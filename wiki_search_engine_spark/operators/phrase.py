"""Phrase queries: exact token-adjacency matching over the analyzed
stream, scored like a pseudo-term under BM25.

The reference engine has no phrase operator (its Mongo ``$in`` retrieval
is bag-of-words only, backend/services/mongoService.js:18-30) — this is
the canonical fulltext-index extension a user of any Lucene-class engine
expects, built Spark-first:

- ``phrase_hits`` — ONE mapInPandas pass over the corpus that emits a
  row per (document, analyzed-position, phrase-slot) ONLY for tokens
  that appear in the phrase (the kernel filter is the pushdown: output
  is O(phrase-term occurrences), never O(tokens)). Positions are
  0-based indexes into the base-analyzed token stream (post junk
  filter), so the DuckDB oracle replays them exactly with
  ``generate_subscripts`` + ``row_number``.
- ``phrase_occurrences`` — the adjacency check as ONE aggregation, no
  self-joins: a phrase of m slots matches at anchor ``apos - slot``
  iff all m distinct slots land on the same (docid, anchor). That is
  ``groupBy(docid, apos - slot).agg(countDistinct(slot)) = m`` — a
  single sketch-sized shuffle of the hit rows, against the textbook
  m-way self-join formulation that would re-scan the corpus m times.
  Duplicate terms in the phrase ("new york new york") are handled by
  emitting one row per slot the term fills.
- ``phrase_bm25`` — phrase-as-pseudo-term ranking: tf = occurrence
  count per doc, df = matching-doc count, scored with the engine's
  BM25 (same K1/B and the reference's df form) against the corpus
  N/avgdl/doc_len.

Scale shape: the hits pass is shuffle-free and its output is tiny
relative to the corpus; the anchor aggregation and the df aggregation
are both over hit rows only. At serving time the same adjacency kernel
runs over the positional index sidecar instead of the corpus (see
``positions_sidecar`` / engine ``search_phrase``), so a query touches
only the phrase terms' position lists — this module's corpus form is
the batch-analytics path and the oracle gate for both.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import analyze_query

HITS_SCHEMA = "docid long, apos int, slot int, doc_len int"


def _phrase_hits_batches(slots: list[tuple[str, int]], stem: bool):
    """Kernel factory: (docid, text) Arrow batches -> hit rows.

    Shares the vectorized clean/split/junk (and optional
    stopword+Porter) pipeline with tokenize_frame — same semantics,
    property-tested against base_tokens/full_tokens — then assigns each
    surviving token its 0-based position and keeps only phrase-term
    rows. doc_len (analyzed token count) rides on every hit row so
    scoring needs no second corpus pass for matching docs.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.analyzer import (
            CLEAN_RE,
            STOPWORDS,
            porter_stem,
        )

        for pdf in batches:
            texts = pdf["text"].fillna("")
            token_lists = (
                texts.str.replace(CLEAN_RE, " ", regex=True)
                .str.lower()
                .str.split()
            )
            lens = token_lists.str.len().fillna(0).astype(np.int64)
            if lens.sum() == 0:
                continue
            flat_docids = np.repeat(
                pdf["docid"].to_numpy(dtype=np.int64), lens.to_numpy()
            )
            flat_terms = pd.Series(
                np.concatenate([t for t in token_lists if t]),
                dtype="object",
            )
            junk = np.zeros(flat_terms.size, dtype=bool)
            maybe = (
                (flat_terms.str.len() > 4)
                & flat_terms.str.slice(0, 1).isin(tuple("0123456789"))
            ).to_numpy()
            if maybe.any():
                junk[maybe] = (
                    flat_terms[maybe]
                    .str.fullmatch("[0-9]+", na=False)
                    .to_numpy()
                )
            keep = ~junk
            if stem:
                keep &= ~flat_terms.isin(STOPWORDS).to_numpy()
            flat_docids = flat_docids[keep]
            flat_terms = flat_terms[keep]
            if stem and flat_terms.size:
                uniq = pd.unique(flat_terms)
                flat_terms = flat_terms.map(
                    {t: porter_stem(t) for t in uniq}
                )
            if not flat_terms.size:
                continue
            # 0-based position within each doc's analyzed stream: docs
            # are contiguous runs (one text row per doc), so positions
            # restart at every docid change point
            starts = np.flatnonzero(
                np.r_[True, flat_docids[1:] != flat_docids[:-1]]
            )
            run_lens = np.diff(np.r_[starts, flat_docids.size])
            apos = np.arange(flat_docids.size) - np.repeat(
                starts, run_lens
            )
            doc_len = np.repeat(run_lens, run_lens)
            out = []
            terms_np = flat_terms.to_numpy()
            for term, slot in slots:
                mask = terms_np == term
                if not mask.any():
                    continue
                out.append(
                    pd.DataFrame(
                        {
                            "docid": flat_docids[mask],
                            "apos": apos[mask].astype("int32"),
                            "slot": np.full(
                                int(mask.sum()), slot, dtype="int32"
                            ),
                            "doc_len": doc_len[mask].astype("int32"),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return fn


def phrase_slots(phrase: str | list[str], stem: bool = False) -> list[str]:
    """Analyze a phrase into its ordered slot terms (duplicates kept —
    unlike analyze_query, slot order IS the query)."""
    if isinstance(phrase, str):
        toks = phrase.split()
    else:
        toks = list(phrase)
    out: list[str] = []
    for t in toks:
        a = analyze_query(t, stem=stem)
        if len(a) != 1:
            raise ValueError(
                f"phrase token {t!r} analyzes to {a} — each phrase "
                "position must survive as exactly one term"
            )
        out.append(a[0])
    return out


def phrase_hits(
    corpus: DataFrame, phrase: str | list[str], stem: bool = False
) -> DataFrame:
    """(docid, text) -> (docid, apos, slot, doc_len) hit rows for the
    phrase's terms only. Shuffle-free; output is O(occurrences of the
    phrase's terms), not O(tokens)."""
    terms = phrase_slots(phrase, stem=stem)
    slots = [(t, i) for i, t in enumerate(terms)]
    return corpus.select("docid", "text").mapInPandas(
        _phrase_hits_batches(slots, stem), schema=HITS_SCHEMA
    )


def occurrences_from_hits(hits: DataFrame, m: int) -> DataFrame:
    """(docid, apos, slot, doc_len) hit rows -> (docid, start, doc_len)
    exact occurrences. The anchor aggregation: slot i must sit at
    anchor+i, so grouping hits by (docid, apos - slot) and requiring
    all m distinct slots is exactly the m-token adjacency test — one
    hit-row-sized shuffle. Shared by the corpus-scan path and the
    positional-index path (operators/positions.py positions_hits_df)."""
    return (
        hits.withColumn("start", F.col("apos") - F.col("slot"))
        .filter(F.col("start") >= 0)
        .groupBy("docid", "start")
        .agg(
            F.countDistinct("slot").alias("nslots"),
            F.first("doc_len").alias("doc_len"),
        )
        .filter(F.col("nslots") == m)
        .select("docid", "start", "doc_len")
    )


def phrase_occurrences(
    corpus: DataFrame, phrase: str | list[str], stem: bool = False
) -> DataFrame:
    """(docid, start, doc_len) — one row per exact phrase occurrence,
    from a corpus scan (the batch-analytics form; serving uses the
    positional index via indexed_phrase_occurrences)."""
    terms = phrase_slots(phrase, stem=stem)
    return occurrences_from_hits(
        phrase_hits(corpus, terms, stem=stem), len(terms)
    )


def slop_occurrences(
    corpus: DataFrame,
    phrase: str | list[str],
    slop: int,
    stem: bool = False,
) -> DataFrame:
    """Ordered proximity match ("a b"~slop): positions
    p_0 < p_1 < ... < p_{m-1} of the respective slots with total span
    p_{m-1} - p_0 <= (m - 1) + slop. One occurrence per distinct
    start p_0 (a start matches iff ANY chain from it fits the window
    — the greedy smallest-successor chain minimizes the final
    position, so greedy-exists == exists). slop=0 is exactly the
    adjacency operator (pytest identity).

    Plan: the same hit kernel, then a left-to-right chain of
    docid-equi joins with range predicates — each intermediate is
    bounded by hit rows x window width, never the token stream.
    Output (docid, start, doc_len)."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    terms = phrase_slots(phrase, stem=stem)
    m = len(terms)
    hits = phrase_hits(corpus, terms, stem=stem)
    span = m - 1 + slop
    if m == 1:
        return (
            hits.select(
                "docid", F.col("apos").alias("start"), "doc_len"
            )
            .distinct()
        )
    chain = hits.filter(F.col("slot") == 0).select(
        "docid",
        F.col("apos").alias("p0"),
        F.col("doc_len"),
    )
    for i in range(1, m):
        nxt = hits.filter(F.col("slot") == i).select(
            "docid", F.col("apos").alias(f"p{i}")
        )
        chain = chain.join(nxt, "docid").filter(
            (F.col(f"p{i}") > F.col(f"p{i - 1}"))
            & (F.col(f"p{i}") - F.col("p0") <= span)
        )
    return (
        chain.select(
            "docid", F.col("p0").alias("start"), "doc_len"
        )
        .distinct()
    )


def indexed_phrase_occurrences(
    spark,
    index_dir: str,
    phrase: str | list[str],
    stem: bool = False,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact phrase occurrences from the positional index sidecar —
    reads ONLY the phrase terms' bucket directories (In-pruned row
    groups), never the corpus. Same output contract as
    phrase_occurrences; rank/value identity is pytest-enforced."""
    from .positions import positions_hits_df

    terms = phrase_slots(phrase, stem=stem)
    hits = positions_hits_df(
        spark, index_dir, terms, n_buckets=n_buckets
    )
    return occurrences_from_hits(hits, len(terms))


QUOTE_RE = re.compile(r'"([^"]*)"(~(\d+))?')


def parse_query(query: str) -> tuple[str, list[tuple[str, int]]]:
    """Split a raw query into (bag text, [(phrase, slop), ...]): every
    double-quoted span becomes an exact-phrase requirement; a trailing
    ``~N`` (Lucene-style) relaxes it to an ordered proximity window of
    slop N. An unbalanced trailing quote is treated as literal text
    (the analyzer strips it). Empty quoted spans are dropped."""
    phrases = [
        (p.strip(), int(slop) if slop else 0)
        for p, _tilde, slop in QUOTE_RE.findall(query or "")
        if p.strip()
    ]
    bag = QUOTE_RE.sub(" ", query or "").strip()
    return bag, phrases


def mixed_bm25(
    corpus: DataFrame,
    bag_terms: list[str],
    phrases: list[str | list[str]],
    n: int,
    avgdl: float,
    k: int = 50,
    k1: float = 1.5,
    b: float = 0.75,
    stem: bool = False,
) -> DataFrame:
    """Mixed query semantics: a document must contain EVERY quoted
    phrase (conjunctive filter); its score is the sum of each phrase's
    pseudo-term BM25 (tf = occurrences, df = that phrase's matching
    docs) plus the bag terms' ordinary BM25 contributions (OR
    semantics, zero when none present). Output (docid, score).

    Plan shape: one hit-kernel pass + anchor aggregation per phrase
    (each output is tiny), inner-joined across phrases (docs matching
    all), with the bag contribution LEFT-joined on top — bag terms
    never expand the candidate set, so every join is phrase-doc-sized.
    """
    mdocs = None
    for p in phrases:
        ptext, pslop = p if isinstance(p, tuple) else (p, 0)
        occ = (
            phrase_occurrences(corpus, ptext, stem=stem)
            if pslop == 0
            else slop_occurrences(corpus, ptext, pslop, stem=stem)
        )
        per = occ.groupBy("docid").agg(
            F.count("*").alias("ptf"),
            F.first("doc_len").alias("doc_len"),
        )
        dfv = per.agg(F.count("*").alias("pdf"))
        idf = F.log(
            (F.lit(float(n)) - F.col("pdf") + 0.5)
            / (F.col("pdf") + 0.5) + 1.0
        )
        denom = F.col("ptf") + k1 * (
            1.0 - b + b * F.col("doc_len") / F.lit(float(avgdl))
        )
        scored = per.crossJoin(F.broadcast(dfv)).select(
            "docid",
            "doc_len",
            (idf * F.col("ptf") * (k1 + 1.0) / denom).alias("pscore"),
        )
        if mdocs is None:
            mdocs = scored
        else:
            mdocs = (
                mdocs.withColumnRenamed("pscore", "acc")
                .join(scored.select("docid", "pscore"), "docid")
                .select(
                    "docid", "doc_len",
                    (F.col("acc") + F.col("pscore")).alias("pscore"),
                )
            )
    if mdocs is None:
        raise ValueError("mixed_bm25 needs at least one phrase")
    if bag_terms:
        from .aggregates import term_df_salted
        from .tokenize import tokenize

        toks = tokenize(corpus, stem=stem).filter(
            F.col("term").isin(list(dict.fromkeys(bag_terms)))
        )
        dfs = term_df_salted(toks)
        tfd = F.col("tf").cast("double")
        contrib = (
            F.log(
                (F.lit(float(n)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0
            )
            * tfd * (k1 + 1.0)
            / (
                tfd
                + k1 * (
                    1.0 - b
                    + b * F.col("doc_len") / F.lit(float(avgdl))
                )
            )
        )
        bag = (
            toks.join(F.broadcast(dfs), "term")
            .select("docid", contrib.alias("c"))
            .groupBy("docid")
            .agg(F.sum("c").alias("bscore"))
        )
        mdocs = mdocs.join(bag, "docid", "left")
    else:
        mdocs = mdocs.withColumn("bscore", F.lit(None).cast("double"))
    return (
        mdocs.select(
            "docid",
            F.round(
                F.col("pscore") + F.coalesce(F.col("bscore"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )


def phrase_bm25(
    corpus: DataFrame,
    phrase: str | list[str],
    n: int,
    avgdl: float,
    k: int = 50,
    k1: float = 1.5,
    b: float = 0.75,
    stem: bool = False,
) -> DataFrame:
    """Top-k docs for an exact phrase, scored as a pseudo-term:
    tf = per-doc occurrence count, df = matching-doc count (the
    reference's df form: Robertson idf with +1), corpus N/avgdl passed
    in (at serving time they come from the stats singleton — never a
    corpus scan). Output (docid, phrase_tf, score) rounded like every
    scored entry."""
    occ = phrase_occurrences(corpus, phrase, stem=stem)
    return rank_occurrences(occ, n, avgdl, k=k, k1=k1, b=b)


def rank_occurrences(
    occ: DataFrame,
    n: int,
    avgdl: float,
    k: int = 50,
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """(docid, start, doc_len) occurrences -> top-k
    (docid, phrase_tf, score): the pseudo-term BM25 shared by the
    corpus-scan and positional-index phrase paths."""
    per_doc = occ.groupBy("docid").agg(
        F.count("*").alias("phrase_tf"),
        F.first("doc_len").alias("doc_len"),
    )
    # df is a scalar over the (small) matching-doc relation; window
    # over an empty partitioning would funnel rows to one task at
    # scale, so cross-join the 1-row aggregate instead
    dfv = per_doc.agg(F.count("*").alias("df"))
    idf = F.log(
        (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("phrase_tf") + k1 * (
        1.0 - b + b * F.col("doc_len") / F.lit(float(avgdl))
    )
    return (
        per_doc.crossJoin(F.broadcast(dfv))
        .select(
            "docid",
            F.col("phrase_tf").cast("long").alias("phrase_tf"),
            F.round(
                idf * F.col("phrase_tf") * (k1 + 1.0) / denom, 6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )
