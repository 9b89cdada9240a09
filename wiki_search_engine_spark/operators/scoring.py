"""Exhaustive BM25 / TF-IDF scoring as declarative DataFrame ops.

This is the Catalyst-native path: the whole computation is JVM-side
(whole-stage codegen), no Python in the loop. It replicates the
reference's serving-path loop (backend/services/mongoService.js:28-58)
as a filter -> arithmetic -> aggregate -> TakeOrderedAndProject plan:

    tokens (docid, term, tf, doc_len)
      |> semi-filter on analyzed query terms      ($in, mongoService.js:18)
      |> join broadcast (term, df) for query terms only
      |> per-row partial score (BM25 or TF-IDF formula)
      |> groupBy(docid).sum                       (OR-semantics accumulate)
      |> orderBy(score desc, docid asc).limit(k)  (top-k, §8.Q5 tie-break)

N / avgdl arrive as literals (the reference reads its metaData singleton
per query, mongoService.js:15-26). df for scoring is recomputed from the
live postings (len(posting list), §8.Q7) — here that's exactly the
count of token rows per term, computed on the FILTERED tokens so only
query terms are aggregated (tiny shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import B, K1


def score_expr(mode: str, n: int, avgdl: float):
    """Partial per-(term,doc) contribution column. Formulas:
    backend/services/mongoService.js:34-48."""
    tf = F.col("tf").cast("double")
    df = F.col("df").cast("double")
    if mode == "bm25":
        idf = F.log((F.lit(float(n)) - df + 0.5) / (df + 0.5) + 1.0)
        dl = F.col("doc_len").cast("double")
        denom = tf + F.lit(K1) * (1.0 - B + F.lit(B) * dl / F.lit(avgdl))
        return idf * tf * F.lit(K1 + 1.0) / denom
    if mode == "tfidf":
        return tf * F.log(F.lit(float(n)) / df)
    raise ValueError(f"unknown scoring mode: {mode}")


def score_exhaustive(
    tokens: DataFrame,
    query_terms: list[str],
    n: int,
    avgdl: float,
    k: int | None = 50,
    mode: str = "bm25",
    semantics: str = "or",
    exclude_terms: list[str] | None = None,
    required_terms: list[str] | None = None,
) -> DataFrame:
    """Top-k (docid, score) over a token/posting relation.

    ``query_terms`` must already be analyzed + deduped
    (functions.analyzer.analyze_query). ``k=None`` returns ALL scored docs
    unordered (caller applies its own ordering/limit) — never pass a huge k
    instead: orderBy().limit(k) plans a size-k TakeOrderedAndProject heap
    per partition.

    ``semantics``: 'or' (the reference's accumulate-any, default) or
    'and' — conjunctive retrieval: only docs containing EVERY query term
    score (the web-search list-intersection form; expressed as the same
    single aggregation plus a distinct-term count, so Catalyst plans one
    hash aggregate — no join chain per term). A query term absent from
    the corpus empties the AND result by definition.

    ``exclude_terms``: Lucene-style NOT — docs containing ANY excluded
    term are removed BEFORE the top-k cut (a post-cut filter would
    under-fill k). Planned as one LEFT ANTI join against the excluded
    terms' docids: the anti-join side is per-doc-per-excluded-term rows
    only (the same magnitude as the excluded postings the engine's
    local path decodes), never corpus-sized; AQE broadcasts it when
    small. A term both queried and excluded empties the result (the
    Lucene boolean contradiction)."""
    if not query_terms:
        return (
            tokens.sparkSession.createDataFrame(
                [], "docid long, score double"
            )
        )
    matched = tokens.filter(F.col("term").isin(query_terms))
    # df recomputed from live postings (Q7); window avoids a second scan
    from pyspark.sql import Window

    df_w = Window.partitionBy("term")
    matched = matched.withColumn("df", F.count("*").over(df_w))
    scored = matched.withColumn("partial", score_expr(mode, n, avgdl))
    if semantics == "and":
        agg = (
            scored.groupBy("docid")
            .agg(
                F.sum("partial").alias("score"),
                F.count_distinct("term").alias("_nt"),
            )
            .filter(F.col("_nt") == len(set(query_terms)))
            .drop("_nt")
        )
    elif semantics == "or":
        if required_terms:
            # Lucene MUST subset: same single hash aggregate as AND,
            # but only the required terms gate membership (SHOULD
            # terms still contribute to the sum)
            # an absent required term can never be counted, so the
            # filter empties the result — correct MUST semantics
            req = sorted(set(required_terms))
            agg = (
                scored.groupBy("docid")
                .agg(
                    F.sum("partial").alias("score"),
                    F.count_distinct(
                        F.when(
                            F.col("term").isin(req), F.col("term")
                        )
                    ).alias("_req"),
                )
                .filter(F.col("_req") == len(req))
                .drop("_req")
            )
        else:
            agg = scored.groupBy("docid").agg(
                F.sum("partial").alias("score")
            )
    else:
        raise ValueError(f"unknown semantics: {semantics}")
    if exclude_terms:
        excluded = (
            tokens.filter(F.col("term").isin(list(set(exclude_terms))))
            .select("docid")
            .distinct()
        )
        agg = agg.join(excluded, "docid", "left_anti")
    if k is None:
        return agg
    return agg.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def score_synonyms(
    tokens: DataFrame,
    groups: list[list[str]],
    n: int,
    avgdl: float,
    k: int | None = 50,
    mode: str = "bm25",
) -> DataFrame:
    """Top-k with query-time synonym groups: each group of analyzed
    terms scores as ONE pseudo-term whose per-doc tf is the SUM of the
    group's tfs and whose df is the DOC FREQUENCY OF THE DISJUNCTION
    (count of docs containing any group member).

    This is Lucene's SynonymQuery semantics with one deliberate
    difference: Lucene approximates the group df with the max member
    df (cheap from per-term stats); here the true disjunction df is
    one extra hash aggregate over rows the query already touched, and
    it is what the BM25 saturation actually means — a synonym group
    behaves exactly like a single vocabulary item.

    Plan shape: broadcast the (term -> gid) mapping (query-sized),
    one hash aggregate to (docid, gid) with map-side partial combine,
    one group-sized aggregate for df, broadcast it back, then the
    standard accumulate + TakeOrderedAndProject — no corpus-sized
    shuffle beyond the per-(doc, gid) rows the matched terms produce."""
    mapping = [
        (t, gid) for gid, terms in enumerate(groups) for t in set(terms)
    ]
    if not mapping:
        return tokens.sparkSession.createDataFrame(
            [], "docid long, score double"
        )
    mdf = tokens.sparkSession.createDataFrame(
        mapping, "term string, gid int"
    )
    per_doc = (
        tokens.join(F.broadcast(mdf), "term")
        .groupBy("docid", "gid")
        .agg(
            F.sum("tf").cast("int").alias("tf"),
            # doc_len is constant per doc
            F.first("doc_len").alias("doc_len"),
        )
    )
    gdf = per_doc.groupBy("gid").agg(
        F.count("*").cast("long").alias("df")
    )
    scored = per_doc.join(F.broadcast(gdf), "gid").withColumn(
        "partial", score_expr(mode, n, avgdl)
    )
    agg = scored.groupBy("docid").agg(F.sum("partial").alias("score"))
    if k is None:
        return agg
    return agg.orderBy(F.desc("score"), F.asc("docid")).limit(k)
