"""Fuzzy term matching / spell correction over the lexicon.

Two paths, one contract (top-k corrections ranked by edit distance,
then df desc, then term asc):

- ``fuzzy_scan`` — the DISTRIBUTED reference form: one
  ``F.levenshtein`` pass over the (term, df) lexicon. O(|vocab|) work
  per query term — exact, SQL-expressible (the DuckDB oracle runs the
  identical ``levenshtein``), and the right shape for batch jobs
  ("correct this whole query log"), but not for a serving path.
- ``spellindex_write`` / ``spell_lookup`` — the SERVING form: a
  materialized SymSpell deletion-neighborhood index (Garbe's symmetric
  delete algorithm). Every lexicon term is indexed under each string
  obtainable by deleting <= max_dist characters; a query term
  generates ITS deletion variants and the candidate set is exactly the
  terms sharing a variant (if levenshtein(a, b) <= d, deleting the
  edited positions from both sides yields a common variant — so the
  candidate set provably covers every true match, pytest-verified
  against the scan). Candidates are then verified with a true
  DP levenshtein. The index is ~sum_t C(len(t), <=d) rows (~50x the
  lexicon at d=2) — the classic space-for-time trade — laid out
  partitionBy(dbucket) with delkey-sorted rows, so a lookup is one
  threaded pyarrow dataset read with an In(delkey) pushdown: zero
  Spark jobs, the same serving pattern as suggest/search_phrase.

The reference has no fuzzy matching (a typo returns nothing,
mongoService.js does exact $in); this is the standard search-head
companion to autocomplete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .postings import term_bucket

N_DBUCKETS = 64
MAX_TERM_LEN = 64  # variant count is O(len^max_dist); cap + document


def fuzzy_scan(
    lexicon: DataFrame,
    term: str,
    max_dist: int = 2,
    k: int = 10,
) -> DataFrame:
    """(term, df) lexicon -> top-k corrections of ``term`` by
    (levenshtein asc, df desc, term asc). JVM codegen end-to-end."""
    return (
        lexicon.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.levenshtein(F.col("term"), F.lit(term)).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def deletion_variants(term: str, max_dist: int = 2) -> set[str]:
    """All strings obtainable from ``term`` by deleting up to
    ``max_dist`` characters (the term itself included)."""
    out = {term}
    frontier = {term}
    for _ in range(max_dist):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def levenshtein(a: str, b: str) -> int:
    """Plain DP levenshtein (two-row), for verify-time candidate
    checks — candidate sets are tiny so this never sees the lexicon."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def spellindex_write(
    lexicon: DataFrame,
    out_dir: str,
    max_dist: int = 2,
    n_dbuckets: int = N_DBUCKETS,
) -> None:
    """Materialize the deletion-neighborhood index: (delkey, term, df)
    rows, hive-partitioned by ``dbucket`` = md5-bucket(delkey) with
    delkey-sorted row groups. One mapInPandas expand (lexicon-sized
    input — small next to the corpus) + one shuffle for the layout."""
    import json
    import os

    import pandas as pd

    def expand(batches):
        for pdf in batches:
            terms, dfs, keys = [], [], []
            for t, dfv in zip(pdf["term"], pdf["df"]):
                t = t[:MAX_TERM_LEN]
                for v in deletion_variants(t, max_dist):
                    terms.append(t)
                    dfs.append(dfv)
                    keys.append(v)
            yield pd.DataFrame(
                {"delkey": keys, "term": terms, "df": dfs}
            )

    expanded = (
        lexicon.select("term", F.col("df").cast("long").alias("df"))
        .mapInPandas(expand, schema="delkey string, term string, df long")
        .withColumn(
            "dbucket",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.col("delkey").cast("binary")), 1, 8
                    ),
                    16, 10,
                ).cast("long"),
                F.lit(n_dbuckets),
            ).cast("int"),
        )
    )
    (
        expanded.repartition("dbucket")
        .sortWithinPartitions("dbucket", "delkey", "term")
        .write.mode("overwrite")
        .partitionBy("dbucket")
        .parquet(out_dir)
    )
    with open(os.path.join(out_dir, "_spell_meta.json"), "w") as f:
        json.dump(
            {"max_dist": max_dist, "n_dbuckets": n_dbuckets}, f
        )


def spell_lookup(
    spell_dir: str,
    term: str,
    k: int = 10,
    max_dist: int | None = None,
    dataset=None,
) -> list[tuple[str, int, int]]:
    """Driver-side correction lookup: generate the query term's
    deletion variants, read the terms indexed under any of them (one
    threaded dataset read, dbucket partition pruning + In(delkey)
    row-group pushdown), verify true levenshtein, rank. Returns
    [(term, dist, df)] by (dist, -df, term). Zero Spark jobs.

    ``dataset`` lets a caller (SearchEngine) pass a cached
    pyarrow dataset; otherwise one is built per call."""
    import json
    import os

    import pyarrow.dataset as pads

    with open(os.path.join(spell_dir, "_spell_meta.json")) as f:
        meta = json.load(f)
    d = meta["max_dist"] if max_dist is None else min(
        max_dist, meta["max_dist"]
    )
    term = term[:MAX_TERM_LEN]
    variants = deletion_variants(term, d)
    buckets = sorted(
        {
            term_bucket(v, meta["n_dbuckets"])
            for v in variants
        }
    )
    ds = dataset or pads.dataset(
        spell_dir, partitioning="hive", format="parquet"
    )
    tbl = ds.to_table(
        columns=["delkey", "term", "df"],
        filter=pads.field("dbucket").isin(buckets)
        & pads.field("delkey").isin(sorted(variants)),
    )
    best: dict[str, tuple[int, int]] = {}
    for t, dfv in zip(
        tbl.column("term").to_pylist(), tbl.column("df").to_pylist()
    ):
        if t in best:
            continue
        dist = levenshtein(term, t)
        if dist <= d:
            best[t] = (dist, int(dfv))
    ranked = sorted(
        ((t, dist, dfv) for t, (dist, dfv) in best.items()),
        key=lambda r: (r[1], -r[2], r[0]),
    )
    return ranked[:k]
