"""Deterministic training-data sampling: stratified quotas and
token-budget packing.

Assembling a training mix from a 10^12-doc corpus needs sampling that
is (a) distributed, (b) reproducible run-to-run regardless of
partitioning, and (c) auditable. Random samplers fail (b) and (c);
these operators instead order documents by a SEEDED HASH — a fixed
pseudo-random permutation any engine can replay — so the sample is a
pure function of (data, seed) and the DuckDB oracle value-checks it
row-for-row.

- ``stratified_sample`` — top-``n_per`` docs per stratum by
  md5(seed || key) order: one window over the stratum (Spark pushes
  partial top-k inside the shuffle via rank; the stratum count, not
  the corpus, bounds the state). The standard "N examples per
  language/domain/quality-band" quota.
- ``pack_token_budget`` — greedy prefix of the same hash order per
  stratum until a token budget fills: keep rows whose PRE-sum is
  under budget (so the first over-budget doc is included iff it
  starts under — documents are atomic; the overshoot is bounded by
  one doc). The "give me ~10B tokens of English web" selector.
  Executed as a two-phase hash-bucket cutoff so no stratum ever
  funnels through a single reducer (see the function docstring).

Hash choice: md5 of (seed literal || '|' || key) — portable between
Spark and DuckDB byte-for-byte (xxhash64 would be faster but is
Spark-private). Keys must be unique per doc (use the docid/url);
ties are impossible, so the order — and thus the sample — is total.

The reference has no sampling machinery (its corpus fits a single
Mongo instance); this family exists for the 100-TB training-data
pipeline the engine fronts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_order(key_col, seed: int):
    return F.md5(
        F.concat(F.lit(str(seed)), F.lit("|"), key_col.cast("string"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per: int,
    seed: int = 42,
) -> DataFrame:
    """Up to ``n_per`` rows per value of ``strata_col``, chosen by the
    seeded-hash order over ``key_col`` — deterministic, partitioning-
    independent, oracle-replayable. Adds no columns."""
    w = Window.partitionBy(strata_col).orderBy(
        _hash_order(F.col(key_col), seed)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per)
        .drop("__rk")
    )


def pack_token_budget(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    tokens_col: str,
    budget: int,
    seed: int = 42,
    bucket_hex: int = 4,
) -> DataFrame:
    """Greedy budget packing per stratum: walk the seeded-hash order
    and keep documents while the RUNNING SUM BEFORE each doc is under
    ``budget`` — documents are atomic, so the realized total overshoots
    by at most one document. Deterministic and oracle-replayable.

    Scale design (two-phase bucket cutoff). A naive running-sum window
    ``partitionBy(stratum).orderBy(hash)`` funnels every row of a
    stratum through ONE reducer — for "10B tokens of English web" out
    of a 10^12-doc corpus, that is a large fraction of the corpus
    sorted on a single task. Instead we exploit that md5-hex order ==
    (first ``bucket_hex`` chars, remainder) lexicographic order:

    1. bucket each row by the first ``bucket_hex`` hex chars of the
       same seeded hash (16^bucket_hex ordered buckets per stratum)
       and aggregate token sums per (stratum, bucket) — a map-side-
       combined shuffle of at most ``strata x 16^bucket_hex`` rows;
    2. prefix-sum those bucket sums with a window over the TINY
       aggregated table (<=65k rows per stratum at the default) to get
       ``cum[b]`` = tokens in buckets strictly before ``b``; keep only
       buckets with ``cum[b] < budget`` — every later bucket's rows
       all start at/after the budget and are provably excluded;
    3. broadcast-join the surviving (stratum, bucket, cum) triples
       back onto the corpus — the inner join discards dead buckets
       BEFORE any wide shuffle, so downstream volume is O(sample),
       not O(corpus);
    4. run the running-sum window WITHIN (stratum, bucket) — each
       window partition is one bucket (corpus/16^bucket_hex rows),
       and a row's global pre-sum is exactly ``cum[bucket] +
       within-bucket pre-sum``; keep rows where that is < budget.

    The kept set is bit-identical to the single-window definition (a
    row's global prefix sum decomposes exactly as cum + within), so
    the DuckDB oracle replays the simple formulation unchanged. The
    corpus is scanned twice (sum pass + select pass) by design — at
    100 TB two scans beat one full-corpus sort-shuffle into
    per-stratum reducers, and pass 2's shuffle carries only the
    budget-sized survivor set.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if not 1 <= bucket_hex <= 8:
        raise ValueError(f"bucket_hex must be in [1, 8], got {bucket_hex}")
    h = _hash_order(F.col(key_col), seed)
    with_bk = df.withColumn("__bk", F.substring(h, 1, bucket_hex))

    # phase 1: per-(stratum, bucket) token sums, then the prefix sum
    # over the aggregated table. The stratum-wide window here is over
    # <=16^bucket_hex BUCKET-SUM rows, never corpus rows.
    cum_w = (
        Window.partitionBy(strata_col)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bclass = (
        with_bk.groupBy(strata_col, "__bk")
        .agg(F.sum(F.col(tokens_col)).alias("__s"))
        .withColumn(
            "__cum", F.coalesce(F.sum("__s").over(cum_w), F.lit(0))
        )
        .filter(F.col("__cum") < budget)
        .drop("__s")
    )

    # phase 2: prune dead buckets via broadcast, then window per bucket
    in_bucket_w = (
        Window.partitionBy(strata_col, "__bk")
        .orderBy(h)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.col("__cum") + F.coalesce(
        F.sum(F.col(tokens_col)).over(in_bucket_w), F.lit(0)
    )
    return (
        with_bk.join(F.broadcast(bclass), [strata_col, "__bk"])
        .withColumn("__pre", pre)
        .filter(F.col("__pre") < budget)
        .select(*df.columns)
    )
