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
  stratum until a token budget fills: running-sum window, keep rows
  whose PRE-sum is under budget (so the first over-budget doc is
  included iff it starts under — documents are atomic; the overshoot
  is bounded by one doc). The "give me ~10B tokens of English web"
  selector.

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
) -> DataFrame:
    """Greedy budget packing per stratum: walk the seeded-hash order
    and keep documents while the RUNNING SUM BEFORE each doc is under
    ``budget`` — documents are atomic, so the realized total overshoots
    by at most one document. Deterministic and oracle-replayable."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(_hash_order(F.col(key_col), seed))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(
        F.sum(F.col(tokens_col)).over(w), F.lit(0)
    )
    return (
        df.withColumn("__pre", pre)
        .filter(F.col("__pre") < budget)
        .drop("__pre")
    )
