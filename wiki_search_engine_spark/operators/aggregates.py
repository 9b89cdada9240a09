"""Corpus-level aggregations: df, doc_stats, corpus stats.

Reference semantics:
- df = number of docs containing the term (Indexer/inverted_index.py:111);
- N = number of docs that appear in the index (metaDataInsert.py:17-23 —
  docs with zero indexed tokens are excluded, SURVEY §8.Q8);
- avgdl = total_length / N (metaDataInsert.py:26-48).

Scale notes:
- token rows are already distinct on (term, docid) (tokenize emits one row
  per pair), so df is a plain count — a partial+final hash aggregate;
- for Zipf-skewed corpora a head term can dominate a reducer, so
  ``term_df_salted`` does the north_rule's explicit two-phase salted
  aggregation: groupBy(term, salt) partial counts -> groupBy(term) sum.
  AQE splits skewed *joins* but not skewed groupBy keys, hence manual;
- doc_stats is |N| rows; corpus_stats is 1 row (broadcast at query time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_df(tokens: DataFrame) -> DataFrame:
    """(term, df) — single hash-agg (fine when skew is mild)."""
    return tokens.groupBy("term").agg(F.count("*").alias("df"))


def term_df_salted(tokens: DataFrame, salt_buckets: int = 64) -> DataFrame:
    """(term, df) via two-phase salted aggregation for heavy-hitter terms.

    Phase 1 spreads each term over ``salt_buckets`` reducers keyed by a
    docid-derived salt; phase 2 sums the partial counts (salt_buckets rows
    per term at most). Result is identical to ``term_df``.
    """
    salt = F.pmod(F.col("docid"), F.lit(salt_buckets)).alias("salt")
    partial = (
        tokens.groupBy("term", salt).agg(F.count("*").alias("pdf"))
    )
    return partial.groupBy("term").agg(F.sum("pdf").cast("long").alias("df"))


def doc_stats(tokens: DataFrame) -> DataFrame:
    """(docid, doc_len) — one row per indexed doc."""
    return tokens.groupBy("docid").agg(F.first("doc_len").alias("doc_len"))


def corpus_stats(doc_stats_df: DataFrame) -> DataFrame:
    """1-row (N, avgdl, total_length) — the reference's metaData singleton
    (metaDataInsert.py:50-53)."""
    return doc_stats_df.agg(
        F.count("*").alias("N"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").cast("long").alias("total_length"),
    )
