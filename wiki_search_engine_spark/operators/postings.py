"""Posting-list construction: salted repartition-by-term + applyInPandas.

Replaces the reference's driver-side group-to-array (mongodb_scripts/
insertIndex.py:43-91: stream CSV rows into a dict keyed by term) with a
distributed, skew-aware build (north_rule: "salted per-term posting-list
construction ... via repartition-by-term + mapInPandas merge").

Layout decision — the index is **doc-range sharded**: each output row is
``(term, salt, df, bucket, blocks)`` where ``salt`` is a docid-RANGE shard
(top ``salt_bits`` bits of the non-negative 63-bit docid) and ``blocks``
are the term's delta+varbyte blocks for that docid range only. Why:

- *skew*: a stopword-scale term (10^11 postings at web scale) never has to
  pass through one task — each (term, salt) encode group is bounded;
- *sound distributed WAND*: within one salt shard, ALL query terms'
  postings for that docid range are present, so a per-shard top-k with OR
  semantics is exact and global top-k = merge of shard top-ks
  (document-sharded query processing, the standard web-search layout);
- *no giant rows*: blocks of one term stay ≤ range size per row.

``df`` on every row is the term's GLOBAL document frequency (window-summed
over shards) so idf is computable anywhere without a second lookup
(reference recomputes df = posting-list length at query time,
mongoService.js:32 — equal to this stored sum by construction).

``bucket`` = md5-based hash of term mod n_buckets — the table's partition
directory key. It is computed with plain Python md5 (not Spark xxhash64)
so the DRIVER can compute the same bucket for query terms and prune
partitions without a Spark job.

Block metadata stores ``max_score`` as the *idf-independent* BM25 factor
    u = tf*(k1+1) / (tf + k1*(1-b+b*doclen/avgdl))
(and ``max_tf`` for the TF-IDF bound), so blocks never need df/N at build
time; the query kernel multiplies by idf(term) for the true block-max
bound.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from .codec import BLOCK_SIZE, encode_postings

DEFAULT_BUCKETS = 64

BLOCK_STRUCT = StructType(
    [
        StructField("first_docid", LongType()),
        StructField("last_docid", LongType()),
        StructField("count", IntegerType()),
        StructField("max_score", DoubleType()),
        StructField("max_tf", IntegerType()),
        StructField("docids_bytes", BinaryType()),
        StructField("tfs_bytes", BinaryType()),
        StructField("doclens_bytes", BinaryType()),
    ]
)

PARTIAL_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("salt", IntegerType()),
        StructField("df_partial", LongType()),
        StructField("bucket", IntegerType()),
        StructField("blocks", ArrayType(BLOCK_STRUCT)),
    ]
)


def term_bucket(term: str, n_buckets: int = DEFAULT_BUCKETS) -> int:
    """Driver/executor-portable term -> partition bucket."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _block_tuple(b: dict) -> tuple:
    return (
        b["first_docid"], b["last_docid"], b["count"], b["max_score"],
        b["max_tf"], b["docids_bytes"], b["tfs_bytes"], b["doclens_bytes"],
    )


def build_postings(
    tokens: DataFrame,
    avgdl: float,
    salt_bits: int = 3,
    block_size: int = BLOCK_SIZE,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """tokens (docid, term, tf, doc_len) -> (term, salt, df, bucket, blocks).

    One shuffle (groupBy term+salt), one window (global df per term).
    """
    shift = 63 - salt_bits
    salted = tokens.withColumn(
        "salt", F.shiftrightunsigned(F.col("docid"), shift).cast("int")
    )

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, salt = key
        blocks = encode_postings(
            pdf["docid"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["doc_len"].to_numpy(),
            idf=1.0,
            avgdl=avgdl,
            block_size=block_size,
        )
        return pd.DataFrame(
            {
                "term": [term],
                "salt": [int(salt)],
                "df_partial": [len(pdf)],
                "bucket": [term_bucket(term, n_buckets)],
                "blocks": [[_block_tuple(b) for b in blocks]],
            }
        )

    partial = salted.groupBy("term", "salt").applyInPandas(
        encode, schema=PARTIAL_SCHEMA
    )
    w = Window.partitionBy("term")
    return partial.select(
        "term",
        "salt",
        F.sum("df_partial").over(w).cast("long").alias("df"),
        "bucket",
        "blocks",
    )


def decode_postings_df(postings: DataFrame) -> DataFrame:
    """postings shards -> flat (term, docid, tf, doc_len).

    The decompressed view used by the exhaustive scorer, the TF-IDF path
    and the index-invariant tests; mapInPandas NumPy decode.
    """
    from .codec import decode_posting_list

    def decode(batches):
        for pdf in batches:
            frames = []
            for term, blocks in zip(pdf["term"], pdf["blocks"]):
                docids, tfs, doclens = decode_posting_list(
                    [
                        b if isinstance(b, dict) else b.asDict()
                        for b in blocks
                    ]
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "term": term,
                            "docid": docids,
                            "tf": tfs,
                            "doc_len": doclens,
                        }
                    )
                )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(
                    {
                        "term": pd.Series([], dtype="string"),
                        "docid": pd.Series([], dtype="int64"),
                        "tf": pd.Series([], dtype="int32"),
                        "doc_len": pd.Series([], dtype="int32"),
                    }
                )
            )

    return postings.select("term", "blocks").mapInPandas(
        decode, schema="term string, docid long, tf int, doc_len int"
    )
