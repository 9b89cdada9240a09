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

``df_shard`` on every row is the term's document frequency WITHIN the
shard. The global df (= posting-list length, which the reference also
recomputes at query time, mongoService.js:32 / SURVEY §8.Q7) is the sum of
a term's shard dfs — aggregated per query over the handful of candidate
rows. Storing the shard-local value avoids a window/join over the full
block table at build time (that would re-shuffle every compressed block a
second time just to attach one integer).

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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from .codec import BLOCK_SIZE

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

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("salt", IntegerType()),
        StructField("df_shard", LongType()),
        StructField("bucket", IntegerType()),
        StructField("blocks", ArrayType(BLOCK_STRUCT)),
    ]
)


def term_bucket(term: str, n_buckets: int = DEFAULT_BUCKETS) -> int:
    """Driver/executor-portable term -> partition bucket."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def build_postings(
    tokens: DataFrame,
    avgdl: float,
    salt_bits: int = 3,
    block_size: int = BLOCK_SIZE,
    n_buckets: int = DEFAULT_BUCKETS,
    num_partitions: int | None = None,
) -> DataFrame:
    """tokens (docid, term, tf, doc_len) -> (term, salt, df_shard, bucket,
    blocks). Exactly ONE shuffle (repartition by term+salt)."""
    shift = 63 - salt_bits
    if num_partitions is None:
        # explicit N: an unsized repartition gets AQE-coalesced (possibly
        # to 1 partition on small inputs), serializing the encode kernel
        num_partitions = tokens.sparkSession.sparkContext.defaultParallelism
    # Range partitioning (not hash): output partitions hold contiguous term
    # ranges, so the written parquet files carry tight min/max stats on
    # `term` — query-time term lookups then prune FILES and ROW GROUPS via
    # footer stats alone, no directory-per-bucket layout (a partitionBy
    # bucket write costs a file per (task x bucket) and dominates build
    # time with committer overhead).
    salted = (
        tokens.withColumn(
            "salt",
            F.shiftrightunsigned(F.col("docid"), shift).cast("int"),
        )
        .repartitionByRange(num_partitions, "term", "salt")
        .sortWithinPartitions("term", "salt", "docid")
    )

    # Encode via mapInPandas over the sorted partition stream — one Python
    # call per Arrow batch instead of one per (term, salt) group (an
    # applyInPandas per-group plan pays ~ms of pandas/Arrow overhead per
    # group; with Zipf vocabularies that's 100k+ tiny groups). Groups are
    # contiguous after the sort; a group that spans a batch boundary is
    # carried over to the next batch.
    def encode_stream(batches):
        carry: pd.DataFrame | None = None
        bucket_cache: dict[str, int] = {}

        def encode_body(body: pd.DataFrame) -> pd.DataFrame:
            from .codec import encode_partition_vectorized

            terms = body["term"].to_numpy(dtype=object)
            salts = body["salt"].to_numpy()
            starts, sizes, blocks = encode_partition_vectorized(
                terms,
                salts,
                body["docid"].to_numpy(),
                body["tf"].to_numpy(),
                body["doc_len"].to_numpy(),
                avgdl=avgdl,
                block_size=block_size,
            )
            g_terms = terms[starts]
            buckets = [
                bucket_cache.setdefault(t, term_bucket(t, n_buckets))
                for t in g_terms
            ]
            return pd.DataFrame(
                {
                    "term": g_terms,
                    "salt": pd.Series(
                        salts[starts].astype("int32"), dtype="int32"
                    ),
                    "df_shard": pd.Series(sizes, dtype="int64"),
                    "bucket": pd.Series(buckets, dtype="int32"),
                    "blocks": blocks,
                }
            )

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            new_group = (pdf["term"] != pdf["term"].shift()) | (
                pdf["salt"] != pdf["salt"].shift()
            )
            gid = new_group.cumsum()
            last = gid.iat[-1]
            carry = pdf[gid == last]
            body = pdf[gid != last]
            if len(body):
                yield encode_body(body)
        if carry is not None and len(carry):
            yield encode_body(carry)

    return salted.mapInPandas(encode_stream, schema=POSTINGS_SCHEMA)


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
