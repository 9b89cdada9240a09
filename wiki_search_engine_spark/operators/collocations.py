"""Collocation mining: top adjacent-bigram PMI over the corpus — the
classic phrase-discovery pass (Church & Hanks 1990; Mikolov et al.
2013's phrase threshold is the same statistic re-scaled). A fulltext
engine uses it to seed phrase suggestions and multi-word synonyms; a
training-data pipeline uses it to find tokenizer-merge candidates.

Spark-first shape: one corpus scan explodes adjacent pairs inside
whole-stage codegen (split + transform over a sequence — no Python),
then two hash aggregates (pair counts, unigram counts) and two
shuffle joins keyed on the words. Unigram counts are NOT broadcast by
default: at web scale the vocabulary is ~10^7-10^8 rows, exactly the
size AQE decides better than we can (it broadcasts when a side is
small). The two scalar totals ride a cross-joined 1-row aggregate, so
nothing corpus-sized ever reaches the driver.

PMI = ln( (c_ab / P) / ((c_a / T) * (c_b / T)) ) with T = total
tokens, P = total adjacent pairs; a ``min_count`` floor drops the
noise pairs whose PMI is high only because they are rare (the
standard Church-Hanks caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tok_col(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )


def bigram_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` adjacent bigrams by PMI: (w1, w2, n_pair, pmi),
    ordered (pmi desc, w1 asc, w2 asc); pairs rarer than ``min_count``
    are dropped before ranking."""
    toks = _tok_col(text_col)
    # Adjacent pairs as arrays_zip over two shifted slices (the
    # functions/textstats.py shingles shape) — NOT element_at(toks, i+j)
    # inside a transform lambda: HOF lambdas are interpreted, and a
    # lambda that references the captured computed ``toks`` re-splits
    # the text per element AND element_at scans to position i, so the
    # pair explode was O(tokens^2) per doc (219x slower at 2k-token
    # docs). Slices of length max(size-1, 0) make the <2-token case an
    # empty array for free.
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, m).alias("w1"),
                F.slice(toks, 2, m).alias("w2"),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    totals = uni.agg(
        F.sum("c").cast("double").alias("T")
    ).crossJoin(
        pairs.agg(F.count("*").cast("double").alias("P"))
    )
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    scored = (
        pair_counts.join(
            uni.select(
                F.col("w").alias("w1"), F.col("c").alias("c1")
            ),
            "w1",
        )
        .join(
            uni.select(
                F.col("w").alias("w2"), F.col("c").alias("c2")
            ),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi",
            F.log(
                (F.col("n_pair") / F.col("P"))
                / ((F.col("c1") / F.col("T")) * (F.col("c2") / F.col("T")))
            ),
        )
    )
    return (
        scored.select("w1", "w2", "n_pair", F.round("pmi", 6).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
