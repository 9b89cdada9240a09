"""Per-doc complexity guard for the gram kernels (VERDICT r4 items
1-3): the decontamination n-gram explode and the collocation pair
explode must cost O(total tokens), NOT O(tokens^2) per doc.

Method: two corpora with EQUAL TOTAL TOKENS — many short docs vs few
long docs. A linear kernel costs roughly the same on both (the long
side is usually CHEAPER: fewer rows of per-doc overhead); the r4
interpreted-lambda trap made the long side ~8x slower at this shape
(grams-work scales docs * n^2 = 8x at 4x doc length). The assert band
(< 4x) sits between those regimes with room for the box's +-30%
noise."""

import random
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def gram_corpora(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(4000)]

    def mk(n_docs, n_tokens):
        return spark.createDataFrame(
            [
                (i, " ".join(rng.choice(vocab) for _ in range(n_tokens)))
                for i in range(n_docs)
            ],
            "doc_id long, text string",
        ).cache()

    short = mk(400, 250)   # 100k tokens
    long = mk(50, 2000)    # 100k tokens
    short.count(), long.count()
    yield short, long
    short.unpersist(), long.unpersist()


def _timed(fn):
    fn()  # warm (JIT/codegen)
    t0 = time.time()
    fn()
    return time.time() - t0


def test_ngram_explode_is_linear_in_doc_length(gram_corpora):
    from wiki_search_engine_spark.operators.decontaminate import (
        ngrams_col, ws_token_array,
    )

    short, long = gram_corpora

    def run(df):
        return (
            df.select(
                F.explode(
                    ngrams_col(ws_token_array(F.col("text")), 13)
                ).alias("g")
            ).count()
        )

    t_short = _timed(lambda: run(short))
    t_long = _timed(lambda: run(long))
    assert t_long < 4 * max(t_short, 0.2), (
        f"13-gram explode superlinear in doc length: "
        f"{t_long:.2f}s (long docs) vs {t_short:.2f}s (short docs) "
        "at equal total tokens — the interpreted-HOF-lambda trap is "
        "back (use arrays_zip over shifted slices)"
    )


def test_bigram_pair_explode_is_linear_in_doc_length(gram_corpora):
    from wiki_search_engine_spark.operators.collocations import (
        bigram_pmi,
    )

    short, long = gram_corpora
    t_short = _timed(
        lambda: bigram_pmi(short, min_count=2, k=20).collect()
    )
    t_long = _timed(
        lambda: bigram_pmi(long, min_count=2, k=20).collect()
    )
    assert t_long < 4 * max(t_short, 0.2), (
        f"bigram pair explode superlinear: {t_long:.2f}s vs "
        f"{t_short:.2f}s at equal total tokens"
    )
