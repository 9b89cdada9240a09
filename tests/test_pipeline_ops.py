"""Training-data pipeline operators: decontamination, PII scrub,
repetition metrics — each vs an independent pure-Python oracle."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from wiki_search_engine_spark.functions.pii import (
    pii_counts, scrub_pii,
)
from wiki_search_engine_spark.operators.decontaminate import (
    contaminated_docs,
)
from wiki_search_engine_spark.operators.repetition import (
    repetition_metrics,
)


def _grams(text, n):
    toks = text.lower().split()
    return {
        " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
    }


@pytest.fixture(scope="module")
def pipe_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi"),  # superset of doc 1
        (3, "one two three four five six seven eight nine ten eleven "
            "twelve thirteen"),
        (4, "spam spam spam spam spam spam ham spam spam spam"),
        (5, "completely different words nothing shared here at all "
            "not even close friend"),
        (6, ""),
        (7, "short doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contaminated_docs_vs_bruteforce(spark, pipe_docs):
    eval_rows = [
        # 13 tokens lifted verbatim from doc 1/2's shared prefix
        ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu",),
        ("unrelated eval question that matches nothing in the corpus "
         "at all whatsoever period",),
    ]
    eval_df = spark.createDataFrame(eval_rows, ["text"])
    got = {
        r["doc_id"]: r["n_hits"]
        for r in contaminated_docs(pipe_docs, eval_df, n=13).collect()
    }
    # brute force
    ev = set()
    for (q,) in eval_rows:
        ev |= _grams(q, 13)
    exp = {}
    for r in pipe_docs.collect():
        hits = _grams(r["text"], 13) & ev
        if hits:
            exp[r["doc_id"]] = len(hits)
    assert got == exp
    assert 1 in got and 2 in got  # planted overlap found
    assert 3 not in got and 5 not in got


def test_contaminated_hash_mode_superset(spark, pipe_docs):
    """xxhash64 production mode: flagged set is a superset of the
    string mode's (collisions only add), and on real data equal."""
    eval_df = spark.createDataFrame(
        [
            ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lambda mu nu",),
        ],
        ["text"],
    )
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in contaminated_docs(pipe_docs, eval_df, n=13).collect()
    }
    hashed = {
        r["doc_id"]: r["n_hits"]
        for r in contaminated_docs(
            pipe_docs, eval_df, n=13, join_on="xxhash64"
        ).collect()
    }
    assert set(hashed) >= set(exact)
    for d, c in exact.items():
        assert hashed[d] >= c
    assert hashed == exact  # no collisions at this scale


def test_contaminated_docs_short_docs_safe(spark, pipe_docs):
    # docs shorter than n must not crash Spark's sequence()
    eval_df = spark.createDataFrame([("short doc",)], ["text"])
    out = contaminated_docs(pipe_docs, eval_df, n=13).collect()
    assert out == []


def test_pii_scrub_and_counts(spark):
    rows = [
        (1, "mail me at a.user+tag@ex-ample.co.uk or boss@corp.io now"),
        (2, "server at 192.168.0.1 and 8.8.8.8 but not 999.999.1.1"),
        (3, "call +1 (415) 555-0172 or 415-555-0199 today"),
        (4, "no pii here just words"),
        (5, "v1.2.3.4 release"),  # dotted quad inside a version string
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    c = pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            c["n_emails"].alias("e"),
            c["n_ips"].alias("i"),
            c["n_phones"].alias("p"),
            scrub_pii(F.col("text")).alias("s"),
        ).collect()
    }
    assert out[1]["e"] == 2 and "<EMAIL>" in out[1]["s"]
    assert "@" not in out[1]["s"]
    assert out[2]["i"] == 2
    assert "192.168.0.1" not in out[2]["s"]
    assert "999.999.1.1" in out[2]["s"]  # not a valid IPv4
    assert out[3]["p"] == 2 and out[3]["s"].count("<PHONE>") == 2
    assert out[4]["e"] == out[4]["i"] == out[4]["p"] == 0
    assert out[4]["s"] == rows[3][1]
    # "v1.2.3.4": no word boundary between "v" and "1", so the version
    # string is NOT a dotted-quad match — stays unmasked
    assert out[5]["i"] == 0
    assert out[5]["s"] == rows[4][1]


def _naive_top(text, n):
    toks = text.lower().split()
    if len(toks) < n:
        return 0
    return max(
        Counter(
            tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)
        ).values()
    )


def test_repetition_metrics_vs_naive(spark, pipe_docs):
    got = {
        r["doc_id"]: r for r in repetition_metrics(pipe_docs).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}
    for r in pipe_docs.collect():
        doc_id, text = r["doc_id"], r["text"]
        toks = text.lower().split()
        g = got[doc_id]
        assert g["n_tokens"] == len(toks)
        assert g["top2_count"] == _naive_top(text, 2), doc_id
        assert g["top3_count"] == _naive_top(text, 3), doc_id
        nt = max(len(toks), 1)
        assert g["top2_frac"] == pytest.approx(
            g["top2_count"] * 2.0 / nt
        )
    # the spam doc is flagged, normal prose is not
    assert got[4]["flagged"] is True
    assert got[1]["flagged"] is False
    assert got[6]["flagged"] is False  # empty doc: 0 tokens, not null


def test_repetition_metrics_randomized(spark):
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r for r in repetition_metrics(df).collect()
    }
    for i, text in rows:
        assert got[i]["top2_count"] == _naive_top(text, 2), (i, text)
        assert got[i]["top3_count"] == _naive_top(text, 3), (i, text)


def test_ngram_dup_fraction_crafted(spark):
    """Two docs sharing an exact 5-gram span are both marked; a doc
    with only unique grams is 0.0; a doc shorter than n is (0, 0,
    0.0); within-doc repetition alone never counts as duplication."""
    from wiki_search_engine_spark.operators.substring_dedup import (
        flag_dup_docs, ngram_dup_fraction,
    )

    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"{shared} one two three"),
        (2, f"prefix words {shared}"),
        (3, "totally different text with no overlap at all"),
        (4, "tiny doc"),
        # within-doc repetition: the same 5-gram twice in ONE doc
        (5, "rep one rep two rep one rep two rep one rep two rep"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac"])
        for r in ngram_dup_fraction(df, n=5).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # docs 1 and 2 share exactly one distinct 5-gram
    assert out[1][1] == 1 and out[2][1] == 1
    assert out[1][2] == pytest.approx(1 / out[1][0])
    assert out[3] == (out[3][0], 0, 0.0) and out[3][0] > 0
    assert out[4] == (0, 0, 0.0)
    assert out[5][1] == 0  # within-doc repeats are not cross-doc dups
    # production hash mode: identical metrics on this corpus
    out_xx = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac"])
        for r in ngram_dup_fraction(df, n=5, key="xxhash64").collect()
    }
    assert out_xx == out
    # filter form
    flagged = {
        r["doc_id"]
        for r in flag_dup_docs(df, n=5, threshold=0.2).collect()
    }
    assert 1 in flagged and 3 not in flagged and 4 not in flagged
