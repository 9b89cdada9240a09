"""Phrase matching: adjacency semantics, position arithmetic, analyzer
interaction, and a property test against a naive pure-Python finder."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wiki_search_engine_spark.functions.analyzer import (
    base_tokens,
    full_tokens,
)
from wiki_search_engine_spark.operators.phrase import (
    phrase_bm25,
    phrase_hits,
    phrase_occurrences,
    phrase_slots,
)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["docid", "text"]).astype(
            {"docid": "int64"}
        )
    )


def _naive_occ(text: str, terms: list[str], stem: bool = False):
    toks = full_tokens(text) if stem else base_tokens(text)
    m = len(terms)
    return [
        i
        for i in range(len(toks) - m + 1)
        if toks[i : i + m] == terms
    ]


def test_basic_adjacency(spark):
    df = _df(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "beta alpha beta gamma alpha"),
            (3, "alpha gamma beta"),  # terms present, never adjacent
            (4, "alpha beta alpha beta gamma"),
        ],
    )
    got = sorted(
        (r["docid"], r["start"])
        for r in phrase_occurrences(df, "beta gamma").collect()
    )
    assert got == [(1, 1), (2, 2), (4, 3)]


def test_junk_filter_shifts_positions(spark):
    # '123456' is junk (all digits, len>4) and must NOT occupy a
    # position: 'alpha [junk] beta' IS an adjacent phrase; '123' (short
    # number) survives and blocks adjacency
    df = _df(
        spark,
        [(1, "alpha 123456 beta"), (2, "alpha 123 beta")],
    )
    got = sorted(
        (r["docid"], r["start"])
        for r in phrase_occurrences(df, "alpha beta").collect()
    )
    assert got == [(1, 0)]


def test_duplicate_phrase_terms(spark):
    df = _df(
        spark,
        [
            (1, "go stop go stop go"),
            (2, "go go stop"),
        ],
    )
    got = sorted(
        (r["docid"], r["start"])
        for r in phrase_occurrences(df, "go stop go").collect()
    )
    assert got == [(1, 0), (1, 2)]


def test_single_term_phrase_is_every_occurrence(spark):
    df = _df(spark, [(1, "x y x"), (2, "y")])
    got = sorted(
        (r["docid"], r["start"])
        for r in phrase_occurrences(df, "x").collect()
    )
    assert got == [(1, 0), (1, 2)]


def test_punctuation_cleaning_and_case(spark):
    # cleaning replaces punctuation with spaces and lowercases — the
    # phrase crosses the punctuation like the analyzer does
    df = _df(spark, [(1, "Alpha, BETA! gamma?")])
    got = phrase_occurrences(df, "alpha beta").collect()
    assert [(r["docid"], r["start"]) for r in got] == [(1, 0)]


def test_stemmed_phrase_crosses_stopwords_consistently(spark):
    # stem=True removes stopwords before positions: 'running the tests'
    # analyzes to [run, test] — so the phrase 'running tests' matches
    df = _df(spark, [(1, "He was running the tests quickly")])
    got = phrase_occurrences(df, "running tests", stem=True).collect()
    assert [(r["docid"], r["start"]) for r in got] == [(1, 0)]


def test_phrase_slots_rejects_vanishing_token():
    with pytest.raises(ValueError):
        phrase_slots("the of", stem=True)  # stopwords vanish
    # base analyzer keeps stopwords
    assert phrase_slots("the quick") == ["the", "quick"]


def test_hits_carry_doc_len_and_only_phrase_terms(spark):
    df = _df(spark, [(1, "a b c d e a")])
    rows = phrase_hits(df, "a c").collect()
    assert {r["doc_len"] for r in rows} == {6}
    # 'a' fills slot 0 (twice), 'c' slot 1 (once) — no other tokens
    assert sorted((r["apos"], r["slot"]) for r in rows) == [
        (0, 0),
        (2, 1),
        (5, 0),
    ]


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "alpha beta")],
        "docid long, text string",
    )
    got = phrase_occurrences(df, "alpha beta").collect()
    assert [(r["docid"], r["start"]) for r in got] == [(3, 0)]


def test_bm25_scoring_matches_manual(spark):
    import math

    df = _df(
        spark,
        [
            (1, "p q p q x"),      # 2 occurrences, dl 5
            (2, "p q y z"),        # 1 occurrence, dl 4
            (3, "q p y z"),        # 0 occurrences
        ],
    )
    n, avgdl = 3, (5 + 4 + 4) / 3
    out = {
        r["docid"]: (r["phrase_tf"], r["score"])
        for r in phrase_bm25(df, "p q", n=n, avgdl=avgdl, k=10).collect()
    }
    assert set(out) == {1, 2}
    df_match = 2
    idf = math.log((n - df_match + 0.5) / (df_match + 0.5) + 1)
    for docid, tf, dl in ((1, 2, 5), (2, 1, 4)):
        exp = idf * tf * 2.5 / (tf + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl))
        assert out[docid][0] == tf
        assert abs(out[docid][1] - exp) < 1e-6, docid


def test_parse_query():
    from wiki_search_engine_spark.operators.phrase import parse_query

    assert parse_query('fast "table hash"') == (
        "fast", [("table hash", 0)]
    )
    bag, ph = parse_query('"a b" x "c d"~3 y')
    assert bag.split() == ["x", "y"]
    assert ph == [("a b", 0), ("c d", 3)]
    assert parse_query("no quotes") == ("no quotes", [])
    assert parse_query('"only phrase"~2') == ("", [("only phrase", 2)])
    # unbalanced quote: literal, analyzer strips it downstream
    assert parse_query('broken "quote') == ('broken "quote', [])
    bag2, ph2 = parse_query('empty "" span')
    assert bag2.split() == ["empty", "span"] and ph2 == []


def test_mixed_bm25_semantics(spark):
    """Phrase filters, bag boosts: docs without the phrase never
    appear regardless of bag weight; bag-less docs still rank."""
    import math

    from wiki_search_engine_spark.operators.phrase import mixed_bm25

    df = _df(
        spark,
        [
            (1, "p q x"),          # phrase + bag
            (2, "p q y"),          # phrase only
            (3, "x x x x q p"),    # bag-heavy, phrase reversed -> out
        ],
    )
    n, avgdl = 3, (3 + 3 + 6) / 3
    out = {
        r["docid"]: r["score"]
        for r in mixed_bm25(
            df, ["x"], ["p q"], n=n, avgdl=avgdl, k=10
        ).collect()
    }
    assert set(out) == {1, 2}
    # doc1 = phrase pseudo-term + bag contribution; doc2 phrase only
    pdf, bdf = 2, 2
    pidf = math.log((n - pdf + 0.5) / (pdf + 0.5) + 1)
    bidf = math.log((n - bdf + 0.5) / (bdf + 0.5) + 1)

    def bm(tf, dl, idf):
        return idf * tf * 2.5 / (tf + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert abs(out[2] - bm(1, 3, pidf)) < 1e-6
    assert abs(out[1] - (bm(1, 3, pidf) + bm(1, 3, bidf))) < 1e-6


def _naive_slop_occ(text, terms, slop):
    toks = base_tokens(text)
    m = len(terms)
    span = m - 1 + slop
    pos = [
        [i for i, t in enumerate(toks) if t == term] for term in terms
    ]

    def chain(i, prev, start):
        if i == m:
            return True
        return any(
            p > prev and p - start <= span and chain(i + 1, p, start)
            for p in pos[i]
        )

    return [p0 for p0 in pos[0] if chain(1, p0, p0)]


def test_slop_zero_equals_exact(spark):
    from wiki_search_engine_spark.operators.phrase import (
        slop_occurrences,
    )

    df = _df(
        spark,
        [
            (1, "a b c a b"),
            (2, "a x b"),
            (3, "b a"),
        ],
    )
    exact = sorted(
        (r["docid"], r["start"])
        for r in phrase_occurrences(df, "a b").collect()
    )
    slop0 = sorted(
        (r["docid"], r["start"])
        for r in slop_occurrences(df, "a b", 0).collect()
    )
    assert slop0 == exact == [(1, 0), (1, 3)]


def test_slop_widens_window(spark):
    from wiki_search_engine_spark.operators.phrase import (
        slop_occurrences,
    )

    df = _df(spark, [(1, "a x b"), (2, "a x x b"), (3, "b x a")])
    got = lambda s: sorted(
        (r["docid"], r["start"])
        for r in slop_occurrences(df, "a b", s).collect()
    )
    assert got(0) == []
    assert got(1) == [(1, 0)]
    assert got(2) == [(1, 0), (2, 0)]
    # order matters: 'b ... a' never matches "a b"
    assert all(d != 3 for d, _ in got(5))


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                 min_size=0, max_size=10),
        min_size=1,
        max_size=5,
    ),
    phrase=st.lists(
        st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=3
    ),
    slop=st.integers(min_value=0, max_value=3),
)
def test_slop_occurrences_match_naive(spark, docs, phrase, slop):
    from wiki_search_engine_spark.operators.phrase import (
        slop_occurrences,
    )

    rows = [(i + 1, " ".join(words)) for i, words in enumerate(docs)]
    got = sorted(
        (r["docid"], r["start"])
        for r in slop_occurrences(
            _df(spark, rows), list(phrase), slop
        ).collect()
    )
    exp = sorted(
        (docid, s)
        for docid, text in rows
        for s in _naive_slop_occ(text, list(phrase), slop)
    )
    assert got == exp


WORDS = ["aa", "bb", "cc", "the", "12345", "dd"]


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    ),
    phrase=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=3
    ),
)
def test_occurrences_match_naive(spark, docs, phrase):
    rows = [(i + 1, " ".join(words)) for i, words in enumerate(docs)]
    got = sorted(
        (r["docid"], r["start"])
        for r in phrase_occurrences(_df(spark, rows), phrase).collect()
    )
    exp = sorted(
        (docid, s)
        for docid, text in rows
        for s in _naive_occ(text, list(phrase))
    )
    assert got == exp
