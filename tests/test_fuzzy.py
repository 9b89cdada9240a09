"""Fuzzy matching: levenshtein DP, deletion-variant completeness,
SymSpell lookup == brute-force scan, engine + HTTP surfaces."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wiki_search_engine_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_scan,
    levenshtein,
    spell_lookup,
    spellindex_write,
)


def _lev_ref(a: str, b: str) -> int:
    """Independent recursive-memo levenshtein for cross-checking."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def go(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            go(i - 1, j) + 1,
            go(i, j - 1) + 1,
            go(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
        )

    return go(len(a), len(b))


def test_levenshtein_known_cases():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert levenshtein("abc", "acb") == 2  # plain (no transposition)
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3


@settings(max_examples=200, deadline=None)
@given(
    a=st.text(alphabet="abc", max_size=8),
    b=st.text(alphabet="abc", max_size=8),
)
def test_levenshtein_matches_reference(a, b):
    assert levenshtein(a, b) == _lev_ref(a, b)


def test_deletion_variants():
    assert deletion_variants("ab", 1) == {"ab", "a", "b"}
    assert deletion_variants("abc", 2) == {
        "abc", "ab", "ac", "bc", "a", "b", "c"
    }
    assert deletion_variants("x", 2) == {"x", ""}


@settings(max_examples=100, deadline=None)
@given(
    a=st.text(alphabet="ab", min_size=1, max_size=6),
    b=st.text(alphabet="ab", min_size=1, max_size=6),
)
def test_deletion_neighborhood_covers_distance(a, b):
    """The SymSpell soundness property: levenshtein(a,b) <= d implies
    the d-deletion neighborhoods intersect — so the candidate set can
    never miss a true match."""
    d = levenshtein(a, b)
    if d <= 2:
        assert deletion_variants(a, 2) & deletion_variants(b, 2)


@pytest.fixture(scope="module")
def lexicon(spark, engine):
    return {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(
            f"{engine.index_dir}/term_stats"
        ).collect()
    }


@pytest.fixture(scope="module")
def spell_engine(engine):
    engine.build_spellindex(max_dist=2)
    return engine


def _brute(lexicon: dict, q: str, d: int, k: int):
    hits = [
        (t, levenshtein(q, t), df)
        for t, df in lexicon.items()
        if levenshtein(q, t) <= d
    ]
    hits.sort(key=lambda r: (r[1], -r[2], r[0]))
    return hits[:k]


def _mutations(word: str):
    yield word                       # dist 0
    yield word[1:]                   # deletion
    yield word + "x"                 # insertion
    yield "q" + word[1:]             # substitution
    if len(word) >= 3:
        yield word[1] + word[0] + word[2:]   # transposition (dist 2)
        yield word[:2] + "zz" + word[4:]     # double substitution


def test_spell_lookup_equals_brute_force(spell_engine, lexicon):
    words = sorted(lexicon, key=lambda t: -lexicon[t])[:8]
    probes = {m for w in words for m in _mutations(w) if m}
    assert len(probes) > 20
    for q in sorted(probes):
        got = spell_engine.correct(q, k=10)
        assert got == _brute(lexicon, q, 2, 10), q


def test_spell_lookup_equals_distributed_scan(
    spark, spell_engine, lexicon
):
    lex_df = spark.read.parquet(
        f"{spell_engine.index_dir}/term_stats"
    )
    for q in ("tabel", "scna", sorted(lexicon)[0] + "x"):
        exp = [
            (r["term"], int(r["dist"]), int(r["df"]))
            for r in fuzzy_scan(lex_df, q, max_dist=2, k=10).collect()
        ]
        assert spell_engine.correct(q, k=10) == exp, q


def test_correct_normalizes_and_rejects_blank(spell_engine):
    from wiki_search_engine_spark.engine import EmptyQueryError

    a = spell_engine.correct("tabel")
    assert spell_engine.correct("  TABEL!? ") == a
    with pytest.raises(EmptyQueryError):
        spell_engine.correct("  !! ")


def test_correct_requires_spell_layout(spark, corpus_df, tmp_path):
    from wiki_search_engine_spark.engine import SearchEngine

    eng = SearchEngine.build(
        spark, corpus_df, str(tmp_path / "nospell"), stem=True,
        n_buckets=8, bucket_groups=1, salt_bits=2,
    )
    with pytest.raises(FileNotFoundError, match="spell"):
        eng.correct("tabel")


def test_fuzzy_search_corrects_zero_df_terms(
    spell_engine, fixture_queries
):
    """Did-you-mean: a typo'd query scores identically to the intended
    query once fuzzy=True swaps the zero-df term."""
    q = fixture_queries[1]              # "w3 w50", both present
    w1, w2 = q.split()
    typo = f"{w1[:-1]}x {w2}"           # one-char substitution on w1
    exact = spell_engine.search_local(q, k=10)
    assert spell_engine.search_local(typo, k=10, fuzzy=True) == exact
    # without fuzzy the typo'd term contributes nothing
    assert spell_engine.search_local(typo, k=10) != exact
    # present terms are never touched
    assert spell_engine.search_local(q, k=10, fuzzy=True) == exact
    terms, corr = spell_engine.fuzzy_terms(
        spell_engine.analyze(typo)
    )
    assert corr and list(corr.values())[0] == spell_engine.analyze(w1)[0]


def test_fuzzy_query_response_carries_corrections(
    spell_engine, fixture_queries
):
    q = fixture_queries[1]
    w1, w2 = q.split()
    typo = f"{w1[:-1]}x {w2}"
    resp = spell_engine.query_response(
        typo, option_name="bm25", k=5, fuzzy=True
    )
    exact = spell_engine.query_response(q, option_name="bm25", k=5)
    assert "corrections" in resp
    assert [d["file_id"] for d in resp["textResult"]] == [
        d["file_id"] for d in exact["textResult"]
    ]
    # nothing corrected -> the reference shape holds (no extra field)
    assert "corrections" not in spell_engine.query_response(
        q, option_name="bm25", k=5, fuzzy=True
    )


def test_fuzzy_over_http(spell_engine, fixture_queries):
    import json
    import urllib.parse
    import urllib.request

    from wiki_search_engine_spark.server import start_server

    w1, w2 = fixture_queries[1].split()
    srv = start_server(spell_engine, port=0, path_mode="local")
    try:
        port = srv.server_address[1]
        typo = urllib.parse.quote(f"{w1[:-1]}x {w2}")
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/query-stem?query={typo}"
            "&optionName=bm25&fuzzy=true",
            timeout=60,
        ) as r:
            body = json.loads(r.read())
        assert body["corrections"]
        assert body["textResult"]
    finally:
        srv.shutdown()


def test_correct_over_http(spell_engine):
    import json
    import urllib.error
    import urllib.request

    from wiki_search_engine_spark.server import start_server

    srv = start_server(spell_engine, port=0, path_mode="local")
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/correct?term=tabel&k=5", timeout=30
        ) as r:
            body = json.loads(r.read())
        exp = [
            {"term": t, "dist": d, "df": df}
            for t, d, df in spell_engine.correct("tabel", k=5)
        ]
        assert r.status == 200 and body["result"] == exp
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/correct?term=%20", timeout=30
            )
        assert ei.value.code == 400
    finally:
        srv.shutdown()
