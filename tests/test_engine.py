"""Spark engine vs pure-Python oracle: rank identity + index invariants.

Mirrors the reference's test intent (SURVEY §5): scoring monotonicity and
schema checks (backend/__tests__/scoringBM25.test.js, indexDocRetrieval
.test.js) — strengthened to full rank-identity against the oracle.
"""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_rank_identical


@pytest.mark.parametrize("mode", ["bm25", "tfidf"])
@pytest.mark.parametrize("path", ["wand", "exhaustive", "local"])
def test_rank_identity(engine, oracle, fixture_queries, mode, path):
    for q in fixture_queries:
        exp = oracle.search(q, k=10, mode=mode)
        got = [
            (r["docid"], r["score"])
            for r in engine.search_ids(q, k=10, mode=mode, path=path).collect()
        ]
        assert_rank_identical(got, exp)


def test_wand_equals_exhaustive_at_k50(engine, fixture_queries):
    for q in fixture_queries[:4]:
        a = engine.search_ids(q, k=50, mode="bm25", path="wand").collect()
        b = engine.search_ids(
            q, k=50, mode="bm25", path="exhaustive"
        ).collect()
        assert [r["docid"] for r in a] == [r["docid"] for r in b]
        for x, y in zip(a, b):
            assert math.isclose(x["score"], y["score"], rel_tol=1e-9)


def test_corpus_stats_match_oracle(engine, oracle):
    assert engine.n == oracle.n_docs
    assert math.isclose(engine.avgdl, oracle.avgdl, rel_tol=1e-12)
    assert engine.total_length == sum(oracle.doc_len.values())


def test_index_invariants(spark, engine, oracle, index_dir):
    from wiki_search_engine_spark.operators.postings import decode_postings_df

    postings = spark.read.parquet(f"{index_dir}/postings")
    flat = decode_postings_df(postings).cache()
    # df == posting-list length (Q7) and matches oracle
    df_check = {
        r["term"]: r["n"]
        for r in flat.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    stored_df = {
        r["term"]: r["df"]
        for r in postings.groupBy("term")
        .agg(F.sum("df_shard").alias("df"))
        .collect()
    }
    assert df_check == stored_df
    oracle_df = {t: len(p) for t, p in oracle.postings.items()}
    assert df_check == oracle_df
    # sum(tf per doc) == doc_len (every row of the doc agrees)
    bad = (
        flat.groupBy("docid")
        .agg(
            F.sum("tf").alias("sum_tf"), F.first("doc_len").alias("doc_len")
        )
        .filter(F.col("sum_tf") != F.col("doc_len"))
        .count()
    )
    assert bad == 0
    # postings docid-sorted within each (term, salt) shard
    rows = postings.select("term", "salt", "blocks").collect()
    for r in rows:
        firsts = [b["first_docid"] for b in r["blocks"]]
        lasts = [b["last_docid"] for b in r["blocks"]]
        assert firsts == sorted(firsts)
        assert all(f <= l for f, l in zip(firsts, lasts))
        assert all(lasts[i] < firsts[i + 1] for i in range(len(firsts) - 1))
    flat.unpersist()


def test_empty_query_errors(engine):
    from wiki_search_engine_spark.engine import EmptyQueryError

    # reference: 400 {success:false,error:'Empty query'}
    # (queryController.js:21-25)
    with pytest.raises(EmptyQueryError):
        engine.search_ids("   ")


def test_hydration(engine, oracle, fixture_queries):
    q = fixture_queries[1]
    rows = engine.search(q, k=5).collect()
    exp = oracle.search(q, k=5)
    assert [r["docid"] for r in rows] == [d for d, _ in exp]
    for r in rows:
        assert r["url"].startswith("https://en.wikipedia.org/wiki/Doc_")
        assert r["title"] == r["url"].rsplit("/", 1)[1]
        assert isinstance(r["snippet"], str)


def test_snippet_semantics(spark):
    """cut_the_article: chars of first <=3 lines until the 2nd '.',
    inclusive (insertScript.py:8-24)."""
    from wiki_search_engine_spark.functions.textstats import snippet

    cases = [
        ("One. Two. Three.", "One. Two."),
        ("no dots at all\nsecond line\nthird\nfourth",
         "no dots at allsecond linethird"),
        ("a.\nb.\nc.", "a.b."),
        ("only one dot.", "only one dot."),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = [r[0] for r in df.select(snippet(F.col("text"))).collect()]
    assert got == [w for _, w in cases]


def test_resume_skips_completed_units(spark, corpus_df, tmp_path):
    import json

    from wiki_search_engine_spark.plans.build import build_index
    from wiki_search_engine_spark.plans.manifest import Manifest

    d = str(tmp_path / "idx")
    m = build_index(
        spark, corpus_df, d, n_buckets=8, bucket_groups=2, salt_bits=1
    )
    assert m.is_done("all")
    # simulate a crash after group 0: drop completion of group 1 + all
    entries = json.load(open(f"{d}/manifest.json"))
    before_g1 = dict(entries)
    del before_g1["postings_g1"]
    del before_g1["all"]
    json.dump(before_g1, open(f"{d}/manifest.json", "w"))
    tok_done_at = entries["tokens"]["finished_at"]
    m2 = build_index(
        spark, corpus_df, d, n_buckets=8, bucket_groups=2, salt_bits=1,
        resume=True,
    )
    # completed units were NOT recomputed (same finished_at), missing one was
    assert m2.entries["tokens"]["finished_at"] == tok_done_at
    assert m2.is_done("postings_g1") and m2.is_done("all")
    # index is complete and loadable
    from wiki_search_engine_spark.engine import SearchEngine

    eng = SearchEngine.load(spark, d)
    assert eng.n > 0


def test_ner_index_rank_identity(spark, corpus_rows, tmp_path):
    """Entity-analyzer plug end-to-end: ner-built index answers entity
    queries rank-identically to the oracle with the same analyzer."""
    import pandas as pd

    from wiki_search_engine_spark.engine import SearchEngine
    from wiki_search_engine_spark.operators.tokenize import with_docid
    from wiki_search_engine_spark.oracle_py.oracle import IndexOracle

    rows = corpus_rows[:30]
    # planted stopword-bridged entities: the r3 analyzer extension must
    # index and retrieve them end-to-end, not just in unit tests
    rows = rows + [
        dict(
            rows[0],
            url="https://en.wikipedia.org/wiki/Bridged_A",
            text="Title: Bridged A\nThe Bank of America tower opened. "
                 "Many visited Bank of America branches nearby.",
        ),
        dict(
            rows[1],
            url="https://en.wikipedia.org/wiki/Bridged_B",
            text="Title: Bridged B\nThe University of California hosted "
                 "a fair near Bank of America plaza.",
        ),
    ]
    corpus_df = spark.createDataFrame(pd.DataFrame(rows))
    eng = SearchEngine.build(
        spark, corpus_df, str(tmp_path / "ner_index"),
        n_buckets=8, bucket_groups=1, salt_bits=1, analyzer="ner",
    )
    assert eng.analyzer == "ner"

    oracle = IndexOracle(analyzer="ner")
    iddf = with_docid(corpus_df, "url").select("docid", "text").collect()
    for r in iddf:
        oracle.add_document(r["docid"], r["text"])

    # pick an entity phrase actually present in a doc (synth capitalizes
    # ~10% of words, so capitalized bigrams occur)
    from wiki_search_engine_spark.functions.analyzer import ner_tokens

    phrase = next(
        t for r in rows for t in ner_tokens(r["text"]) if " " in t
    )
    for q in [phrase, f"{phrase} xyznotaword", "Some Words here",
              "Bank of America", "University of California"]:
        exp = oracle.search(q, k=10, mode="bm25")
        got = [
            (r["docid"], r["score"])
            for r in eng.search_ids(q, k=10, mode="bm25", path="wand")
            .collect()
        ]
        from tests.conftest import assert_rank_identical

        assert_rank_identical(got, exp)
    # local path answers the phrase query identically too
    loc = eng.search_local(phrase, k=10, mode="bm25")
    exp = oracle.search(phrase, k=10, mode="bm25")
    assert_rank_identical(loc, exp)
    # the bridged-entity phrase must actually hit the planted docs
    # (rank-identity alone would also pass on two empty result sets)
    assert len(eng.search_local("Bank of America", k=10)) >= 2


def test_docs_image_metadata_parity(spark, engine, corpus_rows, index_dir,
                                    docid_map):
    """JVM image extraction in the docs stage == the python reference
    (functions/extraction.py extract_image_srcs), ids <file_id>-<i>."""
    from wiki_search_engine_spark.functions.extraction import (
        extract_image_srcs,
    )

    docs = {
        r["docid"]: r
        for r in spark.read.parquet(f"{index_dir}/docs").collect()
    }
    n_with_images = 0
    for row in corpus_rows:
        docid = docid_map[row["url"]]
        exp = extract_image_srcs(row["html"].decode("utf-8"))
        got = docs[docid]["images"]
        assert [g["src"] for g in got] == exp
        assert [g["image_id"] for g in got] == [
            f"{docid}-{j}" for j in range(len(exp))
        ]
        assert docs[docid]["image_count"] == len(exp)
        n_with_images += bool(exp)
    assert n_with_images > 0  # synth actually produces images


def test_image_results_flatten(engine, fixture_queries):
    ids = engine.image_results(fixture_queries[0], k=5)
    assert all("-" in i for i in ids)
    rows = engine.search(
        fixture_queries[0], k=5, with_images=True
    ).collect()
    assert sum(r["image_count"] for r in rows) == len(ids)


def test_build_from_raw_html(spark, corpus_rows, tmp_path, docid_map):
    """Rows with text=NULL are ingested via the extraction UDF: the
    resulting index equals one built from pre-extracted text."""
    import pandas as pd

    from wiki_search_engine_spark.engine import SearchEngine

    rows = [dict(r) for r in corpus_rows[:20]]
    withtext = spark.createDataFrame(pd.DataFrame(rows))
    for r in rows:
        r["text"] = None
    raw = spark.createDataFrame(pd.DataFrame(rows)).withColumn(
        "text", __import__("pyspark.sql.functions", fromlist=["lit"])
        .lit(None).cast("string")
    )
    a = SearchEngine.build(
        spark, withtext, str(tmp_path / "a"), n_buckets=8,
        bucket_groups=1, salt_bits=1,
    )
    b = SearchEngine.build(
        spark, raw, str(tmp_path / "b"), n_buckets=8,
        bucket_groups=1, salt_bits=1,
    )
    assert a.n == 20 and (a.n, a.total_length) == (b.n, b.total_length)
    from wiki_search_engine_spark.sources.synth import vocabulary

    w, _ = vocabulary(42)
    qa = a.search_local(f"{w[0]} {w[3]}", k=10)
    qb = b.search_local(f"{w[0]} {w[3]}", k=10)
    assert qa and qa == qb


def test_query_response_shape(engine, fixture_queries):
    """Reference HTTP response contract (queryController.js:11-59)."""
    r = engine.query_response(fixture_queries[0], option_name="BM25", k=5)
    assert set(r) >= {"imageResult", "textResult", "searchTime", "profile"}
    assert r["textResult"] and all(
        set(d) >= {"docId", "chunkedBody", "url", "file_id", "score"}
        for d in r["textResult"]
    )
    scores = [d["score"] for d in r["textResult"]]
    assert scores == sorted(scores, reverse=True)  # scoringBM25.test.js
    names = [m["name"] for m in r["profile"]["measures"]]
    assert names[:3] == ["validate_input", "stem_query", "get_documents"]
    assert names[-1] == "total_request"
    snap = r["profile"]["sysSnapshot"]  # profiler.js:20-29 shape
    assert set(snap) == {
        "rss_mb", "heapUsed_mb", "heapTotal_mb", "eventLoopDelay_ms",
    }
    assert snap["rss_mb"] > 0
    assert engine.query_response("   ") == {
        "success": False, "result": [], "error": "Empty query",
    }
    # unknown optionName falls back to tfidf (queryController.js:19)
    r2 = engine.query_response(fixture_queries[0], option_name="weird", k=3)
    assert r2["textResult"]


def test_search_many_matches_individual(engine, fixture_queries):
    """Batch path: each query's rows in the one-job batch result equal
    its individual search_ids ranking (incl. empty/absent queries
    contributing no rows)."""
    batch = engine.search_many(fixture_queries, k=10, mode="bm25")
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["docid"], r["score"]))
    for i, q in enumerate(fixture_queries):
        try:
            exp = [
                (r["docid"], r["score"])
                for r in engine.search_ids(
                    q, k=10, mode="bm25", path="wand"
                ).collect()
            ]
        except Exception:
            exp = []
        assert got.get(i, []) == exp, f"query {i}: {q!r}"


def test_build_text_only_corpus(spark, corpus_rows, tmp_path):
    """A corpus with no html column (pre-extracted text) must build and
    serve; image metadata degrades to empty arrays (ADVICE r1: the docs
    stage previously referenced F.col('html') unconditionally)."""
    import pandas as pd

    from wiki_search_engine_spark.engine import SearchEngine

    rows = [{"url": r["url"], "text": r["text"]} for r in corpus_rows[:20]]
    eng = SearchEngine.build(
        spark,
        spark.createDataFrame(pd.DataFrame(rows)),
        str(tmp_path / "textonly"),
        stem=True, n_buckets=8, bucket_groups=1, salt_bits=1,
    )
    query = rows[0]["text"].split()[0]
    hits = eng.search(query, k=5, with_images=True).collect()
    assert hits
    assert all(r["image_count"] == 0 and r["images"] == [] for r in hits)


def test_engine_rejects_old_format_version(spark, engine, index_dir,
                                           tmp_path):
    """format_version mismatch -> clear error, not a confusing path or
    schema failure deep in the serving path."""
    import json
    import shutil

    import pytest as _pytest

    from wiki_search_engine_spark.engine import SearchEngine

    old = str(tmp_path / "oldfmt")
    shutil.copytree(index_dir, old)
    with open(f"{old}/meta.json") as f:
        meta = json.load(f)
    meta["format_version"] = 1
    with open(f"{old}/meta.json", "w") as f:
        json.dump(meta, f)
    with _pytest.raises(ValueError, match="format_version"):
        SearchEngine.load(spark, old)


def test_local_cache_rank_identical_and_bounded(spark, engine, index_dir,
                                                fixture_queries):
    """cache_terms LRU: identical results to the uncached path on every
    fixture query (first and repeated hits), cache size stays bounded."""
    from wiki_search_engine_spark.engine import SearchEngine

    cached = SearchEngine.load(spark, index_dir)
    cached._cache_cap = 8
    for q in fixture_queries:
        try:
            exp = engine.search_local(q, k=10)
        except Exception:
            continue
        assert cached.search_local(q, k=10) == exp, q
        assert cached.search_local(q, k=10) == exp, q  # cache hit path
        assert len(cached._term_cache) <= 8
    cached.clear_cache()
    assert not cached._term_cache


def test_and_semantics(spark, engine, oracle, fixture_queries):
    """Conjunctive retrieval: every AND result contains every query
    term; AND results are a subset of OR results with identical scores;
    a query with an absent term returns nothing."""
    q = fixture_queries[0] + " " + fixture_queries[1]
    terms = engine.analyze(q)
    got_and = {
        r["docid"]: r["score"]
        for r in engine.search_ids(
            q, k=50, mode="bm25", semantics="and"
        ).collect()
    }
    got_or = {
        r["docid"]: r["score"]
        for r in engine.search_ids(
            q, k=500, mode="bm25", path="exhaustive"
        ).collect()
    }
    assert got_and
    for d, s in got_and.items():
        assert abs(got_or[d] - s) < 1e-9
        assert all(d in oracle.postings[t] for t in terms), d
    # OR-only docs (missing some term) are excluded
    partial = [
        d for d in got_or
        if not all(d in oracle.postings[t] for t in terms)
    ]
    assert all(d not in got_and for d in partial)
    assert (
        engine.search_ids(
            f"{fixture_queries[0]} zzznotaword", semantics="and"
        ).count() == 0
    )


def test_and_semantics_local_path(engine, fixture_queries):
    """The driver-local AND intersection scorer equals the exhaustive
    AND path, rank and score."""
    import math

    q = fixture_queries[0] + " " + fixture_queries[1]
    exp = [
        (r["docid"], r["score"])
        for r in engine.search_ids(
            q, k=20, mode="bm25", path="exhaustive", semantics="and"
        ).collect()
    ]
    got = engine.search_local(q, k=20, mode="bm25", semantics="and")
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert math.isclose(a, b, rel_tol=1e-9)
    assert engine.search_local(
        f"{fixture_queries[0]} zzznotaword", semantics="and"
    ) == []


def test_fresh_rebuild_clears_stale_buckets(spark, tmp_path):
    """A non-resume rebuild into an existing index_dir must not inherit
    ghost postings: dynamic partition overwrite only rewrites bucket
    dirs the new corpus touches, so stale ones are cleared up front."""
    import pandas as pd

    from wiki_search_engine_spark.engine import SearchEngine

    d = str(tmp_path / "idx")
    rows_a = [
        {"url": f"https://x/a{i}", "text": f"alphaword{i % 7} shared"}
        for i in range(40)
    ]
    rows_b = [{"url": "https://x/b0", "text": "betaword solo"}]
    SearchEngine.build(
        spark, spark.createDataFrame(pd.DataFrame(rows_a)), d,
        stem=False, n_buckets=8, bucket_groups=1, salt_bits=1,
    )
    eng = SearchEngine.build(
        spark, spark.createDataFrame(pd.DataFrame(rows_b)), d,
        stem=False, n_buckets=8, bucket_groups=1, salt_bits=1,
    )
    assert eng.n == 1
    terms = {
        r["term"]
        for r in spark.read.parquet(f"{d}/term_stats").collect()
    }
    assert terms == {"betaword", "solo"}  # no ghost alphaword* terms
    assert eng.search_local("alphaword0", k=5) == []
    assert eng.search_local("betaword", k=5)


def test_negative_external_docid_fails_build(spark, tmp_path):
    """A pre-keyed corpus with a negative docid must fail the build
    loudly (tokenize kernel contract check) — a negative id would be
    salted inconsistently between the build's unsigned shift and the
    driver lookups' arithmetic shift, making the doc silently
    unfindable (ADVICE r2)."""
    import pandas as pd
    import pytest as _p

    from wiki_search_engine_spark.engine import SearchEngine

    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"docid": 5, "url": "https://x/a", "text": "alpha beta"},
                {"docid": -3, "url": "https://x/b", "text": "gamma delta"},
            ]
        )
    )
    with _p.raises(Exception, match="negative docid"):
        SearchEngine.build(
            spark, df, str(tmp_path / "negid"), stem=True,
            n_buckets=4, bucket_groups=1, salt_bits=1,
        )


def test_salt_of_matches_unsigned_shift(spark):
    """Driver-side salt derivation must equal Spark's
    shiftrightunsigned for NEGATIVE docids too (legacy pre-r3 indexes
    could contain them; arithmetic >> would compute a negative salt and
    miss the doc's salt directory — r3 review finding)."""
    from wiki_search_engine_spark.engine import salt_of

    ids = [0, 1, 5, 2**62, 2**63 - 1, -1, -5, -(2**62), -(2**63)]
    for bits in (1, 2, 3):
        exp = {
            r["d"]: r["s"]
            for r in spark.createDataFrame(
                [(d,) for d in ids], "d long"
            ).selectExpr(
                "d", f"cast(shiftrightunsigned(d, {63 - bits}) as long) s"
            ).collect()
        }
        for d in ids:
            assert salt_of(d, bits) == exp[d], (d, bits)


def test_suggest_matches_oracle(engine, oracle):
    """suggest == the lexicon's prefix top-k by (df desc, term asc),
    for every 1- and 2-char prefix present in the fixture vocab."""
    lex = [(t, len(p)) for t, p in oracle.postings.items()]
    prefixes = sorted({t[:1] for t, _ in lex} | {t[:2] for t, _ in lex})
    for p in prefixes:
        exp = sorted(
            [(t, df) for t, df in lex if t.startswith(p)],
            key=lambda x: (-x[1], x[0]),
        )[:10]
        assert engine.suggest(p, k=10) == exp, p


def test_suggest_normalizes_and_rejects_blank(engine):
    from wiki_search_engine_spark.engine import EmptyQueryError
    import pytest as _p

    got = engine.suggest("s", k=5)
    assert engine.suggest("  S!? ", k=5) == got  # case/punct normalized
    with _p.raises(EmptyQueryError):
        engine.suggest("   !!!   ")
    with _p.raises(EmptyQueryError):
        engine.suggest("")


def test_suggest_agrees_with_distributed_form(spark, engine, corpus_df):
    """The driver range-scan path == the distributed term_df form
    (q_term_prefix_topk's shape) over the same built index."""
    from pyspark.sql import functions as F

    lex = spark.read.parquet(f"{engine.index_dir}/term_stats")
    for p in ("s", "b", "re"):
        exp = [
            (r["term"], r["df"])
            for r in lex.filter(F.col("term").startswith(p))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(7)
            .collect()
        ]
        assert engine.suggest(p, k=7) == exp, p


def test_wildcard_expansion_terms(engine):
    exp_terms = [t for t, _df in engine.suggest("s", k=128)]
    assert engine.expand_query_terms("s*") == exp_terms
    # mixed bag + wildcard: analyzed bag first, expansions appended,
    # order-preserving dedupe; '*'-free queries equal plain analyze
    bag = engine.analyze("running table")
    mixed = engine.expand_query_terms("running table s*")
    assert mixed[: len(bag)] == bag
    assert mixed[len(bag):] == [t for t in exp_terms if t not in bag]
    assert engine.expand_query_terms("plain text") == engine.analyze(
        "plain text"
    )
    # bare '*' and unknown prefixes expand to nothing, not errors
    assert engine.expand_query_terms("zzzzq*") == []


def test_wildcard_search_matches_manual_or(engine, oracle):
    """search_local('s*') == BM25 OR over every lexicon term with the
    prefix, scored against the pure-Python oracle's postings."""
    import math

    K1, B = 1.5, 0.75
    terms = [t for t, _df in engine.suggest("s", k=128)]
    scores: dict = {}
    for t in dict.fromkeys(terms):
        pl = oracle.postings.get(t, {})
        if not pl:
            continue
        idf = math.log(
            (oracle.n_docs - len(pl) + 0.5) / (len(pl) + 0.5) + 1
        )
        for d, tf in pl.items():
            dl = oracle.doc_len[d]
            scores[d] = scores.get(d, 0.0) + idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * dl / oracle.avgdl)
            )
    exp = sorted(scores.items(), key=lambda r: (-r[1], r[0]))[:10]
    got = engine.search_local("s*", k=10)
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in exp
    ]


def test_wildcard_distributed_matches_local(engine):
    """Wildcard expansion is identical across serving paths: the wand
    and exhaustive DataFrame paths rank exactly like search_local."""
    exp = [
        (d, round(s, 6)) for d, s in engine.search_local("s*", k=8)
    ]
    for path in ("wand", "exhaustive"):
        got = [
            (r["docid"], round(r["score"], 6))
            for r in engine.search_ids("s*", k=8, path=path)
            .orderBy("score", ascending=False)
            .collect()
        ]
        got.sort(key=lambda r: (-r[1], r[0]))
        assert got == exp, path


def test_wildcard_leading_and_infix(engine, spark):
    """Leading/infix wildcards: the reversed-lexicon sidecar turns
    ``*ing`` into a term_rev prefix range; matches equal a full-lexicon
    regex scan ranked by (df desc, term asc), capped at 128. Without
    the sidecar, suffix-anchored patterns fail with the revindex
    remedy; prefix-anchored patterns never need it."""
    import os
    import re
    import shutil

    from pyspark.sql import functions as F

    rev_dir = f"{engine.index_dir}/lexicon_rev"
    shutil.rmtree(rev_dir, ignore_errors=True)
    engine._datasets.pop("lexicon_rev", None)
    with pytest.raises(FileNotFoundError, match="revindex"):
        engine.expand_wildcard("*ing")
    # trailing patterns keep working without the sidecar
    assert engine.expand_wildcard("s*")

    engine.build_lexicon_rev()
    assert os.path.isdir(rev_dir)
    lex = [
        (r["term"], int(r["df"]))
        for r in spark.read.parquet(
            f"{engine.index_dir}/term_stats"
        ).collect()
    ]
    for pattern in ("*ing", "*e", "s*e", "b*k"):
        rx = re.compile(
            "^" + ".*".join(map(re.escape, pattern.split("*"))) + "$"
        )
        exp = sorted(
            ((t, df) for t, df in lex if rx.match(t)),
            key=lambda td: (-td[1], td[0]),
        )[:128]
        assert engine.expand_wildcard(pattern) == exp, pattern
    # no range anchor ('*', '**', '*a*') -> the token is skipped at
    # query level (expanding would be a full lexicon scan), never an
    # error; bare-star and unanchored-infix behave alike
    from wiki_search_engine_spark.engine import EmptyQueryError

    with pytest.raises(EmptyQueryError):
        engine.expand_wildcard("*a*")
    assert engine.expand_query_terms("** plain") == engine.analyze(
        "plain"
    )
    assert engine.expand_query_terms("*a* plain") == engine.analyze(
        "plain"
    )


def test_wildcard_leading_search_paths_agree(engine):
    """search_local('*ing') == the distributed wand/exhaustive paths:
    expansion happens once, driver-side, identically for all three."""
    engine.build_lexicon_rev()
    exp = [
        (d, round(s, 6)) for d, s in engine.search_local("*ing", k=8)
    ]
    assert exp, "synthetic vocabulary should have -ing terms"
    for path in ("wand", "exhaustive"):
        got = [
            (r["docid"], round(r["score"], 6))
            for r in engine.search_ids("*ing", k=8, path=path).collect()
        ]
        got.sort(key=lambda r: (-r[1], r[0]))
        assert got == exp, path


def test_lexicon_rev_staleness_detected(engine):
    """A lexicon_rev left behind after term_stats changed must FAIL
    LOUDLY at leading-wildcard time, not silently expand against the
    old vocabulary (ADVICE r4): the sidecar carries a fingerprint of
    the term_stats files, checked once per engine instance."""
    import glob
    import os

    engine.build_lexicon_rev()
    engine._lexrev_stamp_ok = None
    assert engine.expand_wildcard("*ing")  # fresh: serves fine
    # simulate an in-place lexicon rewrite: bump a term_stats mtime
    part = sorted(
        glob.glob(f"{engine.index_dir}/term_stats/**/*.parquet",
                  recursive=True)
    )[0]
    st = os.stat(part)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    engine._lexrev_stamp_ok = None
    with pytest.raises(FileNotFoundError, match="STALE"):
        engine.expand_wildcard("*ing")
    # rebuild restamps and serving resumes
    engine.build_lexicon_rev()
    assert engine.expand_wildcard("*ing")
