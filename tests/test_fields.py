"""Lucene field-scoped queries (title:term, +title:term, -title:term):
parser, local == distributed parity, tiered parity under tombstones,
legacy bag behavior without the flag, invalid combos."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from wiki_search_engine_spark.functions.analyzer import split_field_terms


def test_split_field_terms():
    assert split_field_terms("a title:b c") == ("a c", ["b"])
    assert split_field_terms("title:x title:y") == ("", ["x", "y"])
    assert split_field_terms("Title:Mixed case") == ("case", ["Mixed"])
    assert split_field_terms("title:") == ("title:", [])  # no payload
    assert split_field_terms("") == ("", [])


@pytest.fixture(scope="module")
def field_engine(spark, tmp_path_factory):
    from wiki_search_engine_spark.engine import SearchEngine

    rows = []
    for i in range(30):
        slug = "Alpha_Topic" if i % 6 == 0 else f"Filler_Page{i}"
        body = (
            "alpha discussion point number one"
            if i % 6 == 3
            else "general discussion point number one"
        )
        rows.append(
            {
                "url": f"https://example.org/wiki/{slug}{i}",
                "warc_ts": datetime.datetime(2024, 1, 1, 0, 0, i),
                "html": b"",
                "text": f"{body} shared tail words",
                "lang": "en",
            }
        )
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    return SearchEngine.build(
        spark, df, str(tmp_path_factory.mktemp("field_idx")),
        stem=True, n_buckets=8, bucket_groups=1, salt_bits=2,
    )


def test_field_semantics_local(field_engine):
    eng = field_engine
    # pure title clause matches exactly the Alpha_Topic-titled docs
    r = eng.search_local("title:alpha", k=30, negation=True)
    urls = {x["url"] for x in eng.lookup_docs([d for d, _ in r])}
    assert len(r) == 5 and all("Alpha_Topic" in u for u in urls)
    # +title: gates, -title: excludes; bag terms still score
    gate = eng.search_local(
        "discussion +title:alpha", k=30, negation=True
    )
    assert {d for d, _ in gate} == {d for d, _ in r}
    neg = eng.search_local(
        "discussion -title:alpha", k=30, negation=True
    )
    assert not ({d for d, _ in neg} & {d for d, _ in r})
    assert len(neg) == 30 - 5
    # field overlap rule: title:t -title:t drops SHOULD, keeps NOT
    assert eng.search_local(
        "discussion title:alpha -title:alpha", k=30, negation=True
    ) == neg
    # +title:t -title:t is a contradiction
    assert (
        eng.search_local(
            "discussion +title:alpha -title:alpha", k=30,
            negation=True,
        )
        == []
    )


def test_field_distributed_parity(field_engine):
    eng = field_engine
    for q in (
        "title:alpha",
        "discussion title:alpha",
        "discussion +title:alpha",
        "discussion -title:alpha",
        "title:filler -general",
    ):
        loc = eng.search_local(q, k=30, negation=True)
        for path in ("exhaustive", "wand"):
            dist = [
                (int(r["docid"]), float(r["score"]))
                for r in eng.search_ids(
                    q, k=30, path=path, negation=True
                ).collect()
            ]
            assert [d for d, _ in dist] == [d for d, _ in loc], (q, path)
            for (_, a), (_, b) in zip(loc, dist):
                assert math.isclose(a, b, rel_tol=1e-9), (q, path)


def test_field_legacy_without_flag(field_engine):
    """No negation flag -> reference bag reading ('title:alpha' ==
    'title alpha')."""
    eng = field_engine
    legacy = eng.search_local("title:alpha", k=30)
    bag = eng.search_local("title alpha", k=30)
    assert legacy == bag


def test_field_invalid_combos(field_engine):
    eng = field_engine
    with pytest.raises(ValueError, match="field-scoped"):
        eng.search_local(
            "a title:b", k=5, negation=True, semantics="and"
        )
    with pytest.raises(ValueError, match="wildcards"):
        eng.search_local("title:al*", k=5, negation=True)
    with pytest.raises(ValueError, match="field-scoped"):
        eng.search_local(
            "a title:b", k=5, negation=True, mode="bm25f"
        )


def test_field_tiered_matches_compacted(
    spark, field_engine, tmp_path
):
    """Tiered field queries (local AND distributed) over
    [base, delta, deletes] equal the delete-rebuilt compacted index —
    title rows of tombstoned docs never match."""
    from wiki_search_engine_spark.engine import SearchEngine
    from wiki_search_engine_spark.tiered import (
        TieredEngine, write_deletes_segment,
    )

    delta_rows = [
        {
            "url": f"https://example.org/wiki/Alpha_Late{i}",
            "warc_ts": datetime.datetime(2024, 4, 1, 0, 0, i),
            "html": b"",
            "text": "late discussion content words here",
            "lang": "en",
        }
        for i in range(4)
    ]
    ddf = spark.createDataFrame(
        delta_rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    delta = SearchEngine.build(
        spark, ddf, str(tmp_path / "fd_delta"), stem=True,
        n_buckets=8, bucket_groups=1, salt_bits=2,
    )
    victims = [
        r["docid"]
        for r in spark.createDataFrame(
            [(delta_rows[0]["url"],)], "url string"
        )
        .withColumn(
            "docid", F.shiftrightunsigned(F.xxhash64("url"), 1)
        )
        .collect()
    ]
    del_seg = write_deletes_segment(
        str(tmp_path / "fd_del"), docids=victims
    )
    tiered = TieredEngine(
        spark, [field_engine.index_dir, delta.index_dir, del_seg]
    )
    merged = SearchEngine.merge(
        spark, field_engine.index_dir, delta.index_dir,
        str(tmp_path / "fd_merged"),
    )
    expected = SearchEngine.delete(
        spark, merged.index_dir, str(tmp_path / "fd_exp"),
        docids=victims,
    )
    for q in (
        "title:alpha",
        "discussion +title:alpha",
        "discussion -title:alpha",
        "content title:late",
    ):
        got = tiered.search_local(q, k=30, negation=True)
        exp = expected.search_local(q, k=30, negation=True)
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, a), (_, b) in zip(got, exp):
            assert math.isclose(a, b, rel_tol=1e-9), q
        dist = [
            (int(r["docid"]), float(r["score"]))
            for r in tiered.search_ids(
                q, k=30, negation=True
            ).collect()
        ]
        assert [d for d, _ in dist] == [d for d, _ in exp], q
