"""PageRank over the corpus link graph (operators/linkgraph.py):
kernel vs a pure-Python power iteration on the REAL extracted link
table, mass conservation, dangling handling, docid resolution."""

import pytest
from pyspark.sql import functions as F


def _py_pagerank(edges, n_iter=10, d=0.85):
    """Independent reference: dict-based power iteration with dangling
    redistribution, same semantics (duplicate edges pass mass twice)."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r[v] for v in nodes if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += r[s] / out[s]
        r = {
            v: (1.0 - d) / n + d * (contrib[v] + dangling / n)
            for v in nodes
        }
    return r


def test_pagerank_matches_python_on_real_links(spark):
    """End-to-end: html -> extract_links (reference filter chain) ->
    resolve to corpus docids -> pagerank; vs the Python oracle."""
    import random

    from wiki_search_engine_spark.operators.linkgraph import (
        pagerank, resolve_link_docids,
    )
    from wiki_search_engine_spark.operators.tokenize import link_table

    rng = random.Random(3)
    n = 40
    urls = [
        f"https://en.wikipedia.org/wiki/Page_{i}" for i in range(n)
    ]
    rows = []
    for i in range(n):
        targets = rng.sample(range(n), k=rng.randint(1, 4))
        anchors = "".join(
            f'<a href="/wiki/Page_{t}">t{t}</a> ' for t in targets
        )
        # a frontier link and an edit decoy that must be filtered out
        html = (
            "<html><body><div id='mw-content-text'>"
            f"<p>body {i} {anchors}"
            '<a href="https://other.example.com/x">off</a>'
            '<a href="/w/index.php?action=edit">e</a>'
            "</p></div></body></html>"
        )
        rows.append((urls[i], html.encode(), f"body {i}"))
    corpus = spark.createDataFrame(
        rows, "url string, html binary, text string"
    )
    links = link_table(corpus)
    edges_df = resolve_link_docids(
        links, corpus.select("url")
    ).persist()
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    assert edges, "synthetic corpus should have intra-corpus links"
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges_df, n_iter=8).collect()
    }
    exp = _py_pagerank(edges, n_iter=8)
    assert set(got) == set(exp)
    for v, rv in exp.items():
        assert got[v] == pytest.approx(rv, rel=1e-9), v
    # ranks are a probability distribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    edges_df.unpersist()


def test_pagerank_dangling_and_sinks(spark):
    """A sink (no out-links) must redistribute its mass, not absorb
    it: ranks still sum to 1 and the heavily-linked sink outranks its
    sources."""
    from wiki_search_engine_spark.operators.linkgraph import pagerank

    # 1..4 all point at 5; 5 points nowhere (dangling)
    edges = [(i, 5) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"] for r in pagerank(df, n_iter=12).collect()
    }
    exp = _py_pagerank(edges, n_iter=12)
    for v, rv in exp.items():
        assert got[v] == pytest.approx(rv, rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[5] > max(got[i] for i in range(1, 5))


def test_resolve_link_docids_drops_frontier(spark):
    """Links to urls OUTSIDE the corpus (crawl frontier) are dropped;
    docids derive exactly like the index's (xxhash64 >> 1)."""
    from wiki_search_engine_spark.operators.linkgraph import (
        resolve_link_docids,
    )

    links = spark.createDataFrame(
        [
            ("https://a/x", "https://a/y"),
            ("https://a/x", "https://elsewhere/z"),
        ],
        "src_url string, dst_url string",
    )
    known = spark.createDataFrame(
        [("https://a/x",), ("https://a/y",)], "url string"
    )
    rows = resolve_link_docids(links, known).collect()
    assert len(rows) == 1
    exp = spark.createDataFrame(
        [("https://a/x",), ("https://a/y",)], "url string"
    ).withColumn(
        "d", F.shiftrightunsigned(F.xxhash64("url"), 1)
    ).collect()
    by_url = {r["url"]: r["d"] for r in exp}
    assert rows[0]["src"] == by_url["https://a/x"]
    assert rows[0]["dst"] == by_url["https://a/y"]
