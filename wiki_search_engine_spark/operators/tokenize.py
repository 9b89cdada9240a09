"""Corpus -> term-frequency rows, Arrow-vectorized (mapInPandas).

Replaces the reference's per-row Python UDF + explode + groupBy chain
(reference: Indexer/inverted_index.py:77-82 tokenizer UDF; :105 explode;
:109-110 tf and doc_len groupBys) with ONE mapInPandas pass that emits
already-aggregated ``(docid, term, tf, doc_len)`` rows:

- tf is a per-document quantity, so it needs NO shuffle at all — each
  input partition tokenizes its documents and counts terms in-batch
  (SURVEY §2.3 A1/A2: "emit (docid, term, tf) directly from tokenizer");
- doc_len (total token count per doc) rides along on every row, matching
  the reference's posting payload (insertIndex.py:62-68) and saving the
  doc-stats join at scoring time (SURVEY §7 "doc_len in postings").

At 100 TB this is the scan stage: it streams Arrow batches, never
materializes the exploded token stream, and its output is ~|distinct
(doc,term)| rows instead of |tokens| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import tokenize_frame

TOKENS_SCHEMA = "docid long, term string, tf int, doc_len int"


def _tokenize_batches(stem: bool, analyzer: str | None = None):
    def fn(batches):
        for pdf in batches:
            # zero-term docs drop out here -> excluded from index and N (Q8)
            yield tokenize_frame(pdf["docid"], pdf["text"], stem, analyzer)

    return fn


def tokenize(
    corpus: DataFrame, stem: bool = True, analyzer: str | None = None
) -> DataFrame:
    """(docid, text) -> (docid, term, tf, doc_len). Shuffle-free."""
    return corpus.select("docid", "text").mapInPandas(
        _tokenize_batches(stem, analyzer), schema=TOKENS_SCHEMA
    )


def with_docid(corpus: DataFrame, id_col: str = "url") -> DataFrame:
    """Stable non-negative 63-bit docid from the external key.

    The reference's docid is md5(url) (Crawler/crawler.py:324,
    insertIndex.py:63); we use xxhash64 >> 1 (non-negative so varbyte
    deltas on the signed-sorted order are valid) — same role, cheaper,
    JVM-side. A corpus that already carries a ``docid`` column is
    trusted as pre-keyed (external doc ids) and passes through; the
    non-negativity contract on that path is enforced at build time by
    the tokenize kernel (functions/analyzer.py tokenize_frame raises on
    the first negative docid it sees)."""
    if "docid" in corpus.columns:
        return corpus
    return corpus.withColumn(
        "docid", F.shiftrightunsigned(F.xxhash64(F.col(id_col)), 1)
    )


def link_table(
    corpus: DataFrame,
    allow_domains: tuple = ("en.wikipedia.org",),
) -> DataFrame:
    """(src_url, dst_url) edge list from the corpus html — the batch form
    of the reference crawler's link frontier (Crawler/crawler.py:227-269,
    SURVEY P13). Arrow-batched pandas UDF + explode; downstream this is
    the input for link-graph work (pagerank-ish signals, dedup by URL)."""
    import pandas as pd

    from ..functions.extraction import extract_links

    # no annotations: 'pd.Series' hints can't resolve with pandas imported
    # function-locally, and partial hints break eval-type inference
    @F.pandas_udf("array<string>")
    def _links(html, url):
        return pd.Series(
            [
                extract_links(
                    bytes(h).decode("utf-8", "replace") if h is not None
                    else "",
                    base_url=u or "",
                    allow_domains=allow_domains,
                )
                for h, u in zip(html, url)
            ]
        )

    return (
        corpus.select(
            F.col("url").alias("src_url"),
            F.explode(_links(F.col("html"), F.col("url"))).alias("dst_url"),
        )
    )
