"""wiki_search_engine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference `tomal-majumder/Wiki_Search_Engine` (batch IR pipeline:
crawl -> extract -> tokenize/stem -> inverted index -> BM25/TF-IDF top-k),
re-expressed Spark-first:

- corpus is a columnar table ``(url, warc_ts, html, text, lang)``;
- tokenization / extraction run as Arrow-vectorized pandas UDFs
  (``mapInPandas``) — never per-row Python UDFs;
- the inverted index is a parquet postings table, bucketed by term, with
  docid-sorted delta+varbyte-compressed blocks carrying per-block
  ``(first_docid, max_score)`` metadata for block-max WAND pruning;
- document statistics (doc_len, N, avgdl) are small broadcast side tables;
- scoring replicates the reference formulas exactly
  (reference: backend/services/mongoService.js:8-58):
  BM25 k1=1.5 b=0.75, idf=ln((N-df+0.5)/(df+0.5)+1);
  TF-IDF idf=ln(N/df); OR semantics; duplicate query terms deduped;
  df = posting-list length at query time.
"""

__version__ = "0.1.0"

K1 = 1.5          # reference: backend/services/mongoService.js:9
B = 0.75          # reference: backend/services/mongoService.js:10
DEFAULT_TOP_K = 50  # reference: backend/services/mongoService.js:64
