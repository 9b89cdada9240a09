"""Pure-Python single-process oracle — the correctness contract.

Implements the reference's semantics exactly (no Spark, no NumPy tricks):
index build (Indexer/inverted_index.py:100-117 + insertIndex.py grouping)
and query scoring (backend/services/mongoService.js:8-58). Pytest compares
the Spark engine against this oracle for rank-identity.
"""

from .oracle import IndexOracle, bm25_idf, tfidf_idf  # noqa: F401
