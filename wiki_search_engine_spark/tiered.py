"""Tiered (segment) serving: query base + delta indexes as ONE index.

The incremental merge (plans/merge.py) produces a single exact index,
but it WRITES a complete new index every fold — pass-through avoids
re-encoding untouched posting groups, yet the IO is still index-sized.
At 10^12 docs that is petabytes per crawl batch. The standard web-scale
answer (Lucene segments, every LSM store) is to serve the segments
directly and compact offline:

- each crawl batch stays its own index (a segment), built by the normal
  ``plans/build.py`` pipeline — batch-sized IO, nothing rewritten;
- a later segment OVERRIDES earlier ones per docid (docid = stable url
  hash, so "same url re-crawled" == "same docid"): earlier segments get
  a TOMBSTONE set = the sorted docid arrays of later segments (only
  crawl batches are ever loaded — the base's docid set is never read);
- queries run against all segments; stale base postings are dropped at
  decode time by a vectorized searchsorted against the tombstones.

EXACTNESS — this is not the usual "df is slightly stale until
compaction" segment engine: scores are IDENTICAL to the compacted
(merged) index, pytest-enforced and DuckDB-oracle-checked:

- N / avgdl: segment stats combine, minus the overridden docs' counts
  and lengths (a pruned point lookup of the later segments' docids in
  earlier ``doc_stats``, which is docid-sorted for this);
- df per query term: counted from the LIVE postings — the candidate
  lists are decoded anyway to score, so tombstoned postings are both
  excluded from scoring and subtracted from df before idf is computed
  (two passes over arrays already in memory, not extra IO).

Serving path: driver-side (pyarrow bucket reads via each segment's
hot-term cache, NumPy scoring) — the search-head mode. Scoring is
exhaustive over the query's candidate lists (the reference's own
semantics); the block-max pruned path applies per segment once a
compaction makes it the base. Compaction IS ``plans/merge.py``: fold
segments when their count or tombstone ratio grows, restoring the
single-index fast paths.

Reference contract: identical results to merging the crawl batch into
the index (crawler re-crawl overwrite, Crawler/crawler.py:401-406) —
verified against the merged index and against DuckDB scoring over the
live corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from . import B, K1
from .engine import SearchEngine
from .oracle_py.oracle import bm25_idf, tfidf_idf

_COMPAT_KEYS = ("stem", "analyzer", "n_buckets", "salt_bits")


class TieredEngine:
    def __init__(
        self,
        spark: SparkSession,
        index_dirs: list[str],
        cache_terms: int = 0,
    ):
        """``index_dirs`` oldest-first: [base, batch1, batch2, ...].
        Later segments override earlier ones per docid."""
        import pyarrow.parquet as pq

        if not index_dirs:
            raise ValueError("need at least one index dir")
        self.spark = spark
        self.engines = [
            SearchEngine(spark, d, cache_terms=cache_terms)
            for d in index_dirs
        ]
        head = self.engines[0]
        for eng in self.engines[1:]:
            diffs = [
                k for k in _COMPAT_KEYS
                if getattr(eng, k) != getattr(head, k)
            ]
            if diffs:
                raise ValueError(
                    f"segment {eng.index_dir} config differs from "
                    f"{head.index_dir} on {diffs}"
                )

        # docid arrays of every NON-base segment (crawl batches — small
        # by construction; the base's docids are never loaded)
        seg_docids: dict[int, np.ndarray] = {}
        for i, d in enumerate(index_dirs):
            if i == 0:
                continue
            seg_docids[i] = np.sort(
                pq.read_table(f"{d}/docs", columns=["docid"])
                .column("docid")
                .to_numpy()
            )
        # tombstones[i] = sorted union of docids of segments AFTER i
        self.tombstones: list[np.ndarray] = []
        for i in range(len(index_dirs)):
            later = [seg_docids[j] for j in seg_docids if j > i]
            self.tombstones.append(
                np.unique(np.concatenate(later))
                if later
                else np.empty(0, dtype=np.int64)
            )

        # live corpus stats: combined minus overridden docs (pruned
        # point lookup — doc_stats is docid-sorted within files)
        n_live, total_live = 0, 0
        for i, eng in enumerate(self.engines):
            n_live += eng.n
            total_live += eng.total_length
            tombs = self.tombstones[i]
            if tombs.size:
                tbl = pq.read_table(
                    f"{eng.index_dir}/doc_stats",
                    columns=["docid", "doc_len"],
                    filters=[("docid", "in", tombs.tolist())],
                )
                n_live -= len(tbl)
                total_live -= int(
                    tbl.column("doc_len").to_numpy().sum()
                ) if len(tbl) else 0
        self.n = n_live
        self.avgdl = total_live / n_live if n_live else 0.0
        self.total_length = total_live

    def analyze(self, query: str) -> list[str]:
        return self.engines[0].analyze(query)

    def _live_term_postings(self, term: str):
        """Decoded LIVE postings of ``term`` across segments:
        [(docids, tfs, doclens)], tombstoned entries removed. Live df ==
        total rows (one posting per doc; segments are docid-disjoint
        after tombstoning)."""
        from .operators.codec import decode_posting_list

        parts = []
        df = 0
        for i, eng in enumerate(self.engines):
            dfi, salted = eng._cached_term_lists([term])[term]
            if dfi <= 0:
                continue
            tombs = self.tombstones[i]
            for _salt, blocks in salted:
                d, tf, dl = decode_posting_list(
                    [
                        b if isinstance(b, dict) else b.asDict()
                        for b in blocks
                    ]
                )
                if tombs.size and d.size:
                    pos = np.searchsorted(tombs, d)
                    hit = (pos < tombs.size) & (
                        tombs[np.minimum(pos, tombs.size - 1)] == d
                    )
                    keep = ~hit
                    d, tf, dl = d[keep], tf[keep], dl[keep]
                if d.size:
                    parts.append((d, tf, dl))
                    df += int(d.size)
        return df, parts

    def search_local(
        self, query: str, k: int = 50, mode: str = "bm25"
    ) -> list[tuple[int, float]]:
        """Driver-side tiered top-k, rank- and score-identical to the
        compacted index (exact live df/N/avgdl — see module doc)."""
        terms = self.analyze(query)
        if not terms or not self.n:
            return []
        all_d, all_s = [], []
        for t in dict.fromkeys(terms):
            df, parts = self._live_term_postings(t)
            if not df:
                continue
            idf = (
                bm25_idf(self.n, df)
                if mode == "bm25"
                else tfidf_idf(self.n, df)
            )
            for d, tf, dl in parts:
                tfd = tf.astype(np.float64)
                if mode == "bm25":
                    s = idf * tfd * (K1 + 1.0) / (
                        tfd
                        + K1
                        * (1.0 - B + B * dl.astype(np.float64) / self.avgdl)
                    )
                else:
                    s = tfd * idf
                all_d.append(d)
                all_s.append(s)
        if not all_d:
            return []
        d = np.concatenate(all_d)
        s = np.concatenate(all_s)
        uniq, inv = np.unique(d, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, s)
        idx = np.lexsort((uniq, -acc))[: min(k, uniq.size)]
        return [(int(uniq[i]), float(acc[i])) for i in idx]

    def lookup_docs(
        self, docids: list[int], with_images: bool = True
    ) -> list[dict]:
        """Point-lookup hydration across segments — later segments win
        per docid (same pruned pyarrow reads as SearchEngine)."""
        out: dict[int, dict] = {}
        for eng in self.engines:  # oldest first; later overwrites
            for row in eng.lookup_docs(docids, with_images=with_images):
                out[row["docid"]] = row
        return [out[d] for d in docids if d in out]
