"""Reference-semantics oracle (pure Python, single process).

Scoring formulas transcribed from backend/services/mongoService.js:8-58:

- constants: k1=1.5, b=0.75 (lines 9-10), topK default 50 (line 64);
- per query term, ``df = len(posting_list)`` recomputed at query time
  (line 32), NOT a stored column (SURVEY §8.Q7);
- BM25 (lines 34-41): idf = ln((N - df + 0.5)/(df + 0.5) + 1);
  score += idf * tf*(k1+1) / (tf + k1*(1 - b + b*doc_len/avgdl));
- TF-IDF (lines 42-48): idf = ln(N/df); score += tf * idf;
- OR semantics across terms; duplicate query terms deduped (lines 18-30);
- N = number of docs that appear in the index (metaDataInsert.py:17-23,
  SURVEY §8.Q8); avgdl = total_length / N (metaDataInsert.py:26-48);
- ties broken by ascending docid (our deterministic definition of the
  reference's unspecified JS-insertion-order ties, SURVEY §8.Q5).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from ..functions.analyzer import analyze_query, tokens_for

K1 = 1.5
B = 0.75


def bm25_idf(n: int, df: int) -> float:
    return math.log((n - df + 0.5) / (df + 0.5) + 1.0)


def tfidf_idf(n: int, df: int) -> float:
    return math.log(n / df)


class IndexOracle:
    """In-memory inverted index + scorer with reference semantics."""

    def __init__(self, stem: bool = True, analyzer: str | None = None):
        self.stem = stem
        self.analyzer = analyzer or ("porter" if stem else "base")
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}

    def _analyze(self, text: str) -> list[str]:
        return tokens_for(text, self.analyzer)

    def add_document(self, docid: int, text: str) -> None:
        toks = self._analyze(text)
        if not toks:
            return  # docs with zero indexed terms are excluded from N (Q8)
        self.doc_len[docid] = len(toks)
        for term, tf in Counter(toks).items():
            self.postings[term][docid] = tf

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_len.values()) / self.n_docs

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def search(self, query: str, k: int = 50, mode: str = "bm25"):
        """Top-k [(docid, score)] — score desc, docid asc on ties.
        Queries analyze with the ORACLE'S OWN analyzer (the same
        index/query symmetry the engine enforces, SURVEY §8.Q4): a
        'ner' oracle must expand capitalized query phrases exactly like
        the 'ner' index side did."""
        terms = analyze_query(query, stem=self.stem, analyzer=self.analyzer)
        n, avgdl = self.n_docs, self.avgdl
        scores: dict[int, float] = defaultdict(float)
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue  # OR semantics: missing terms contribute 0
            df = len(plist)
            if mode == "bm25":
                idf = bm25_idf(n, df)
                for docid, tf in plist.items():
                    dl = self.doc_len[docid]
                    scores[docid] += (
                        idf * tf * (K1 + 1.0)
                        / (tf + K1 * (1.0 - B + B * dl / avgdl))
                    )
            else:  # tfidf — serving formula, not the stored column (Q3)
                idf = tfidf_idf(n, df)
                for docid, tf in plist.items():
                    scores[docid] += tf * idf
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def index_rows(self):
        """The reference index relation (term, docid, tf, df, doc_len,
        tfidf) with tfidf = tf * N/df — the STORED column's no-log formula
        (Indexer/inverted_index.py:116, SURVEY §8.Q3)."""
        n = self.n_docs
        for term, plist in sorted(self.postings.items()):
            df = len(plist)
            for docid, tf in sorted(plist.items()):
                yield term, docid, tf, df, self.doc_len[docid], tf * n / df
