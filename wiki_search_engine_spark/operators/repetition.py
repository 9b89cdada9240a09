"""Gopher-style repetition quality metrics: per-document top n-gram
fraction (Rae et al. 2021, table A1 — "fraction of characters in the
most common n-gram"; token-fraction form here since the synthetic
corpus is single-line text). Documents whose most common 2-/3-gram
dominates the text are boilerplate/spam and get dropped before
training.

Scale shape: the metric is per-doc, so the whole operator is MAP-ONLY —
a vectorized pandas kernel over Arrow batches (the same in-batch
aggregation rule as the tokenize kernel, SURVEY §2.3 A1: never shuffle
what a batch can collapse). An explode -> groupBy(doc, gram) ->
groupBy(doc) max formulation would shuffle |distinct (doc, gram)| rows
for a value every batch already holds; at 100 TB this version shuffles
NOTHING and composes with any downstream filter in one corpus pass.
Inside the kernel the token stream is flattened once per batch and
n-gram multiplicities come from C-level pandas groupbys — per-row
Python never touches the token dimension.

Duplicate-count semantics: n-grams are counted over the lowercased
whitespace token stream; a doc shorter than n tokens scores 0 (no
gram repeats), not NULL — the filter keeps it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

REPETITION_SCHEMA = (
    "doc_id long, n_tokens int, top2_count int, top3_count int, "
    "top2_frac double, top3_frac double, flagged boolean"
)

# Gopher A1 rejection thresholds (token-fraction analogue)
TOP2_THRESHOLD = 0.20
TOP3_THRESHOLD = 0.18


def _top_counts_per_doc(flat_doc, codes, n: int):
    """Max n-gram multiplicity per doc from the flattened (doc, token
    code) stream: one C-level groupby over adjacent code columns.
    Returns a pandas Series indexed by doc id (docs shorter than n
    absent)."""
    import numpy as np
    import pandas as pd

    if flat_doc.size < n:
        return pd.Series(dtype="int64")
    cols = {"d": flat_doc[: flat_doc.size - n + 1]}
    ok = np.ones(flat_doc.size - n + 1, dtype=bool)
    for j in range(n):
        sl = codes[j: codes.size - (n - 1 - j)]
        cols[f"c{j}"] = sl
        if j:
            # gram must not straddle a doc boundary
            ok &= flat_doc[j: flat_doc.size - (n - 1 - j)] == cols["d"]
    df = pd.DataFrame(cols)[ok]
    if not len(df):
        return pd.Series(dtype="int64")
    cnt = df.groupby(list(cols), sort=False).size()
    return cnt.groupby(level=0, sort=False).max()


def repetition_metrics(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, top2_count, top3_count, top2_frac, top3_frac,
    flagged) — one row per input doc.

    frac = count * n / n_tokens: the fraction of the token stream
    covered by a maximally-packed tiling of the most repeated n-gram —
    the deterministic token analogue of Gopher's character fraction.
    flagged = (top2_count >= 2 AND top2_frac > 0.20) OR (top3_count >= 2
    AND top3_frac > 0.18): a gram must actually REPEAT to count —
    without the floor every short doc's unique trigram (3/n_tokens)
    clears the 0.18 bar."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            ids = pdf[doc_id_col].to_numpy(dtype=np.int64)
            texts = pdf[text_col].fillna("")
            token_lists = texts.str.lower().str.split()
            lens = token_lists.str.len().fillna(0).astype(np.int64)
            out = pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_tokens": lens.to_numpy().astype("int32"),
                }
            )
            if lens.sum():
                flat_doc = np.repeat(ids, lens.to_numpy())
                flat_tok = pd.Series(
                    np.concatenate(
                        [t for t in token_lists if t]
                    ),
                    dtype="object",
                )
                codes, _ = pd.factorize(flat_tok, sort=False)
                for n in (2, 3):
                    top = _top_counts_per_doc(flat_doc, codes, n)
                    out[f"top{n}_count"] = (
                        out["doc_id"]
                        .map(top)
                        .fillna(0)
                        .astype("int32")
                    )
            else:
                out["top2_count"] = np.int32(0)
                out["top3_count"] = np.int32(0)
            nt = out["n_tokens"].where(out["n_tokens"] > 0, 1)
            out["top2_frac"] = out["top2_count"] * 2.0 / nt
            out["top3_frac"] = out["top3_count"] * 3.0 / nt
            out["flagged"] = (
                (out["top2_count"] >= 2)
                & (out["top2_frac"] > TOP2_THRESHOLD)
            ) | (
                (out["top3_count"] >= 2)
                & (out["top3_frac"] > TOP3_THRESHOLD)
            )
            yield out

    return docs.select(doc_id_col, text_col).mapInPandas(
        fn, schema=REPETITION_SCHEMA
    )
