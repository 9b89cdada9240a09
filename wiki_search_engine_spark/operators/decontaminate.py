"""Benchmark decontamination: flag training documents that contain any
n-gram of an evaluation set — the standard pre-training hygiene pass
(GPT-3 appendix C / Gopher section A.3 style: 13-gram overlap).

Spark-first shape:

- the EVAL side is small by construction (an eval suite is thousands of
  questions, not terabytes): its distinct n-grams become a broadcast
  hash relation. The CORPUS side explodes each doc into its n-grams
  inside whole-stage codegen (split/transform/slice/array_join — no
  Python), and the overlap test is a map-side BroadcastHashJoin +
  partial-aggregated count per doc. NO shuffle of corpus text, no
  all-pairs comparison; the only wide op is the final per-doc count
  combine, whose input is already collapsed to (doc_id, gram-hit) rows.
- grams join on their STRING form so the DuckDB oracle replays the
  operator exactly (the same md5-vs-xxhash64 trade as
  operators/dedup.py: a production run at 100 TB would join on
  xxhash64(gram) to keep the broadcast table and the exploded rows
  8 bytes wide; the string form is the oracle-exact default and the
  hash form cannot produce false NEGATIVES, only ~2^-64 false hits).

The reference engine has no decontamination stage (it indexes
everything it crawls); this operator is part of the LLM-training-data
family the engine serves at corpus scale alongside dedup/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ws_token_array(col):
    """Whitespace tokens, lowercased, empties dropped — the exact
    list_filter(string_split_regex(lower(x),'\\s+')) the oracle uses."""
    return F.filter(
        F.split(F.lower(col), r"\s+"), lambda x: x != F.lit("")
    )


def ngrams_col(toks, n: int):
    """array<string> of space-joined n-grams of a token array (empty
    when the doc is shorter than n).

    Formulated as arrays_zip over n shifted slices — the same shape as
    functions/textstats.py shingles — NOT slice(toks, i+1, n) inside a
    transform lambda: HOF lambdas are interpreted, and a lambda body
    that references the CAPTURED computed expression ``toks``
    re-evaluates the whole tokenizing split per element, O(tokens^2)
    per document (29x slower at 2k-token docs). Here the lambda touches
    only its own struct argument; ``toks`` is evaluated O(n) times per
    ROW (once per shifted slice)."""
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, j + 1, m).alias(f"t{j}") for j in range(n)]
    )
    return F.transform(
        zipped,
        lambda s: F.concat_ws(" ", *[s[f"t{j}"] for j in range(n)]),
    )


def eval_ngrams(
    eval_df: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """Distinct n-grams of the eval suite: (gram). Small side —
    broadcast by the caller (contaminated_docs does)."""
    toks = ws_token_array(F.col(text_col))
    return (
        eval_df.select(F.explode(ngrams_col(toks, n)).alias("gram"))
        .distinct()
    )


def contaminated_docs(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    join_on: str = "gram",
) -> DataFrame:
    """(doc_id, n_hits) for every training doc that shares at least one
    n-gram with the eval set; n_hits = DISTINCT overlapping grams.

    Plan: corpus scan -> codegen gram explode -> BroadcastHashJoin
    against the distinct eval grams -> partial + final count per doc.
    Docs with zero overlap never leave the map side.

    ``join_on``: 'gram' (default) joins on the gram STRING — the
    DuckDB-oracle-exact mode; 'xxhash64' joins on the 8-byte JVM
    xxhash64 of the gram — the production mode at 100 TB (the exploded
    rows and the broadcast table shrink from ~13-token strings to one
    long each; same md5-vs-xxhash64 trade as operators/dedup.py). Hash
    collisions can only ADD candidates (~2^-64 each), never lose one —
    the candidate-superset pytest gates it."""
    if join_on not in ("gram", "xxhash64"):
        raise ValueError(f"unknown join_on: {join_on}")
    toks = ws_token_array(F.col(text_col))
    doc_grams = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(ngrams_col(toks, n)).alias("gram"),
    )
    ev = eval_ngrams(eval_df, n=n, text_col=text_col)
    if join_on == "xxhash64":
        doc_grams = doc_grams.select(
            "doc_id", F.xxhash64("gram").alias("g")
        )
        ev = ev.select(F.xxhash64("gram").alias("g")).distinct()
        key = "g"
    else:
        key = "gram"
    return (
        doc_grams.join(F.broadcast(ev), key)
        .groupBy("doc_id")
        .agg(F.count_distinct(key).cast("long").alias("n_hits"))
    )
