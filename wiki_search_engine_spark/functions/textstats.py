"""Text-analysis column expressions (JVM-side built-ins, no UDFs).

Snippet semantics replicate the reference's "cut the article"
(mongodb_scripts/insertScript.py:8-24): concatenate the characters of the
first <=3 lines until (and including) the second ``'.'``; if fewer than two
dots, the whole first-3-lines text; strip. The rest are the training-data
text operators (language-ID heuristic, quality scoring, token counting,
fingerprinting) — all expressible as Catalyst expressions so they run in
whole-stage codegen, and mirrored 1:1 in DuckDB SQL by
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los", "es"],
    "fr": ["le", "la", "les", "et", "des", "est", "une"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein"],
}

QUALITY_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
]

# word tokens | single digits | any other non-space char — a BPE-ish
# longest-match-first segmentation regex (shared with oracle SQL)
BPE_ISH_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def first_lines(text: Column, n: int = 3) -> Column:
    return F.concat_ws("", F.slice(F.split(text, "\n"), 1, n))


def snippet(text: Column) -> Column:
    """Reference cut_the_article over the first 3 lines."""
    head = first_lines(text, 3)
    two_sentences = F.regexp_extract(head, r"^([^.]*\.[^.]*\.)", 1)
    return F.trim(F.when(two_sentences != "", two_sentences).otherwise(head))


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text -> empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def ws_token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[^a-zA-Z0-9\s]", "")
    )
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / F.length(text)
    )


def stopword_ratio(text: Column) -> Column:
    toks = ws_tokens(F.lower(text))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(QUALITY_STOPWORDS))
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks)
    )


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards moderate length,
    penalizes punctuation soup and stopword-free (non-natural) text."""
    length_component = F.least(
        ws_token_count(text).cast("double") / F.lit(100.0), F.lit(1.0)
    )
    return F.round(
        0.5 * length_component
        + 0.3 * (1.0 - F.least(punct_ratio(text) * 5.0, F.lit(1.0)))
        + 0.2 * F.least(stopword_ratio(text) * 4.0, F.lit(1.0)),
        6,
    )


def lang_scores(text: Column) -> dict[str, Column]:
    toks = ws_tokens(F.lower(text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        out[lang] = F.size(F.filter(toks, lambda t: t.isin(markers)))
    return out


def lang_id(text: Column) -> Column:
    """argmax language by marker-word hits; ties -> alphabetical order of
    lang code; zero hits everywhere -> 'und'."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        expr = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(expr)
    return expr


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle strings (space-joined).

    Formulated as arrays_zip over n shifted slices of the token array,
    NOT element_at(toks, i+j) inside a transform lambda: HOF lambdas are
    interpreted (no codegen), so a lambda body that references ``toks``
    re-evaluates the whole tokenizing split PER ELEMENT — O(tokens^2)
    per document (measured 13x slower on 5k real-length docs). Here the
    lambda touches only its own struct argument; the split is evaluated
    O(n) times per ROW."""
    toks = ws_tokens(F.lower(text))
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, j + 1, m).alias(f"t{j}") for j in range(n)]
    )
    grams = F.transform(
        zipped,
        lambda s: F.concat_ws(" ", *[s[f"t{j}"] for j in range(n)]),
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


def doc_fingerprint(text: Column, n: int = 3) -> Column:
    """Deterministic document fingerprint: min md5 over word 3-shingles
    (min-hash with one permutation — a stable content fingerprint that
    survives small edits better than a full-text hash)."""
    sh = shingles(text, n)
    hashed = F.transform(sh, lambda s: F.md5(s))
    return F.when(F.size(sh) == 0, F.md5(F.lower(F.trim(text)))).otherwise(
        F.array_min(hashed)
    )


def highlight_snippet(
    snippet: str, terms: set[str], analyzer: str = "porter"
) -> str:
    """Wrap every snippet word whose ANALYZED form is a query term in
    <em>..</em> — so 'running' highlights for the query 'runs' under
    the Porter analyzer, exactly matching retrieval semantics. Plain
    Python (driver-side serving decoration, one snippet per result
    row); whitespace is preserved verbatim."""
    import re

    from .analyzer import tokens_for

    if not snippet or not terms:
        return snippet or ""

    def mark(m: "re.Match") -> str:
        word = m.group(0)
        toks = tokens_for(word, analyzer)
        if toks and toks[0] in terms:
            return f"<em>{word}</em>"
        return word

    return re.sub(r"\S+", mark, snippet)
