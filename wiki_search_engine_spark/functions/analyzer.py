"""Text analysis chain: clean -> tokenize -> (stop/junk filter) -> Porter.

Replicates the reference's semantics (unified across index and query sides,
see SURVEY §8.Q4):

- clean: lowercase, replace every char outside ``[a-zA-Z0-9\\s]`` with a
  space (the serving-path variant, backend/services/stemmingService.js:8-10;
  the indexer variant at Indexer/inverted_index.py:18-22 deletes instead —
  we unify on space-replacement so word boundaries survive, SURVEY §8.Q4);
- tokenize: split on whitespace runs;
- junk-number filter: drop tokens that are all digits with length > 4
  (reference: Indexer/inverted_index.py:65-66);
- stopword filter: deterministic in-repo list (the reference uses spaCy's
  ``token.is_stop`` — a model-versioned external set; we pin our own so the
  analyzer is dependency-free and stable);
- Porter stem (reference: Indexer/inverted_index.py:70,
  backend/services/stemmingService.js:16).

Two analyzer levels:

- ``base_tokens``   — clean + split + junk-number filter. This level is
  exactly expressible in ANSI SQL (DuckDB) and is the analyzer used for the
  oracle-checked index/scoring queries in ``__spark_entry__``.
- ``full_tokens``   — base + stopword removal + Porter stem. Used by the
  SearchEngine default pipeline; verified against the pure-Python oracle in
  pytest (rank-identity), not via SQL.

Both are plain Python functions; Spark-side they run vectorized over Arrow
batches inside mapInPandas (see operators/tokenize.py) — never per-row UDFs.
"""

from __future__ import annotations

import re

from .porter import porter_stem

CLEAN_RE = re.compile(r"[^a-zA-Z0-9\s]")
SPLIT_RE = re.compile(r"\s+")
DIGITS_RE = re.compile(r"^[0-9]+$")

# Deterministic stopword list (classic English function words). The reference
# delegates to spaCy is_stop (Indexer/inverted_index.py:64); we pin a fixed,
# in-repo set for reproducibility.
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be
    because been before being below between both but by could did do does
    doing down during each few for from further had has have having he her
    here hers herself him himself his how i if in into is it its itself just
    me more most my myself no nor not now of off on once only or other our
    ours ourselves out over own same she should so some such than that the
    their theirs them themselves then there these they this those through to
    too under until up very was we were what when where which while who whom
    why will with you your yours yourself yourselves""".split()
)

# SQL fragments kept in lock-step with the Python above — used by
# __spark_entry__.oracle_sql() so DuckDB tokenizes identically.
SQL_CLEAN = "lower(regexp_replace({col}, '[^a-zA-Z0-9 \\t\\n\\r]', ' ', 'g'))"
SQL_JUNK_PRED = "NOT (regexp_matches(tok, '^[0-9]+$') AND length(tok) > 4)"


def clean_text(text: str) -> str:
    """Lowercase and delete non-alphanumeric/non-space chars."""
    return CLEAN_RE.sub(" ", text).lower()


def base_tokens(text: str) -> list[str]:
    """clean + whitespace split + junk-number filter (SQL-expressible)."""
    out = []
    for tok in SPLIT_RE.split(clean_text(text)):
        if not tok:
            continue
        if len(tok) > 4 and DIGITS_RE.match(tok):
            continue
        out.append(tok)
    return out


def full_tokens(text: str) -> list[str]:
    """base + stopword removal + Porter stem (the engine's default analyzer)."""
    return [porter_stem(t) for t in base_tokens(text) if t not in STOPWORDS]


def tokenize_frame(docids, texts, stem: bool, analyzer: str | None = None):
    """Vectorized batch tokenization: (docids, texts) -> pandas DataFrame
    (docid, term, tf, doc_len), one row per distinct (doc, term).

    The Arrow-batch hot path: pandas str ops for clean/split, a single
    regex pass over the exploded token array for the junk-number filter,
    and Porter applied to UNIQUE tokens only (then mapped back) — per-row
    Python never touches the token stream. Semantics identical to
    ``base_tokens``/``full_tokens`` (property-tested in tests/).

    ``analyzer='ner'`` routes through the per-doc entity analyzer
    (run detection needs original casing + adjacency, so it's a python
    loop per doc within the Arrow batch — the optional plug's cost, still
    batch-at-a-time, unlike the reference's per-row spaCy UDF).
    """
    import numpy as np
    import pandas as pd

    # docid contract check (operators/tokenize.py with_docid): a NEGATIVE
    # external docid would be routed inconsistently — the build computes
    # salt with an unsigned shift (salt >= 2^salt_bits) while driver-side
    # point lookups / tombstone bucketing use Python's arithmetic shift
    # (negative salt), making the doc silently unfindable. Fail the build
    # loudly instead; the check is one vectorized min() per Arrow batch.
    _ids = np.asarray(docids, dtype=np.int64)
    if _ids.size and int(_ids.min()) < 0:
        raise ValueError(
            f"negative docid {int(_ids.min())} in corpus batch — docids "
            "must be non-negative 63-bit values (with_docid contract); "
            "rekey the corpus or drop the pre-existing docid column"
        )

    # an explicit analyzer defines the stem behavior — a contradictory
    # (stem, analyzer) pair would otherwise build an index that its own
    # queries (analyze_query routes on analyzer) can never match
    if analyzer == "porter":
        stem = True
    elif analyzer == "base":
        stem = False

    if analyzer == "ner":
        from collections import Counter

        recs = []
        for docid, text in zip(docids, texts):
            toks = ner_tokens(text or "")
            if not toks:
                continue
            dl = len(toks)
            for term, tf in Counter(toks).items():
                recs.append((int(docid), term, tf, dl))
        return pd.DataFrame(
            recs, columns=["docid", "term", "tf", "doc_len"]
        ).astype(
            {"docid": "int64", "tf": "int32", "doc_len": "int32"}
        )

    texts = pd.Series(texts).fillna("")
    token_lists = (
        texts.str.replace(CLEAN_RE, " ", regex=True)
        .str.lower()
        .str.split()
    )
    lens = token_lists.str.len().fillna(0).astype(np.int64).to_numpy()
    if lens.sum() == 0:
        return pd.DataFrame(
            {
                "docid": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int32"),
                "doc_len": pd.Series([], dtype="int32"),
            }
        )
    flat_docids = np.repeat(np.asarray(docids, dtype=np.int64), lens)
    flat_terms = pd.Series(
        np.concatenate([t for t in token_lists if t]), dtype="object"
    )
    # junk-number filter: all-digits and len > 4. The regex runs only on
    # tokens whose first char is a digit (~3% of web text) — a full
    # fullmatch over every token measured as expensive as the entire
    # HTML extraction (see git history / bench).
    junk = np.zeros(flat_terms.size, dtype=bool)
    maybe = (
        (flat_terms.str.len() > 4)
        & flat_terms.str.slice(0, 1).isin(tuple("0123456789"))
    ).to_numpy()
    if maybe.any():
        junk[maybe] = (
            flat_terms[maybe].str.fullmatch("[0-9]+", na=False).to_numpy()
        )
    keep = ~junk
    if stem:
        keep &= ~flat_terms.isin(STOPWORDS).to_numpy()
    flat_docids = flat_docids[keep]
    flat_terms = flat_terms[keep]
    if stem:
        uniq = pd.unique(flat_terms)
        mapping = {t: porter_stem(t) for t in uniq}
        flat_terms = flat_terms.map(mapping)
    df = pd.DataFrame(
        {"docid": flat_docids, "term": flat_terms.to_numpy()}
    )
    doc_len = df.groupby("docid", sort=False).size().rename("doc_len")
    tf = (
        df.groupby(["docid", "term"], sort=False)
        .size()
        .rename("tf")
        .reset_index()
    )
    out = tf.merge(doc_len, left_on="docid", right_index=True)
    out["tf"] = out["tf"].astype("int32")
    out["doc_len"] = out["doc_len"].astype("int32")
    return out


ENTITY_CORE_RE = re.compile(r"^[A-Z][a-z]+$")
STRIP_EDGE_RE = re.compile(r"^[^A-Za-z0-9]+|[^A-Za-z0-9]+$")

# Capitalized-but-not-an-entity vocabulary: date/time words that spaCy
# types DATE/TIME — types the reference's filter REJECTS
# (Indexer/inverted_index.py keeps only PERSON/ORG/GPE-style spans).
# A run whose cores are ALL such words ("Monday Morning", "New Year's
# Eve" minus "New") is no entity; mixed runs survive ("Monday Night
# Football" has a non-date core). This is the deterministic slice of
# spaCy's type filter — see COVERAGE.md P4 for what still differs.
NON_ENTITY_CORES = frozenset(
    """january february march april may june july august september
    october november december monday tuesday wednesday thursday friday
    saturday sunday morning afternoon evening night noon midnight
    today tomorrow yesterday week month year spring summer autumn
    winter""".split()
)


def ner_tokens(text: str) -> list[str]:
    """Entity-aware dual-indexing analyzer (the reference's INTENDED
    behavior: spaCy PERSON/ORG/GPE phrases indexed alongside their
    component words, Indexer/inverted_index.py:24-72; its own test
    expects 'new york' from 'Barack Obama visited New York',
    backend/__tests__/stemmingService.test.js:3-8).

    spaCy is a heavyweight model-versioned dependency, so the entity
    detector here is a deterministic surrogate: a maximal run of >= 2
    capitalized non-stopword CORE words ([A-Z][a-z]+), where up to TWO
    consecutive function words (STOPWORDS, any case) may BRIDGE two
    core words — so "Bank of America", "University of California", and
    "Ministry of the Interior" are single entities. Capitalized
    stopwords are bridge-class, never core: "The Government announced"
    forms NO entity (the sentence-case determiner was the most common
    false positive of the pure capitalized-run rule), while "The White
    House" yields "white house" — matching spaCy's usual
    determiner-stripped span. Runs start and end on core words. For
    each entity run we emit the lowercased phrase (bridges included:
    'bank of america') AND each CORE component word (reference quirk
    Q2 — bridges are stopwords and are never indexed alone); remaining
    tokens go through the normal stopword/junk/Porter chain, except
    runs whose every core is a date/time word (NON_ENTITY_CORES) —
    the deterministic slice of spaCy's PERSON/ORG/GPE type filter:
    'Monday Morning' is no entity, 'Monday Night Football' is. Other
    tokens whose cleaned form is an entity component elsewhere in the
    doc, which are skipped (inverted_index.py:56-61 semantics). See
    COVERAGE.md P4 for what still differs from spaCy."""
    raw = text.split()
    n = len(raw)
    cores = [STRIP_EDGE_RE.sub("", t) for t in raw]
    is_core = [
        bool(ENTITY_CORE_RE.match(c)) and c.lower() not in STOPWORDS
        for c in cores
    ]
    is_bridge = [
        c.isalpha() and c.lower() in STOPWORDS for c in cores
    ]
    # an entity never spans a sentence boundary: trailing .!?;: on the
    # raw token (inside closing quotes/brackets) terminates the run —
    # "visited America. The President" is two fragments, not one
    # entity, and "Mr. John Smith" drops the honorific like spaCy does
    ends_sentence = [
        bool(s) and s[-1] in ".!?;:"
        for s in (t.rstrip("'\")]") for t in raw)
    ]

    # sentence-initial FP guard (the "Big Bank announced" class): a
    # run's FIRST word carries no capitalization signal when it starts
    # a sentence — it may be sentence case, not a name. spaCy resolves
    # this with model evidence; the deterministic, doc-local version
    # weighs two replayable signals: the word capitalized MID-sentence
    # anywhere in the doc = entity evidence (keep), the word's
    # lowercase form anywhere in the doc = common-word evidence
    # (demote: drop it from the span). With NO evidence either way the
    # word is kept — a one-sentence doc like the reference's own test
    # ("Barack Obama visited New York",
    # backend/__tests__/stemmingService.test.js:6-8) must keep its
    # entities; the no-evidence FP that survives is documented in
    # COVERAGE.md P4.
    sent_initial = [
        i == 0 or ends_sentence[i - 1] for i in range(n)
    ]
    mid_caps = {
        cores[i]
        for i in range(n)
        if is_core[i] and not sent_initial[i]
    }
    lower_words = {
        c for c in cores if c.isalpha() and c == c.lower()
    }

    # maximal runs of core words, allowing <= 2 consecutive bridge
    # words between cores; >= 2 core words make an entity
    runs: list[tuple[int, int]] = []
    i = 0
    while i < n:
        if is_core[i]:
            j = i
            while True:
                if ends_sentence[j]:
                    break
                if j + 1 < n and is_core[j + 1]:
                    j += 1
                    continue
                stepped = False
                for g in (1, 2):
                    if (
                        j + g + 1 < n
                        and all(
                            is_bridge[j + t]
                            and not ends_sentence[j + t]
                            for t in range(1, g + 1)
                        )
                        and is_core[j + g + 1]
                    ):
                        j += g + 1
                        stepped = True
                        break
                if not stepped:
                    break
            a = i
            if (
                j > a
                and sent_initial[a]
                and cores[a] not in mid_caps
                and cores[a].lower() in lower_words
            ):
                rest = [x for x in range(a + 1, j + 1) if is_core[x]]
                # the shortened span must still have >= 2 cores to be
                # an entity ("Big Bank announced" -> nothing)
                a = rest[0] if len(rest) >= 2 else -1
            if a >= 0 and j > a and not all(
                cores[x].lower() in NON_ENTITY_CORES
                for x in range(a, j + 1)
                if is_core[x]
            ):
                runs.append((a, j))
            i = j + 1
        else:
            i += 1
    in_run = set()
    for a, b in runs:
        in_run.update(range(a, b + 1))
    entity_words = {
        cores[i].lower() for i in in_run if is_core[i]
    }

    out: list[str] = []
    for i, t in enumerate(raw):
        if i in in_run:
            a, b = next(r for r in runs if r[0] <= i <= r[1])
            if i == a:
                out.append(" ".join(cores[x].lower() for x in range(a, b + 1)))
            if is_core[i]:
                out.append(cores[i].lower())
            continue
        for tok in base_tokens(t):
            if tok in entity_words:
                continue  # already indexed via the entity pass
            if tok in STOPWORDS:
                continue
            out.append(porter_stem(tok))
    return out


def tokens_for(text: str, analyzer: str = "porter") -> list[str]:
    """Analyzer dispatch: 'base' (SQL-expressible), 'porter' (default
    full chain), 'ner' (entity dual-indexing plug)."""
    if analyzer == "base":
        return base_tokens(text)
    if analyzer == "porter":
        return full_tokens(text)
    if analyzer == "ner":
        return ner_tokens(text)
    raise ValueError(f"unknown analyzer: {analyzer}")


def split_boolean(query: str) -> tuple[str, str, str]:
    """Split a raw query into (should text, must text, not text):
    Lucene prefix operators — ``+term`` is REQUIRED (MUST), ``-term``
    is excluded (NOT), bare terms are optional (SHOULD). Same opt-in
    and intra-word-hyphen rules as split_negations (which this
    supersedes on surfaces that accept ``+``): parsing only happens
    under the boolean/negation flag, so legacy queries keep the
    reference's bag reading."""
    should, must, neg = [], [], []
    for tok in (query or "").split():
        if tok.startswith("-") and len(tok) > 1:
            neg.append(tok[1:])
        elif tok.startswith("+") and len(tok) > 1:
            must.append(tok[1:])
        else:
            should.append(tok)
    return " ".join(should), " ".join(must), " ".join(neg)


def split_field_terms(text: str) -> tuple[str, list[str]]:
    """Split whitespace tokens into (plain text, raw title-field
    tokens): a token of the form ``title:word`` (case-insensitive
    prefix, at least one char after the colon) is a Lucene-style
    FIELD-SCOPED term — it matches/scores against the document TITLE
    only. Parsing is gated behind the same opt-in boolean flag as
    ``+``/``-`` (split_boolean), so legacy queries containing colons
    keep the reference's bag reading (the analyzer space-replaces
    ``:``). Run on the ALREADY-SPLIT should/must/not parts, so
    ``+title:foo`` / ``-title:foo`` compose naturally."""
    plain, title = [], []
    for tok in (text or "").split():
        low = tok.lower()
        if low.startswith("title:") and len(tok) > 6:
            title.append(tok[6:])
        else:
            plain.append(tok)
    return " ".join(plain), title


def resolve_boolean_overlap(
    terms: list[str],
    required: list[str] | None,
    excluded: list[str],
) -> tuple[list[str], bool]:
    """Lucene's rule for a term appearing on both sides of a boolean
    query AFTER analysis (stemming makes collisions easy: ``run -runs``
    both analyze to ``run``):

    - a REQUIRED (+t) term that is also excluded (-t) is a genuine
      contradiction — the query matches nothing;
    - a SHOULD term that is also excluded is simply DROPPED from the
      positive set and the exclusion kept (``a b -a`` returns docs
      matching ``b`` without ``a`` — it must not silently empty).

    Returns ``(positive_terms, contradiction)``; the caller returns an
    empty result when ``contradiction`` is True or no positive terms
    remain. Callers with ``semantics='and'`` pass ``required=terms``
    (conjunctive retrieval makes every term required)."""
    if not excluded:
        return terms, False
    overlap = set(terms) & set(excluded)
    if not overlap:
        return terms, False
    if set(required or ()) & overlap:
        return [], True
    return [t for t in terms if t not in overlap], False


def split_negations(query: str) -> tuple[str, str]:
    """Split a raw query into (positive text, excluded text): a
    whitespace token starting with ``-`` and carrying at least one more
    character is a Lucene-style NOT term (its ``-`` stripped); intra-word
    hyphens ("state-of-the-art") are untouched. MUST run before
    analysis — the analyzer space-replaces ``-``, which would silently
    turn "-spark" into a positive term. Negation parsing is OPT-IN at
    every surface (``negation=True`` / ``--negation`` / ``&negation``)
    so legacy queries containing stray hyphens keep the reference's
    bag-of-words behavior."""
    pos, neg = [], []
    for tok in (query or "").split():
        if tok.startswith("-") and len(tok) > 1:
            neg.append(tok[1:])
        else:
            pos.append(tok)
    return " ".join(pos), " ".join(neg)


def analyze_query(
    query: str, stem: bool = True, analyzer: str | None = None
) -> list[str]:
    """Query-side analysis (same analyzer as the index side — the
    deliberate fix of the reference's asymmetry, SURVEY §8.Q4).
    Duplicate terms are deduped (order-preserving) because the
    reference's Mongo ``$in`` returns each posting list once — duplicate
    query terms never double-count
    (reference: backend/services/mongoService.js:18-30)."""
    if analyzer is None:
        analyzer = "porter" if stem else "base"
    toks = tokens_for(query, analyzer)
    seen: dict[str, None] = {}
    for t in toks:
        seen.setdefault(t)
    return list(seen)
