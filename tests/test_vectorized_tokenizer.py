"""The vectorized Arrow-batch tokenizer must equal the scalar analyzer."""

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from wiki_search_engine_spark.functions.analyzer import (
    base_tokens, full_tokens, tokenize_frame,
)

token_st = st.one_of(
    st.text(
        alphabet="abcdefgHIJ012345 .,!-'\t", min_size=0, max_size=12
    ),
    st.integers(0, 10**9).map(str),
    st.sampled_from(["the", "and", "running", "don't", "HELLO!!"]),
)
text_st = st.lists(token_st, max_size=30).map(" ".join)


@given(st.lists(text_st, max_size=25), st.booleans())
@settings(max_examples=40, deadline=None)
def test_tokenize_frame_matches_scalar_analyzer(texts, stem):
    docids = list(range(len(texts)))
    got = tokenize_frame(docids, texts, stem)
    gmap = {
        (r.docid, r.term): (r.tf, r.doc_len) for r in got.itertuples()
    }
    fn = full_tokens if stem else base_tokens
    emap = {}
    for d, t in zip(docids, texts):
        toks = fn(t)
        if not toks:
            continue
        for term, tf in Counter(toks).items():
            emap[(d, term)] = (tf, len(toks))
    assert gmap == emap
