"""The vectorized Arrow posting combine must equal the naive per-doc combine.

The build's tokenize stage aggregates (term -> sorted positions) per doc
map-side with C kernels (`_post_array_from_docs`); these tests pin it to
the readable reference implementations for both analyzer families,
including rejected-token placeholders, duplicates, empty docs, and
arbitrary unicode (hypothesis).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from frankensearch_spark.operators.build import (
    _doc_postings_from_pairs,
    _doc_postings_from_tokens,
    _post_array_from_docs,
)


def _as_map(structs):
    return {s["term"]: s["positions"] for s in structs}


def check_tokens(docs):
    got = _post_array_from_docs(docs).to_pylist()
    exp = [
        [{"term": t, "positions": p} for t, p in _doc_postings_from_tokens(d)]
        for d in docs
    ]
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert _as_map(g) == _as_map(e)


def check_pairs(docs):
    got = _post_array_from_docs(
        [[t for _, t in p] for p in docs], [[i for i, _ in p] for p in docs]
    ).to_pylist()
    exp = [
        [{"term": t, "positions": p} for t, p in _doc_postings_from_pairs(d)]
        for d in docs
    ]
    for g, e in zip(got, exp):
        assert _as_map(g) == _as_map(e)


def test_token_combine_edge_cases():
    check_tokens(
        [
            ["a", "b", "a", None, "c", "a"],
            [],
            [None, None],
            ["x"],
            ["б", "б", "z", "б"],
            ["same"] * 300,
        ]
    )


def test_pair_combine_edge_cases():
    check_pairs(
        [
            [(0, "ab"), (0, "cd"), (1, "ab"), (1, "ab")],  # shared + duplicate pos
            [],
            [(5, "q"), (2, "q")],  # out-of-order positions must sort
        ]
    )


# NUL is excluded from generated terms: pandas' factorize hashes object
# strings NUL-terminated, conflating "a" with "a\x00" — and no shipped
# analyzer can emit NUL (tokens are Unicode-alnum runs, NUL is a
# separator), so the kernel documents NUL-free terms as a precondition
# rather than paying a per-token scan on the hot path.
# ...surrogates are excluded too: terms arrive through Arrow as UTF-8,
# which cannot carry lone surrogates in the first place.
_term = st.text(
    alphabet=st.characters(
        blacklist_characters="\x00", blacklist_categories=("Cs",)
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(st.none(), _term),
            max_size=40,
        ),
        max_size=20,
    )
)
def test_token_combine_property(docs):
    check_tokens(docs)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(0, 100), _term),
            max_size=40,
        ),
        max_size=20,
    )
)
def test_pair_combine_property(docs):
    check_pairs(docs)
