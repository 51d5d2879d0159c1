"""Property-based tests (hypothesis) for the pure-python kernels.

The numpy oracle is the conformance anchor for the Spark engine, so the
oracle itself is validated here against an independent brute-force BM25
written directly from the pinned formulas, plus structural laws for the
analyzer, glob matcher, eval tree, and snippet range collapse.
"""

from __future__ import annotations

import math
import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from frankensearch_spark.functions.analyze import analyze_terms, tokenize
from frankensearch_spark.functions.contract import (
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
)
from frankensearch_spark.functions.snippet import _collapse
from frankensearch_spark.oracle import OracleIndex
from frankensearch_spark.plans import glob
from frankensearch_spark.plans.query import DefaultQueryParser, DEFAULT_SCHEMA

words = st.text(alphabet="abcd", min_size=1, max_size=3)
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=12,
)


def brute_force_bm25(texts: list[str], term: str) -> list[tuple[int, float]]:
    """Independent BM25 from the pinned formulas (f32 steps, no shared
    code with the oracle's vectorized path)."""
    toks = [analyze_terms(t) for t in texts]
    n = len(texts)
    lens = [len(t) for t in toks]
    avgdl = sum(lens) / n if n else 0.0
    df = sum(1 for t in toks if term in t)
    if df == 0 or avgdl == 0:
        return []
    ratio = (np.float32(n - df) + np.float32(0.5)) / (np.float32(df) + np.float32(0.5))
    idf = np.float32(math.log(float(np.float32(1.0) + ratio)))
    weight = idf * (np.float32(1.0) + np.float32(1.2))
    weight = np.float32(weight * np.float32(1.0))
    out = []
    for docid, t in enumerate(toks):
        f = t.count(term)
        if not f:
            continue
        # fieldnorm quantization through the pinned table
        fnid = int(fieldnorm_to_id(np.array([lens[docid]]))[0])
        decoded = np.float32(FIELD_NORMS_TABLE[fnid])
        norm = np.float32(1.2) * (
            np.float32(1.0) - np.float32(0.75) + np.float32(0.75) * decoded / np.float32(avgdl)
        )
        score = np.float32(weight * (np.float32(f) / (np.float32(f) + norm)))
        out.append((docid, float(score)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@settings(max_examples=60, deadline=None)
@given(docs_strategy, words)
def test_oracle_matches_brute_force_single_term(texts, term):
    docs = [{"doc_id": f"d{i:04d}", "content": t} for i, t in enumerate(texts)]
    oracle = OracleIndex(docs, text_fields=("content",))
    hits = oracle.search(term, limit=len(texts))
    expected = brute_force_bm25(texts, term)
    assert [(h.docid, np.float32(h.score)) for h in hits] == [
        (d, np.float32(s)) for d, s in expected
    ]


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=60))
def test_analyzer_is_maximal_alnum_runs(text):
    toks = tokenize(text)
    # token texts are the lowercased maximal [^\W_]+ runs, in order
    expected = [m.group().lower() for m in re.finditer(r"[^\W_]+", text, re.UNICODE)]
    assert [t.text for t in toks] == expected
    # positions are dense ordinals; byte offsets are monotone and valid
    assert [t.position for t in toks] == list(range(len(toks)))
    raw = text.encode("utf-8")
    prev = 0
    for t in toks:
        assert prev <= t.offset_from < t.offset_to <= len(raw)
        prev = t.offset_to


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="ab*", min_size=1, max_size=8),
    st.text(alphabet="ab", max_size=8),
)
def test_glob_matches_fnmatch_semantics(pattern, term):
    import fnmatch

    got = glob.matches(pattern, term)
    core = pattern
    kind, _ = glob.classify(pattern)
    if kind == glob.EXACT and "*" in pattern:
        # all-star patterns classify Exact("") and match nothing
        assert got is (term == "")
        return
    expected = fnmatch.fnmatchcase(term, pattern.lower())
    assert got == expected, (pattern, term, kind)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 15)).map(
            lambda p: (p[0], p[0] + 1 + p[1])
        ),
        max_size=10,
    )
)
def test_snippet_collapse_laws(ranges):
    out = _collapse(ranges)
    # sorted, non-overlapping, covers exactly the union of inputs
    for (a1, b1), (a2, b2) in zip(out, out[1:]):
        assert a1 < a2 and b1 <= a2  # adjacency allowed, overlap not
    covered = set()
    for a, b in out:
        covered.update(range(a, b))
    expected = set()
    for a, b in ranges:
        expected.update(range(a, b))
    assert covered == expected


@settings(max_examples=40, deadline=None)
@given(docs_strategy, st.lists(words, min_size=1, max_size=3))
def test_boolean_or_is_union_of_terms(texts, terms):
    """OR query's matched set == union of single-term matched sets, and
    scores == f32 ordered sums of the members' scores."""
    docs = [{"doc_id": f"d{i:04d}", "content": t} for i, t in enumerate(texts)]
    oracle = OracleIndex(docs, text_fields=("content",))
    parser = DefaultQueryParser(DEFAULT_SCHEMA)
    query = " OR ".join(dict.fromkeys(terms))
    hits = {h.docid: np.float32(h.score) for h in oracle.search(query, limit=len(texts))}
    singles = [
        {h.docid: np.float32(h.score) for h in oracle.search(t, limit=len(texts))}
        for t in dict.fromkeys(terms)
    ]
    expected_ids = set().union(*[set(s) for s in singles])
    assert set(hits) == expected_ids
    for docid in expected_ids:
        acc = np.float32(0.0)
        for s in singles:
            if docid in s:
                acc = np.float32(acc + s[docid])
        assert hits[docid] == acc


# ── manifest snapshot laws (visibility protocol kernels) ─────────────────

manifest_row = st.fixed_dictionaries(
    {
        "segment_id": st.integers(0, 30),
        "generation": st.integers(1, 20),
        "status": st.sampled_from(["sealed", "unsealed"]),
        "sealed_at": st.one_of(st.none(), st.integers(1, 40)),
        "superseded_at": st.one_of(st.none(), st.integers(1, 40)),
    }
)
manifests = st.lists(manifest_row, min_size=0, max_size=40).map(
    # pending rows have no activation yet, by construction of seal()
    lambda rows: [
        {**r, "sealed_at": None} if r["status"] == "unsealed" else r
        for r in rows
    ]
)


@given(manifests)
@settings(max_examples=200, deadline=None)
def test_snapshot_laws_default_liveness(rows):
    from frankensearch_spark.sources.storage import IndexStorage

    live = IndexStorage.live_from_snapshot(rows)
    dirty = IndexStorage.live_from_snapshot(rows, include_unsealed=True)
    # default readers never see unsealed-only segments; dirty is a superset
    assert set(live) <= set(dirty)
    unsealed_only = {
        r["segment_id"]
        for r in rows
        if r["status"] == "unsealed" and r["superseded_at"] is None
    } - {
        r["segment_id"]
        for r in rows
        if r["status"] == "sealed" and r["superseded_at"] is None
    }
    assert not (unsealed_only & set(live))
    # superseded-everywhere segments are gone from both
    gone = {r["segment_id"] for r in rows} - {
        r["segment_id"] for r in rows if r["superseded_at"] is None
    }
    assert not (gone & set(dirty))


@given(manifests)
@settings(max_examples=200, deadline=None)
def test_snapshot_laws_seal_immutability(rows):
    """Applying seal() (flip pending rows to sealed at a FRESH activation)
    must not change any snapshot pinned at or below the pre-seal
    watermark — the invariant the sealed_at scheme exists for."""
    from frankensearch_spark.sources.storage import IndexStorage

    state = IndexStorage.state_from_snapshot(rows)
    act = state.any_gen + 1  # what seal() mints
    sealed_rows = [
        {**r, "status": "sealed", "sealed_at": act}
        if r["status"] == "unsealed"
        else r
        for r in rows
    ]
    for g in range(0, state.any_gen + 1):
        assert IndexStorage.live_from_snapshot(
            rows, at_generation=g
        ) == IndexStorage.live_from_snapshot(sealed_rows, at_generation=g)
    # and the seal advanced the published watermark iff something sealed
    new_state = IndexStorage.state_from_snapshot(sealed_rows)
    if state.unsealed:
        assert new_state.sealed_gen == act
        assert not new_state.unsealed
    else:
        assert new_state.sealed_gen == state.sealed_gen


@given(manifests)
@settings(max_examples=200, deadline=None)
def test_snapshot_laws_watermarks(rows):
    from frankensearch_spark.sources.storage import IndexStorage

    state = IndexStorage.state_from_snapshot(rows)
    assert state.sealed_gen <= state.any_gen
    # every pending generation is invisible to the sealed watermark
    for r in rows:
        if r["status"] == "sealed":
            eff = max(
                r["generation"],
                r["sealed_at"] if r["sealed_at"] is not None else 0,
            )
            assert eff <= state.sealed_gen
    # overrides only record true reactivations
    for g, a in state.overrides.items():
        assert a != g
