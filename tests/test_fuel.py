"""Query fuel budget: deterministic coarse work admission control.

Reference semantics: ``config.rs:35-40`` (unit definition, 10M default,
zero budgets rejected), ``argus.rs:178-180`` (fuel-exhausted error carries
consumed/budget).  The Spark analogue is pre-flight admission (plans/fuel.py);
these tests pin the unit accounting, the two-level check's zero-job hot
path, and the deterministic rejection."""

from __future__ import annotations

import pytest

from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.plans import fuel
from frankensearch_spark.plans.eval import EvalPlan, LeafSpec


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """300 docs so blocks(doc_count) = 3 > 1: the pessimistic bound for a
    single term is measurably larger than a rare term's exact charge."""
    index_dir = str(tmp_path_factory.mktemp("fuel_index"))
    rows = [
        {"doc_id": f"d{i:04d}", "content": f"common w{i % 10} unique{i}"}
        for i in range(300)
    ]
    index = LexicalIndex(spark, index_dir).build(
        spark.createDataFrame(rows),
        text_fields=("content",),
        sort_cols=("doc_id",),
        num_segments=2,
        num_buckets=4,
    )
    return index


# ── pure estimator ──────────────────────────────────────────────────────────


def _plan(*leaves):
    p = EvalPlan(leaves=list(leaves), spec={"t": "leaf", "id": 0})
    return p


def test_term_charge_is_blocks_plus_segments():
    leaf = LeafSpec(leaf_id=0, kind="term", field="content", term="x")
    units, exact = fuel.estimate_fuel(
        _plan(leaf), n_segments=3, doc_count=10_000,
        df_of=lambda l: 1000, glob_expansion=lambda l: None,
    )
    # ceil(1000/128)=8 posting blocks + 3 segment/dictionary transitions
    assert (units, exact) == (8 + 3, True)


def test_unresolved_df_is_pessimistic_and_flagged():
    leaf = LeafSpec(leaf_id=0, kind="term", field="content", term="x")
    units, exact = fuel.estimate_fuel(
        _plan(leaf), n_segments=1, doc_count=12_800,
        df_of=lambda l: None, glob_expansion=lambda l: None,
    )
    assert units == 100 + 1 and exact is False


def test_phrase_charges_member_blocks_plus_min_df_candidates():
    leaf = LeafSpec(
        leaf_id=0, kind="phrase", field="content",
        terms=((0, "a"), (1, "b")),
    )
    dfs = {"a": 1000, "b": 40}
    units, exact = fuel.estimate_fuel(
        _plan(leaf), n_segments=2, doc_count=10_000,
        df_of=lambda l: dfs[l.term], glob_expansion=lambda l: None,
    )
    # blocks(1000)+2 + blocks(40)+2 + min(1000,40) verification candidates
    assert (units, exact) == ((8 + 2) + (1 + 2) + 40, True)


def test_glob_charges_expansion_terms_and_blocks():
    leaf = LeafSpec(leaf_id=0, kind="glob", field="content", pattern="w*")
    units, exact = fuel.estimate_fuel(
        _plan(leaf), n_segments=2, doc_count=10_000,
        df_of=lambda l: None,
        glob_expansion=lambda l: [("w1", 128), ("w2", 300)],
    )
    # 2 dictionary terms + 2 leaf segments + per-term (blocks + segments):
    # (blocks(128)=1 + 2) + (blocks(300)=3 + 2) — per-term +seg matches the
    # term-leaf path (per-segment block residency rounds up independently)
    assert (units, exact) == (2 + 2 + (1 + 2) + (3 + 2), True)


def test_docs_scan_leaves_charge_segment_transitions_only():
    leaves = [
        LeafSpec(leaf_id=0, kind="all"),
        LeafSpec(leaf_id=1, kind="range", field="created_at", lower="a"),
    ]
    units, exact = fuel.estimate_fuel(
        _plan(*leaves), n_segments=5, doc_count=10**12,
        df_of=lambda l: None, glob_expansion=lambda l: None,
    )
    assert (units, exact) == (10, True)


def test_validate_budget_rejects_nonpositive():
    # reference config.rs:160-163: zero budgets are invalid configuration
    with pytest.raises(ValueError, match="query_fuel_budget"):
        fuel.validate_budget(0)
    with pytest.raises(ValueError, match="query_fuel_budget"):
        fuel.validate_budget(-5)
    assert fuel.validate_budget(1) == 1


# ── engine admission ────────────────────────────────────────────────────────


def test_default_budget_admits_without_probing(built):
    """The pessimistic pass must keep ADMISSION zero-job: charging fuel
    under the default budget resolves NO doc frequencies.  (Execution
    itself probes-and-caches novel terms by design — the admission check
    is scoped to _charge_fuel, not the whole search.)"""
    from frankensearch_spark.plans.eval import compile_query
    from frankensearch_spark.plans.query import canonicalize_query

    engine = built.engine
    assert engine.query_fuel_budget == fuel.DEFAULT_QUERY_FUEL_BUDGET
    before = dict(engine._doc_freq_cache)
    plan = compile_query(canonicalize_query(engine._parse("common")))
    charged = engine._charge_fuel(plan)
    assert charged is not None
    assert engine._doc_freq_cache == before  # admission did not probe
    result = built.search("common", limit=5)
    assert len(result.hits) > 0
    assert engine.last_fuel_units is not None
    # the charge rides the result (the profile-receipt fuel counter)
    assert result.fuel_units == engine.last_fuel_units


def test_exhaustion_raises_with_consumed_and_budget(built, spark, tmp_path_factory):
    tiny = LexicalIndex(spark, built.index_dir, query_fuel_budget=1)
    with pytest.raises(fuel.QueryFuelExhausted) as exc:
        tiny.search("common w1 w2", limit=5)
    assert exc.value.budget == 1
    assert exc.value.consumed > 1
    assert f"{exc.value.consumed}/1 units" in str(exc.value)


def test_exact_pass_rescues_rare_term(built, spark):
    """Budget below the pessimistic bound but above the exact charge:
    the engine resolves the real df (one probe) and admits the query."""
    probe = built.engine
    seg = len(probe.live_segments)
    # pessimistic bound for one term: blocks(doc_count) + seg
    pessimistic = -(-probe.doc_count // 128) + seg
    rescued = LexicalIndex(spark, built.index_dir, query_fuel_budget=seg + 1)
    assert seg + 1 < pessimistic  # the pessimistic pass must overflow
    eng = rescued.engine
    assert eng._doc_freq_cache == {}
    hits = rescued.search("unique7", limit=5).hits  # df = 1: one block
    assert list(hits["doc_id"]) == ["d0007"]
    assert eng._doc_freq_cache  # exact pass probed the dictionary
    assert eng.last_fuel_units is not None
    assert eng.last_fuel_units <= seg + 1


def test_fuel_estimate_is_deterministic(built):
    engine = built.engine
    built.search("common w1", limit=5)
    first = engine.last_fuel_units  # may be the pessimistic bound
    engine._query_cache.clear()  # force re-execution, keep the df cache
    built.search("common w1", limit=5)
    second = engine.last_fuel_units  # exact iff something resolved the dfs
    engine._query_cache.clear()
    built.search("common w1", limit=5)
    # same snapshot + same cache state -> identical charge; the bound can
    # only tighten (pessimistic >= exact), never wander
    assert engine.last_fuel_units == second
    assert first >= second


def test_zero_budget_rejected_at_open(built, spark):
    with pytest.raises(ValueError, match="query_fuel_budget"):
        _ = LexicalIndex(spark, built.index_dir, query_fuel_budget=0).engine


# ── glob bound soundness (round-4 fix: pessimistic must dominate exact) ────


def test_unresolved_glob_bound_dominates_worst_case_exact():
    """The cold (unresolved) glob charge must be >= the exact charge for
    EVERY possible expansion — including the adversarial one the old
    formula waved through (16,384 terms, each df = doc_count)."""
    from frankensearch_spark.plans import glob as globmod

    leaf = LeafSpec(leaf_id=0, kind="glob", field="content", pattern="w*")
    n, seg = 10**9, 4
    limit = globmod.DEFAULT_GLOB_EXPANSION_LIMIT
    pessimistic, exact_flag = fuel.estimate_fuel(
        _plan(leaf), n_segments=seg, doc_count=n,
        df_of=lambda l: None, glob_expansion=lambda l: None,
    )
    assert exact_flag is False
    worst = [(f"t{i}", n) for i in range(limit)]
    exact, exact_flag2 = fuel.estimate_fuel(
        _plan(leaf), n_segments=seg, doc_count=n,
        df_of=lambda l: None, glob_expansion=lambda l: worst,
    )
    assert exact_flag2 is True
    assert pessimistic >= exact  # the documented upper-bound invariant


def test_field_postings_cap_tightens_without_undercharging():
    """Σ_t df_t is bounded by the field's posting pairs; passing that
    statistic tightens the cold bound but never below a feasible exact
    charge (every feasible expansion satisfies Σ df_i <= total)."""
    leaf = LeafSpec(leaf_id=0, kind="glob", field="content", pattern="w*")
    n, seg, total = 10**9, 2, 500_000
    loose, _ = fuel.estimate_fuel(
        _plan(leaf), n_segments=seg, doc_count=n,
        df_of=lambda l: None, glob_expansion=lambda l: None,
    )
    capped, _ = fuel.estimate_fuel(
        _plan(leaf), n_segments=seg, doc_count=n,
        df_of=lambda l: None, glob_expansion=lambda l: None,
        field_postings_of=lambda f: total,
    )
    assert capped < loose
    # feasible expansion under the cap: k terms summing to `total`
    feasible = [(f"t{i}", total // 100) for i in range(100)]
    exact, _ = fuel.estimate_fuel(
        _plan(leaf), n_segments=seg, doc_count=n,
        df_of=lambda l: None, glob_expansion=lambda l: feasible,
    )
    assert capped >= exact


def test_adversarial_glob_is_rejected_not_admitted(built, spark):
    """A wide-expansion glob whose exact estimate exceeds the budget must
    raise QueryFuelExhausted — the old pessimistic formula admitted it
    cold (the admission gate failed open for exactly this query class)."""
    engine = built.engine
    seg = len(engine.live_segments)
    # 'unique*' expands to ~300 terms of df=1: exact ≈ 300 + seg + 300
    budget = 50
    tight = LexicalIndex(spark, built.index_dir, query_fuel_budget=budget)
    with pytest.raises(fuel.QueryFuelExhausted) as exc:
        tight.search("content:unique*", limit=5)
    assert exc.value.budget == budget
    assert exc.value.consumed > budget
    # the same engine still admits a narrow glob (exact pass, not a ban)
    hits = tight.search("content:unique7*", limit=20).hits
    assert len(hits) >= 1


def test_cached_expansion_never_flips_admission(built, spark):
    """'Bound only tightens': a glob admitted cold must stay admitted once
    its expansion is cached by an earlier query (the round-3 formula broke
    this — cold pessimistic could sit BELOW the cached exact charge)."""
    eng = LexicalIndex(spark, built.index_dir).engine
    plan_leaf = LeafSpec(leaf_id=0, kind="glob", field="content", pattern="w*")
    plan = _plan(plan_leaf)

    def run_estimate():
        return fuel.estimate_fuel(
            plan,
            len(eng.live_segments),
            eng.doc_count,
            lambda l: eng._doc_freq_cache.get((l.field, l.term)),
            lambda l: eng._glob_cache.get((l.field, l.pattern)),
            field_postings_of=lambda f: eng.field_tokens.get(f),
        )

    cold, cold_exact = run_estimate()
    assert cold_exact is False
    eng._expand_glob_with_df("content", "w*")  # cache the expansion
    warm, warm_exact = run_estimate()
    assert warm_exact is True
    assert warm <= cold
