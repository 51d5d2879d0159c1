"""Rank-safe block-max pruned top-k execution (two-pass DataFrame plan).

Distributed analogue of the reference's MaxScore / Block-Max-WAND pruning
(reference: ``argus.rs:4464-4800`` strategy selection,
``quiver.rs:1719-1790`` BlockMaxEntry::score_upper_bound,
``contract.rs:306-367`` conservative block codes).  The reference skips
posting blocks whose score upper bound cannot beat the running k-th score;
Catalyst cannot derive this domain pruning, so it is expressed structurally
as a two-pass plan (SURVEY §4.1):

Pass 1 (threshold seed): the few highest-upper-bound blocks per term are
decoded and scored exactly; the k-th best observed doc total is a valid
**lower bound** τ on the true k-th best score (every sampled doc's sampled
sum ≤ its true score).

Pass 2 (pruned evaluation):

* per-leaf ceiling ``σ_t = max block ub`` (MaxScore's term bound);
* **non-essential leaves**: the maximal σ-ascending prefix with
  ``Σ σ < τ`` — docs matching only those leaves cannot reach τ, so those
  leaves never *generate* candidates (their postings are decoded only for
  docs that already are candidates);
* **essential block filter**: an essential leaf's block survives only when
  ``ub_block + Σ_{other leaves} σ ≥ τ`` (the BMW block skip);
* surviving blocks explode into a candidate docid set; all leaves'
  postings join that set; exact float32 scoring + the shared eval tree +
  global top-k run as in the exhaustive path.

Rank-exactness: pruning decisions use conservative float64 bounds inflated
by ``BOUND_SLACK`` and strict comparisons, and every surviving candidate is
re-scored with the exact float32 contract — so the result is identical
(scores AND tie-breaks) to the exhaustive plan.  The exhaustive path stays
the conformance anchor; the differential test asserts equality.

At cluster scale this is the path that matters: a 1000-executor top-10
query over a 10^12-turn index decodes a handful of blocks per term instead
of the full posting lists, and the candidate set entering the score
shuffle is O(k + essential postings) instead of O(total postings).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.eval import EvalPlan
from ..plans.localrel import values_frame

#: Multiplicative slack applied to f64 upper bounds / thresholds so that
#: float32-vs-float64 rounding can never turn a safe prune into a rank
#: change (bounds go up, the threshold goes down).
BOUND_SLACK = 1e-5

#: Strategy-selection constants, mirrored from the reference
#: (``argus.rs:29-31``): MaxScore for 2..=8 direct term clauses, Block-Max
#: WAND for >=9 clauses whose summed cost (doc freq) reaches 16,384.
MAX_SCORE_MAX_CLAUSES = 8
BMW_MIN_CLAUSES = MAX_SCORE_MAX_CLAUSES + 1
BMW_MIN_TOTAL_COST = 16_384

#: Cost floor for auto-engaging EITHER pruned shape, on top of the
#: reference's structural gates.  The reference applies pruning adaptively
#: per 4,096-doc union window against a live cutoff (``argus.rs:4491-4497``)
#: at nanosecond overhead, so its absolute cost gate (16,384) is tiny; the
#: Spark analogue is a per-QUERY decision with a two-pass plan whose
#: scheduling + bound-filter cost SCALES WITH BLOCK COUNT, not just a
#: constant.  Round-4 measurement (BENCH.md, fixed 16-segment config,
#: frequent 4-term disjunction, rank-identical both ways):
#:
#:   summed df   659k    2.2M    6.6M    13.2M (old floor engaged here)
#:   pruned/exh  5.24x   3.23x   2.71x   2.33x
#:
#: Pruned's absolute slope (~0.6 s per 1M df: bound pass + 40-65%
#: surviving decode + full rescore) exceeds the vectorized exhaustive
#: scan's (~0.24 s/M df) on the synthetic zipf corpus, so the old 10M
#: floor auto-picked a 2.3x SLOWER plan at its own engagement point.
#: Pruning's winning regime needs decode IO to dominate scheduling AND a
#: selective tau (the sandbox corpus keeps 60% of blocks; skewed real
#: scores keep far fewer), which no feasible sandbox corpus reaches —
#: the default floor therefore sits at 10^9 summed postings (a regime
#: where the exhaustive scan moves ~TBs through the pivot and the block
#: filter's savings are IO-bound, not job-bound).  Engines expose it as
#: ``auto_prune_min_cost`` so selective-workload deployments tune it
#: down with their own measurements; ``prune=True`` forces the pruned
#: plan unconditionally (rank-safety is identical either way).
AUTO_PRUNE_MIN_COST = 1_000_000_000


def select_strategy(engine, plan: EvalPlan) -> Optional[str]:
    """Auto dispatch: pick the pruning strategy the reference would.

    Mirror of ``argus.rs:4464-4529``: 2..=8 direct term clauses ->
    ``"maxscore"``; >=9 clauses with summed doc-freq cost >=
    ``BMW_MIN_TOTAL_COST`` -> ``"bmw"``; anything else -> ``None``
    (exhaustive).  Clause counts use LIVE leaves (df > 0) — a vanished
    term contributes neither a cursor nor cost in the reference either.
    Both strategies execute the same rank-safe two-pass plan here
    (:class:`PrunedExecutor` fuses the MaxScore essential-list split with
    the BMW block filter); the dispatch decides *whether* the pruned plan
    runs, which is the reference's actual selection semantics.
    """
    if not pruned_applicable(plan, is_text=engine._is_text):
        return None
    if len(plan.leaves) < 2:
        return None  # one cursor never prunes (both gates need >=2 clauses)
    cache = engine._doc_freq_cache
    if any((leaf.field, leaf.term) not in cache for leaf in plan.leaves):
        # Zero-job admission gate: summed cost is bounded by
        # n_leaves x doc_count (df <= N per leaf), so below every
        # strategy's floor the dictionary probe cannot change the
        # decision — skip it and keep the cold multi-term query free of
        # the driver-side probe job (the in-plan dictionary fold then
        # keeps weight resolution inside the main action too).  On a
        # corpus big enough that the bound crosses the floor, the probe
        # runs and pays for itself by unlocking the pruned plan.
        floor = max(1, engine.auto_prune_min_cost)
        if len(plan.leaves) * engine.doc_count < floor:
            return None
        engine._resolve_doc_freqs(plan.leaves)
    costs = [
        engine._doc_freq_cache.get((l.field, l.term), 0) for l in plan.leaves
    ]
    live = [c for c in costs if c > 0]
    n = len(live)
    total_cost = sum(live)
    floor = engine.auto_prune_min_cost
    if 2 <= n <= MAX_SCORE_MAX_CLAUSES:
        if total_cost >= floor:
            return "maxscore"
        return None
    if n >= BMW_MIN_CLAUSES and total_cost >= max(BMW_MIN_TOTAL_COST, floor):
        return "bmw"
    return None


def pruned_applicable(plan: EvalPlan, is_text=None) -> bool:
    """True when the eval spec is a pure term-disjunction the pruner covers.

    Required shape: every leaf is a text-field term; the spec is a single
    leaf, a union of leaves, or a Boolean with Should-only children that
    are leaves/unions (score == sum of matched leaf scores).

    ``is_text`` is the engine's field-type predicate.  Keyword/i64 term
    leaves score as exact-match constants via the docs table, which the
    pruned executor does not cover — admitting them would silently drop
    their contribution from the top-k (rank-safety violation), so any
    non-text leaf disqualifies the plan.  ``None`` (shape-only callers,
    e.g. unit tests over the all-text default schema) skips the check.
    """
    if plan.spec is None:
        return False
    if not plan.leaves or any(l.kind != "term" for l in plan.leaves):
        return False
    if is_text is not None and not all(is_text(l.field) for l in plan.leaves):
        return False

    def pure_sum(node: dict) -> bool:
        t = node.get("t")
        if t == "leaf":
            return True
        if t == "union":
            return all(pure_sum(c) for c in node["ch"])
        if t == "bool":
            return (
                not node["must"]
                and not node["not"]
                and all(pure_sum(c) for c in node["should"])
            )
        return False

    return pure_sum(plan.spec)


class PrunedExecutor:
    """Bound to one SearchEngine; executes the two-pass pruned plan.

    Observability: when the engine sets ``collect_prune_metrics = True``,
    :meth:`execute` records ``engine.last_prune_metrics`` with the block
    accounting (total query-term blocks vs blocks surviving the BMW
    filter, the non-essential split, τ) — the evidence that the pruned
    plan decodes strictly less than the exhaustive one.  Off by default:
    the extra counts are two small jobs the latency path must not pay.
    """

    def __init__(self, engine):
        self.engine = engine

    # ── block metadata with upper bounds ─────────────────────────────────

    def _block_frame(self, leaves) -> Optional[DataFrame]:
        """(leaf_id, field, term, segment_id, block_id, ub) for all blocks
        of the query terms, with conservative f64 upper bounds computed
        JVM-side from the inline BLOCKMAX columns."""
        engine = self.engine
        rows = []
        for leaf in leaves:
            df_ = engine._doc_freq_cache.get((leaf.field, leaf.term))
            if not df_:
                continue
            from ..functions.contract import term_weight

            weight = float(term_weight(df_, engine.doc_count, leaf.boost))
            rows.append((leaf.leaf_id, leaf.field, leaf.term, weight))
        if not rows:
            return None
        qterms = values_frame(
            engine.spark, rows, "leaf_id int, field string, term string, weight double"
        )
        buckets = sorted(
            {engine_bucket(t, engine.meta.num_buckets) for _, _, t, _ in rows}
        )
        postings = engine._read_live("postings").where(F.col("bucket").isin(buckets))
        joined = postings.join(
            F.broadcast(qterms), on=["field", "term"], how="inner"
        )
        # norm(min_fnid) per field via a 256-literal decode array (JVM-side)
        norm_expr = None
        for field, cache in engine.tf_cache.items():
            if cache is None:
                continue
            arr = F.array(*[F.lit(float(v)) for v in cache])
            e = F.element_at(arr, F.col("min_fnid") + 1)
            norm_expr = e if norm_expr is None else F.when(
                F.col("field") == field, e
            ).otherwise(norm_expr)
        mf = F.when(F.col("max_freq_code") >= 255, F.lit(float(2**32))).otherwise(
            F.col("max_freq_code").cast("double")
        )
        ub = (
            F.col("weight") * (mf / (mf + norm_expr)) * F.lit(1.0 + BOUND_SLACK)
        ).alias("ub")
        return joined.select(
            "leaf_id", "field", "term", "segment_id", "block_id", ub
        )

    # ── pass 1: threshold seed ───────────────────────────────────────────

    def _seed_threshold(self, blocks: DataFrame, leaves, k: int) -> float:
        """Exactly score the top-ub blocks per leaf; return the k-th best
        sampled doc total (deflated), or -inf when fewer than k docs."""
        per_leaf = max(1, -(-k // 128)) + 1
        w = Window.partitionBy("leaf_id").orderBy(F.desc("ub"), F.asc("block_id"))
        sample = (
            blocks.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= per_leaf)
            .select("leaf_id", "field", "term", "segment_id", "block_id")
        )
        scored = self.engine._score_block_subset(leaves, sample)
        if scored is None:
            return float("-inf")
        # Rank-safety with deletes: a tombstoned doc must not inflate τ —
        # an overstated threshold prunes blocks holding the true live
        # top-k (it would only be caught by the differential suite).
        scored = self.engine._filter_tombstones(scored)
        totals = (
            scored.groupBy("docid")
            .agg(F.sum(F.col("score").cast("double")).alias("total"))
            .orderBy(F.desc("total"))
            .limit(k)
            .collect()
        )
        if len(totals) < k:
            return float("-inf")
        return float(totals[-1]["total"]) * (1.0 - BOUND_SLACK)

    # ── full pruned execution ────────────────────────────────────────────

    def execute(self, plan: EvalPlan, k: int) -> Optional[DataFrame]:
        """Return the scored candidate DataFrame (docid, score) or None to
        signal fallback to the exhaustive path."""
        engine = self.engine
        if getattr(engine, "collect_prune_metrics", False):
            # reset so an early bail can't leave a PRIOR query's accounting
            engine.last_prune_metrics = None
        leaves = plan.leaves
        # doc freqs resolved once (engine caches them for weight computation)
        engine._resolve_doc_freqs(leaves)
        live = [
            l for l in leaves if engine._doc_freq_cache.get((l.field, l.term))
        ]
        if len(live) < 2:
            return None  # nothing to prune
        blocks = self._block_frame(live)
        if blocks is None:
            return None
        blocks = blocks.persist()
        try:
            tau = self._seed_threshold(blocks, live, k)
            if not np.isfinite(tau):
                return None  # fewer than k matches — prune nothing
            sigma = {
                r["leaf_id"]: float(r["s"])
                for r in blocks.groupBy("leaf_id").agg(F.max("ub").alias("s")).collect()
            }
            order = sorted(sigma, key=lambda lid: sigma[lid])
            total_sigma = sum(sigma.values())
            nonessential, cum = [], 0.0
            for lid in order:
                if cum + sigma[lid] < tau:
                    cum += sigma[lid]
                    nonessential.append(lid)
                else:
                    break
            essential = [lid for lid in sigma if lid not in set(nonessential)]
            if not essential:
                return None
            # BMW block filter on essential leaves: keep blocks that could
            # still beat τ together with every other leaf's ceiling.
            sigma_lit = F.create_map(
                *[F.lit(x) for pair in sigma.items() for x in pair]
            )
            surviving = (
                blocks.where(F.col("leaf_id").isin(essential))
                .withColumn(
                    "bound",
                    F.col("ub") + F.lit(total_sigma) - sigma_lit[F.col("leaf_id")],
                )
                .where(F.col("bound") >= tau)
                .select("leaf_id", "field", "term", "segment_id", "block_id")
            )
            if getattr(engine, "collect_prune_metrics", False):
                engine.last_prune_metrics = {
                    "tau": float(tau),
                    "total_blocks": int(blocks.count()),
                    "surviving_blocks": int(surviving.count()),
                    "essential_leaves": len(essential),
                    "nonessential_leaves": len(nonessential),
                }
            # Candidate generation: docids of surviving essential blocks.
            # Rank-safety: a doc in NO surviving block satisfies, for any
            # essential leaf t containing it, total ≤ ub_block(t) +
            # Σ_{t'≠t} σ < τ; a doc in no essential leaf satisfies
            # total ≤ Σ_{nonessential} σ < τ.
            cand_scored = engine._score_block_subset(live, surviving)
            if cand_scored is None:
                return None
            # Dead docs can't win (they're dropped in _combine anyway);
            # filtering here keeps the rescore join candidate-minimal.
            candidates = (
                engine._filter_tombstones(cand_scored).select("docid").distinct()
            )
            # Exact rescore of EVERY leaf restricted to the candidate set —
            # a candidate may have contributions in pruned blocks of other
            # leaves, so scores must come from the full postings, filtered
            # by docid.  The pruning win is the candidate-set reduction
            # entering the pivot/eval shuffle, not posting-scan IO.
            scored = engine._score_leaf_rows_for_docids(live, candidates)
            if scored is None:
                return None
            return engine._combine(plan, scored)
        finally:
            blocks.unpersist()


def engine_bucket(term: str, num_buckets: int) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % num_buckets
