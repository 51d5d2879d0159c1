#!/usr/bin/env python3
"""Wall-time evidence for the auto-prune dispatch (VERDICT r3/r4 items).

Two modes:

* **uniform** (default): builds the zipf transcript corpus, runs a
  frequent multi-term disjunction both ways — exhaustive and pruned
  (floor lowered so the dispatch fires on real statistics) — and prints
  wall times plus the pruned plan's block accounting.  On this corpus τ
  keeps ~60% of blocks alive, so the pruned plan is EXPECTED to lose —
  this is the regime the mid-flight selectivity bail exists for.
* **--selective**: builds a SKEWED corpus — dense terms injected into
  ~60% of turns plus rare needle terms with high tf — where τ eliminates
  >90% of blocks.  This is block-max pruning's winning regime
  (argus.rs:4700+ BMW pivot skipping) and the evidence point for the
  production admission floor + bail fraction: the pruned plan must WIN
  here with dispatch engaging UN-FORCED, rank-identical.

Usage: python scripts/bench_prune.py [n_turns] [query]
       python scripts/bench_prune.py --selective [n_turns]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frankensearch_spark.index import LexicalIndex  # noqa: E402
from frankensearch_spark.session import get_spark  # noqa: E402
from frankensearch_spark.sources.transcripts import synthetic_transcripts  # noqa: E402


def skewed_transcripts(spark, n_turns: int):
    """Zipf base corpus + 6 dense terms in ~60% of turns + 4 rare needle
    terms (df ≈ n/4,096 each — enough needle docs that the τ seed sees ≥k
    of them — repeated 8× per hit so tf saturates the norm factor and
    needle docs dominate τ).  Deterministic in n."""
    from pyspark.sql import functions as F

    base = synthetic_transcripts(spark, n_turns, partitions=64)
    rid = F.xxhash64("conv_id", "turn_idx")
    dense = F.when(
        F.pmod(rid, F.lit(10)) < 6,
        F.lit(" hay0 hay1 hay2 hay3 hay4 hay5"),
    ).otherwise(F.lit(""))
    needle = F.when(
        F.pmod(rid, F.lit(4_096)) == 7,
        F.lit(" " + (" ".join(f"needle{i}" for i in range(4)) + " ") * 8),
    ).otherwise(F.lit(""))
    return base.withColumn("text", F.concat("text", dense, needle))


SELECTIVE_QUERY = "hay0 hay1 hay2 hay3 hay4 hay5 needle0 needle1 needle2 needle3"


def main() -> None:
    selective = "--selective" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--selective"]
    n_turns = int(argv[0]) if argv else (2_000_000 if selective else 100_000)
    query = argv[1] if len(argv) > 1 else (
        SELECTIVE_QUERY if selective else "w0 w1 w2 w3"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-prune", cores=cpus, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    # FS_PRUNE_CACHE=<dir>: build once per (mode, n) under that dir and
    # reuse across invocations (the 8M evidence corpus takes minutes to
    # build); without it, a temp dir is built and removed as before.
    cache_root = os.environ.get("FS_PRUNE_CACHE")
    ephemeral = cache_root is None
    work = (
        tempfile.mkdtemp(prefix="fs_prune_", dir=shm)
        if ephemeral
        else os.path.join(
            cache_root, f"fs_prune_{'sel' if selective else 'uni'}_{n_turns}"
        )
    )
    try:
        ix_path = os.path.join(work, "ix")
        if not ephemeral and os.path.exists(os.path.join(ix_path, "index_meta.json")):
            idx = LexicalIndex(spark, ix_path)
        else:
            os.makedirs(work, exist_ok=True)
            corpus = (
                skewed_transcripts(spark, n_turns)
                if selective
                else synthetic_transcripts(spark, n_turns, partitions=64)
            )
            idx = LexicalIndex.build_transcripts(
                spark, corpus, ix_path, num_segments=16, num_buckets=16
            )
        engine = idx.engine

        def timed(prune, floor=None, bail=None):
            if floor is not None:
                engine.auto_prune_min_cost = floor
            if bail is not None:
                engine.prune_bail_fraction = bail
            best = float("inf")
            for _ in range(3):
                engine._query_cache.clear()
                t0 = time.time()
                hits = idx.search(query, limit=10, prune=prune).hits
                best = min(best, time.time() - t0)
            return best, hits

        # In selective mode the PRODUCTION floor must admit the query
        # un-forced; in uniform mode the floor is lowered so the plan runs
        # at all (the point there is measuring the losing regime).
        from frankensearch_spark.operators.pruned import (
            AUTO_PRUNE_MIN_COST,
            select_strategy,
        )
        from frankensearch_spark.plans import query as q
        from frankensearch_spark.plans.eval import compile_query

        floor = int(
            os.environ.get(
                "FS_PRUNE_FLOOR", AUTO_PRUNE_MIN_COST if selective else 1
            )
        )
        # forced-committed pruned plan (bail off) vs exhaustive
        timed(False)  # warm
        timed("auto", floor=floor, bail=1.0)  # warm
        t_ex, h_ex = timed(False)
        t_pr, h_pr = timed("auto", floor=floor, bail=1.0)
        assert list(h_ex["docid"]) == list(h_pr["docid"])
        m = dict(getattr(engine, "last_prune_metrics", None) or {})
        plan = compile_query(
            q.canonicalize_query(engine.parser.parse_lenient(query).query)
        )
        strategy = select_strategy(engine, plan)
        cost = sum(
            engine._doc_freq_cache.get((l.field, l.term), 0) for l in plan.leaves
        )
        # auto at PRODUCTION bail fraction: in the uniform regime this
        # should bail mid-flight (wasted-gamble cost = t_auto - t_ex); in
        # the selective regime it must commit and win.
        from frankensearch_spark.operators.pruned import PRUNE_BAIL_FRACTION

        t_auto, h_auto = timed("auto", floor=floor, bail=PRUNE_BAIL_FRACTION)
        assert list(h_ex["docid"]) == list(h_auto["docid"])
        auto_m = dict(getattr(engine, "last_prune_metrics", None) or {})
        print(
            {
                "mode": "selective" if selective else "uniform",
                "n_turns": n_turns,
                "query": query,
                "summed_df_cost": cost,
                "unforced_strategy": strategy,
                "exhaustive_sec": round(t_ex, 3),
                "pruned_sec": round(t_pr, 3),
                "pruned_over_exhaustive": round(t_pr / t_ex, 2),
                "auto_sec": round(t_auto, 3),
                "auto_bailed": auto_m.get("bailed"),
                "total_blocks": m.get("total_blocks"),
                "surviving_blocks": m.get("surviving_blocks"),
                "surviving_fraction": m.get("surviving_fraction"),
                "rank_identical": True,
            }
        )
    finally:
        if ephemeral:
            shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
