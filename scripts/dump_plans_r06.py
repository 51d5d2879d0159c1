#!/usr/bin/env python3
"""Round-6 measurement + plan-artifact dump (dev tool).

For every declared entry query: time the DataFrame via the noop sink
(guide §1.4 — computes every column, discards the write) and save
``explain("formatted")`` under ``plans/r06/<name>_after.txt``.

For the BM25 rows the returned frame is a LocalRelation (the engine
collects k winners), so the meaningful plans are the ENGINE's internal
ones: the scored frame per bench query class and the hydration
point-read.  Those are captured separately with before/after semantics:
"before" = the distributed hydration plan (still constructible — it is
the fast path's fallback), "after" = the same scored plan plus the
driver-side point-read note (the plan no longer schedules a job).

Usage: python scripts/dump_plans_r06.py [sf_dir]
"""
from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from frankensearch_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.makedirs(OUT, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="plans-r06", cores=cpus, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for name, fn in entry.queries().items():
        spark.sparkContext.setJobDescription(f"r06-plan: {name}")
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            build_sec = time.time() - t0
            plan = formatted(df)
            best = None
            for _ in range(2):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results.append((name, build_sec, best))
            with open(os.path.join(OUT, f"{name}_after.txt"), "w") as fh:
                fh.write(
                    f"# {name} @ {sf_dir}\n"
                    f"# frame construction: {build_sec*1000:.0f} ms; "
                    f"noop-sink execution best-of-2: {best*1000:.0f} ms\n"
                    f"# (BM25 rows return a LocalRelation of the k winners —\n"
                    f"#  see bm25_scored_*.txt for the engine-internal plans)\n\n"
                )
                fh.write(plan)
            print(f"{name:28s} build {build_sec*1000:6.0f} ms  noop {best*1000:6.0f} ms")
        except Exception as e:  # pragma: no cover - dev tool
            print(f"{name}: FAILED {e}")
        finally:
            spark.sparkContext.setJobDescription(None)

    # ── engine-internal plans for the BM25 classes ────────────────────
    idx = entry._index(spark, sf_dir)
    engine = idx.engine
    from frankensearch_spark.plans.eval import compile_query
    from frankensearch_spark.plans import query as q

    for name, qs in [
        ("bm25_scored_single_term", "spark"),
        ("bm25_scored_multi_term", entry.FLAGSHIP_QUERY),
        ("bm25_scored_boolean_and", "spark AND merge"),
        ("bm25_scored_boolean_not", "spark -merge"),
        ("bm25_scored_phrase", '"value table"'),
    ]:
        tree = engine._parse(qs)
        plan = compile_query(q.canonicalize_query(tree))
        scored = engine._evaluate(plan)
        with open(os.path.join(OUT, f"{name}_after.txt"), "w") as fh:
            fh.write(
                f"# scored frame for {qs!r} @ {sf_dir} — the plan the top-k\n"
                f"# action executes (prepared-plan cache returns this SAME\n"
                f"# unexecuted frame on repeat queries; hydration of the k\n"
                f"# winners is a driver-side pyarrow point-read, no 2nd job)\n\n"
            )
            fh.write(formatted(scored))
    # the hydration plan that USED to run as a scheduled job per query
    # (still the gated fallback) — captured as the before-artifact
    docs = engine._read_live("docs")
    import pyspark.sql.functions as F

    hydra = engine._without_aqe(
        docs.where(F.col("docid").isin([1, 2, 3])).select("docid", "doc_id")
    )
    with open(os.path.join(OUT, "hydration_point_read_before.txt"), "w") as fh:
        fh.write(
            "# winner hydration BEFORE round 6: this plan ran as a second\n"
            "# scheduled Spark job on every query (~90-170 ms fixed).  It\n"
            "# remains the fallback when the driver-side pyarrow point-read\n"
            "# declines (non-local format, non-primitive hydrate columns,\n"
            "# row groups over the 32 MB budget).\n\n"
        )
        fh.write(formatted(hydra))
    with open(os.path.join(OUT, "hydration_point_read_after.txt"), "w") as fh:
        fh.write(
            "# winner hydration AFTER round 6: served by\n"
            "# SearchEngine._point_read_docs_driver — manifest spans pick the\n"
            "# <=k segment dirs, docid min/max row-group statistics pick the\n"
            "# <=k row groups, pyarrow reads only the requested columns under\n"
            "# a 32 MB budget.  Zero Spark jobs; no plan executes.  Job-count\n"
            "# evidence: scripts/profile_query_jobs.py — term/boolean queries\n"
            "# 2 jobs -> 1, phrase 3 -> 2 (tests/test_query_fastpaths.py pins\n"
            "# result equality against the fallback plan).\n"
        )
    print("plan artifacts written to", OUT)
    spark.stop()


if __name__ == "__main__":
    main()
