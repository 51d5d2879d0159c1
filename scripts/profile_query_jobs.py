#!/usr/bin/env python3
"""Per-query Spark job accounting for the bench queries (dev tool).

Builds the bench-sized transcript index, then runs each headline query
steady-state and reports wall time, number of Spark jobs, number of
stages, and total task count per query (from the status tracker).  The
instrument for the round-4 latency pass: at sf0.1 most of the remaining
p50 is fixed scheduling overhead, so the lever is JOB COUNT, not per-row
work.

Usage: python scripts/profile_query_jobs.py [n_turns]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frankensearch_spark.index import LexicalIndex  # noqa: E402
from frankensearch_spark.session import get_spark  # noqa: E402
from frankensearch_spark.sources.transcripts import synthetic_transcripts  # noqa: E402

QUERIES = [
    ("single_term", "w3"),
    ("rare_term", "w9100"),
    ("multi_term_or", "w3 w47 w200 w1150"),
    ("boolean_and", "w12 AND w47"),
    ("boolean_not", "w3 -w47"),
    ("phrase", '"w3 w3"'),
    ("identifier_phrase", "pol-358"),
]


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile-qjobs", cores=cpus, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    work = tempfile.mkdtemp(prefix="fs_qjobs_", dir="/dev/shm")
    try:
        corpus = synthetic_transcripts(spark, n_turns, partitions=64)
        idx = LexicalIndex.build_transcripts(
            spark, corpus, os.path.join(work, "ix"), num_segments=16, num_buckets=16
        )
        engine = idx.engine
        for name, qs in QUERIES:
            idx.search(qs, limit=10)  # warm
            best, jobs, stages, tasks = float("inf"), 0, 0, 0
            for i in range(3):
                engine._query_cache.clear()
                group = f"q-{name}-{i}"  # fresh group per iteration
                sc.setJobGroup(group, name)
                t0 = time.time()
                idx.search(qs, limit=10)
                dt = time.time() - t0
                new = list(tracker.getJobIdsForGroup(group) or [])
                if dt < best:
                    best = dt
                    jobs = len(new)
                    stages = tasks = 0
                    for j in new:
                        info = tracker.getJobInfo(j)
                        if info is None:
                            continue
                        stages += len(info.stageIds)
                        for sid in info.stageIds:
                            sinfo = tracker.getStageInfo(sid)
                            if sinfo is not None:
                                tasks += sinfo.numTasks
                sc.setJobGroup(None, None)
            print(
                f"{name:18s} {best*1000:7.0f} ms  jobs={jobs:2d} "
                f"stages={stages:2d} tasks={tasks:4d}"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
