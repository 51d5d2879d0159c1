#!/usr/bin/env python3
"""A/B: multi-leaf pivot execution under (AQE on, 64 shuffle partitions)
vs (AQE off, 8 fixed partitions) at bench scale (dev tool).

BENCH.md round 3 established AQE-on beats AQE-off at the SAME 64-partition
setting for pivot plans; this asks the sharper question — is the win from
adaptivity, or just from coalescing 64 tiny partitions (which a small
fixed count gets for free, minus AQE's per-query-stage job)?

Usage: python scripts/ab_pivot_shuffle.py [n_turns]
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
    ("multi_term_or", "w3 w47 w200 w1150"),
    ("boolean_and", "w12 AND w47"),
    ("boolean_not", "w3 -w47"),
]


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab-pivot", cores=cpus, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="fs_ab_", dir="/dev/shm")
    try:
        corpus = synthetic_transcripts(spark, n_turns, partitions=64)
        idx = LexicalIndex.build_transcripts(
            spark, corpus, os.path.join(work, "ix"), num_segments=16, num_buckets=16
        )
        engine = idx.engine

        def best(qs, rounds=5):
            b = float("inf")
            for _ in range(rounds):
                engine._query_cache.clear()
                t0 = time.time()
                idx.search(qs, limit=10)
                b = min(b, time.time() - t0)
            return b

        configs = [
            ("aqe_on_64", {"spark.sql.adaptive.enabled": "true",
                           "spark.sql.shuffle.partitions": "64"}),
            ("aqe_off_8", {"spark.sql.adaptive.enabled": "false",
                           "spark.sql.shuffle.partitions": "8"}),
            ("aqe_on_8", {"spark.sql.adaptive.enabled": "true",
                          "spark.sql.shuffle.partitions": "8"}),
        ]
        results = {}
        for name, qs in QUERIES:
            idx.search(qs, limit=10)  # warm
            row = {}
            for label, conf in configs:
                for k, v in conf.items():
                    spark.conf.set(k, v)
                row[label] = round(best(qs), 3)
            results[name] = row
            print(name, row)
        print(results)
    finally:
        for k, v in (("spark.sql.adaptive.enabled", "true"),
                     ("spark.sql.shuffle.partitions", "64")):
            spark.conf.set(k, v)
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
