#!/usr/bin/env python3
"""Wall-time breakdown of one search() call per bench query (dev tool).

Monkeypatch timers around the internal phases of
``SearchEngine._search_uncached``: parse+compile, fuel, evaluate (plan
construction), the top-k action, and _materialize (hydration point
read).  Usage: python scripts/profile_query_phases.py [n_turns]
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
from frankensearch_spark.operators import search as S  # noqa: E402

QUERIES = [
    ("single_term", "w3"),
    ("rare_term", "w9100"),
    ("multi_term_or", "w3 w47 w200 w1150"),
    ("boolean_and", "w12 AND w47"),
    ("boolean_not", "w3 -w47"),
    ("phrase", '"w3 w3"'),
    ("identifier_phrase", "pol-358"),
]

phase: dict[str, float] = {}


def timed(name, fn):
    def wrapper(*a, **k):
        t0 = time.time()
        try:
            return fn(*a, **k)
        finally:
            phase[name] = phase.get(name, 0.0) + (time.time() - t0)

    return wrapper


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile-qphases", cores=cpus, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="fs_qphase_", dir="/dev/shm")

    S.SearchEngine._parse = timed("parse", S.SearchEngine._parse)
    S.SearchEngine._charge_fuel = timed("fuel", S.SearchEngine._charge_fuel)
    S.SearchEngine._evaluate = timed("evaluate(plan construction)", S.SearchEngine._evaluate)
    S.SearchEngine._materialize = timed("materialize(hydration)", S.SearchEngine._materialize)
    S.SearchEngine._resolve_doc_freqs = timed("resolve_doc_freqs", S.SearchEngine._resolve_doc_freqs)
    try:
        from frankensearch_spark.operators import pruned as P

        P.select_strategy = timed("prune_dispatch", P.select_strategy)
    except Exception:
        pass
    try:
        corpus = synthetic_transcripts(spark, n_turns, partitions=64)
        idx = LexicalIndex.build_transcripts(
            spark, corpus, os.path.join(work, "ix"), num_segments=16, num_buckets=16
        )
        engine = idx.engine
        for name, qs in QUERIES:
            engine.search(qs, limit=10)  # warm
        for name, qs in QUERIES:
            for k in list(phase):
                phase.pop(k)
            best = None
            best_phases = None
            for _ in range(3):
                for k in list(phase):
                    phase.pop(k)
                engine._query_cache.clear()
                t0 = time.time()
                engine.search(qs, limit=10)
                dt = time.time() - t0
                if best is None or dt < best:
                    best = dt
                    best_phases = dict(phase)
            rest = best - sum(best_phases.values())
            parts = "  ".join(f"{k}={v*1000:.0f}ms" for k, v in sorted(best_phases.items()))
            print(f"{name:20s} {best*1000:6.0f} ms | {parts}  action+rest={rest*1000:.0f}ms")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
