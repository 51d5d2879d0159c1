#!/usr/bin/env python3
"""Scaling-efficiency evidence: the same index-build job at N and 4N cores.

The north rule's two-cluster-size criterion (reference analogue QG-8:
16-thread >= 1.8x own 4-thread bulk indexing) cannot use a real cluster in
this sandbox; it is evidenced by running the IDENTICAL job — fixed segment
count, fixed shuffle partitioning, fixed materialized parquet input — at
two ``local[N]`` parallelism levels in separate JVMs.  Only the core count
differs, exactly as executor count is the only difference between two
cluster sizes.

Method notes (all visible in the child code below):

* steady state: a warm-up build JIT-compiles every stage and spawns the
  Python UDF workers before the timed run;
* the corpus is materialized to parquet first — the engine's contract is
  a parquet/Iceberg input table, and timing the synthetic generator would
  charge the build for three re-executions of the generator expressions;
* work dirs sit on RAM-backed storage so the one shared virtual disk does
  not serialize the comparison (a cluster's object store scales with
  nodes);
* the sandbox VM shows bursty CPU steal, so each config can be repeated
  and the best run kept (min-wall estimation).

Usage:  python bench_scaling.py [n_turns] [repeats]
Env:    SCALE_LO / SCALE_HI (default 1 / 4)
Writes BENCH.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, "@REPO@")
os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
from frankensearch_spark.session import get_spark
from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.sources.transcripts import synthetic_transcripts

cores = int(sys.argv[1]); n_turns = int(sys.argv[2])
# The JOB is identical at every parallelism level: fixed segment count,
# fixed shuffle partitioning, fixed input partitioning (a real cluster
# sizes partitions to the data; core count only sets concurrency).
SEGMENTS, PARTITIONS = 16, 64
spark = get_spark(app_name=f"scaling-{cores}", cores=cores, shuffle_partitions=PARTITIONS)
spark.sparkContext.setLogLevel("ERROR")
shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
work = tempfile.mkdtemp(prefix=f"fs_scale_{cores}_", dir=shm)
try:
    warm = synthetic_transcripts(spark, 20_000, partitions=PARTITIONS)
    LexicalIndex.build_transcripts(
        spark, warm, os.path.join(work, "warm"), num_segments=SEGMENTS, num_buckets=16
    )
    src = os.path.join(work, "transcripts")
    synthetic_transcripts(spark, n_turns, partitions=PARTITIONS).write.mode(
        "overwrite"
    ).parquet(src)
    transcripts = spark.read.parquet(src)
    t0 = time.time()
    index = LexicalIndex.build_transcripts(
        spark, transcripts, os.path.join(work, "ix"),
        num_segments=SEGMENTS, num_buckets=16,
    )
    build_sec = time.time() - t0
    index.search("w3", limit=10)  # warm query path
    t0 = time.time()
    for q in ["w3", "w3 w47 w200 w1150", "w12 AND w47"]:
        index.search(q, limit=10)
    query_sec = (time.time() - t0) / 3
    print(json.dumps({"cores": cores, "build_sec": round(build_sec, 2),
                      "turns_per_sec": round(n_turns / build_sec, 1),
                      "query_avg_sec": round(query_sec, 3)}))
finally:
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
"""


def run(cores: int, n_turns: int, attempts: int = 3) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    last_err = ""
    for _ in range(attempts):
        out = subprocess.run(
            [sys.executable, "-c", CHILD.replace("@REPO@", repo), str(cores), str(n_turns)],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        last_err = out.stderr[-4000:]
    raise RuntimeError(f"child failed (cores={cores}):\n{last_err}")


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    lo = int(os.environ.get("SCALE_LO", "1"))
    hi = int(os.environ.get("SCALE_HI", "4"))
    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        runs_hi.append(run(hi, n_turns))
        runs_lo.append(run(lo, n_turns))
    r_lo = max(runs_lo, key=lambda r: r["turns_per_sec"])
    r_hi = max(runs_hi, key=lambda r: r["turns_per_sec"])
    ratio = hi / lo
    eff = r_hi["turns_per_sec"] / (ratio * r_lo["turns_per_sec"])
    result = {
        "metric": f"index-build scaling efficiency (N={lo} vs {ratio:.0f}N={hi} local cores)",
        "n_turns": n_turns,
        "runs": {str(lo): r_lo, str(hi): r_hi},
        "speedup": round(r_hi["turns_per_sec"] / r_lo["turns_per_sec"], 3),
        "efficiency": round(eff, 3),
        "gate": "efficiency >= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "BENCH.json"), "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
