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

Usage:  python bench_scaling.py [n_turns] [paired_rounds]
Env:    SCALE_LO / SCALE_HI (default 1 / 4)
Writes BENCH.json and prints one JSON line.  Each round runs lo then hi
back-to-back (same host-weather window); the reported efficiency is the
median of per-round ratios.
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

cores = int(sys.argv[1]); n_turns = int(sys.argv[2]); src = sys.argv[3]
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


def _materialize_corpus(n_turns: int) -> str:
    """Generate the shared input table ONCE (deterministic; every child
    reads the same parquet — the engine's contract is a materialized
    table, and per-child regeneration would add an unmeasured variance
    source)."""
    import tempfile

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    src = os.path.join(tempfile.mkdtemp(prefix="fs_scale_src_", dir=shm), "transcripts")
    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "from frankensearch_spark.session import get_spark\n"
        "from frankensearch_spark.sources.transcripts import synthetic_transcripts\n"
        "spark = get_spark(app_name='scale-gen', cores=8, shuffle_partitions=64)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "synthetic_transcripts(spark, %d, partitions=64).write.mode('overwrite').parquet(%r)\n"
        "spark.stop()\n"
    ) % (os.path.dirname(os.path.abspath(__file__)), n_turns, src)
    subprocess.run([sys.executable, "-c", gen], check=True, timeout=900)
    return src


def _host_counters() -> tuple[float, float, float]:
    """(wall_sec, busy_ticks, steal_ticks) from /proc/stat — the hypervisor
    steal counter is the direct witness of the sandbox's bursty host noise
    (identical builds measure 6s..120s across weather windows)."""
    import time as _t

    with open("/proc/stat") as fh:
        f = fh.readline().split()
    busy = int(f[1]) + int(f[2]) + int(f[3])
    steal = int(f[8]) if len(f) > 8 else 0
    return _t.time(), busy, steal


def run(cores: int, n_turns: int, src: str, attempts: int = 3) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    last_err = ""
    for _ in range(attempts):
        t0, _, s0 = _host_counters()
        out = subprocess.run(
            [sys.executable, "-c", CHILD.replace("@REPO@", repo), str(cores), str(n_turns), src],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        t1, _, s1 = _host_counters()
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                r = json.loads(line)
                # machine-wide steal % over the child's window (steal hits
                # all CPUs, so normalize by the whole box, not the child's
                # core count): ~3% is this host's background hum; >>10%
                # marks a weather window that corrupts the ratio.
                ncpu = os.cpu_count() or 1
                r["host_steal_pct"] = round(
                    100.0 * (s1 - s0) / max(1.0, ncpu * 100.0 * (t1 - t0)), 1
                )
                return r
        last_err = out.stderr[-4000:]
    raise RuntimeError(f"child failed (cores={cores}):\n{last_err}")


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = int(os.environ.get("SCALE_LO", "1"))
    hi = int(os.environ.get("SCALE_HI", "4"))
    ratio = hi / lo
    # PAIRED rounds: the sandbox host shows bursty multiplicative noise
    # (identical back-to-back 4-core builds have measured 126s..238s), so a
    # lo run and a hi run from different weather windows corrupt the ratio.
    # Each round runs lo then hi immediately after (same window); the
    # efficiency estimate is the MEDIAN of per-round ratios — unbiased
    # under window-level noise, unlike best-of-config which pairs one
    # config's lucky window with the other's unlucky one.
    src = _materialize_corpus(n_turns)
    rounds = []
    for i in range(repeats):
        r_lo = run(lo, n_turns, src)
        r_hi = run(hi, n_turns, src)
        eff_i = r_hi["turns_per_sec"] / (ratio * r_lo["turns_per_sec"])
        rounds.append({"lo": r_lo, "hi": r_hi, "efficiency": round(eff_i, 3)})
        print(json.dumps({"round": i, **rounds[-1]}))
    effs = sorted(r["efficiency"] for r in rounds)
    eff = effs[len(effs) // 2]
    median_round = next(r for r in rounds if r["efficiency"] == eff)
    result = {
        "metric": f"index-build scaling efficiency (N={lo} vs {ratio:.0f}N={hi} local cores)",
        "n_turns": n_turns,
        "method": "median of per-round paired ratios (lo/hi back-to-back per round)",
        "runs": {str(lo): median_round["lo"], str(hi): median_round["hi"]},
        "rounds": rounds,
        "speedup": round(eff * ratio, 3),
        "efficiency": eff,
        "gate": "efficiency >= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "BENCH.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    import shutil

    shutil.rmtree(os.path.dirname(src), ignore_errors=True)


if __name__ == "__main__":
    main()
