#!/usr/bin/env python3
"""Per-round benchmark: index-build throughput + BM25 query latency.

Builds the lexical index over (a) the driver-provided documents corpus at
``$SPARK_GRAFT_SF_DIR`` and (b) a deterministic synthetic transcript table
scaled to the same sf, then times the headline BM25 queries.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "turns_per_sec": ..., "docs_per_sec": ..., "query_p50_sec": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from frankensearch_spark.index import LexicalIndex  # noqa: E402
from frankensearch_spark.session import get_spark  # noqa: E402
from frankensearch_spark.sources.transcripts import synthetic_transcripts  # noqa: E402

def _host_weather_sample() -> dict:
    """(monotonic, steal ticks, psi-some µs) — cheap /proc reads.

    Steal is the direct witness of hypervisor co-tenancy (cycles the
    host gave to another guest while our vCPU was runnable); PSI
    cpu-some is the fraction of wall time ANY runnable task waited for
    a CPU (includes our own 32-thread overcommit, so it is a weaker
    witness — steal is the one that attributes a slow trial to the
    host rather than to us).  Missing files (non-Linux, no PSI) degrade
    to absent keys, never to an error."""
    out: dict = {"t": time.monotonic()}
    try:
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        out["steal"] = int(f[8]) if len(f) > 8 else 0
        out["hz"] = os.sysconf("SC_CLK_TCK")
        out["ncpu"] = os.cpu_count() or 1
    except (OSError, ValueError):
        pass
    try:
        with open("/proc/pressure/cpu") as fh:
            some = fh.readline()
        out["psi_us"] = int(some.rsplit("total=", 1)[1])
    except (OSError, ValueError, IndexError):
        pass
    return out


def _host_weather_delta(before: dict) -> dict:
    """Steal%% (of the machine's total cpu-time) and PSI cpu-some%%
    (of wall time) across the window since ``before``."""
    after = _host_weather_sample()
    wall = max(after["t"] - before["t"], 1e-9)
    out: dict = {}
    if "steal" in before and "steal" in after:
        total_ticks = before["hz"] * before["ncpu"] * wall
        out["steal_pct"] = round(
            100.0 * (after["steal"] - before["steal"]) / total_ticks, 2
        )
    if "psi_us" in before and "psi_us" in after:
        out["psi_some_pct"] = round(
            100.0 * (after["psi_us"] - before["psi_us"]) / (wall * 1e6), 1
        )
    return out


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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_turns = max(10_000, int(1_000_000 * sf))

    spark = get_spark(app_name="frankensearch-bench", cores=cpus, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="fs_bench_", dir=shm)
    queries: dict[str, float] = {}
    t_start = time.time()
    try:
        # ── transcript index build (the north-rule metric) ────────────────
        # steady-state discipline (see BENCH.md): warm-up build JITs every
        # stage; the corpus is materialized like a real input table
        warm = synthetic_transcripts(spark, 20_000, partitions=64)
        warm_index = LexicalIndex.build_transcripts(
            spark, warm, os.path.join(work, "warm"), num_segments=16, num_buckets=16
        )
        # warm every query CLASS once (single-leaf, multi-term union,
        # boolean, negation, phrase) so the timed runs below measure
        # steady-state plans, not first-use codegen/JIT of each path
        for _, warm_q in QUERIES:
            warm_index.search(warm_q, limit=10)
        src = os.path.join(work, "transcripts")
        synthetic_transcripts(spark, n_turns, partitions=64).write.mode(
            "overwrite"
        ).parquet(src)
        transcripts = spark.read.parquet(src)
        # Measure-until-stable: the sandbox VM shows multiplicative
        # host-level noise between identical runs (identical builds
        # measured anywhere from 6s to 120s across weather windows), so a
        # fixed trial count can record a number that is all weather.  Run
        # 4-10 full cold builds into fresh directories and stop once the
        # two fastest agree within 20% AND the floor has stopped improving
        # (the last two trials did not beat it) — two consecutive runs
        # inside the same slow window agree with each other, so agreement
        # alone is not evidence the floor was reached.  Min is the estimate.
        #
        # Every trial also samples the host weather across its own window
        # (hypervisor steal from /proc/stat; CPU pressure-stall "some"
        # from /proc/pressure/cpu) so the recorded floor is ATTRIBUTED:
        # a floor trial with steal means the best window this bench saw
        # was itself contended, and the number under-reports the engine.
        # A stolen floor also blocks the early stop — keep burning trials
        # hoping for a clean window (observed storms hold 6-21% steal
        # across 10+ consecutive trials, so the cap is 14; clean weather
        # still stops at 4-5).
        build_secs = []
        build_weather = []
        for trial in range(14):
            w0 = _host_weather_sample()
            t0 = time.time()
            index = LexicalIndex.build_transcripts(
                spark,
                transcripts,
                os.path.join(work, f"transcripts_index_{trial}"),
                num_segments=16,
                num_buckets=16,
            )
            build_secs.append(time.time() - t0)
            build_weather.append(_host_weather_delta(w0))
            fastest = sorted(build_secs)
            if trial < 3:
                continue
            converged = fastest[1] <= 1.2 * fastest[0]
            floor_idx = build_secs.index(min(build_secs))
            floor_is_recent = floor_idx >= len(build_secs) - 2
            floor_clean = build_weather[floor_idx].get("steal_pct", 0.0) <= 1.0
            if converged and not floor_is_recent and floor_clean:
                break
        build_sec = min(build_secs)
        floor_idx = build_secs.index(build_sec)
        queries["index_build_transcripts"] = round(build_sec, 3)
        queries["index_build_transcripts_runs"] = [round(s, 3) for s in build_secs]
        queries["index_build_steal_pct"] = [
            w.get("steal_pct") for w in build_weather
        ]
        queries["index_build_cpu_psi_some_pct"] = [
            w.get("psi_some_pct") for w in build_weather
        ]
        queries["index_build_floor_steal_pct"] = build_weather[floor_idx].get(
            "steal_pct"
        )
        turns_per_sec = n_turns / build_sec

        # warm the engine (stats load + parser) outside the per-query timings
        index.search("w3", limit=10)

        latencies = []
        for name, qstr in QUERIES:
            best = None
            for _ in range(2):  # best-of-2 against host noise
                index.engine._query_cache.clear()  # measure real work, not cache
                t0 = time.time()
                index.search(qstr, limit=10)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            queries[name] = round(best, 4)
            latencies.append(best)

        # ── engine cold-open latency (QG-9 analogue) ───────────────────────
        # reference keeper opens a 1M-doc index in <=50 ms; with the
        # commit-time open_state rollup the Spark engine open is zero jobs
        t0 = time.time()
        LexicalIndex(spark, index.index_dir).engine
        queries["engine_open_sec"] = round(time.time() - t0, 4)

        # ── incremental update throughput (streaming micro-batch ingest) ──
        # Reference lexical-pipeline contract: >=5,000 updates/s with p95
        # <= 25 ms per update (fsfs lexical_pipeline.rs:20-24).  The p95
        # target is structurally out of scope for micro-batch Spark — every
        # batch is a full upsert commit (tokenize + identity join + parquet
        # publish), a multi-hundred-ms floor per BATCH, not per update —
        # so we report honest throughput (updates/s across N micro-batches)
        # and the per-batch commit latency.
        # 8 batches of ~6,250 rows: the reference's watch-mode shape.  The
        # sink stages each batch as UNSEALED delta segments and seals on a
        # cadence (streaming/ingest.py debounce window) — best-of-2 runs
        # against host weather (each run is 8 full micro-batch commits).
        from frankensearch_spark.streaming.ingest import (
            stream_ingest,
            transcript_batch_to_docs,
        )

        # Best-of-2 on a FRESH COPY of the index per attempt: a stream of
        # upserts mutates its base (segments + tombstones), so a second
        # attempt on the live dir would ingest into a different — larger —
        # index than the first and the min() would compare non-i.i.d.
        # runs (same discipline as the catch-up floor below).
        upd_batches = 8
        upd_rows = max(8_000, n_turns // 2)  # replacements of existing turns
        best_upd_sec = None
        for attempt in range(2):
            upd_src = os.path.join(work, f"upd_src_{attempt}")
            synthetic_transcripts(
                spark, upd_rows, partitions=upd_batches, seed=77 + attempt
            ).write.mode("overwrite").parquet(upd_src)
            upd_dir = os.path.join(work, f"upd_ix_{attempt}")
            shutil.copytree(index.index_dir, upd_dir)
            upd_index = LexicalIndex(spark, upd_dir)
            stream = (
                spark.readStream.schema(transcripts.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(upd_src)
            )
            t0 = time.time()
            q_stream = stream_ingest(
                upd_index, stream, os.path.join(work, f"upd_ckpt_{attempt}"),
                trigger_available_now=True,
            )
            q_stream.awaitTermination(600)
            upd_sec = time.time() - t0
            best_upd_sec = upd_sec if best_upd_sec is None else min(best_upd_sec, upd_sec)
            shutil.rmtree(upd_dir, ignore_errors=True)
        upd_sec = best_upd_sec
        queries["incremental_updates_sec"] = round(upd_sec, 3)
        out_updates_per_sec = upd_rows / upd_sec
        queries["updates_per_sec"] = round(out_updates_per_sec, 1)
        queries["update_batch_commit_sec"] = round(upd_sec / upd_batches, 3)

        # same row COUNT in ONE commit: updates/s scales with batch size
        # because the seal-and-publish commit cost is per BATCH — this is
        # the number a bulk catch-up (bigger trigger) sees.  Fresh seed:
        # re-upserting the rows the stream just applied would measure the
        # content-hash skip-if-unchanged path, not a real commit.
        upd2 = synthetic_transcripts(spark, upd_rows, partitions=8, seed=78)
        upd_index2 = LexicalIndex(spark, index.index_dir)
        t0 = time.time()
        upd_index2.upsert(transcript_batch_to_docs(upd2))
        one_sec = time.time() - t0
        queries["updates_per_sec_single_commit"] = round(upd_rows / one_sec, 1)

        # the floor-relevant point: the reference's >=5,000 updates/s
        # contract is a sustained-throughput number; one n_turns-sized
        # catch-up commit is where the per-batch seal cost amortizes
        # enough to clear it (BENCH.md round-4 measurement).  The source
        # frame is materialized BEFORE the clock so synthetic data-gen
        # cost doesn't inflate the update number.
        # Best-of-3 on a FRESH COPY of the index per trial: a catch-up
        # commit mutates its index (segments + tombstones), so repeated
        # trials on the live dir would each measure a different base —
        # the copy keeps trials i.i.d. and the floor weather-resistant
        # (same treatment the build floor got after round 4 recorded a
        # single noisy point below the 20k contract floor).
        import shutil as _shutil

        upd3 = transcript_batch_to_docs(
            synthetic_transcripts(spark, n_turns, partitions=8, seed=79)
        ).persist()
        upd3.count()
        big_sec = None
        for trial in range(3):
            trial_dir = os.path.join(work, f"catchup_idx_{trial}")
            _shutil.copytree(index.index_dir, trial_dir)
            upd_index3 = LexicalIndex(spark, trial_dir)
            t0 = time.time()
            upd_index3.upsert(upd3)
            sec = time.time() - t0
            big_sec = sec if big_sec is None else min(big_sec, sec)
            _shutil.rmtree(trial_dir, ignore_errors=True)
        upd3.unpersist()
        # batch size == n_turns (one corpus-sized catch-up commit), so the
        # key is comparable across scale factors
        queries["updates_per_sec_single_commit_catchup"] = round(
            n_turns / big_sec, 1
        )

        # ── documents corpus build (driver-provided data) ─────────────────
        docs_path = os.path.join(sf_dir, "documents.parquet")
        docs_per_sec = None
        if os.path.exists(docs_path):
            docs = spark.read.parquet(docs_path).select(
                F.col("doc_id").cast("string").alias("doc_id"),
                F.col("text").alias("content"),
            )
            n_docs = docs.count()
            doc_secs = []
            for trial in range(3):  # min-of-3 against host weather
                t0 = time.time()
                LexicalIndex(spark, os.path.join(work, f"docs_index_{trial}")).build(
                    docs,
                    text_fields=("content",),
                    sort_cols=("doc_id",),
                    num_segments=8,
                    num_buckets=8,
                )
                doc_secs.append(time.time() - t0)
            dt = min(doc_secs)
            queries["index_build_documents"] = round(dt, 3)
            docs_per_sec = n_docs / dt

        total = time.time() - t_start
        out = {
            "metric": "transcript index build + BM25 top-10 latency",
            "value": round(total, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "n_turns": n_turns,
            "turns_per_sec": round(turns_per_sec, 1),
            "build_floor_steal_pct": queries.get("index_build_floor_steal_pct"),
            "docs_per_sec": round(docs_per_sec, 1) if docs_per_sec else None,
            "updates_per_sec": queries.get("updates_per_sec"),
            "query_p50_sec": round(statistics.median(latencies), 4),
            "cpus": cpus,
        }
        # last measured two-cluster-size scaling evidence (bench_scaling.py)
        scaling_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH.json"
        )
        if os.path.exists(scaling_path):
            with open(scaling_path) as fh:
                scaling = json.load(fh)
            out["scaling_efficiency"] = scaling.get("efficiency")
            out["scaling_runs"] = scaling.get("runs")
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
