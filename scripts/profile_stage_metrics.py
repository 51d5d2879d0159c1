#!/usr/bin/env python3
"""Per-stage executor metrics for the build's posting phase (dev tool).

Runs the build through the posting write at a given core count with the
Spark UI enabled, then dumps each completed stage's CPU time, GC time,
spill bytes, and shuffle volumes from the REST API, sorted by run time.
This is the instrument that localized the round-2 scaling loss: the
posting sort stage at 4 concurrent tasks showed +38% CPU and 402 MB of
spill vs the 1-core run of the identical job.

Usage: python scripts/profile_stage_metrics.py <cores> <n_turns>
"""
import json, os, shutil, sys, tempfile, time, urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
cores = int(sys.argv[1]); n_turns = int(sys.argv[2])
from frankensearch_spark.session import get_spark
from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.sources.transcripts import synthetic_transcripts
from frankensearch_spark.sources.storage import IndexStorage, IndexMeta
from frankensearch_spark.operators import build as B
from pyspark.sql import functions as F
from pyspark import StorageLevel
SEGMENTS, PARTITIONS = 16, 64
spark = get_spark(app_name=f"met-{cores}", cores=cores, shuffle_partitions=PARTITIONS,
                  extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"})
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix=f"fs_met_{cores}_", dir="/dev/shm")
try:
    warm = synthetic_transcripts(spark, 20_000, partitions=PARTITIONS)
    LexicalIndex.build_transcripts(spark, warm, os.path.join(work, "warm"), num_segments=SEGMENTS, num_buckets=16)
    src = os.path.join(work, "transcripts")
    synthetic_transcripts(spark, n_turns, partitions=PARTITIONS).write.mode("overwrite").parquet(src)
    df0 = spark.read.parquet(src)
    df = df0.select(
        F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string")).alias("doc_id"),
        F.col("conv_id"), F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("role"), F.col("tool"), F.col("ts").cast("timestamp").alias("ts"),
        F.col("text").alias("content"))
    meta = IndexMeta(text_fields=["content"], keyword_fields=["conv_id","role","tool"],
                     i64_fields=["turn_idx"], stored_fields=["ts","content"], num_buckets=16, positions=True)
    storage = IndexStorage(spark, os.path.join(work, "ix")); storage.write_meta(meta)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    ranged, docs_frame, slim, _n, _ns = B._assign_docids_and_tokenize(spark, df, meta, sort_cols=["conv_id","turn_idx"], num_segments=SEGMENTS, docid_base=0, segment_base=0)
    slim.persist(StorageLevel.DISK_ONLY); slim.count()
    # mark stage boundary: record job ids before postings
    st = spark.sparkContext.statusTracker
    t0 = time.time()
    B._write_postings(slim, storage, meta, "overwrite", new_segments=list(range(SEGMENTS)))
    print(f"postings: {time.time()-t0:.2f}s", file=sys.stderr)
    data = json.load(urllib.request.urlopen("http://localhost:4099/api/v1/applications"))
    app = data[0]["id"]
    stages = json.load(urllib.request.urlopen(f"http://localhost:4099/api/v1/applications/{app}/stages?status=complete"))
    rows = []
    for s in stages:
        rows.append({k: s.get(k) for k in ("stageId","name","numTasks","executorRunTime","executorCpuTime","jvmGcTime","memoryBytesSpilled","diskBytesSpilled","shuffleReadBytes","shuffleWriteBytes","inputBytes","outputBytes")})
    rows.sort(key=lambda r: -(r["executorRunTime"] or 0))
    for r in rows[:12]:
        r["executorCpuTime"] = round((r["executorCpuTime"] or 0)/1e9,1)  # ns->s
        r["executorRunTime"] = round((r["executorRunTime"] or 0)/1e3,1)  # ms->s
        r["jvmGcTime"] = round((r["jvmGcTime"] or 0)/1e3,1)
        print(json.dumps(r))
finally:
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
