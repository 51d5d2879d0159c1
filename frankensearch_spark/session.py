"""SparkSession construction with engine defaults.

Local sandbox runs use ``local[N]``; on a real cluster the same settings
apply minus ``master``.  AQE stays on (skew-join + coalesce); Arrow is
required for every pandas UDF stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _submitted_externally() -> bool:
    """True when spark-submit launched this Python process.

    spark-submit starts the driver JVM first and hands Python a py4j
    gateway via ``PYSPARK_GATEWAY_PORT``; in that case ``--master`` /
    ``--conf`` / ``--driver-memory`` from the submit command already own
    the session, and a builder ``.master()`` here would silently override
    the cluster manager with ``local[N]``.
    """
    return "PYSPARK_GATEWAY_PORT" in os.environ


def get_spark(
    app_name: str = "frankensearch-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    external = _submitted_externally()
    builder = SparkSession.builder.appName(app_name)
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master:
        builder = builder.master(master)
    elif not external:
        builder = builder.master(f"local[{cores}]")
    # Environment-SIZING confs (shuffle parallelism, driver heap, local
    # dirs) belong to whoever launched the JVM: under spark-submit the
    # command's --conf/--driver-memory own them, and builder options would
    # silently override --conf (SPARK_GRAFT_CPUS defaults are sandbox
    # sizing, not cluster sizing).  An EXPLICIT shuffle_partitions argument
    # still wins — callers that pass it are sizing a specific job.  The
    # engine-SEMANTIC confs below (Arrow, UTC, dynamic partition
    # overwrite, commit protocol, codec) are part of the engine contract
    # and apply everywhere.
    if shuffle_partitions is None and not external:
        shuffle_partitions = max(cores, 8)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    builder = (
        builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.session.timeZone", "UTC")
        # compaction rewrites only the touched segment partitions
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # The posting shuffle partitions 1:1 with (segment, bucket) output
        # groups — bounded by publish cadence × buckets (≤ ~4k per batch),
        # few map tasks per executor.  In that regime the bypass-merge
        # writer (one stream per reduce partition, concat at close) is
        # ~5x cheaper CPU than the sort-based path (measured 35s vs 162s
        # per 10^6-turn batch); open-file count per map task equals the
        # reduce-partition count, which segment sizing bounds.
        .config("spark.shuffle.sort.bypassMergeThreshold", "4097")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Level 1 builds 19% faster end-to-end than parquet-mr's default
        # level 3 for only ~1% more bytes on posting-shaped data
        # (measured: 95s vs 117s per 1M-turn build; 22.25MB vs 22.02MB
        # index at 50k turns).  Decompression speed is level-invariant,
        # so the query path is unaffected.
        .config("spark.hadoop.parquet.compression.codec.zstd.level", "1")
        # Commit protocol v2: task outputs move to the destination at task
        # commit instead of a serial driver-side rename sweep at job
        # commit — the segment-partitioned writes produce hundreds of
        # partition directories per batch and v1's O(dirs) driver loop
        # serializes an otherwise-parallel commit.  Safe here: manifest-
        # last publish (not output-dir presence) is the visibility
        # barrier, so a crashed job's stray task files are invisible and
        # replaced by the replay's dynamic partition overwrite.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # PySpark 4's DataFrame-debugging wrapper (on by default) runs
        # getActiveSession + a conf read + a JVM PySparkCurrentOrigin
        # set/clear + a Python stack capture around EVERY DataFrame and
        # Column call — profiled at ~60% of the ~500 py4j round-trips a
        # warm query's plan construction makes (~120 ms/query at sf0.1),
        # and it taxes build-side plan construction the same way.  All it
        # buys is the Python call-site line in error messages; the engine
        # pins behavior by test, so trade the prettier traceback for the
        # hot path.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if not external:
        # local-mode sizing only (under spark-submit the launch command
        # owns heap/dirs/UI): 8g heap regardless of core count — G1 at
        # 24-32g measured 40-70% SLOWER for ≤100k-doc builds (young-gen
        # ergonomics), while 16 cores × 1M turns wanted 16g (1.7x) to
        # absorb execution-pool contention; override per-job via
        # SPARK_DRIVER_MEM.  Shuffle/spill to RAM-backed storage: the
        # sandbox's one virtual disk serializes multi-core shuffles
        # (override with SPARK_LOCAL_DIRS).
        builder = (
            builder
            .config(
                "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g")
            )
            .config("spark.ui.enabled", "false")
            .config(
                "spark.local.dir",
                os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"),
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
