"""Distributed inverted-index build.

Spark-first rebuild of the reference ingest pipeline
(reference: ``quill/src/scribe.rs`` — shard-leased docids, columnar
accumulate, radix flush; ``index.rs:4882`` index_documents):

1. **Deterministic global docids** — the input is range-partitioned and
   sorted on the stable total order (default ``(conv_id, turn_idx)``); per-
   partition row counts prefix-sum into disjoint docid bases (the Q1 lease
   discipline, ``scribe.rs:82``).  The docid of a row is its rank in the
   total order, so results are invariant to the partition count
   (merge=concat law, reference plan Q1-OB3).
2. **Tokenize** — one Arrow-batched ``mapInPandas`` pass assigns docids and
   produces per-field token arrays (array index == analyzer position).
3. **Radix flush** — ``posexplode`` to the long token frame, then ONE
   shuffle on ``(segment_id, field, term)`` builds docid-sorted posting
   blocks of 128 with BLOCKMAX metadata (``max_freq_code``, ``min_fnid``,
   ``first_doc`` — reference ``quiver.rs:1719``) entirely JVM-side (the
   window and the block aggregation share the same hash partitioning, so
   Catalyst plans a single exchange).
4. **Denormalized fieldnorms** — each posting block carries the per-doc
   fieldnorm ids inline, so query-time scoring needs NO doclen join.
5. **Commit** — per-segment manifest rows are written last; a re-run
   anti-joins sealed segments and rebuilds only the missing ones
   (idempotent per-segment overwrite = crash-resumable bulk load,
   reference ``config.rs:26-27``).

Skew: block rows bound per-group state by segment size (64Ki-doc leases in
the reference; partition-sized segments here), so a pathological high-DF
term costs many *rows*, never one giant in-memory group.  The bucket
partition column additionally spreads high-DF terms across files for the
query side, and AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

import time
from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.analyze import tokenize_batch
from ..functions.contract import POSTINGS_PER_BLOCK, fieldnorm_to_id
from ..sources.storage import IndexMeta, IndexStorage

#: Auto-sizing target: one segment ≈ one docid lease span (bounded
#: per-(segment, term) shuffle-group state — the Q1 skew discipline).
TARGET_DOCS_PER_SEGMENT = 1 << 18


def content_hash_expr(meta: "IndexMeta", df: DataFrame):
    """The per-doc content witness: xxhash64 over the text source columns.

    Analogue of the reference's xxh3 content hash (``index.rs:10231``,
    ``storage/src/content_hash.rs``): a cheap identity that lets upsert
    skip re-indexing docs whose content is unchanged.  Columns are taken
    in sorted name order; missing/null columns hash as '' so the build
    side and an upsert batch (which may omit derived sources) agree.
    """
    sources = sorted({meta.derived_prefix_fields.get(f, f) for f in meta.text_fields})
    cols = [
        F.coalesce(F.col(s).cast("string"), F.lit(""))
        if s in df.columns
        else F.lit("")
        for s in sources
    ]
    return F.xxhash64(*cols)


def build_index(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    text_fields: Sequence[str] = ("content", "title"),
    keyword_fields: Sequence[str] = (),
    i64_fields: Sequence[str] = (),
    stored_fields: Sequence[str] = (),
    sort_cols: Sequence[str] = ("doc_id",),
    num_segments: Optional[int] = None,
    num_buckets: int = 16,
    positions: bool = True,
    analyzers: Optional[dict] = None,
    derived_prefix_fields: Optional[dict] = None,
) -> IndexStorage:
    """Build a full index from ``df`` into ``index_dir``.

    ``df`` must contain a unique ``doc_id`` string column, the text field
    columns, and any keyword/i64/stored passthrough columns.  ``sort_cols``
    defines the stable total order that assigns global docids.

    ``analyzers`` maps text fields to "default" (the frankensearch
    analyzer) or "cass_hyphen"/"cass_prefix" (the CASS family, which emits
    same-position compound/part/bigram alternatives).
    ``derived_prefix_fields`` maps a text field to the source column whose
    edge-n-gram expansion it indexes (the CASS ``*_prefix`` fields).
    """
    storage = IndexStorage(spark, index_dir)
    meta = IndexMeta(
        text_fields=list(text_fields),
        keyword_fields=list(keyword_fields),
        i64_fields=list(i64_fields),
        stored_fields=list(stored_fields),
        num_buckets=num_buckets,
        positions=positions,
        analyzers=dict(analyzers or {}),
        derived_prefix_fields=dict(derived_prefix_fields or {}),
    )

    if num_segments is None:
        # Segment sizing IS the skew bound (the reference's 64Ki-doc lease
        # discipline, scribe.rs:82): a term's postings per (segment, term)
        # group are capped by the segment's doc count, so no single shuffle
        # group can exceed target_docs_per_segment postings regardless of
        # how skewed the term distribution is.  One cheap count() sizes the
        # build; at 10^12 turns this yields ~10^7 manifest rows, which is
        # Iceberg-manifest scale, not a bottleneck.
        n_docs = df.count()
        num_segments = max(
            4,
            min(
                -(-n_docs // TARGET_DOCS_PER_SEGMENT),
                spark.sparkContext.defaultParallelism * 4,
            ),
        )
        num_segments = max(num_segments, min(spark.sparkContext.defaultParallelism, 64))

    # Fresh build: clear any prior generation so dynamic partition
    # overwrite cannot leave stale segment directories behind.
    storage.clear_tables()

    append_segment_batch(
        spark,
        df,
        storage,
        meta,
        sort_cols=list(sort_cols),
        num_segments=num_segments,
        docid_base=0,
        segment_base=0,
        mode="overwrite",
    )
    storage.write_meta(meta)
    return storage


def append_segment_batch(
    spark: SparkSession,
    df: DataFrame,
    storage: IndexStorage,
    meta: IndexMeta,
    sort_cols: list[str],
    num_segments: int,
    docid_base: int,
    segment_base: int,
    mode: str = "append",
    pre_publish=None,
) -> list[int]:
    """Tokenize + index one batch of documents as ``num_segments`` new
    segments starting at ``segment_base`` with docids from ``docid_base``.

    All table writes are append-only (except the initial ``overwrite``
    build); visibility is controlled by the manifest rows written last —
    the analogue of the reference's seal-then-publish commit protocol
    (``index.rs:6054``).  Returns the new segment ids.
    """
    # AQE's partition coalescing optimizes for task-size, which throttles
    # the build's CPU-bound aggregation stages on small-ish inputs; keep
    # the build at full parallelism (AQE skew handling stays on for reads).
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev_coalesce = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    ranged, analyzed = _assign_docids_and_tokenize(
        spark,
        df,
        meta,
        sort_cols=sort_cols,
        num_segments=num_segments,
        docid_base=docid_base,
        segment_base=segment_base,
    )
    from pyspark import StorageLevel

    # DISK_ONLY: the tokenized frame is read by four downstream stages but
    # must not occupy unified heap memory (it starves the posting build's
    # sort/write execution memory); spark.local.dir points at RAM-backed
    # storage locally, and real clusters get NVMe-speed re-reads.
    analyzed.persist(StorageLevel.DISK_ONLY)
    try:
        analyzed.count()  # materialize once; later stages reuse the cache
        ranged.unpersist()
        write_segment_tables(
            analyzed,
            storage,
            meta,
            mode=mode,
            pre_publish=pre_publish,
            new_segments=list(range(segment_base, segment_base + num_segments)),
        )
    finally:
        analyzed.unpersist()
        spark.conf.set(coalesce_key, prev_coalesce)
    return list(range(segment_base, segment_base + num_segments))


def write_segment_tables(
    analyzed: DataFrame,
    storage: IndexStorage,
    meta: IndexMeta,
    mode: str,
    pre_publish=None,
    new_segments: Optional[list[int]] = None,
) -> None:
    """Write docs/doclens/postings/terms/field_stats/manifest for the
    analyzed frame (docid+segment assigned, token arrays per text field).

    The segment-partitioned tables ALWAYS write mode="overwrite" under
    dynamic partition overwrite: only this batch's own segment_id
    partitions are replaced, which makes a crashed batch's re-run
    idempotent (replay replaces its partial files instead of appending
    duplicates).  The unpartitioned stats/manifest tables append —
    possible crash-replay duplicates are deduplicated by every reader —
    except on the initial full build (mode="overwrite"), which resets them.

    ``pre_publish`` (if given) runs after every data table is durable but
    BEFORE the manifest append — the publish point.  Upsert stages its
    tombstones there so delete-of-old and add-of-new become visible in
    the same manifest generation (atomic for readers).
    """
    _write_docs(analyzed, storage, meta, "overwrite")
    _write_doclens(analyzed, storage, meta, "overwrite")
    _write_postings_and_terms(analyzed, storage, meta, "overwrite", new_segments=new_segments)
    sm_mode = "overwrite" if mode == "overwrite" else "append"
    seg = _write_stats(analyzed, storage, meta, sm_mode)
    if pre_publish is not None:
        pre_publish()
    _write_manifest(seg, storage, meta, sm_mode)


# ── step 1+2: docid assignment + tokenization ──────────────────────────────


def _assign_docids_and_tokenize(
    spark: SparkSession,
    df: DataFrame,
    meta: IndexMeta,
    sort_cols: list[str],
    num_segments: int,
    docid_base: int = 0,
    segment_base: int = 0,
) -> tuple[DataFrame, DataFrame]:
    passthrough = _passthrough_columns(df, meta)
    text_sources = [
        meta.derived_prefix_fields.get(f, f) for f in meta.text_fields
    ]
    select_cols = [
        "doc_id",
        *passthrough,
        *[s for s in text_sources if s in df.columns],
    ]
    ranged = (
        df.select(*dict.fromkeys(select_cols))
        .withColumn("content_hash", content_hash_expr(meta, df))
        .repartitionByRange(num_segments, *sort_cols)
        .sortWithinPartitions(*sort_cols)
    )
    # Persist so the count job and the docid job see identical partitions
    # (range boundaries are sampled; the persisted partitioning is the one
    # source of truth — this is how RDD.zipWithIndex pins its bases too).
    ranged.persist()
    counts = (
        ranged.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    count_map = {r["pid"]: r["count"] for r in counts}
    bases: dict[int, int] = {}
    running = docid_base
    for pid in range(num_segments):
        bases[pid] = running
        running += count_map.get(pid, 0)

    out_fields = [
        StructField("docid", LongType(), False),
        StructField("segment_id", IntegerType(), False),
        StructField("doc_id", StringType(), False),
        StructField("content_hash", LongType(), False),
    ]
    for name in passthrough:
        out_fields.append(df.schema[name])
    pair_type = ArrayType(
        StructType(
            [
                StructField("pos", IntegerType(), False),
                StructField("term", StringType(), False),
            ]
        )
    )
    for f in meta.text_fields:
        if meta.analyzer_of(f) == "default":
            out_fields.append(StructField(f"tokens_{f}", ArrayType(StringType()), True))
        else:
            out_fields.append(StructField(f"tokpairs_{f}", pair_type, True))
        out_fields.append(StructField(f"len_{f}", IntegerType(), False))
        out_fields.append(StructField(f"fnid_{f}", IntegerType(), False))
    out_schema = StructType(out_fields)
    analyzers = {f: meta.analyzer_of(f) for f in meta.text_fields}
    derived = dict(meta.derived_prefix_fields)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.cass_analyze import cass_tokenize_batch

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        offset = bases.get(pid, docid_base)
        for pdf in batches:
            n = len(pdf)
            out = pd.DataFrame()
            out["docid"] = range(offset, offset + n)
            out["segment_id"] = segment_base + pid
            out["doc_id"] = pdf["doc_id"].astype(str).values
            out["content_hash"] = pdf["content_hash"].values
            for name in passthrough:
                out[name] = pdf[name].values
            for f in meta.text_fields:
                source = derived.get(f, f)
                if source in pdf.columns:
                    texts = pdf[source].fillna("").tolist()
                else:
                    texts = [""] * n
                if analyzers[f] == "default":
                    tokens = tokenize_batch(texts)
                    lens = [len(t) for t in tokens]
                    out[f"tokens_{f}"] = tokens
                else:
                    pairs, lens = cass_tokenize_batch(
                        texts,
                        hyphen_decompose=(analyzers[f] == "cass_hyphen"),
                        edge_ngrams=(f in derived),
                    )
                    out[f"tokpairs_{f}"] = pairs
                out[f"len_{f}"] = pd.Series(lens, dtype="int32").values
                out[f"fnid_{f}"] = fieldnorm_to_id(pd.Series(lens).values).astype("int32")
            offset += n
            yield out

    return ranged, ranged.mapInPandas(assign, schema=out_schema)


def _passthrough_columns(df: DataFrame, meta: IndexMeta) -> list[str]:
    wanted = [*meta.keyword_fields, *meta.i64_fields, *meta.stored_fields]
    return [c for c in dict.fromkeys(wanted) if c in df.columns and c != "doc_id"]


# ── step 3: tables ──────────────────────────────────────────────────────────


def _write_docs(
    analyzed: DataFrame, storage: IndexStorage, meta: IndexMeta, mode: str
) -> None:
    passthrough = [
        c
        for c in analyzed.columns
        if not c.startswith(("tokens_", "tokpairs_", "len_", "fnid_"))
    ]
    # stored text fields ride along for snippet/hydration parity
    stored_text = [f for f in meta.text_fields if f in meta.stored_fields]
    cols = [*passthrough, *[f for f in stored_text if f in analyzed.columns]]
    # analyzed partitions ARE disjoint docid ranges (one per segment), so an
    # in-partition sort yields a globally range-partitioned docs table;
    # segment_id directory partitioning gives segment-granular GC + pruning.
    storage.write_table(
        analyzed.select(*dict.fromkeys(cols)).sortWithinPartitions("docid"),
        "docs",
        mode,
        partition_by=("segment_id",),
    )


def _write_doclens(
    analyzed: DataFrame, storage: IndexStorage, meta: IndexMeta, mode: str
) -> None:
    cols = [F.col("docid"), F.col("segment_id")]
    for f in meta.text_fields:
        cols.append(F.col(f"len_{f}"))
        cols.append(F.col(f"fnid_{f}"))
    storage.write_table(
        analyzed.select(*cols).sortWithinPartitions("docid"),
        "doclens",
        mode,
        partition_by=("segment_id",),
    )


def _token_frame(analyzed: DataFrame, meta: IndexMeta) -> DataFrame:
    """Long-format (segment_id, field, term, docid, pos, fnid) frame.

    Default fields explode their position-indexed token arrays; CASS
    fields explode (pos, term) structs (same-position alternatives keep
    their shared position).
    """
    frames = []
    for f in meta.text_fields:
        if meta.analyzer_of(f) == "default":
            frames.append(
                analyzed.select(
                    "segment_id",
                    F.lit(f).alias("field"),
                    "docid",
                    F.col(f"fnid_{f}").alias("fnid"),
                    F.posexplode(f"tokens_{f}").alias("pos", "term"),
                ).where(F.col("term").isNotNull())
            )
        else:
            frames.append(
                analyzed.select(
                    "segment_id",
                    F.lit(f).alias("field"),
                    "docid",
                    F.col(f"fnid_{f}").alias("fnid"),
                    F.explode(f"tokpairs_{f}").alias("e"),
                ).select(
                    "segment_id",
                    "field",
                    "docid",
                    "fnid",
                    F.col("e.pos").alias("pos"),
                    F.col("e.term").alias("term"),
                )
            )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def _write_postings_and_terms(
    analyzed: DataFrame,
    storage: IndexStorage,
    meta: IndexMeta,
    mode: str,
    new_segments: Optional[list[int]] = None,
) -> None:
    # ONE token-scale shuffle: hash-partition on (segment, bucket) up
    # front.  bucket = pmod(crc32(term), B) is a pure function of the term,
    # so every row of one (segment, field, term) lands in one partition;
    # the per-doc aggregation, the block-numbering window, and the block
    # aggregation all group by supersets of (segment_id, bucket), which
    # this partitioning satisfies -- Catalyst plans NO further exchange,
    # and the write is already aligned with its (segment, bucket)
    # directory partitioning (exactly one file per directory).
    tokens = (
        _token_frame(analyzed, meta)
        .withColumn(
            "bucket",
            F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(meta.num_buckets)).cast("int"),
        )
        .repartition("segment_id", "bucket")
    )
    per_doc = tokens.groupBy("segment_id", "bucket", "field", "term", "docid").agg(
        F.count("pos").cast("int").alias("freq"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.first("fnid").alias("fnid"),
    )
    w = Window.partitionBy("segment_id", "bucket", "field", "term").orderBy("docid")
    blocked = per_doc.withColumn(
        "block_id",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(POSTINGS_PER_BLOCK)).cast("int"),
    )
    entry = F.struct(
        F.col("docid"),
        F.col("freq"),
        F.col("fnid"),
        *([F.col("positions")] if meta.positions else []),
    )
    agg = blocked.groupBy("segment_id", "bucket", "field", "term", "block_id").agg(
        F.sort_array(F.collect_list(entry)).alias("packed")
    )
    # Posting blocks persist (docid, freq, fnid) as one struct array and
    # the (large) positions as a PARALLEL column: Parquet columnarizes
    # both, and keeping positions outside the scoring struct lets column
    # pruning skip position bytes entirely on non-phrase queries (nested
    # pruning cannot reach through the explode otherwise).
    postings = agg.select(
        "segment_id",
        "field",
        "term",
        "block_id",
        "bucket",
        F.element_at("packed", 1)["docid"].alias("first_doc"),
        F.size("packed").cast("int").alias("count"),
        F.least(F.expr("array_max(packed.freq)"), F.lit(255)).cast("int").alias("max_freq_code"),
        F.expr("array_min(packed.fnid)").cast("int").alias("min_fnid"),
        # block_cf: per-block collection frequency, aggregated at build so
        # the dictionary pass never has to decode the entries arrays
        F.expr("aggregate(packed.freq, 0L, (a, x) -> a + x)").alias("block_cf"),
        F.expr(
            "transform(packed, e -> struct(e.docid as docid, e.freq as freq, e.fnid as fnid))"
        ).alias("entries")
        if meta.positions
        else F.col("packed").alias("entries"),
        *([F.expr("transform(packed, e -> e.positions)").alias("positions")] if meta.positions else []),
    )
    storage.write_table(postings, "postings", mode, partition_by=("segment_id", "bucket"))

    # Per-segment dictionary rows: the snapshot df/cf of a term is the sum
    # over live segments at probe time, so dictionary maintenance is
    # append-only too (no global rewrite per commit — SURVEY §2.7).  The
    # read-back touches ONLY the small scalar columns (count, block_cf) —
    # column pruning skips the posting payloads entirely, so this pass
    # costs one metadata-width scan + one tiny shuffle of dictionary rows.
    if new_segments is None:
        new_segments = [
            r["segment_id"] for r in analyzed.select("segment_id").distinct().collect()
        ]
    terms = (
        storage.read("postings")
        .where(F.col("segment_id").isin(new_segments))
        .groupBy("segment_id", "field", "term")
        .agg(
            F.sum("count").cast("long").alias("df"),
            F.sum("block_cf").cast("long").alias("cf"),
        )
        .withColumn(
            "bucket",
            F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(meta.num_buckets)).cast("int"),
        )
    )
    storage.write_table(
        terms.repartition("segment_id", "bucket"),
        "terms",
        mode,
        partition_by=("segment_id", "bucket"),
    )


def _write_stats(
    analyzed: DataFrame, storage: IndexStorage, meta: IndexMeta, mode: str
) -> DataFrame:
    aggs = [
        F.count("*").alias("doc_count"),
        F.min("docid").alias("docid_lo"),
        F.max("docid").alias("docid_hi"),
    ]
    for f in meta.text_fields:
        aggs.append(F.sum(f"len_{f}").alias(f"tokens_{f}"))
    seg = analyzed.groupBy("segment_id").agg(*aggs)
    rows = []
    for f in meta.text_fields:
        rows.append(
            seg.select(
                "segment_id",
                F.lit(f).alias("field"),
                "doc_count",
                F.col(f"tokens_{f}").cast("long").alias("total_tokens"),
                "docid_lo",
                "docid_hi",
            )
        )
    stats = rows[0]
    for r in rows[1:]:
        stats = stats.unionByName(r)
    storage.write_table(stats, "field_stats", mode, coalesce=1)
    return seg


def _write_manifest(
    seg: DataFrame, storage: IndexStorage, meta: IndexMeta, mode: str
) -> None:
    manifest = seg.select(
        F.lit(meta.generation).alias("generation"),
        "segment_id",
        "docid_lo",
        (F.col("docid_hi") + F.lit(1)).alias("docid_hi"),  # half-open [lo, hi)
        "doc_count",
        F.lit("sealed").alias("status"),
        F.lit(time.time()).alias("built_at"),
    )
    storage.write_table(manifest, "manifest", mode, coalesce=1)
