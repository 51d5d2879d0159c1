"""Structured Streaming incremental ingest (the watch-mode analogue).

The reference's live-ingest loop (reference: ``fsfs/src/runtime.rs``
LiveIngestPipeline, plan §2.4) performs per-batch upsert/delete with one
commit per batch.  The Structured Streaming mapping is ``writeStream.
foreachBatch``: each micro-batch is deduplicated on the document identity
and upserted as fresh mini-segments (the delta-segment analogue — sealed
and manifest-visible at batch commit, folded later by compaction/merge).

Late/duplicate data: ``dropDuplicates`` on the identity inside the batch +
upsert-by-id across batches (delete old docid + add under a new docid) —
the same semantics as the reference's content-identity upsert path
(``storage/src/content_hash.rs`` per plan §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index import LexicalIndex


def transcript_batch_to_docs(batch: DataFrame) -> DataFrame:
    """Canonical transcript micro-batch -> document frame for the index."""
    return batch.select(
        F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string")).alias(
            "doc_id"
        ),
        F.col("conv_id"),
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("role"),
        F.col("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("text").alias("content"),
    )


def upsert_batch(index: LexicalIndex, batch: DataFrame, batch_id: int) -> None:
    """foreachBatch body: dedup on identity, upsert as new segment(s).

    Watch-mode micro-batches (< 8,192 changed rows) mint exactly ONE
    segment; a catch-up batch past that is auto-sized like the cold
    build (maintenance._auto_upsert_segments) so its posting exchange
    reaches every core — the tier merge planner absorbs the extra rows.

    Idempotent enough for at-least-once delivery: re-upserting the same
    identity tombstones the previous docid and republishes, so replayed
    batches converge to the same visible corpus (duplicate-then-delete
    idempotence — reference plan §15.3).
    """
    docs = transcript_batch_to_docs(batch).dropDuplicates(["doc_id"])
    if docs.isEmpty():
        return
    index.maintenance.upsert(docs, sort_cols=("conv_id", "turn_idx"))
    index.reopen()


def stream_ingest(
    index: LexicalIndex,
    transcripts: DataFrame,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    watermark: Optional[str] = "10 minutes",
):
    """Attach the incremental-ingest sink to a streaming transcript frame.

    Returns the started ``StreamingQuery``.  ``availableNow`` drains the
    backlog and stops (the batch-catchup mode); pass False for a
    continuous micro-batch loop.  The watermark bounds state for upstream
    event-time operators; the sink itself is stateless (identity upsert).
    """
    if watermark:
        transcripts = transcripts.withWatermark("ts", watermark)
    writer = (
        transcripts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda batch, bid: upsert_batch(index, batch, bid))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
