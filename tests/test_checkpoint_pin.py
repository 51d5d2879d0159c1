"""Pin the docid-determinism protocol: the ranged frame is a materialized
localCheckpoint, so every docid-bearing Arrow pass scans the checkpointed
RDD directly — no cache lookup, no range exchange in the recompute path.

Why this matters: range-exchange boundaries are SAMPLED per execution.
Before the checkpoint, a racing first-materialization of the slim
tokenize cache could recompute through the exchange and place the same
row in a different partition — the docs and postings passes then
assigned DIFFERENT docids to one row (~40% repro as a hydration miss).
These tests fail loudly if a Spark upgrade changes localCheckpoint
semantics (plans regain an Exchange) or kills the internal block-release
seam (checkpoint blocks would then pile up under a long-running stream).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from frankensearch_spark.operators.build import (
    _assign_docids_and_tokenize,
    release_checkpoint,
)
from frankensearch_spark.sources.storage import IndexMeta


def _make_meta():
    return IndexMeta(text_fields=("content",), num_buckets=4)


def _storage_ids(spark):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {i.id() for i in infos}


def test_docid_passes_scan_the_checkpoint_not_an_exchange(spark):
    # distinct token count per doc ties slim rows back to their identity:
    # doc d{i} has i+1 tokens, so len_content is a per-doc witness
    df = spark.createDataFrame(
        [
            {"doc_id": f"d{i:02d}", "content": " ".join(["tok"] * (i + 1))}
            for i in range(64)
        ]
    )
    ranged, docs_frame, slim, n_docs, _ = _assign_docids_and_tokenize(
        spark, df, _make_meta(), sort_cols=["doc_id"], num_segments=2
    )
    try:
        assert n_docs == 64
        for frame, name in ((docs_frame, "docs"), (slim, "slim")):
            plan = frame._jdf.queryExecution().executedPlan().toString()
            assert "Scan ExistingRDD" in plan, f"{name} pass lost the checkpoint scan"
            assert "Exchange" not in plan, (
                f"{name} pass re-plans through an exchange — a recompute could "
                f"re-sample range boundaries and diverge docids"
            )
        # PER-ROW docid agreement across the two passes (a cross-pass
        # permutation — the divergence class the checkpoint prevents —
        # must fail, so compare identities, not docid sets): the docs
        # pass maps doc_id -> docid, slim maps docid -> token count, and
        # doc d{i} has exactly i+1 tokens.
        by_doc = {
            r["doc_id"]: r["docid"]
            for r in docs_frame.select("doc_id", "docid").collect()
        }
        by_len = {
            r["docid"]: r["len_content"]
            for r in slim.select("docid", "len_content").collect()
        }
        assert sorted(by_doc.values()) == list(range(64))
        for i in range(64):
            docid = by_doc[f"d{i:02d}"]
            assert by_len[docid] == i + 1, (
                f"doc d{i:02d}: docs pass assigned docid {docid} but slim "
                f"holds a {by_len[docid]}-token doc there (expected {i + 1})"
            )
    finally:
        release_checkpoint(ranged)


def test_release_checkpoint_frees_blocks(spark):
    df = spark.createDataFrame(
        [{"doc_id": f"d{i}", "content": f"alpha bravo w{i}"} for i in range(64)]
    )
    before = _storage_ids(spark)
    ranged, docs_frame, _slim, _n, _ = _assign_docids_and_tokenize(
        spark, df, _make_meta(), sort_cols=["doc_id"], num_segments=2
    )
    docs_frame.count()  # consume, as the build's writers do
    during = _storage_ids(spark) - before
    assert during, "checkpoint was never materialized into storage"
    release_checkpoint(ranged)
    after = _storage_ids(spark) - before
    assert not (after & during), (
        "release_checkpoint left the checkpoint's blocks registered — the "
        "internal-RDD unpersist seam silently died (stream micro-batches "
        "would leak one checkpoint per commit until driver GC)"
    )
