"""Crash-resumable bulk load: resume ≡ single-shot (docids AND scores).

Covers the north rule's "resumable from checkpoint with per-partition
lineage": a build killed between batch commits — and even one killed
mid-batch after partial table writes — converges to the identical index
when re-run.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.operators import bulk
from frankensearch_spark.operators.build import append_segment_batch
from frankensearch_spark.sources.transcripts import synthetic_transcripts

QUERIES = ["w3", "w3 w47 w200", "w12 AND w47"]


@pytest.fixture(scope="module")
def corpus(spark):
    t = synthetic_transcripts(spark, 1_200, vocab_size=300)
    docs = t.selectExpr(
        "concat(conv_id, ':', cast(turn_idx as string)) as doc_id",
        "conv_id",
        "cast(turn_idx as long) as turn_idx",
        "text as content",
    ).persist()
    docs.count()
    yield docs
    docs.unpersist()


@pytest.fixture(scope="module")
def single_shot(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("single"))
    idx = LexicalIndex(spark, d).build(
        corpus,
        text_fields=("content",),
        i64_fields=("turn_idx",),
        keyword_fields=("conv_id",),
        sort_cols=("conv_id", "turn_idx"),
        num_segments=8,  # = 4 batches x 2 segments in the bulk runs
        num_buckets=4,
    )
    return idx


def _results(index, query):
    h = index.search(query, limit=10).hits
    return [
        (int(d), s)
        for d, s in zip(h["docid"], np.asarray(h["score"], dtype=np.float32))
    ]


def _docids(index):
    return [
        (r["docid"], r["doc_id"])
        for r in index.storage.read("docs").select("docid", "doc_id").orderBy("docid").collect()
    ]


def test_resume_after_kill_between_batches(spark, corpus, single_shot, tmp_path_factory, monkeypatch):
    d = str(tmp_path_factory.mktemp("resumed"))
    calls = {"n": 0}
    real = append_segment_batch

    def crashing(*args, **kwargs):
        if calls["n"] == 2:
            raise RuntimeError("simulated crash before batch 3")
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(bulk, "append_segment_batch", crashing)
    with pytest.raises(RuntimeError):
        bulk.bulk_load(
            spark, corpus, d, n_batches=4, chunk_col="conv_id",
            segments_per_batch=2, text_fields=("content",),
            keyword_fields=("conv_id",), i64_fields=("turn_idx",),
            sort_cols=("conv_id", "turn_idx"), num_buckets=4,
        )
    # lineage: exactly 2 sealed batches recorded
    plan = json.load(open(os.path.join(d, "build_plan.json")))
    assert [b["status"] for b in plan["batches"]] == ["sealed", "sealed", "pending", "pending"]
    monkeypatch.setattr(bulk, "append_segment_batch", real)
    bulk.bulk_load(
        spark, corpus, d, n_batches=4, chunk_col="conv_id",
        segments_per_batch=2, text_fields=("content",),
        keyword_fields=("conv_id",), i64_fields=("turn_idx",),
        sort_cols=("conv_id", "turn_idx"), num_buckets=4,
    )
    resumed = LexicalIndex(spark, d)
    assert _docids(resumed) == _docids(single_shot)
    for query in QUERIES:
        assert _results(resumed, query) == _results(single_shot, query), query


def test_replay_after_midbatch_crash_is_idempotent(spark, corpus, single_shot, tmp_path_factory, monkeypatch):
    """Crash AFTER a batch's table writes but BEFORE its plan entry seals:
    the replay overwrites the partial partitions and converges."""
    d = str(tmp_path_factory.mktemp("midbatch"))
    calls = {"n": 0}
    real = append_segment_batch

    def crash_after_write(*args, **kwargs):
        out = real(*args, **kwargs)
        if calls["n"] == 1:
            calls["n"] += 1
            raise RuntimeError("simulated crash after batch 2 wrote tables")
        calls["n"] += 1
        return out

    monkeypatch.setattr(bulk, "append_segment_batch", crash_after_write)
    with pytest.raises(RuntimeError):
        bulk.bulk_load(
            spark, corpus, d, n_batches=4, chunk_col="conv_id",
            segments_per_batch=2, text_fields=("content",),
            keyword_fields=("conv_id",), i64_fields=("turn_idx",),
            sort_cols=("conv_id", "turn_idx"), num_buckets=4,
        )
    monkeypatch.setattr(bulk, "append_segment_batch", real)
    bulk.bulk_load(
        spark, corpus, d, n_batches=4, chunk_col="conv_id",
        segments_per_batch=2, text_fields=("content",),
        keyword_fields=("conv_id",), i64_fields=("turn_idx",),
        sort_cols=("conv_id", "turn_idx"), num_buckets=4,
    )
    resumed = LexicalIndex(spark, d)
    assert _docids(resumed) == _docids(single_shot)
    for query in QUERIES:
        assert _results(resumed, query) == _results(single_shot, query), query
    # duplicate-row safety: stats dedupe keeps N exact
    assert resumed.engine.doc_count == single_shot.engine.doc_count
