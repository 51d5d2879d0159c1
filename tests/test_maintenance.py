"""Incremental ingest + maintenance laws.

Metamorphic/differential suites mirroring the reference gauntlet (plan
§15.2/15.3): incremental ≡ bulk, upsert replace semantics, tombstone
at-seal stats, compacted ≡ fresh-rebuild-on-survivors, merged ≡ unmerged,
GC safety, and Structured Streaming foreachBatch ingest ≡ batch upsert.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.sources.transcripts import synthetic_transcripts
from frankensearch_spark.streaming.ingest import stream_ingest, transcript_batch_to_docs

N_TURNS = 600
SPLIT = 400
QUERIES = ["w3", "w3 w47 w200", "w12 AND w47", "w1 -w9"]


@pytest.fixture(scope="module")
def corpus(spark):
    t = synthetic_transcripts(spark, N_TURNS, vocab_size=500).persist()
    t.count()
    yield t
    t.unpersist()


@pytest.fixture(scope="module")
def batches(spark, corpus):
    ordered = corpus.orderBy("conv_id", "turn_idx")
    rows = ordered.collect()
    b1 = spark.createDataFrame(rows[:SPLIT], corpus.schema)
    b2 = spark.createDataFrame(rows[SPLIT:], corpus.schema)
    return b1, b2


@pytest.fixture(scope="module")
def bulk(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bulk_ix"))
    return LexicalIndex.build_transcripts(spark, corpus, d, num_segments=3, num_buckets=4)


def _hits(index, query, k=10):
    h = index.search(query, limit=k).hits
    return list(zip(h["doc_id"], np.asarray(h["score"], dtype=np.float32)))


def test_incremental_equals_bulk(spark, batches, bulk, tmp_path_factory):
    b1, b2 = batches
    d = str(tmp_path_factory.mktemp("inc_ix"))
    inc = LexicalIndex.build_transcripts(spark, b1, d, num_segments=2, num_buckets=4)
    inc.upsert(transcript_batch_to_docs(b2), sort_cols=("conv_id", "turn_idx"))
    for query in QUERIES:
        assert _hits(inc, query) == _hits(bulk, query), query
    # docid assignment identical too (batch order == global order)
    a = inc.storage.read("docs").select("docid", "doc_id").orderBy("docid").collect()
    b = bulk.storage.read("docs").select("docid", "doc_id").orderBy("docid").collect()
    assert [(r["docid"], r["doc_id"]) for r in a] == [
        (r["docid"], r["doc_id"]) for r in b
    ]


def test_upsert_replaces_content(spark, batches, tmp_path_factory):
    b1, _ = batches
    d = str(tmp_path_factory.mktemp("upsert_ix"))
    idx = LexicalIndex.build_transcripts(spark, b1, d, num_segments=2, num_buckets=4)
    victim = idx.search("w3", limit=1).hits["doc_id"][0]
    conv_id, turn_idx = victim.rsplit(":", 1)
    replacement = spark.createDataFrame(
        [(victim, conv_id, int(turn_idx), "user", None, "zzreplacement token only")],
        "doc_id string, conv_id string, turn_idx long, role string, tool string, content string",
    )
    idx.upsert(replacement, sort_cols=("conv_id", "turn_idx"))
    assert list(idx.search("zzreplacement", limit=5).hits["doc_id"]) == [victim]
    assert victim not in list(idx.search("w3", limit=400).hits["doc_id"])
    # exactly one live row per doc_id
    live = idx.engine._filter_tombstones(
        idx.engine._read_live("docs").select("docid", "doc_id")
    )
    dups = live.groupBy("doc_id").count().where("count > 1").count()
    assert dups == 0


def test_delete_keeps_at_seal_stats(spark, batches, tmp_path_factory):
    b1, _ = batches
    d = str(tmp_path_factory.mktemp("del_ix"))
    idx = LexicalIndex.build_transcripts(spark, b1, d, num_segments=2, num_buckets=4)
    before = _hits(idx, "w3", k=20)
    victims = [doc for doc, _ in before[:3]]
    n = idx.delete(victims)
    assert n == 3
    after = _hits(idx, "w3", k=20)
    surviving = [h for h in before if h[0] not in set(victims)][: len(after)]
    # deleted docs vanish; remaining docs keep their exact at-seal scores
    assert after[: len(surviving)] == surviving
    assert idx.delete(victims) == 0  # idempotent


def test_compact_equals_fresh_rebuild(spark, batches, tmp_path_factory):
    b1, _ = batches
    d = str(tmp_path_factory.mktemp("compact_ix"))
    idx = LexicalIndex.build_transcripts(spark, b1, d, num_segments=2, num_buckets=4)
    all_ids = [r["doc_id"] for r in idx.storage.read("docs").select("doc_id").collect()]
    victims = sorted(all_ids)[:: 4]  # 25% spread across segments
    idx.delete(victims)
    mapping = idx.maintenance.compact(max_density=0.10)
    assert mapping
    idx.reopen()
    # docids preserved (gaps legal): surviving docids unchanged
    survivors = spark.createDataFrame(
        [(i,) for i in sorted(set(all_ids) - set(victims))], "doc_id string"
    )
    fresh_dir = str(tmp_path_factory.mktemp("fresh_ix"))
    fresh_docs = transcript_batch_to_docs(b1).join(survivors, "doc_id")
    fresh = LexicalIndex(spark, fresh_dir).build(
        fresh_docs,
        text_fields=("content",),
        keyword_fields=("conv_id", "role", "tool"),
        i64_fields=("turn_idx",),
        stored_fields=("ts",),
        sort_cols=("conv_id", "turn_idx"),
        num_segments=2,
        num_buckets=4,
    )
    for query in QUERIES:
        got = _hits(idx, query)
        exp = _hits(fresh, query)
        assert [g[0] for g in got] == [e[0] for e in exp], query
        assert np.array_equal(
            np.array([g[1] for g in got]), np.array([e[1] for e in exp])
        ), query
    # tombstones for compacted segments folded away
    dens = idx.maintenance.tombstone_density()
    assert all(v == 0.0 for v in dens.values())


def test_concat_merge_invariance_and_gc(spark, bulk, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("merge_ix"))
    idx = LexicalIndex.build_transcripts(spark, corpus, d, num_segments=3, num_buckets=4)
    before = {query: _hits(idx, query) for query in QUERIES}
    segs = idx.storage.live_segments()
    out = idx.maintenance.concat_merge(segs)
    idx.reopen()
    assert idx.storage.live_segments() == [out]
    for query in QUERIES:
        assert _hits(idx, query) == before[query], query
    removed = idx.maintenance.gc()
    assert removed  # superseded segment dirs reclaimed
    idx.reopen()
    for query in QUERIES:
        assert _hits(idx, query) == before[query], query


def test_tier_merge_planner(spark, batches, tmp_path_factory):
    b1, _ = batches
    d = str(tmp_path_factory.mktemp("tier_ix"))
    idx = LexicalIndex.build_transcripts(spark, b1, d, num_segments=8, num_buckets=4)
    plans = idx.maintenance.plan_tier_merge(fanout=8)
    assert plans and len(plans[0]) == 8  # eight consecutive small segments


def test_stream_ingest_equals_batch(spark, batches, bulk, tmp_path_factory):
    b1, b2 = batches
    d = str(tmp_path_factory.mktemp("stream_ix"))
    idx = LexicalIndex.build_transcripts(spark, b1, d, num_segments=2, num_buckets=4)
    src = str(tmp_path_factory.mktemp("stream_src"))
    b2.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(b2.schema).parquet(src)
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    query = stream_ingest(idx, stream, ckpt, trigger_available_now=True)
    query.awaitTermination(120)
    idx.reopen()
    for qs in QUERIES:
        assert _hits(idx, qs) == _hits(bulk, qs), qs
