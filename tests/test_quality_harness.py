"""Search-quality harness over the reference relevance fixture.

Port of the reference's deterministic relevance harness
(``crates/frankensearch-fsfs/tests/search_quality_harness.rs``): index the
shared corpus fixture, run the 20 ``relevance.json`` queries, compute
nDCG@10 / MRR / Recall@10 against ``expected_top_10`` (metric definitions
mirror ``frankensearch-core/src/metrics_eval.rs:25-143`` — binary
relevance, dedup-aware), and assert the reference's own invariants
(finite, strictly positive).  Because ``expected_top_10`` was recorded
from the full hybrid fsfs pipeline (lexical + semantic tiers) while this
engine is the lexical tier alone, the harness additionally asserts
RANK-IDENTITY of the Spark engine against the independent oracle on every
relevance query — the lexical-tier conformance statement the fixture can
actually pin.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.oracle import OracleIndex

TOP_K = 10


@pytest.fixture(scope="module")
def built(spark, corpus_fixture, tmp_path_factory):
    docs = corpus_fixture["documents"]
    index_dir = str(tmp_path_factory.mktemp("quality_index"))
    rows = [
        {
            "doc_id": d["doc_id"],
            "content": d["content"],
            "title": d.get("title", ""),
            "doc_type": d.get("doc_type", ""),
        }
        for d in docs
    ]
    index = LexicalIndex(spark, index_dir).build(
        spark.createDataFrame(rows),
        text_fields=("content", "title"),
        keyword_fields=("doc_type",),
        stored_fields=("content", "title"),
        sort_cols=("doc_id",),
        num_segments=4,
        num_buckets=8,
    )
    return index, OracleIndex(docs)


# ── metric kernels (metrics_eval.rs parity: binary relevance, dedup) ─────


def ndcg_at_k(retrieved: list[str], relevant: list[str], k: int) -> float:
    rel = set(relevant)
    if not rel or k == 0:
        return 0.0
    seen: set[str] = set()
    dcg = 0.0
    for i, doc in enumerate(retrieved[:k]):
        if doc in seen:
            continue
        seen.add(doc)
        if doc in rel:
            dcg += 1.0 / math.log2(i + 2.0)
    idcg = sum(1.0 / math.log2(i + 2.0) for i in range(min(k, len(rel))))
    return dcg / idcg if idcg else 0.0


def mrr(retrieved: list[str], relevant: list[str]) -> float:
    rel = set(relevant)
    seen: set[str] = set()
    for i, doc in enumerate(retrieved):
        if doc in seen:
            continue
        seen.add(doc)
        if doc in rel:
            return 1.0 / (i + 1.0)
    return 0.0


def recall_at_k(retrieved: list[str], relevant: list[str], k: int) -> float:
    rel = set(relevant)
    if not rel or k == 0:
        return 0.0
    seen: set[str] = set()
    found = 0
    for doc in retrieved[:k]:
        if doc in seen:
            continue
        seen.add(doc)
        if doc in rel:
            found += 1
    return found / len(rel)


def test_relevance_queries_rank_identical_to_oracle(built, relevance_fixture):
    """Lexical-tier RankExact: Spark top-10 ≡ oracle top-10 (ids AND f32
    scores) on every relevance query — the conformance contract this
    fixture pins for the BM25 tier."""
    index, oracle = built
    for case in relevance_fixture["queries"]:
        query = case["query"]
        engine_hits = index.search(query, limit=TOP_K).hits
        oracle_hits = oracle.search(query, limit=TOP_K)
        assert list(engine_hits["docid"]) == [h.docid for h in oracle_hits], query
        assert np.array_equal(
            np.asarray(engine_hits["score"], dtype=np.float32),
            np.asarray([h.score for h in oracle_hits], dtype=np.float32),
        ), query


def test_quality_metrics_against_expected_top10(built, relevance_fixture):
    """The reference harness's overall-summary invariants: every metric is
    finite and strictly positive over the 20 relevance queries, plus a
    floor that a working BM25 tier clears comfortably."""
    index, _ = built
    queries = relevance_fixture["queries"]
    assert len(queries) == 20
    ndcgs, mrrs, recalls = [], [], []
    for case in queries:
        retrieved = list(index.search(case["query"], limit=TOP_K).hits["doc_id"])
        expected = case["expected_top_10"]
        ndcgs.append(ndcg_at_k(retrieved, expected, TOP_K))
        mrrs.append(mrr(retrieved, expected))
        recalls.append(recall_at_k(retrieved, expected, TOP_K))
    mean_ndcg = sum(ndcgs) / len(ndcgs)
    mean_mrr = sum(mrrs) / len(mrrs)
    mean_recall = sum(recalls) / len(recalls)
    for value in (mean_ndcg, mean_mrr, mean_recall):
        assert math.isfinite(value)
        assert value > 0.0
    # Floors sit below the measured lexical-only values (nDCG 0.446,
    # MRR 0.95, Recall 0.315 — expected_top_10 includes the semantic
    # tiers' contribution, so lexical-only recall of the full ten is
    # structurally partial while first-relevant rank is near-perfect).
    # They flag collapse, not drift (the reference asserts only > 0).
    assert mean_ndcg >= 0.35, ndcgs
    assert mean_mrr >= 0.80, mrrs
    assert mean_recall >= 0.25, recalls
