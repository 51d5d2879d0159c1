"""Differential conformance: pruned (block-max / MaxScore) ≡ exhaustive.

The reference's internal differential (plan §15.2: pruned(MaxScore/BMW) ≡
exhaustive) on a corpus large enough that terms span many 128-posting
blocks, so the block filter and the non-essential-leaf split actually
engage.
"""

from __future__ import annotations

import numpy as np
import pytest

from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.plans.eval import compile_query
from frankensearch_spark.operators.pruned import pruned_applicable
from frankensearch_spark.plans import query as q
from frankensearch_spark.sources.transcripts import synthetic_transcripts

QUERIES = [
    "w3 w47",
    "w1 w2 w3 w4",
    "w0 w9000",  # very common + very rare
    "w12 w47 w200 w1150 w3000",
    "w7",  # single term -> pruner declines, still equal
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("pruned_index"))
    transcripts = synthetic_transcripts(spark, 4_000, vocab_size=2_000)
    return LexicalIndex.build_transcripts(
        spark, transcripts, index_dir, num_segments=4, num_buckets=8
    )


def test_pruned_applicability():
    parser = q.DefaultQueryParser(q.DEFAULT_SCHEMA)
    assert pruned_applicable(compile_query(parser.parse_lenient("a b c").query))
    assert not pruned_applicable(
        compile_query(parser.parse_lenient("a AND b").query)
    )
    assert not pruned_applicable(compile_query(parser.parse_lenient('"a b"').query))
    assert not pruned_applicable(compile_query(parser.parse_lenient("a -b").query))


@pytest.mark.parametrize("query", QUERIES)
def test_pruned_equals_exhaustive(built, query):
    exhaustive = built.search(query, limit=10, prune=False).hits
    pruned = built.search(query, limit=10, prune=True).hits
    assert list(pruned["docid"]) == list(exhaustive["docid"]), query
    assert np.array_equal(
        np.asarray(pruned["score"], dtype=np.float32),
        np.asarray(exhaustive["score"], dtype=np.float32),
    ), query


def test_pruned_k_larger_than_matches(built):
    exhaustive = built.search("w9000 w9100", limit=500, prune=False).hits
    pruned = built.search("w9000 w9100", limit=500, prune=True).hits
    assert list(pruned["docid"]) == list(exhaustive["docid"])


def test_pruned_equals_exhaustive_after_delete(built):
    """Rank-safety with tombstones: deleted docs must not inflate the
    pruning threshold τ (they'd prune blocks holding the live top-k).

    Regression for the round-1 advisory: _seed_threshold scored tombstoned
    docs, so deleting high-tf docs flipped pruned vs exhaustive results.
    """
    # delete the exhaustive top-20 of the target query — exactly the docs
    # that used to inflate τ
    top = built.search("w3 w47", limit=20, prune=False).hits
    built.delete(list(top["doc_id"]))
    # NOTE: mutates the module-scoped index — keep this the file's last test
    for query in ["w3 w47", "w1 w2 w3 w4", "w12 w47 w200 w1150 w3000"]:
        exhaustive = built.search(query, limit=10, prune=False).hits
        pruned = built.search(query, limit=10, prune=True).hits
        assert list(pruned["docid"]) == list(exhaustive["docid"]), query
        assert np.array_equal(
            np.asarray(pruned["score"], dtype=np.float32),
            np.asarray(exhaustive["score"], dtype=np.float32),
        ), query
        # and none of the deleted docs appear
        assert not set(pruned["doc_id"]) & set(top["doc_id"]), query
