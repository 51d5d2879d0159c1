"""Metamorphic invariances (reference plan §15.3).

Results — docids, scores, ranks — must be invariant to the physical
partitioning of the build (merge=concat law Q1-OB3) and to the input row
order (docids derive from the stable sort, not arrival order).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.sources.transcripts import synthetic_transcripts

QUERIES = ["w3", "w3 w47 w200", "w12 AND w47", '"w3 w3"', "w1*"]


@pytest.fixture(scope="module")
def corpus(spark):
    t = synthetic_transcripts(spark, 1_500, vocab_size=300).persist()
    t.count()
    yield t
    t.unpersist()


def _results(index, query):
    h = index.search(query, limit=10).hits
    return [
        (int(d), s)
        for d, s in zip(h["docid"], np.asarray(h["score"], dtype=np.float32))
    ]


def test_partition_count_invariance(spark, corpus, tmp_path_factory):
    """1-segment and 7-segment builds give identical docids AND scores."""
    one = LexicalIndex.build_transcripts(
        spark, corpus, str(tmp_path_factory.mktemp("seg1")), num_segments=1, num_buckets=4
    )
    many = LexicalIndex.build_transcripts(
        spark, corpus, str(tmp_path_factory.mktemp("seg7")), num_segments=7, num_buckets=4
    )
    for query in QUERIES:
        assert _results(one, query) == _results(many, query), query


def test_input_order_permutation_invariance(spark, corpus, tmp_path_factory):
    """Shuffled input rows produce the identical index results."""
    base = LexicalIndex.build_transcripts(
        spark, corpus, str(tmp_path_factory.mktemp("ord")), num_segments=3, num_buckets=4
    )
    shuffled = corpus.orderBy(F.hash("text", F.lit(99)))
    perm = LexicalIndex.build_transcripts(
        spark, shuffled, str(tmp_path_factory.mktemp("perm")), num_segments=3, num_buckets=4
    )
    for query in QUERIES:
        assert _results(base, query) == _results(perm, query), query


def test_index_twice_equivalence(spark, corpus, tmp_path_factory):
    """Rebuilding into the same directory reproduces identical results."""
    d = str(tmp_path_factory.mktemp("twice"))
    first = LexicalIndex.build_transcripts(spark, corpus, d, num_segments=3, num_buckets=4)
    expected = {q: _results(first, q) for q in QUERIES}
    again = LexicalIndex.build_transcripts(spark, corpus, d, num_segments=3, num_buckets=4)
    for query in QUERIES:
        assert _results(again, query) == expected[query], query
