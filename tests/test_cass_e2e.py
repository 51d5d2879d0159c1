"""End-to-end CASS surface: CASS-analyzed index + CASS grammar queries.

Engine and oracle both run the CASS analyzer family (hyphen compounds,
CJK bigrams, edge-n-gram prefix fields) and evaluate CassQueryParser
trees; results must be rank- and score-identical.
"""

from __future__ import annotations

import numpy as np
import pytest

from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.oracle import OracleIndex
from frankensearch_spark.plans.cass import CassFilters, CassQueryParser

ANALYZERS = {
    "title": "cass_hyphen",
    "content": "cass_hyphen",
    "title_prefix": "cass_prefix",
    "content_prefix": "cass_prefix",
}
DERIVED = {"title_prefix": "title", "content_prefix": "content"}


@pytest.fixture(scope="module")
def built(spark, corpus_fixture, tmp_path_factory):
    docs = corpus_fixture if isinstance(corpus_fixture, list) else corpus_fixture["documents"]
    def epoch(v) -> int:
        if isinstance(v, (int, float)):
            return int(v)
        from datetime import datetime

        return int(
            datetime.fromisoformat(str(v).replace("Z", "+00:00")).timestamp()
        )

    rows = [
        {
            "doc_id": d["doc_id"],
            "title": d.get("title", ""),
            "content": d["content"],
            "doc_type": d.get("doc_type", ""),
            "created_at": epoch(d.get("created_at", 0)),
        }
        for d in docs
    ]
    index_dir = str(tmp_path_factory.mktemp("cass_index"))
    df = spark.createDataFrame(rows)
    index = LexicalIndex(spark, index_dir).build_cass(
        df,
        keyword_fields=("doc_type",),
        i64_fields=("created_at",),
        sort_cols=("doc_id",),
        num_segments=3,
        num_buckets=8,
    )
    oracle = OracleIndex(
        rows,
        text_fields=("title", "content", "title_prefix", "content_prefix"),
        keyword_fields=("id", "doc_type"),
        i64_fields=("created_at",),
        analyzers=ANALYZERS,
        derived_prefix_fields=DERIVED,
    )
    parser = CassQueryParser(agent_field="doc_type", created_at_field="created_at")
    return index, oracle, parser


def _compare(index, oracle, tree, k=10):
    engine_hits = index.search(tree, limit=k).hits
    oracle_hits = oracle.search(tree, limit=k)
    assert list(engine_hits["docid"]) == [h.docid for h in oracle_hits]
    assert np.array_equal(
        np.asarray(engine_hits["score"], dtype=np.float32),
        np.asarray([h.score for h in oracle_hits], dtype=np.float32),
    )
    return engine_hits


def test_cass_query_set(built):
    index, oracle, parser = built
    for q in [
        "rust ownership",
        "rust OR cooking AND recipe",
        "rust -ownership",
        "auth && token",
        "memory||cache",
        "NOT NOT rust",
        '"error handling"',
        '"error handling" rust',
        "error-handling",  # hyphen compound + parts
    ]:
        tree = parser.parse(q).query
        _compare(index, oracle, tree)


def test_cass_prefix_acceleration(built):
    """'rust*' probes the edge-n-gram prefix fields as an exact term."""
    index, oracle, parser = built
    tree = parser.parse("rust*").query
    hits = _compare(index, oracle, tree)
    assert not hits.empty
    # docs containing only longer words like 'rusty' would still match via
    # the prefix fields; docs with 'rust' match all four fields


def test_cass_regex_glob(built):
    index, oracle, parser = built
    for q in ["*ship", "*own*", "own*ship"]:
        tree = parser.parse(q).query
        _compare(index, oracle, tree)


def test_cass_filters(built):
    index, oracle, parser = built
    tree = parser.parse(
        "rust", CassFilters(agents=("tutorial",), created_from=1)
    ).query
    engine_hits = index.search(tree, limit=20).hits
    oracle_hits = oracle.search(tree, limit=20)
    assert list(engine_hits["docid"]) == [h.docid for h in oracle_hits]


def test_cass_empty_query_is_all(built):
    index, oracle, parser = built
    tree = parser.parse("").query
    n = index.search(tree, limit=5, exact_count=True).total_count
    assert n == oracle.count(tree)
