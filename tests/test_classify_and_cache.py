"""Query classification (query.rs:461 parity) + cache key semantics."""

from __future__ import annotations

from frankensearch_spark.plans.query import classify_query


def test_classify_query_cases():
    assert classify_query("") == "empty"
    assert classify_query("   ") == "empty"
    assert classify_query('"error handling"') == "phrase"
    assert classify_query("'single quoted'") == "phrase"
    assert classify_query("rust") == "simple"
    assert classify_query("  rust  ") == "simple"
    assert classify_query("rust ownership") == "boolean"
    assert classify_query("a AND b OR c") == "boolean"


def test_classify_matches_fixture_classes(contract_fixture):
    """Harvested queries carry query_class metadata; our classifier must
    bucket the unambiguous ones consistently (phrase/empty)."""
    for case in contract_fixture["harvested_queries"]:
        got = classify_query(case["query"])
        if case["query_class"] == "phrase":
            assert got == "phrase", case["id"]
