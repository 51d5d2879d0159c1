"""Analyzer conformance vs the reference's language-contract fixtures."""

from __future__ import annotations

from frankensearch_spark.functions.analyze import (
    analyze_terms,
    is_admitted,
    tokenize,
    tokenize_batch,
)


def test_default_analyzer_cases(contract_fixture):
    for case in contract_fixture["analyzer_cases"]:
        if case.get("analyzer") != "frankensearch_default":
            continue
        if "generated_input" in case:
            gen = case["generated_input"]
            term = gen["repeat"] * gen.get("count_bytes", gen.get("count", 0))
            if case.get("token_admission") == "kept":
                assert is_admitted(term)
            elif case.get("token_admission") == "dropped":
                assert not is_admitted(term)
            continue
        toks = tokenize(case["input"])
        got = [
            {
                "text": t.text,
                "position": t.position,
                "offset_from": t.offset_from,
                "offset_to": t.offset_to,
                "position_length": 1,
            }
            for t in toks
        ]
        assert got == case["expected_tokens"], case["id"]


def test_splits_and_lowercase():
    assert analyze_terms("Rust POL-358") == ["rust", "pol", "358"]
    assert analyze_terms("SearchIndex::new") == ["searchindex", "new"]
    assert analyze_terms("src/main.rs") == ["src", "main", "rs"]
    assert analyze_terms("underscore_split") == ["underscore", "split"]
    assert analyze_terms("") == []
    assert analyze_terms("   \t\n ") == []
    assert analyze_terms("...!!!") == []


def test_batch_matches_single():
    texts = ["Rust POL-358", "ÉCLAIR 東京", "", "İ", "a_b c"]
    batch = tokenize_batch(texts)
    for text, row in zip(texts, batch):
        assert [t for t in row if t is not None] == analyze_terms(text)


def test_batch_positions_are_indexes():
    row = tokenize_batch(["one two three"])[0]
    assert row == ["one", "two", "three"]
