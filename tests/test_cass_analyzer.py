"""CASS analyzer family conformance vs the language-contract fixtures."""

from __future__ import annotations

from frankensearch_spark.functions.cass_analyze import (
    cass_analyze,
    cass_analyze_prefix,
    cass_build_preview,
    cass_generate_edge_ngrams,
)


def tokens_as_fixture(toks):
    return [
        {
            "text": t.text,
            "position": t.position,
            "offset_from": t.offset_from,
            "offset_to": t.offset_to,
            "position_length": t.position_length,
        }
        for t in toks
    ]


def test_cass_analyzer_cases(contract_fixture):
    for case in contract_fixture["analyzer_cases"]:
        analyzer = case.get("analyzer")
        if analyzer not in ("hyphen_normalize", "prefix_normalize"):
            continue
        run = cass_analyze if analyzer == "hyphen_normalize" else cass_analyze_prefix
        if "generated_input" in case:
            gen = case["generated_input"]
            term = gen["repeat"] * gen.get("count_bytes", gen.get("count", 0))
            toks = run(term)
            if "expected_token_count" in case:
                assert len(toks) == case["expected_token_count"], case["id"]
                tok = toks[0]
                assert len(tok.text.encode()) == case["expected_token_bytes"]
                assert set(tok.text) == {case["expected_token_repeat"]}
            else:
                assert tokens_as_fixture(toks) == case["expected_tokens"], case["id"]
            continue
        got = tokens_as_fixture(run(case["input"]))
        assert got == case["expected_tokens"], case["id"]


def test_helper_cases(contract_fixture):
    for case in contract_fixture["helper_cases"]:
        helper = case["helper"]
        if helper == "cass_generate_edge_ngrams":
            got = cass_generate_edge_ngrams(case["input"])
            if "expected" in case:
                assert got == case["expected"], case["id"]
            else:
                prefixes = got.split(" ") if got else []
                assert len(prefixes) == case["expected_prefix_count"], case["id"]
                assert prefixes[-1] == case["last_expected_prefix"], case["id"]
        elif helper == "cass_build_preview":
            got = cass_build_preview(case["input"], case["max_chars"])
            assert got == case["expected"], case["id"]


def test_hyphen_and_prefix_semantics():
    # compound + parts share position and compound offsets
    toks = cass_analyze("BD-Q3FY search")
    assert [(t.text, t.position) for t in toks] == [
        ("bd-q3fy", 0),
        ("bd", 0),
        ("q3fy", 0),
        ("search", 1),
    ]
    # trailing hyphen is a separator, interior hyphen joins
    assert [t.text for t in cass_analyze("a-b- c")] == ["a-b", "a", "b", "c"]
    # prefix analyzer keeps compounds whole
    assert [t.text for t in cass_analyze_prefix("BD-Q3FY")] == ["bd-q3fy"]
    # non-ASCII latin letters are separators (é is not CASS-alnum)
    assert [t.text for t in cass_analyze("éclair")] == ["clair"]
