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


def test_batch_ascii_fast_path_matches_regex_path():
    """The ASCII translate+split fast path must be row-identical to the
    regex+per-token path it bypasses (randomized + adversarial cases)."""
    import random
    import re

    from frankensearch_spark.functions.analyze import MAX_TERM_BYTES, _TOKEN_RE

    def regex_path(texts):
        out = []
        admit = MAX_TERM_BYTES // 4
        for text in texts:
            if not text:
                out.append([])
                continue
            raw = _TOKEN_RE.findall(text)
            row = [None] * len(raw)
            for i, tok in enumerate(raw):
                low = tok.lower()
                if len(low) <= admit or len(low.encode("utf-8")) <= MAX_TERM_BYTES:
                    row[i] = low
            out.append(row)
        return out

    rng = random.Random(1234)
    alphabet = "abcXYZ019 _-./!~\t\n"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))
        for _ in range(500)
    ]
    cases += [
        "",
        "   ",
        "_",
        "a",
        "A" * 100,
        "pol-358 src/main.rs",
        "MiXeD CaSe W3 w3",
        "x" * (MAX_TERM_BYTES + 10),  # overlong: takes the regex path
        "Grüße W47",  # non-ASCII: takes the regex path
        "0" * 65530,  # exactly at the cap: fast path, single admitted token
    ]
    assert tokenize_batch(cases) == regex_path(cases)
