"""Direct-boolean matching-semantics conformance.

The reference contract's four ``parser: direct_boolean`` parse_tree_cases
(quill_language_contract.json) pin the matching semantics of
programmatically-constructed Boolean queries — Tantivy's
minimum-should-match rules (reference: crates/frankensearch-quill
BooleanQuery lowering):

* Must present        -> Should clauses are optional score bonuses
                         (minimum_should_match = 0);
* Should only         -> at least one Should must match
                         (minimum_should_match = 1);
* Should + MustNot    -> the Should is required, MustNot excludes;
* MustNot only        -> matches nothing (``matching_semantics: empty``).

These are NOT string-parser cases (``input: "synthetic"``), so we build the
ASTs straight from each case's ``expected_ast`` and assert the semantics
end-to-end: engine hits == brute-force oracle hits == hand-derived doc sets.
"""

from __future__ import annotations

import numpy as np
import pytest

from frankensearch_spark.index import LexicalIndex
from frankensearch_spark.oracle import OracleIndex
from frankensearch_spark.plans import query as q

CONTENT = (q.QueryField("content", 1.0),)

#: Purpose-built corpus: every membership combination the four cases can
#: discriminate on appears at least once.
DOCS = [
    ("d00", "required only here"),
    ("d01", "required bonus together"),
    ("d02", "required excluded mixture"),
    ("d03", "required bonus excluded everything"),
    ("d04", "bonus alone text"),
    ("d05", "excluded alone text"),
    ("d06", "first thing text"),
    ("d07", "second thing text"),
    ("d08", "first second both"),
    ("d09", "neither nothing matches"),
    ("d10", "included text body"),
    ("d11", "included excluded body"),
]


def _ast_from_fixture(node: dict) -> q.Query:
    """Build our Query tree from the fixture AST (content-field terms)."""
    t = node["type"]
    if t == "Term":
        return q.Term(fields=CONTENT, text=node["text"])
    if t == "Boolean":
        clauses = tuple(
            q.BooleanClause(occur=q.Occur(c["occur"]), query=_ast_from_fixture(c["query"]))
            for c in node["children"]
        )
        return q.Boolean(clauses=clauses)
    raise AssertionError(f"unexpected fixture node {t!r}")


@pytest.fixture(scope="module")
def direct_cases(contract_fixture):
    cases = [
        c for c in contract_fixture["parse_tree_cases"] if c.get("parser") == "direct_boolean"
    ]
    assert len(cases) == 4, "contract should carry exactly 4 direct_boolean cases"
    return {c["id"]: c for c in cases}


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("direct_bool_index"))
    rows = [
        {"doc_id": d, "content": c, "title": "", "created_at": "", "doc_type": ""}
        for d, c in DOCS
    ]
    df = spark.createDataFrame(rows)
    index = LexicalIndex(spark, index_dir).build(
        df,
        text_fields=("content", "title"),
        keyword_fields=("doc_type",),
        stored_fields=("content",),
        sort_cols=("doc_id",),
        num_segments=2,
        num_buckets=4,
    )
    oracle = OracleIndex(
        [{"doc_id": d, "content": c, "title": ""} for d, c in DOCS]
    )
    return index, oracle


def _run(built, case) -> list[str]:
    """Engine and oracle must agree exactly (ranks AND f32 scores);
    return the matched doc_ids (rank order)."""
    index, oracle = built
    tree = _ast_from_fixture(case["expected_ast"])
    engine_hits = index.search(tree, limit=len(DOCS)).hits
    oracle_hits = oracle.search(tree, limit=len(DOCS))
    assert list(engine_hits["doc_id"]) == [h.doc_id for h in oracle_hits], case["id"]
    eng = np.asarray(engine_hits["score"], dtype=np.float32)
    ora = np.asarray([h.score for h in oracle_hits], dtype=np.float32)
    assert np.array_equal(eng, ora), case["id"]
    return list(engine_hits["doc_id"])


def test_should_optional_with_must(built, direct_cases):
    """Must(required) + Should(bonus) + MustNot(excluded): Should is a pure
    score bonus (min_should_match=0); MustNot vetoes."""
    got = _run(built, direct_cases["query-boolean-should-optional-with-must"])
    # d00 (required only) matches even without "bonus"; d02/d03 are vetoed.
    assert set(got) == {"d00", "d01"}
    # the Should clause contributes score: d01 must outrank d00.
    assert got.index("d01") < got.index("d00")


def test_should_only_required(built, direct_cases):
    """Should(first) + Should(second): at least one must match."""
    got = _run(built, direct_cases["query-boolean-should-only-required"])
    assert set(got) == {"d06", "d07", "d08"}
    # both-should doc accumulates both scores -> ranks first.
    assert got[0] == "d08"


def test_should_plus_mustnot_required(built, direct_cases):
    """Should(included) + MustNot(excluded): Should stays required."""
    got = _run(built, direct_cases["query-boolean-should-plus-mustnot-required"])
    assert set(got) == {"d10"}


def test_mustnot_only_empty(built, direct_cases):
    """MustNot-only boolean matches nothing (matching_semantics: empty)."""
    case = direct_cases["query-boolean-mustnot-only-empty"]
    assert case["expected_ast"]["matching_semantics"] == "empty"
    got = _run(built, case)
    assert got == []


def test_count_agrees_with_matches(built, direct_cases):
    """Exact-count mode obeys the same matching semantics."""
    index, oracle = built
    expected = {
        "query-boolean-should-optional-with-must": 2,
        "query-boolean-should-only-required": 3,
        "query-boolean-should-plus-mustnot-required": 1,
        "query-boolean-mustnot-only-empty": 0,
    }
    for cid, n in expected.items():
        tree = _ast_from_fixture(direct_cases[cid]["expected_ast"])
        assert oracle.count(tree) == n, cid
        res = index.search(tree, limit=1, exact_count=True)
        assert res.total_count == n, cid


def test_must_of_pure_negative_level_matches_nothing(built):
    """A MUST clause whose child is a pure-negative boolean zeroes the
    whole conjunction (the nested analogue of the mustnot-only-empty
    contract case): '+(-excluded) text' must return 0 hits, not degrade
    to 'text'.  Both the engine and the brute-force oracle share
    compile_query, so this pins the shared lowering, and the default
    parser really produces this shape for '+(-x) y'."""
    tree = q.Boolean(
        clauses=(
            q.BooleanClause(
                occur=q.Occur.MUST,
                query=q.Boolean(
                    clauses=(
                        q.BooleanClause(
                            occur=q.Occur.MUST_NOT,
                            query=q.Term(fields=CONTENT, text="excluded"),
                        ),
                    )
                ),
            ),
            q.BooleanClause(
                occur=q.Occur.SHOULD, query=q.Term(fields=CONTENT, text="text")
            ),
        )
    )
    index, oracle = built
    assert index.search(tree, limit=len(DOCS)).hits.empty
    assert oracle.search(tree, limit=len(DOCS)) == []
    # ...while a SHOULD disjunct of a pure-negative level just drops
    # (contributes nothing) and a MUST_NOT of one excludes nothing.
    tree2 = q.Boolean(
        clauses=(
            q.BooleanClause(
                occur=q.Occur.SHOULD,
                query=q.Boolean(
                    clauses=(
                        q.BooleanClause(
                            occur=q.Occur.MUST_NOT,
                            query=q.Term(fields=CONTENT, text="excluded"),
                        ),
                    )
                ),
            ),
            q.BooleanClause(
                occur=q.Occur.SHOULD, query=q.Term(fields=CONTENT, text="alone")
            ),
        )
    )
    got = list(index.search(tree2, limit=len(DOCS)).hits["doc_id"])
    assert set(got) == {"d04", "d05"}
