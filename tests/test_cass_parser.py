"""CASS parser conformance vs the reference parse-tree fixtures (39 cases)."""

from __future__ import annotations

import pytest

from frankensearch_spark.plans import cass, glob
from frankensearch_spark.plans import query as q
from test_parser import ast_to_fixture


def to_filters(payload: dict) -> cass.CassFilters:
    return cass.CassFilters(
        agents=tuple(payload.get("agents", ())),
        workspaces=tuple(payload.get("workspaces", ())),
        created_from=payload.get("created_from"),
        created_to=payload.get("created_to"),
        source_filter=payload.get("source_filter", "all"),
        source_id=payload.get("source_id"),
    )


def serialize(node) -> dict:
    """Fixture-AST serialization incl. CASS Range bounds and Glob fields."""
    if isinstance(node, q.RangeQ):
        def bound(value, inclusive):
            if value is None:
                return {"bound": "Unbounded"}
            return {"bound": "Included" if inclusive else "Excluded", "value": value}

        return {
            "type": "RangeI64" if not isinstance(node.lower or node.upper, str) else "RangeStr",
            "field": node.field,
            "lower": bound(node.lower, node.lower_inclusive),
            "upper": bound(node.upper, node.upper_inclusive),
        }
    if isinstance(node, q.Boolean):
        out = {
            "type": "Boolean",
            "children": [
                {"occur": c.occur.value, "query": serialize(c.query)}
                for c in node.clauses
            ],
        }
        if node.operator:
            out["operator"] = node.operator
        return out
    if isinstance(node, q.Boost):
        return {"type": "Boost", "factor": node.factor, "query": serialize(node.query)}
    return ast_to_fixture(node)


def normalize_expected(ast: dict) -> dict:
    """Strip fixture annotation keys; canonicalize bound dicts."""
    if not isinstance(ast, dict):
        return ast
    out = {}
    for k, v in ast.items():
        if k in ("score", "minimum_should_match", "matching_semantics", "matched_score"):
            continue
        if k == "children":
            out[k] = [
                {"occur": c["occur"], "query": normalize_expected(c["query"])}
                for c in v
            ]
        elif k in ("query",):
            out[k] = normalize_expected(v)
        else:
            out[k] = v
    return out


@pytest.fixture(scope="module")
def cass_cases(contract_fixture):
    cases = {
        c["id"]: c
        for c in contract_fixture["parse_tree_cases"]
        if c.get("parser") == "cass"
    }
    # resolve {"ref": "..."} expected ASTs
    for c in cases.values():
        ast = c["expected_ast"]
        while isinstance(ast, dict) and set(ast) == {"ref"}:
            ast = cases[ast["ref"]]["expected_ast"]
        c["_resolved_ast"] = ast
    return cases


def test_cass_parse_trees(cass_cases):
    parser = cass.CassQueryParser()
    failures = []
    for cid, case in sorted(cass_cases.items()):
        expected = normalize_expected(case["_resolved_ast"])
        if expected.get("type") == "Glob":
            continue  # classification cases covered separately
        filters = to_filters(case.get("filters", {}))
        parsed = parser.parse(case["input"], filters)
        got = serialize(parsed.query)
        if got != expected:
            failures.append(f"{cid}: input={case['input']!r}\n  got={got}\n  exp={expected}")
        want_diag = case.get("expected_diagnostic")
        if want_diag and not any(
            want_diag.lower() in d.message.lower() or want_diag.lower() in d.kind.lower()
            for d in parsed.diagnostics
        ):
            failures.append(
                f"{cid}: missing diagnostic {want_diag!r}; got "
                f"{[d.message for d in parsed.diagnostics]}"
            )
    assert not failures, f"{len(failures)} mismatches:\n" + "\n\n".join(failures)


def test_cass_glob_classification(cass_cases):
    """Glob fixture cases pin wildcard classification + lowering strategy."""
    parser = cass.CassQueryParser()
    class_of = {
        glob.EXACT: "Exact",
        glob.PREFIX: "Prefix",
        glob.SUFFIX: "Suffix",
        glob.SUBSTRING: "Substring",
        glob.COMPLEX: "Complex",
    }
    for cid, case in sorted(cass_cases.items()):
        expected = case["_resolved_ast"]
        if expected.get("type") != "Glob":
            continue
        kind, core = glob.classify(case["input"])
        assert class_of[kind] == expected["class"], cid
        parsed = parser.parse(case["input"]).query
        if expected["strategy"] == "TermQuery":
            # Exact/Prefix lower to an exact Term over the four searchable
            # fields (prefix acceleration = exact probe of *_prefix fields)
            assert isinstance(parsed, q.Term), cid
            assert [f.name for f in parsed.fields] == list(expected["fields"]), cid
            assert parsed.text == expected.get("normalized_term", expected["pattern"])
        else:  # RegexQuery
            assert isinstance(parsed, q.Glob), cid
            assert list(parsed.fields) == list(expected["fields"]), cid
            assert parsed.pattern == expected["pattern"].lower(), cid
            # our anchored rlike regex accepts exactly the FST regex's terms
            core_regex = glob.to_regex(parsed.pattern)
            assert core_regex.startswith("^") and core_regex.endswith("$"), cid


def test_cass_sanitizer_and_lexer_edges():
    parser = cass.CassQueryParser()
    # carriage return is not whitespace: 'auth\rOR\rcache' is ONE term run
    parsed = parser.parse("auth\rOR\rcache")
    ast = serialize(parsed.query)
    assert ast["type"] == "Boolean" and ast["operator"] == "AND"
    texts = [c["query"]["text"] for c in ast["children"]]
    assert texts == ["auth", "or", "cache"]
    # sanitizer: punctuation -> space, compound identifiers split
    parsed2 = parser.parse("SearchIndex::new")
    ast2 = serialize(parsed2.query)
    assert ast2["type"] == "Boolean" and ast2["operator"] == "AND"
    assert [c["query"]["text"] for c in ast2["children"]] == ["searchindex", "new"]
