"""Default lenient parser conformance vs the reference parse-tree fixtures."""

from __future__ import annotations

import pytest

from frankensearch_spark.plans import query as q


def ast_to_fixture(node) -> dict:
    """Serialize our Query tree into the reference fixture AST format."""
    if isinstance(node, q.Empty):
        return {"type": "Empty"}
    if isinstance(node, q.All):
        return {"type": "All"}
    if isinstance(node, q.Term):
        return {
            "type": "Term",
            "text": node.text,
            "fields": [{"name": f.name, "boost": f.boost} for f in node.fields],
        }
    if isinstance(node, q.Phrase):
        return {
            "type": "Phrase",
            "terms": [t.text for t in node.terms],
            "slop": node.slop,
            "fields": [{"name": f.name, "boost": f.boost} for f in node.fields],
        }
    if isinstance(node, q.Boolean):
        out = {
            "type": "Boolean",
            "children": [
                {"occur": c.occur.value, "query": ast_to_fixture(c.query)}
                for c in node.clauses
            ],
        }
        if node.operator:
            out["operator"] = node.operator
        return out
    if isinstance(node, q.Boost):
        return {"type": "Boost", "factor": node.factor, "query": ast_to_fixture(node.query)}
    if isinstance(node, q.RangeQ):
        def bound(value, inclusive):
            return {"bound": "Included" if inclusive else "Excluded", "value": value}

        return {
            "type": "RangeStr" if isinstance(node.lower, str) or isinstance(node.upper, str) else "RangeI64",
            "field": node.field,
            "lower": bound(node.lower, node.lower_inclusive),
            "upper": bound(node.upper, node.upper_inclusive),
        }
    if isinstance(node, q.SetQ):
        return {
            "type": "SetStr" if all(isinstance(v, str) for v in node.values) else "SetI64",
            "field": node.field,
            "values": list(node.values),
        }
    if isinstance(node, q.Glob):
        return {"type": "Glob", "fields": list(node.fields), "pattern": node.pattern}
    raise AssertionError(f"unserializable node {node!r}")


def normalize_expected(ast: dict) -> dict:
    """Drop annotation-only keys from the fixture AST (score, min_should...)."""
    if not isinstance(ast, dict):
        return ast
    out = {}
    for k, v in ast.items():
        if k in ("score", "minimum_should_match", "matching_semantics"):
            continue
        if k == "children":
            out[k] = [
                {"occur": c["occur"], "query": normalize_expected(c["query"])} for c in v
            ]
        elif k == "query":
            out[k] = normalize_expected(v)
        else:
            out[k] = v
    return out


def default_parser():
    return q.DefaultQueryParser(q.DEFAULT_SCHEMA)


def test_default_lenient_parse_trees(contract_fixture):
    parser = default_parser()
    failures = []
    for case in contract_fixture["parse_tree_cases"]:
        if case.get("parser") != "default_lenient":
            continue
        parsed = parser.parse_lenient(case["input"])
        got = ast_to_fixture(parsed.query)
        expected = normalize_expected(case["expected_ast"])
        if got != expected:
            failures.append((case["id"], case["input"], got, expected))
    if failures:
        lines = []
        for cid, inp, got, exp in failures:
            lines.append(f"{cid}: input={inp!r}\n  got={got}\n  exp={exp}")
        pytest.fail(
            f"{len(failures)} parse-tree mismatches:\n" + "\n".join(lines)
        )


def test_truncation_10k_chars():
    parser = default_parser()
    parsed = parser.parse_lenient("é" * 10_001)
    assert parsed.was_truncated
    parsed2 = parser.parse_lenient("a" * 10_000)
    assert not parsed2.was_truncated


def test_empty_and_whitespace_queries():
    parser = default_parser()
    assert isinstance(parser.parse_lenient("").query, q.Empty)
    assert isinstance(parser.parse_lenient("   \t  ").query, q.Empty)
    assert isinstance(parser.parse_lenient("&&& !!!").query, q.Empty)
