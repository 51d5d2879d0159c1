"""Query-tree compilation and vectorized float32 evaluation.

The query tree is compiled ONCE on the driver into:

* a flat list of :class:`LeafSpec` — the scored/filtering leaves the engine
  must produce candidate frames for (one per (field, term) pair, phrase,
  range, set, or All); and
* a JSON-serializable eval-tree ``spec`` whose nodes reference leaves by id.

Both the pure-numpy oracle and the Spark engine then evaluate the same spec
with :func:`evaluate_tree` over per-doc leaf match/score arrays.  Keeping one
evaluator guarantees the distributed engine and the oracle agree bit-for-bit
on the float32 accumulation order, which is part of the rank-exact contract
(reference: ``argus.rs:2403`` ReferenceScorer — f32 accumulation in scorer
tree order, required aggregate before optional Should aggregate).

Score semantics per node (all float32):

* Term leaf:    weight * f / (f + tf_cache[fieldnorm_id])
* Phrase leaf:  like Term with f = phrase occurrence count and
                weight = (sum of per-term idfs, left to right) * (1+k1) * boost
* All/Range/Set leaf: constant 1.0 when matched (ConstScorer semantics)
* Term/Phrase over multiple fields: any-match union; matched fields' scores
  summed in field-expansion order (content before title)
* Boolean: matched = all(Must) if Must else any(Should), minus any(MustNot);
  score = sum(Must scores in order) + sum(matching Should scores in order)
* Boost: child score * float32(factor)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable, Optional, Union

import numpy as np

from ..functions.contract import BM25_K1, idf as f32_idf
from . import query as q


@dataclass(frozen=True)
class LeafSpec:
    """One candidate-producing leaf the engine must materialize."""

    leaf_id: int
    kind: str  # "term" | "phrase" | "all" | "range" | "set" | "glob"
    field: str = ""
    term: str = ""  # for kind=="term"
    pattern: str = ""  # for kind=="glob": raw wildcard pattern
    terms: tuple[tuple[int, str], ...] = ()  # for kind=="phrase": (position, text)
    slop: int = 0
    boost: float = 1.0
    # range/set payloads (applied against the docs table)
    lower: Optional[Union[str, int]] = None
    upper: Optional[Union[str, int]] = None
    lower_inclusive: bool = True
    upper_inclusive: bool = True
    values: tuple = ()


@dataclass
class EvalPlan:
    leaves: list[LeafSpec] = dc_field(default_factory=list)
    spec: Optional[dict] = None  # eval tree; None == Empty query

    @property
    def is_empty(self) -> bool:
        return self.spec is None or self.spec.get("t") == "empty"

    def term_leaves(self) -> list[LeafSpec]:
        return [leaf for leaf in self.leaves if leaf.kind == "term"]


def compile_query(tree: q.Query) -> EvalPlan:
    """Lower a Query tree into leaf specs + a serializable eval spec."""
    plan = EvalPlan()

    def leaf(spec_kwargs) -> dict:
        leaf_id = len(plan.leaves)
        plan.leaves.append(LeafSpec(leaf_id=leaf_id, **spec_kwargs))
        return {"t": "leaf", "id": leaf_id}

    def walk(node: q.Query) -> Optional[dict]:
        if isinstance(node, q.Empty):
            return None
        if isinstance(node, q.All):
            return leaf({"kind": "all"})
        if isinstance(node, q.Term):
            children = [
                leaf({"kind": "term", "field": f.name, "term": node.text, "boost": f.boost})
                for f in node.fields
            ]
            if len(children) == 1:
                return children[0]
            return {"t": "union", "ch": children}
        if isinstance(node, q.Phrase):
            terms = tuple((t.position, t.text) for t in node.terms)
            children = [
                leaf(
                    {
                        "kind": "phrase",
                        "field": f.name,
                        "terms": terms,
                        "slop": node.slop,
                        "boost": f.boost,
                    }
                )
                for f in node.fields
            ]
            if len(children) == 1:
                return children[0]
            return {"t": "union", "ch": children}
        if isinstance(node, q.RangeQ):
            return leaf(
                {
                    "kind": "range",
                    "field": node.field,
                    "lower": node.lower,
                    "upper": node.upper,
                    "lower_inclusive": node.lower_inclusive,
                    "upper_inclusive": node.upper_inclusive,
                }
            )
        if isinstance(node, q.SetQ):
            return leaf({"kind": "set", "field": node.field, "values": tuple(node.values)})
        if isinstance(node, q.Boolean):
            must, should, must_not = [], [], []
            for clause in node.clauses:
                child = walk(clause.query)
                if child is None:
                    # the child level matches nothing (pure-negative or
                    # empty). Its effect depends on the occur: a MUST of
                    # match-nothing zeroes the whole conjunction (e.g.
                    # '+(-b) a' must return 0 hits, not degrade to 'a');
                    # a SHOULD disjunct of match-nothing contributes
                    # nothing; a MUST_NOT of match-nothing excludes
                    # nothing — the latter two simply drop.
                    if clause.occur is q.Occur.MUST:
                        return None
                    continue
                if clause.occur is q.Occur.MUST:
                    must.append(child)
                elif clause.occur is q.Occur.SHOULD:
                    should.append(child)
                else:
                    must_not.append(child)
            if not must and not should:
                return None  # pure-negative or empty level matches nothing
            return {"t": "bool", "must": must, "should": should, "not": must_not}
        if isinstance(node, q.Boost):
            child = walk(node.query)
            if child is None:
                return None
            return {"t": "boost", "f": float(node.factor), "ch": child}
        if isinstance(node, q.Glob):
            # One const-score leaf per field: matched = any dictionary term
            # matching the pattern occurs in the doc; score = 1.0 (the
            # reference's constant_score over an unscored term union —
            # index.rs lower_leaf_glob / lower_leaf_string_predicate).
            children = [
                leaf({"kind": "glob", "field": f, "pattern": node.pattern})
                for f in node.fields
            ]
            if len(children) == 1:
                return children[0]
            return {"t": "union", "ch": children}
        raise TypeError(f"unsupported query node {node!r}")

    plan.spec = walk(tree)
    return plan


def phrase_weight(
    term_doc_freqs: list[int], doc_count: int, boost: float
) -> np.float32:
    """Phrase BM25 weight: left-to-right f32 idf accumulation, then
    ``* (1 + k1)`` then ``* boost`` (fixture score-phrase-bm25)."""
    total = np.float32(0.0)
    for df in term_doc_freqs:
        total = np.float32(total + f32_idf(df, doc_count))
    weight = total * (np.float32(1.0) + BM25_K1)
    return np.float32(weight * np.float32(boost))


def evaluate_tree(
    spec: dict,
    leaf_matched: Callable[[int], np.ndarray],
    leaf_score: Callable[[int], np.ndarray],
    n: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate the compiled spec over n candidate docs.

    ``leaf_matched(leaf_id)`` -> bool[n]; ``leaf_score(leaf_id)`` -> f32[n].
    Returns (matched bool[n], score f32[n]); float32 accumulation strictly
    follows spec order.
    """
    if spec is None:
        return np.zeros(n, dtype=bool), np.zeros(n, dtype=np.float32)
    t = spec["t"]
    if t == "leaf":
        return leaf_matched(spec["id"]), leaf_score(spec["id"])
    if t == "union":
        matched = np.zeros(n, dtype=bool)
        score = np.zeros(n, dtype=np.float32)
        for child in spec["ch"]:
            m, s = evaluate_tree(child, leaf_matched, leaf_score, n)
            matched |= m
            score = score + np.where(m, s, np.float32(0.0)).astype(np.float32)
        return matched, score.astype(np.float32)
    if t == "bool":
        must = spec["must"]
        should = spec["should"]
        must_not = spec["not"]
        score = np.zeros(n, dtype=np.float32)
        if must:
            matched = np.ones(n, dtype=bool)
            for child in must:
                m, s = evaluate_tree(child, leaf_matched, leaf_score, n)
                matched &= m
                score = score + np.where(m, s, np.float32(0.0)).astype(np.float32)
            # optional Should contributions for docs that match the node
            for child in should:
                m, s = evaluate_tree(child, leaf_matched, leaf_score, n)
                score = score + np.where(m, s, np.float32(0.0)).astype(np.float32)
        else:
            matched = np.zeros(n, dtype=bool)
            for child in should:
                m, s = evaluate_tree(child, leaf_matched, leaf_score, n)
                matched |= m
                score = score + np.where(m, s, np.float32(0.0)).astype(np.float32)
        for child in must_not:
            m, _ = evaluate_tree(child, leaf_matched, leaf_score, n)
            matched &= ~m
        return matched, score.astype(np.float32)
    if t == "boost":
        m, s = evaluate_tree(spec["ch"], leaf_matched, leaf_score, n)
        return m, (s * np.float32(spec["f"])).astype(np.float32)
    raise ValueError(f"unknown spec node {t!r}")


def compile_tree_columns(spec: dict, leaf_matched, leaf_score):
    """JVM mirror of :func:`evaluate_tree`: (matched, score) Column exprs.

    ``leaf_matched(leaf_id)`` / ``leaf_score(leaf_id)`` return a boolean /
    float Column per leaf; the result evaluates the same spec inside
    whole-stage codegen, removing the Python eval stage from the combine
    step.  Every float32 accumulation step of the numpy evaluator becomes
    one Spark arithmetic op cast back to float — a single binary32 op
    evaluated in binary64 and rounded once is exactly the binary32 result
    (53 >= 2*24 + 2), so the two evaluators are bit-identical; pinned by
    ``tests/test_properties.py`` differentials over random trees.

    ``leaf_matched`` must never return SQL NULL (wrap pivot columns in
    ``isNotNull``); score columns must be NULL-free too (``coalesce``).
    """
    from pyspark.sql import functions as F

    f32 = lambda c: c.cast("float")  # noqa: E731
    zero = F.lit(0.0).cast("float")

    def add_if(score, m, s):
        return f32(score + F.when(m, s).otherwise(zero))

    def rec(node: dict):
        t = node["t"]
        if t == "leaf":
            return leaf_matched(node["id"]), leaf_score(node["id"])
        if t == "union":
            matched, score = F.lit(False), zero
            for ch in node["ch"]:
                m, s = rec(ch)
                matched = matched | m
                score = add_if(score, m, s)
            return matched, score
        if t == "bool":
            score = zero
            if node["must"]:
                matched = F.lit(True)
                for ch in node["must"]:
                    m, s = rec(ch)
                    matched = matched & m
                    score = add_if(score, m, s)
                for ch in node["should"]:
                    m, s = rec(ch)
                    score = add_if(score, m, s)
            else:
                matched = F.lit(False)
                for ch in node["should"]:
                    m, s = rec(ch)
                    matched = matched | m
                    score = add_if(score, m, s)
            for ch in node["not"]:
                m, _ = rec(ch)
                matched = matched & ~m
            return matched, score
        if t == "boost":
            m, s = rec(node["ch"])
            return m, f32(s * F.lit(float(np.float32(node["f"]))).cast("float"))
        raise ValueError(f"unknown spec node {t!r}")

    return rec(spec)
