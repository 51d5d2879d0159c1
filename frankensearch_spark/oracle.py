"""Pure-python/numpy exhaustive BM25 oracle.

An independent, in-memory implementation of the exact same search semantics
the Spark engine implements distributedly: identical analyzer, identical
float32 scoring contract, identical docid assignment (rank in the stable
``(conv_id, turn_idx)`` — or caller-supplied — total order), identical
tie-break (score desc, docid asc).  Used by the differential test suite:
engine results must be rank- and score-identical to this oracle, and the
oracle itself is pinned to the reference's scoring fixtures.

Reference semantics: ``crates/frankensearch-quill/src/contract.rs`` (scoring),
``argus.rs:5266-5380`` (top-k collector key = score desc, docid asc),
``argus.rs:1521,1602`` (term weight/score).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from .functions.analyze import analyze_positional
from .functions.contract import compute_tf_cache, fieldnorm_to_id, term_weight
from .plans import glob
from .plans import query as q
from .plans.eval import EvalPlan, compile_query, evaluate_tree, phrase_weight


@dataclass
class OracleHit:
    docid: int
    doc_id: str
    score: float  # float32 value


class OracleIndex:
    """In-memory inverted index with rank-exact BM25 scoring."""

    def __init__(
        self,
        docs: Sequence[dict],
        text_fields: Sequence[str] = ("content", "title"),
        keyword_fields: Sequence[str] = ("id",),
        i64_fields: Sequence[str] = (),
        sort_key=None,
        analyzers: Optional[dict] = None,
        derived_prefix_fields: Optional[dict] = None,
    ):
        """``docs`` are dicts with at least ``doc_id`` plus field values.

        Docid assignment: rank in ``sorted(docs, key=sort_key)`` where
        ``sort_key`` defaults to ``doc_id`` (== (conv_id, turn_idx) when
        doc_id is ``conv_id || ':' || zero-padded turn_idx``, or any caller
        supplied stable total order).
        """
        if sort_key is None:
            sort_key = lambda d: d["doc_id"]  # noqa: E731
        self.docs = sorted(docs, key=sort_key)
        self.n_docs = len(self.docs)
        self.doc_ids = [d["doc_id"] for d in self.docs]
        self.text_fields = tuple(text_fields)
        self.keyword_fields = tuple(keyword_fields)
        self.i64_fields = tuple(i64_fields)

        # per text field: postings + doclens + stats
        self.postings: dict[tuple[str, str], dict] = {}
        self.doclens: dict[str, np.ndarray] = {}
        self.fieldnorm_ids: dict[str, np.ndarray] = {}
        self.total_tokens: dict[str, int] = {}
        self.tf_cache: dict[str, np.ndarray] = {}
        self.avgdl: dict[str, float] = {}

        analyzers = dict(analyzers or {})
        derived = dict(derived_prefix_fields or {})
        for field in self.text_fields:
            analyzer = analyzers.get(field, "default")
            source = derived.get(field, field)
            doclens = np.zeros(self.n_docs, dtype=np.int64)
            buckets: dict[str, dict[int, list[int]]] = {}
            for docid, doc in enumerate(self.docs):
                text = str(doc.get(source) or "")
                if analyzer == "default":
                    toks = analyze_positional(text)
                    # doc length counts every analyzer token (rejected ones
                    # never appear; admission is byte-bounded, both sides)
                    doclens[docid] = len(toks)
                else:
                    from .functions.cass_analyze import (
                        cass_generate_edge_ngrams,
                        cass_token_stream,
                    )

                    if field in derived:
                        text = cass_generate_edge_ngrams(text)
                    stream, n_positions = cass_token_stream(
                        text, hyphen_decompose=(analyzer == "cass_hyphen")
                    )
                    toks = [(t.position, t.text) for t in stream]
                    doclens[docid] = n_positions
                for pos, term in toks:
                    buckets.setdefault(term, {}).setdefault(docid, []).append(pos)
            self.doclens[field] = doclens
            self.fieldnorm_ids[field] = fieldnorm_to_id(doclens)
            total = int(doclens.sum())
            self.total_tokens[field] = total
            avgdl = total / self.n_docs if self.n_docs else 0.0
            self.avgdl[field] = avgdl
            self.tf_cache[field] = compute_tf_cache(avgdl) if avgdl > 0 else None
            for term, docmap in buckets.items():
                docids = np.array(sorted(docmap), dtype=np.int64)
                freqs = np.array([len(docmap[d]) for d in docids], dtype=np.int64)
                positions = [np.array(docmap[int(d)], dtype=np.int64) for d in docids]
                self.postings[(field, term)] = {
                    "docids": docids,
                    "freqs": freqs,
                    "positions": positions,
                    "df": len(docids),
                }

        # keyword / i64 columns for range & set leaves
        self.columns: dict[str, list] = {}
        for field in (*self.keyword_fields, *self.i64_fields):
            self.columns[field] = [doc.get(field) for doc in self.docs]

    # ── stats accessors (shared shape with the Spark engine) ─────────────

    def doc_freq(self, field: str, term: str) -> int:
        entry = self.postings.get((field, term))
        return entry["df"] if entry else 0

    # ── leaf materialization ─────────────────────────────────────────────

    def _leaf_arrays(self, leaf) -> tuple[np.ndarray, np.ndarray]:
        """Dense (matched bool[N], score f32[N]) for one leaf spec."""
        n = self.n_docs
        matched = np.zeros(n, dtype=bool)
        score = np.zeros(n, dtype=np.float32)
        if leaf.kind == "all":
            matched[:] = True
            score[:] = np.float32(1.0)
            return matched, score
        if leaf.kind == "term":
            if leaf.field in self.text_fields:
                entry = self.postings.get((leaf.field, leaf.term))
                if entry is None or self.tf_cache[leaf.field] is None:
                    return matched, score
                weight = term_weight(entry["df"], self.n_docs, leaf.boost)
                cache = self.tf_cache[leaf.field]
                fnids = self.fieldnorm_ids[leaf.field][entry["docids"]]
                freqs = entry["freqs"].astype(np.float32)
                norms = cache[fnids]
                tf_factor = freqs / (freqs + norms)
                matched[entry["docids"]] = True
                score[entry["docids"]] = (weight * tf_factor).astype(np.float32)
                return matched, score
            # keyword exact term
            col = self.columns.get(leaf.field)
            if col is None:
                return matched, score
            for docid, value in enumerate(col):
                if value == leaf.term:
                    matched[docid] = True
                    score[docid] = np.float32(1.0)
            return matched, score
        if leaf.kind == "phrase":
            return self._phrase_leaf(leaf)
        if leaf.kind == "glob":
            # Deterministic dictionary expansion (term asc, capped), then a
            # const-score union of the matching terms' doc sets.
            if leaf.field in self.text_fields:
                terms = sorted(
                    t for (f, t) in self.postings.keys() if f == leaf.field
                )
                for term in glob.expand(terms, leaf.pattern):
                    matched[self.postings[(leaf.field, term)]["docids"]] = True
            else:
                col = self.columns.get(leaf.field)
                if col is not None:
                    for docid, value in enumerate(col):
                        if value is not None and glob.matches(leaf.pattern, str(value)):
                            matched[docid] = True
            score[matched] = np.float32(1.0)
            return matched, score
        if leaf.kind in ("range", "set"):
            col = self.columns.get(leaf.field)
            if col is None and leaf.field in self.text_fields:
                # RangeStr over an analyzed text field: per-term dictionary
                # range — match docs containing any in-range term.
                matched = self._text_range(leaf)
                score[matched] = np.float32(1.0)
                return matched, score
            if col is None:
                return matched, score
            for docid, value in enumerate(col):
                if value is None:
                    continue
                ok = (
                    _in_range(value, leaf)
                    if leaf.kind == "range"
                    else value in leaf.values
                )
                if ok:
                    matched[docid] = True
                    score[docid] = np.float32(1.0)
            return matched, score
        raise ValueError(f"unknown leaf kind {leaf.kind!r}")

    def _text_range(self, leaf) -> np.ndarray:
        matched = np.zeros(self.n_docs, dtype=bool)
        for (field, term), entry in self.postings.items():
            if field != leaf.field:
                continue
            if _in_range(term, leaf):
                matched[entry["docids"]] = True
        return matched

    def _phrase_leaf(self, leaf) -> tuple[np.ndarray, np.ndarray]:
        n = self.n_docs
        matched = np.zeros(n, dtype=bool)
        score = np.zeros(n, dtype=np.float32)
        if leaf.field not in self.text_fields or self.tf_cache[leaf.field] is None:
            return matched, score
        entries = []
        for _, term in leaf.terms:
            entry = self.postings.get((leaf.field, term))
            if entry is None:
                return matched, score
            entries.append(entry)
        dfs = [entry["df"] for entry in entries]
        weight = phrase_weight(dfs, self.n_docs, leaf.boost)
        # conjunction of docid sets
        common = entries[0]["docids"]
        for entry in entries[1:]:
            common = np.intersect1d(common, entry["docids"], assume_unique=True)
        if common.size == 0:
            return matched, score
        cache = self.tf_cache[leaf.field]
        offsets = [p for p, _ in leaf.terms]
        for docid in common:
            sets = []
            for entry, off in zip(entries, offsets):
                idx = int(np.searchsorted(entry["docids"], docid))
                sets.append(set((entry["positions"][idx] - off).tolist()))
            starts = set.intersection(*sets)
            occurrences = len(starts)
            if occurrences == 0:
                continue
            fnid = int(self.fieldnorm_ids[leaf.field][docid])
            f = np.float32(occurrences)
            norm = cache[fnid]
            matched[docid] = True
            score[docid] = np.float32(weight * (f / (f + norm)))
        return matched, score

    # ── search ────────────────────────────────────────────────────────────

    def search(
        self,
        query: q.Query | str,
        limit: int = 10,
        offset: int = 0,
        parser: Optional[q.DefaultQueryParser] = None,
    ) -> list[OracleHit]:
        if isinstance(query, str):
            parser = parser or q.DefaultQueryParser(q.DEFAULT_SCHEMA)
            query = parser.parse_lenient(query).query
        plan: EvalPlan = compile_query(query)
        if plan.is_empty or self.n_docs == 0:
            return []
        arrays = [self._leaf_arrays(leaf) for leaf in plan.leaves]
        matched, scores = evaluate_tree(
            plan.spec,
            lambda i: arrays[i][0],
            lambda i: arrays[i][1],
            self.n_docs,
        )
        docids = np.nonzero(matched)[0]
        if docids.size == 0:
            return []
        doc_scores = scores[docids]
        order = np.lexsort((docids, -doc_scores))
        selected = order[offset : offset + limit]
        return [
            OracleHit(
                docid=int(docids[i]),
                doc_id=self.doc_ids[int(docids[i])],
                score=float(doc_scores[i]),
            )
            for i in selected
        ]

    def count(self, query: q.Query | str, parser=None) -> int:
        if isinstance(query, str):
            parser = parser or q.DefaultQueryParser(q.DEFAULT_SCHEMA)
            query = parser.parse_lenient(query).query
        plan = compile_query(query)
        if plan.is_empty or self.n_docs == 0:
            return 0
        arrays = [self._leaf_arrays(leaf) for leaf in plan.leaves]
        matched, _ = evaluate_tree(
            plan.spec, lambda i: arrays[i][0], lambda i: arrays[i][1], self.n_docs
        )
        return int(matched.sum())


def _in_range(value, leaf) -> bool:
    if leaf.lower is not None:
        if leaf.lower_inclusive:
            if value < leaf.lower:
                return False
        elif value <= leaf.lower:
            return False
    if leaf.upper is not None:
        if leaf.upper_inclusive:
            if value > leaf.upper:
                return False
        elif value >= leaf.upper:
            return False
    return True
