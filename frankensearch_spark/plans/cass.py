"""CASS boolean-grammar query parser (the agent-transcript search surface).

Driver-side rebuild of the reference's intentionally non-standard CASS
grammar (reference: ``crates/frankensearch-quill/src/query.rs:3580``
CassQueryParser, ``query.rs:4041`` cass_lex, ``query.rs:4132``
CassGrammar), conformance-pinned by the 39 ``parser: "cass"`` cases in
``tests/fixtures/quill_language_contract.json``:

* **OR binds tighter than AND**; juxtaposition is implicit AND.
* Operators: ``AND``/``&&``, ``OR``/``||``, ``NOT``/leading ``-``;
  case-insensitive word operators; NOT is idempotent (``NOT NOT x`` ≡
  ``NOT x``); a negative used as an OR operand or as the whole root is
  wrapped in the complement ``All + MustNot``.
* Sanitizer: alphanumerics, ``*``, ``"``, ``-`` survive; every other
  scalar becomes a space (``query.rs:3469``).  Grammar whitespace is
  space/tab/newline only — carriage return is NOT whitespace.
* Terms classify through the wildcard classes: Exact/Prefix lower to an
  exact Term over the four searchable fields (title, content,
  title_prefix, content_prefix — prefix acceleration is an exact probe
  of the edge-n-gram fields); Suffix/Substring/Complex lower to a Glob
  over the regex fields (content, title).
* CJK runs become character bigrams ANDed together (unigram when one
  scalar); mixed-script terms keep only the CJK scalars.
* Quoted phrases lower to slop-0 Phrase over (title, content); a phrase
  that analyzes to one term collapses to that term's compound lowering.
* Structured filters (agents, workspaces, created range, source) append
  Must clauses in pinned order after the root.

The prefix fields exist in the CASS schema as edge-n-gram indexes; an
index built without them simply resolves their dictionary probes to
df=0 (no score contribution), so the parser is usable against any index.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional

from ..functions.contract import MAX_QUERY_LENGTH
from . import glob as g
from .query import (
    All,
    Boolean,
    BooleanClause,
    Diagnostic,
    Empty,
    Glob,
    Occur,
    ParsedQuery,
    Phrase,
    PositionedTerm,
    Query,
    QueryField,
    RangeQ,
    Term,
    truncated_prefix,
)

#: The four exact-probe fields of one CASS term (query.rs searchable()).
SEARCHABLE_FIELDS = ("title", "content", "title_prefix", "content_prefix")

#: Fields scanned by regex-lowered globs (query.rs regex_fields()).
REGEX_FIELDS = ("content", "title")

PHRASE_FIELDS = ("title", "content")


@dataclass(frozen=True)
class CassFilters:
    """Structured filters appended as Must clauses (query.rs:3400)."""

    agents: tuple[str, ...] = ()
    workspaces: tuple[str, ...] = ()
    created_from: Optional[int] = None
    created_to: Optional[int] = None
    source_filter: str = "all"  # "all" | "local" | "remote" | "source_id"
    source_id: Optional[str] = None


def cass_sanitize_query(raw: str) -> str:
    """Alphanumerics, ``* " -`` survive; every other scalar -> space."""
    return "".join(
        ch if (ch.isalnum() or ch in '*"-') else " " for ch in raw
    )


def is_cass_cjk(ch: str) -> bool:
    """CJK scalar ranges bigrammed by the CASS analyzer (scribe.rs:820)."""
    o = ord(ch)
    return (
        0x4E00 <= o <= 0x9FFF
        or 0x3400 <= o <= 0x4DBF
        or 0x3040 <= o <= 0x309F
        or 0x30A0 <= o <= 0x30FF
        or 0xAC00 <= o <= 0xD7AF
        or 0x3100 <= o <= 0x312F
        or 0x3300 <= o <= 0x33FF
        or 0xF900 <= o <= 0xFAFF
        or 0x20000 <= o <= 0x2A6DF
    )


def _cjk_terms(term: str) -> list[str]:
    chars = [c for c in term if is_cass_cjk(c)]
    if len(chars) <= 1:
        return ["".join(chars)] if chars else []
    return ["".join(chars[i : i + 2]) for i in range(len(chars) - 1)]


def _is_empty(q: Query) -> bool:
    return isinstance(q, Empty)


def _required(queries: list[Query]) -> Query:
    """AND-of-Must over non-empty children; 0 -> Empty, 1 -> unwrap."""
    queries = [q for q in queries if not _is_empty(q)]
    if not queries:
        return Empty()
    if len(queries) == 1:
        return queries[0]
    return Boolean(
        tuple(BooleanClause(Occur.MUST, q) for q in queries), operator="AND"
    )


def _complement(query: Query) -> Query:
    """Negative in OR/root position denotes a complement: All - query."""
    return Boolean(
        (
            BooleanClause(Occur.MUST, All()),
            BooleanClause(Occur.MUST_NOT, query),
        ),
        operator=None,
    )


# ── lexer ───────────────────────────────────────────────────────────────────


@dataclass
class _Tok:
    kind: str  # "and" | "or" | "not" | "term" | "phrase"
    text: str = ""
    offset: int = 0


def cass_lex(query: str, diagnostics: list[Diagnostic]) -> list[_Tok]:
    tokens: list[_Tok] = []
    word: list[str] = []
    word_offset = 0

    def flush() -> None:
        if not word:
            return
        text = "".join(word)
        word.clear()
        upper = text.upper()
        if upper == "AND":
            tokens.append(_Tok("and", offset=word_offset))
        elif upper == "OR":
            tokens.append(_Tok("or", offset=word_offset))
        elif upper == "NOT":
            tokens.append(_Tok("not", offset=word_offset))
        else:
            tokens.append(_Tok("term", text, word_offset))

    i = 0
    n = len(query)
    while i < n:
        ch = query[i]
        if ch == '"':
            flush()
            j = query.find('"', i + 1)
            if j == -1:
                phrase = query[i + 1 :]
                diagnostics.append(
                    Diagnostic(
                        "syntax_recovery",
                        "CASS syntax recovery: unterminated phrase",
                    )
                )
                i = n
            else:
                phrase = query[i + 1 : j]
                i = j + 1
            if phrase:
                tokens.append(_Tok("phrase", phrase, i))
            continue
        if ch == "&" and i + 1 < n and query[i + 1] == "&":
            flush()
            tokens.append(_Tok("and", offset=i))
            i += 2
            continue
        if ch == "|" and i + 1 < n and query[i + 1] == "|":
            flush()
            tokens.append(_Tok("or", offset=i))
            i += 2
            continue
        if ch == "-" and not word:
            tokens.append(_Tok("not", offset=i))
            i += 1
            continue
        if ch in (" ", "\t", "\n"):  # \r is NOT grammar whitespace
            flush()
            i += 1
            continue
        if not word:
            word_offset = i
        word.append(ch)
        i += 1
    flush()
    return tokens


# ── parser ──────────────────────────────────────────────────────────────────


class CassQueryParser:
    """CASS grammar over the transcript/agent schema field names."""

    def __init__(
        self,
        searchable: tuple[str, ...] = SEARCHABLE_FIELDS,
        regex_fields: tuple[str, ...] = REGEX_FIELDS,
        phrase_fields: tuple[str, ...] = PHRASE_FIELDS,
        agent_field: str = "agent",
        workspace_field: str = "workspace",
        created_at_field: str = "created_at",
        source_id_field: str = "source_id",
        origin_kind_field: str = "origin_kind",
    ):
        self.searchable = tuple(QueryField(f, 1.0) for f in searchable)
        self.regex_fields = regex_fields
        self.phrase_fields = tuple(QueryField(f, 1.0) for f in phrase_fields)
        self.agent_field = agent_field
        self.workspace_field = workspace_field
        self.created_at_field = created_at_field
        self.source_id_field = source_id_field
        self.origin_kind_field = origin_kind_field

    # ── term / phrase lowering ────────────────────────────────────────────

    def _lower_term_part(self, raw: str) -> Optional[Query]:
        kind, core = g.classify(raw)
        if kind in (g.EXACT, g.PREFIX):
            if not core:
                return None
            if any(is_cass_cjk(c) for c in core):
                terms = _cjk_terms(core)
                return _required(
                    [Term(fields=self.searchable, text=t) for t in terms]
                )
            return Term(fields=self.searchable, text=core)
        # Suffix / Substring / Complex -> dictionary-regex glob
        return Glob(fields=self.regex_fields, pattern=raw.lower())

    def _lower_compound(self, parts: list[str]) -> Query:
        lowered = [self._lower_term_part(p) for p in parts]
        return _required([q for q in lowered if q is not None])

    def lower_term(self, raw: str) -> Query:
        return self._lower_compound(cass_sanitize_query(raw).split())

    def lower_phrase(self, raw: str) -> Query:
        terms = [
            t.strip("*").lower()
            for t in cass_sanitize_query(raw).split()
        ]
        terms = [t for t in terms if t]
        if len(terms) <= 1 or any(any(is_cass_cjk(c) for c in t) for t in terms):
            return self._lower_compound(terms)
        return Phrase(
            fields=self.phrase_fields,
            terms=tuple(PositionedTerm(i, t) for i, t in enumerate(terms)),
            slop=0,
            prefix=False,
        )

    # ── grammar ───────────────────────────────────────────────────────────

    def parse(
        self, raw_query: str, filters: CassFilters = CassFilters()
    ) -> ParsedQuery:
        admitted, was_truncated = truncated_prefix(raw_query)
        diagnostics: list[Diagnostic] = []
        if was_truncated:
            diagnostics.append(
                Diagnostic(
                    "truncated",
                    f"CASS query truncated to {MAX_QUERY_LENGTH} Unicode scalar values",
                )
            )
        tokens = cass_lex(admitted, diagnostics)
        node = self._parse_tokens(tokens, diagnostics)
        if node is None:
            root: Query = All()
        elif node[1]:  # negative root denotes the complement
            root = _complement(node[0])
        else:
            root = node[0]
        query = self._apply_filters(root, filters)
        return ParsedQuery(
            query=query, diagnostics=diagnostics, was_truncated=was_truncated
        )

    def _parse_tokens(
        self, tokens: list[_Tok], diagnostics: list[Diagnostic]
    ) -> Optional[tuple[Query, bool]]:
        clauses: list[BooleanClause] = []
        pending_or: list[Query] = []
        next_occur = Occur.MUST
        in_or_sequence = False
        just_saw_or = False
        saw_operand = False
        last_binary: Optional[int] = None
        dangling_not: Optional[int] = None

        def recover(message: str) -> None:
            diagnostics.append(
                Diagnostic("syntax_recovery", f"CASS syntax recovery: {message}")
            )

        def flush_or_group() -> None:
            nonlocal pending_or
            if not pending_or:
                return
            grouped = Boolean(
                tuple(BooleanClause(Occur.SHOULD, q) for q in pending_or),
                operator="OR",
            )
            pending_or = []
            clauses.append(BooleanClause(Occur.MUST, grouped))

        def apply_query(query: Query) -> None:
            nonlocal in_or_sequence, just_saw_or
            if in_or_sequence and just_saw_or:
                if not pending_or and clauses and clauses[-1].occur in (
                    Occur.MUST,
                    Occur.MUST_NOT,
                ):
                    prev = clauses.pop()
                    pending_or.append(
                        _complement(prev.query)
                        if prev.occur is Occur.MUST_NOT
                        else prev.query
                    )
                pending_or.append(
                    _complement(query) if next_occur is Occur.MUST_NOT else query
                )
            else:
                flush_or_group()
                in_or_sequence = False
                clauses.append(BooleanClause(next_occur, query))
            just_saw_or = False

        for tok in tokens:
            if tok.kind == "and":
                if not saw_operand or last_binary is not None:
                    recover("AND without an adjacent operand was recovered")
                if dangling_not is not None:
                    recover("NOT has no operand before AND")
                    dangling_not = None
                flush_or_group()
                in_or_sequence = False
                just_saw_or = False
                next_occur = Occur.MUST
                last_binary = tok.offset
            elif tok.kind == "or":
                if not saw_operand or last_binary is not None:
                    recover("OR without an adjacent operand was recovered")
                in_or_sequence = True
                just_saw_or = True
                last_binary = tok.offset
            elif tok.kind == "not":
                if not just_saw_or:
                    flush_or_group()
                    in_or_sequence = False
                    just_saw_or = False
                next_occur = Occur.MUST_NOT
                if dangling_not is None:
                    dangling_not = tok.offset
                last_binary = None
            else:  # term | phrase
                query = (
                    self.lower_term(tok.text)
                    if tok.kind == "term"
                    else self.lower_phrase(tok.text)
                )
                if _is_empty(query):
                    recover(f"empty {tok.kind} operand was skipped")
                    continue
                apply_query(query)
                next_occur = Occur.MUST
                saw_operand = True
                last_binary = None
                dangling_not = None

        flush_or_group()
        if dangling_not is not None:
            recover("dangling NOT has no operand")
        if last_binary is not None:
            recover("dangling binary operator has no operand")
        return _finish(clauses)

    def _apply_filters(self, root: Query, filters: CassFilters) -> Query:
        no_filters = (
            not filters.agents
            and not filters.workspaces
            and filters.created_from is None
            and filters.created_to is None
            and filters.source_filter == "all"
        )
        if no_filters:
            return root
        clauses = [BooleanClause(Occur.MUST, root)]
        for values, field in (
            (filters.agents, self.agent_field),
            (filters.workspaces, self.workspace_field),
        ):
            if values:
                clauses.append(
                    BooleanClause(
                        Occur.MUST,
                        Boolean(
                            tuple(
                                BooleanClause(
                                    Occur.SHOULD,
                                    Term(fields=(QueryField(field, 1.0),), text=v),
                                )
                                for v in values
                            ),
                            operator=None,
                        ),
                    )
                )
        if filters.created_from is not None or filters.created_to is not None:
            clauses.append(
                BooleanClause(
                    Occur.MUST,
                    RangeQ(
                        field=self.created_at_field,
                        lower=filters.created_from,
                        upper=filters.created_to,
                        lower_inclusive=True,
                        upper_inclusive=True,
                    ),
                )
            )
        source = None
        if filters.source_filter == "local":
            source = (self.origin_kind_field, "local")
        elif filters.source_filter == "remote":
            source = (self.origin_kind_field, "ssh")
        elif filters.source_filter == "source_id" and filters.source_id:
            source = (self.source_id_field, filters.source_id)
        if source is not None:
            clauses.append(
                BooleanClause(
                    Occur.MUST,
                    Term(fields=(QueryField(source[0], 1.0),), text=source[1]),
                )
            )
        if len(clauses) == 1:
            return clauses[0].query
        return Boolean(tuple(clauses), operator=None)


def _finish(clauses: list[BooleanClause]) -> Optional[tuple[Query, bool]]:
    """Collapse the top level; returns (query, is_negative_root)."""
    if len(clauses) == 1:
        clause = clauses[0]
        return clause.query, clause.occur is Occur.MUST_NOT
    if not clauses:
        return None
    if all(c.occur is Occur.MUST_NOT for c in clauses):
        clauses = [BooleanClause(Occur.MUST, All()), *clauses]
    return Boolean(tuple(clauses), operator="AND"), False
