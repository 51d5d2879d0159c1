"""Engine-neutral query tree + the default lenient parser.

Reimplements, in driver-side Python, the reference's query surface
(reference: ``crates/frankensearch-quill/src/query.rs``):

* the engine-neutral ``Query`` tree (Term / Phrase / Boolean / Range / Set /
  Glob / Boost / All / Empty) — ``query.rs:124-184``;
* the shipping lenient parser over the default ``[content, title^2.0]``
  field expansion — ``query.rs:753-`` (``DefaultQueryParser::parse_lenient``):
  never errors, drops malformed fragments with diagnostics;
* query truncation to 10,000 scalar values — ``query.rs:17,878``;
* score-neutral canonicalization — ``query.rs:194-209,379``.

Pinned grammar semantics (from the reference's parse-tree fixture corpus):

* bare words become Should-terms over ``[content^1.0, title^2.0]``;
* one unquoted word that analyzes to several tokens becomes a slop-0 Phrase
  (``src/main.rs`` -> phrase [src, main, rs]);
* AND binds tighter than OR; implicit juxtaposition binds loosest;
* ``field:value`` targets a schema field; unknown fields drop the atom with
  a diagnostic (``SearchIndex::new`` -> field ``SearchIndex`` -> Empty);
* quoted text analyzing to one token is a Term, several a Phrase;
* ``^N`` wraps the preceding atom/group in Boost;
* ``[x TO y}`` / ``{x TO y]`` are ranges (``[``/``]`` inclusive,
  ``{``/``}`` exclusive); ``IN [a b c]`` is a set with stable dedup;
* exact duplicate sibling atoms are deduplicated pre-analysis, keeping the
  Boolean wrapper (``rust rust`` -> Boolean[Should(rust)]);
* an all-negative root is repaired by appending Should(All).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Optional, Union

from ..functions.analyze import analyze_positional, tokenize
from ..functions.contract import MAX_QUERY_DEPTH, MAX_QUERY_LENGTH

CONTENT_FIELD_NAME = "content"
TITLE_FIELD_NAME = "title"
TITLE_BOOST = 2.0


# ── Schema ──────────────────────────────────────────────────────────────────


class FieldType(Enum):
    """Field kinds supported by the engine (reference: schema.rs:39-73)."""

    KEYWORD = "keyword"  # untokenized exact string
    TEXT = "text"  # analyzed, positions recorded
    I64 = "i64"  # signed 64-bit, range-queryable
    STORED = "stored"  # stored only, not queryable


@dataclass(frozen=True)
class SchemaField:
    name: str
    kind: FieldType
    stored: bool = True
    positions: bool = True  # for TEXT fields


@dataclass(frozen=True)
class Schema:
    """Fixed schema; field order is significant (field ordinals)."""

    name: str
    fields: tuple[SchemaField, ...]

    def field(self, name: str) -> Optional[SchemaField]:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    @property
    def text_fields(self) -> tuple[SchemaField, ...]:
        return tuple(f for f in self.fields if f.kind is FieldType.TEXT)


#: Default document schema (reference: schema.rs:252-298 DEFAULT_SCHEMA).
DEFAULT_SCHEMA = Schema(
    name="frankensearch_default",
    fields=(
        SchemaField("id", FieldType.KEYWORD),
        SchemaField("content", FieldType.TEXT),
        SchemaField("title", FieldType.TEXT),
        SchemaField("metadata_json", FieldType.STORED),
        SchemaField("ord", FieldType.I64),
    ),
)

#: Transcript schema per the input hint: one turn per document.
TRANSCRIPT_SCHEMA = Schema(
    name="transcripts",
    fields=(
        SchemaField("id", FieldType.KEYWORD),
        SchemaField("content", FieldType.TEXT),  # turn text
        SchemaField("title", FieldType.TEXT),  # optional; empty for turns
        SchemaField("conv_id", FieldType.KEYWORD),
        SchemaField("role", FieldType.KEYWORD),
        SchemaField("tool", FieldType.KEYWORD),
        SchemaField("turn_idx", FieldType.I64),
        SchemaField("ts", FieldType.I64),
    ),
)


# ── Query tree ──────────────────────────────────────────────────────────────


class Occur(Enum):
    MUST = "Must"
    SHOULD = "Should"
    MUST_NOT = "MustNot"


OCCUR_RANK = {Occur.MUST: 0, Occur.SHOULD: 1, Occur.MUST_NOT: 2}


@dataclass(frozen=True)
class QueryField:
    """One queryable field with its parser-time boost."""

    name: str
    boost: float


@dataclass(frozen=True)
class PositionedTerm:
    position: int
    text: str


@dataclass(frozen=True)
class Empty:
    pass


@dataclass(frozen=True)
class All:
    pass


@dataclass(frozen=True)
class Term:
    fields: tuple[QueryField, ...]
    text: str


@dataclass(frozen=True)
class Phrase:
    fields: tuple[QueryField, ...]
    terms: tuple[PositionedTerm, ...]
    slop: int = 0
    prefix: bool = False


@dataclass(frozen=True)
class BooleanClause:
    occur: Occur
    query: "Query"


@dataclass(frozen=True)
class Boolean:
    clauses: tuple[BooleanClause, ...]
    operator: Optional[str] = None  # "AND" | "OR" | None


@dataclass(frozen=True)
class RangeQ:
    """Inclusive/exclusive range over one field (string or i64 values)."""

    field: str
    lower: Optional[Union[str, int]]
    upper: Optional[Union[str, int]]
    lower_inclusive: bool = True
    upper_inclusive: bool = True


@dataclass(frozen=True)
class SetQ:
    field: str
    values: tuple[Union[str, int], ...]


@dataclass(frozen=True)
class Glob:
    fields: tuple[str, ...]
    pattern: str


@dataclass(frozen=True)
class Boost:
    query: "Query"
    factor: float


Query = Union[Empty, All, Term, Phrase, Boolean, RangeQ, SetQ, Glob, Boost]


@dataclass(frozen=True)
class Diagnostic:
    kind: str
    message: str


@dataclass
class ParsedQuery:
    query: Query
    diagnostics: list[Diagnostic] = dc_field(default_factory=list)
    was_truncated: bool = False


def classify_query(query: str) -> str:
    """Incumbent-compatible query classification for telemetry
    (reference: ``query.rs:461`` classify_query): "empty", "phrase"
    (fully quoted), "simple" (one whitespace token), else "boolean"."""
    trimmed = query.strip()
    if not trimmed:
        return "empty"
    if (trimmed.startswith('"') and trimmed.endswith('"')) or (
        trimmed.startswith("'") and trimmed.endswith("'")
    ):
        return "phrase"
    if len(trimmed.split()) <= 1:
        return "simple"
    return "boolean"


def truncated_prefix(query: str) -> tuple[str, bool]:
    """Truncate to MAX_QUERY_LENGTH Unicode scalar values (char-safe)."""
    if len(query) <= MAX_QUERY_LENGTH:
        return query, False
    return query[:MAX_QUERY_LENGTH], True


# ── Lexer ───────────────────────────────────────────────────────────────────


@dataclass
class _Atom:
    """One lexed leaf: bare/quoted text, range, set, or group marker."""

    kind: str  # "bare" | "quoted" | "range" | "set" | "lparen" | "rparen" | "op"
    raw: str = ""
    field: Optional[str] = None
    quote: str = ""
    slop: int = 0
    prefix: bool = False
    boost: Optional[float] = None
    # ranges
    lower: str = ""
    upper: str = ""
    lower_inclusive: bool = True
    upper_inclusive: bool = True
    # sets
    values: tuple[str, ...] = ()
    # operators: raw holds "AND"|"OR"|"NOT"|"+"|"-"
    occur_prefix: Optional[Occur] = None


def _is_field_start(ch: str) -> bool:
    return ch.isalpha() or ch == "_"


def _lex(text: str, diagnostics: list[Diagnostic]) -> list[_Atom]:
    atoms: list[_Atom] = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "(":
            atoms.append(_Atom("lparen"))
            i += 1
            continue
        if ch == ")":
            atom = _Atom("rparen")
            i += 1
            i = _maybe_boost(text, i, atom, diagnostics)
            atoms.append(atom)
            continue
        occur: Optional[Occur] = None
        if ch in "+-" and i + 1 < n and not text[i + 1].isspace():
            occur = Occur.MUST if ch == "+" else Occur.MUST_NOT
            i += 1
            ch = text[i] if i < n else ""
            if not ch:
                break
        # word operators
        for op in ("AND", "OR", "NOT"):
            if occur is None and text.startswith(op, i):
                end = i + len(op)
                if end == n or text[end].isspace() or text[end] in "()":
                    atoms.append(_Atom("op", raw=op))
                    i = end
                    break
        else:
            i, atom = _lex_atom(text, i, occur, diagnostics)
            if atom is not None:
                atoms.append(atom)
            continue
        continue
    return atoms


def _maybe_boost(text: str, i: int, atom: _Atom, diagnostics: list[Diagnostic]) -> int:
    if i < len(text) and text[i] == "^":
        j = i + 1
        start = j
        while j < len(text) and (text[j].isdigit() or text[j] in ".eE+-"):
            j += 1
        try:
            factor = float(text[start:j])
            if math.isfinite(factor) and factor >= 0:
                atom.boost = factor
            else:
                raise ValueError(factor)
        except ValueError:
            diagnostics.append(Diagnostic("invalid_boost", f"invalid boost {text[start:j]!r}"))
        return j
    return i


def _maybe_slop(text: str, i: int, atom: _Atom) -> int:
    if i < len(text) and text[i] == "~":
        j = i + 1
        start = j
        while j < len(text) and text[j].isdigit():
            j += 1
        if j > start:
            atom.slop = int(text[start:j])
        return j
    return i


def _lex_atom(
    text: str, i: int, occur: Optional[Occur], diagnostics: list[Diagnostic]
) -> tuple[int, Optional[_Atom]]:
    n = len(text)
    field: Optional[str] = None
    # field prefix: ident ':'
    if _is_field_start(text[i]):
        j = i
        while j < n and (text[j].isalnum() or text[j] == "_"):
            j += 1
        if j < n and text[j] == ":":
            field = text[i:j]
            i = j + 1
            # allow whitespace after the colon only before structured values
            k = i
            while k < n and text[k] == " ":
                k += 1
            if k < n and (text[k] in "[{(" or text.startswith("IN", k)):
                i = k
            if i >= n:
                diagnostics.append(Diagnostic("dangling_field", f"dangling field {field!r}"))
                return i, None
    if i >= n:
        return i, None
    ch = text[i]
    # set: IN [v1 v2 ...]
    if text.startswith("IN", i) and (
        i + 2 < n and (text[i + 2].isspace() or text[i + 2] == "[")
    ):
        j = text.find("[", i)
        # the '[' must FOLLOW IN with only whitespace between: an
        # unbounded find would swallow every token up to some later
        # bracket ('role:IN assistant [1 TO 2]' silently ate 'assistant'
        # and turned the range into set values, with zero diagnostics)
        if j != -1 and text[i + 2 : j].strip():
            j = -1
        if j != -1:
            close = text.find("]", j)
            if close == -1:
                close = n
                diagnostics.append(Diagnostic("syntax", "unterminated set"))
            inner = text[j + 1 : close]
            values = tuple(v for v in inner.split() if v)
            atom = _Atom("set", field=field, values=values, occur_prefix=occur)
            i = min(close + 1, n)
            i = _maybe_boost(text, i, atom, diagnostics)
            return i, atom
    # range: [x TO y} etc.
    if ch in "[{":
        close_pos = None
        for j in range(i + 1, n):
            if text[j] in "]}":
                close_pos = j
                break
        if close_pos is not None and " TO " in text[i + 1 : close_pos]:
            inner = text[i + 1 : close_pos]
            lower_s, upper_s = inner.split(" TO ", 1)
            atom = _Atom(
                "range",
                field=field,
                lower=lower_s.strip(),
                upper=upper_s.strip(),
                lower_inclusive=(ch == "["),
                upper_inclusive=(text[close_pos] == "]"),
                occur_prefix=occur,
            )
            i = close_pos + 1
            i = _maybe_boost(text, i, atom, diagnostics)
            return i, atom
        # fall through: treat as bare text
    # field-scoped group: field:(...)
    if ch == "(" and field is not None:
        atom = _Atom("lparen", field=field, occur_prefix=occur)
        return i + 1, atom
    if ch == "(":
        return i + 1, _Atom("lparen", occur_prefix=occur)
    if ch == ")":
        atom = _Atom("rparen")
        i += 1
        i = _maybe_boost(text, i, atom, diagnostics)
        return i, atom
    # quoted
    if ch in "\"'":
        quote = ch
        j = i + 1
        buf = []
        terminated = False
        while j < n:
            if text[j] == quote:
                terminated = True
                j += 1
                break
            buf.append(text[j])
            j += 1
        if not terminated:
            diagnostics.append(Diagnostic("syntax", "unterminated quote recovered"))
        atom = _Atom("quoted", raw="".join(buf), field=field, quote=quote, occur_prefix=occur)
        j = _maybe_slop(text, j, atom)
        j = _maybe_boost(text, j, atom, diagnostics)
        return j, atom
    # bare word: read until whitespace or structural char
    j = i
    while j < n and not text[j].isspace() and text[j] not in "()^":
        j += 1
    raw = text[i:j]
    atom = _Atom("bare", raw=raw, field=field, occur_prefix=occur)
    j = _maybe_boost(text, j, atom, diagnostics)
    if raw.endswith("*") and len(raw) > 1:
        atom.prefix = True
        atom.raw = raw[:-1]
    return j, atom


# ── Parser ──────────────────────────────────────────────────────────────────


class DefaultQueryParser:
    """Lenient parser over the default ``[content, title^2.0]`` expansion."""

    def __init__(self, schema: Schema = DEFAULT_SCHEMA):
        content = schema.field(CONTENT_FIELD_NAME)
        title = schema.field(TITLE_FIELD_NAME)
        if content is None or content.kind is not FieldType.TEXT:
            raise ValueError(f"schema {schema.name!r} missing text field 'content'")
        self.schema = schema
        self.default_fields: tuple[QueryField, ...]
        if title is not None and title.kind is FieldType.TEXT:
            self.default_fields = (
                QueryField(CONTENT_FIELD_NAME, 1.0),
                QueryField(TITLE_FIELD_NAME, TITLE_BOOST),
            )
        else:
            self.default_fields = (QueryField(CONTENT_FIELD_NAME, 1.0),)

    # boost a field target per the pinned default expansion: title always
    # carries its 2.0 default boost, every other field 1.0.
    def _field_target(self, name: str) -> QueryField:
        return QueryField(name, TITLE_BOOST if name == TITLE_FIELD_NAME else 1.0)

    def parse(self, query: str) -> ParsedQuery:
        return self.parse_lenient(query)

    def parse_lenient(self, query: str) -> ParsedQuery:
        query, was_truncated = truncated_prefix(query)
        diagnostics: list[Diagnostic] = []
        if was_truncated:
            diagnostics.append(
                Diagnostic(
                    "truncated",
                    f"query truncated to {MAX_QUERY_LENGTH} Unicode scalar values",
                )
            )
        atoms = _lex(query, diagnostics)
        tree = _Parser(self, atoms, diagnostics).parse()
        tree = _repair_root_all_negative(tree, diagnostics)
        return ParsedQuery(query=tree, diagnostics=diagnostics, was_truncated=was_truncated)


class _Parser:
    def __init__(self, parser: DefaultQueryParser, atoms: list[_Atom], diagnostics):
        self.p = parser
        self.atoms = atoms
        self.pos = 0
        self.diagnostics = diagnostics

    def parse(self) -> Query:
        node = self._parse_level(scope=None, depth=0, stop_at_rparen=False)
        return node if node is not None else Empty()

    def _peek(self) -> Optional[_Atom]:
        return self.atoms[self.pos] if self.pos < len(self.atoms) else None

    def _next(self) -> Optional[_Atom]:
        atom = self._peek()
        if atom is not None:
            self.pos += 1
        return atom

    def _parse_level(
        self, scope: Optional[str], depth: int, stop_at_rparen: bool
    ) -> Optional[Query]:
        """Parse a (possibly parenthesized) operand/operator sequence.

        Precedence (loosest to tightest): juxtaposition < OR < AND.
        Fold order is therefore AND runs first, then OR runs, then the
        surviving operands become one implicit Boolean level.
        """
        if depth > MAX_QUERY_DEPTH:
            self.diagnostics.append(Diagnostic("depth", "max query depth exceeded"))
            return None
        # operands: (occur_override, dedup_key, query); ops[i] joins
        # operand i and i+1 ("AND" | "OR" | None for juxtaposition).
        operands: list[tuple[Optional[Occur], object, Query]] = []
        ops: list[Optional[str]] = []
        pending_op: Optional[str] = None
        source_atoms = 0
        while True:
            atom = self._peek()
            if atom is None:
                break
            if atom.kind == "rparen":
                if stop_at_rparen:
                    break
                self._next()
                self.diagnostics.append(Diagnostic("syntax", "unbalanced ')' dropped"))
                continue
            if atom.kind == "op" and atom.raw in ("AND", "OR"):
                self._next()
                if not operands:
                    self.diagnostics.append(
                        Diagnostic("syntax", f"leading operator {atom.raw} dropped")
                    )
                    continue
                pending_op = atom.raw
                continue
            occur, child, key = self._parse_unary(scope, depth)
            source_atoms += 1
            if child is None:
                pending_op = None
                continue
            if operands:
                ops.append(pending_op)
            operands.append((occur, key, child))
            pending_op = None
        if pending_op is not None:
            self.diagnostics.append(
                Diagnostic("syntax", f"trailing operator {pending_op} dropped")
            )
        operands, ops = _fold_binary(operands, ops, "AND", Occur.MUST)
        operands, ops = _fold_binary(operands, ops, "OR", Occur.SHOULD)
        return self._finish_level(operands, source_atoms)

    def _parse_unary(
        self, scope: Optional[str], depth: int
    ) -> tuple[Optional[Occur], Optional[Query], object]:
        atom = self._next()
        if atom is None:
            return None, None, None
        if atom.kind == "op" and atom.raw == "NOT":
            # collapse a run of NOTs iteratively (idempotent — NOT
            # overrides any prefix, so NOT NOT x ≡ NOT x) instead of
            # recursing once per token: MAX_QUERY_LENGTH admits ~2,500
            # 'NOT ' repetitions, past the interpreter recursion limit,
            # and the lenient parse must never raise
            while True:
                nxt = self._peek()
                if nxt is not None and nxt.kind == "op" and nxt.raw == "NOT":
                    self._next()
                else:
                    break
            occur, child, key = self._parse_unary(scope, depth)
            if child is None:
                return None, None, None
            # NOT overrides any +/- prefix on its operand
            return Occur.MUST_NOT, child, ("not", key)
        if atom.kind == "op":
            self.diagnostics.append(Diagnostic("syntax", f"operator {atom.raw} dropped"))
            return None, None, None
        if atom.kind == "lparen":
            inner_scope = atom.field if atom.field is not None else scope
            if atom.field is not None and self.p.schema.field(atom.field) is None:
                self.diagnostics.append(
                    Diagnostic("unknown_field", f"unknown field {atom.field}")
                )
                inner_scope = scope
                drop = True
            else:
                drop = False
            node = self._parse_level(inner_scope, depth + 1, stop_at_rparen=True)
            closing = self._peek()
            boost = None
            if closing is not None and closing.kind == "rparen":
                self._next()
                boost = closing.boost
            else:
                self.diagnostics.append(Diagnostic("syntax", "unterminated group recovered"))
            if drop or node is None:
                return None, None, None
            if boost is not None:
                node = Boost(node, boost)
            return atom.occur_prefix, node, ("group", id(node))
        return self._lower_atom(atom, scope)

    # ── Atom lowering ──────────────────────────────────────────────────

    def _resolve_field(self, atom_field: Optional[str], scope: Optional[str]):
        """Return (list of QueryField targets, field kind) or None if unknown."""
        name = atom_field if atom_field is not None else scope
        if name is None:
            return list(self.p.default_fields), FieldType.TEXT
        f = self.p.schema.field(name)
        if f is None:
            self.diagnostics.append(Diagnostic("unknown_field", f"unknown field {name}"))
            return None
        return [self.p._field_target(name)], f.kind

    def _lower_atom(
        self, atom: _Atom, scope: Optional[str]
    ) -> tuple[Optional[Occur], Optional[Query], object]:
        resolved = self._resolve_field(atom.field, scope)
        if resolved is None:
            return None, None, None
        targets, kind = resolved
        occur = atom.occur_prefix
        node: Optional[Query] = None
        key: object = None
        if atom.kind == "range":
            fname = targets[0].name
            lower = _normalize_value(atom.lower, kind)
            upper = _normalize_value(atom.upper, kind)
            if kind is FieldType.I64:
                # '*' = open bound; any other non-numeric bound drops the
                # leaf leniently (the bare-atom path already does this) —
                # letting a str bound reach the bigint column would raise
                # CAST_INVALID_INPUT at execution under ANSI mode
                lower = None if atom.lower == "*" else lower
                upper = None if atom.upper == "*" else upper
                if isinstance(lower, str) or isinstance(upper, str):
                    self.diagnostics.append(
                        Diagnostic("type", f"non-numeric range bound on {fname}")
                    )
                    return None, None, None
            node = RangeQ(
                field=fname,
                lower=lower,
                upper=upper,
                lower_inclusive=atom.lower_inclusive,
                upper_inclusive=atom.upper_inclusive,
            )
            key = ("range", fname, lower, upper, atom.lower_inclusive, atom.upper_inclusive)
        elif atom.kind == "set":
            fname = targets[0].name
            seen: list[Union[str, int]] = []
            for v in atom.values:
                nv = _normalize_value(v, kind)
                if kind is FieldType.I64 and isinstance(nv, str):
                    # same lenient drop as the bare-atom type check
                    self.diagnostics.append(
                        Diagnostic("type", f"non-numeric set value {v!r} on {fname}")
                    )
                    continue
                if nv not in seen:
                    seen.append(nv)
            if not seen:
                return None, None, None
            node = SetQ(field=fname, values=tuple(seen))
            key = ("set", fname, tuple(seen))
        elif atom.kind in ("bare", "quoted"):
            raw = atom.raw
            if not raw:
                return None, None, None
            key = ("atom", atom.field, raw, atom.quote, atom.slop, atom.prefix)
            if (
                atom.kind == "bare"
                and kind in (FieldType.TEXT, FieldType.KEYWORD)
                and (atom.prefix or "*" in raw)
            ):
                # Wildcard atom -> Glob over the target fields, lowered later
                # against the term dictionary (const-score semantics).
                pattern = (raw + "*" if atom.prefix else raw).lower()
                node = Glob(fields=tuple(t.name for t in targets), pattern=pattern)
                key = ("glob", tuple(t.name for t in targets), pattern)
                if atom.boost is not None:
                    node = Boost(node, atom.boost)
                    key = ("boost", key, atom.boost)
                return occur, node, key
            if kind is FieldType.KEYWORD:
                node = Term(fields=tuple(targets), text=raw)
            elif kind is FieldType.TEXT:
                # Oversized-token lowering (contract behavior-quill-
                # oversized-query-lowering): a token that FAILS admission is
                # kept as an ordinary term leaf — the index never admits it,
                # so df=0 by construction, which yields exactly the
                # contract's lowering table: standalone/Must/Phrase with an
                # oversized member match nothing (Empty-equivalent), while
                # Should and MustNot contexts degrade gracefully.  Dropping
                # the token instead (as plain analysis would) would wrongly
                # let Must(valid, oversized) match on the valid term alone.
                toks = [(t.position, t.text) for t in tokenize(raw)]
                if not toks:
                    self.diagnostics.append(
                        Diagnostic("empty_atom", f"atom {raw!r} produced no tokens")
                    )
                    return None, None, None
                if len(toks) == 1 and not atom.prefix:
                    node = Term(fields=tuple(targets), text=toks[0][1])
                else:
                    node = Phrase(
                        fields=tuple(targets),
                        terms=tuple(PositionedTerm(p, t) for p, t in toks),
                        slop=atom.slop,
                        prefix=atom.prefix,
                    )
            else:
                # numeric field bare value -> exact "range" [v TO v]
                try:
                    value = int(raw)
                except ValueError:
                    self.diagnostics.append(
                        Diagnostic("type", f"non-numeric value {raw!r} for field")
                    )
                    return None, None, None
                node = RangeQ(field=targets[0].name, lower=value, upper=value)
        if node is None:
            return None, None, None
        if atom.boost is not None:
            node = Boost(node, atom.boost)
            key = ("boost", key, atom.boost)
        return occur, node, key

    def _finish_level(self, operands, source_atoms: int) -> Optional[Query]:
        if not operands:
            return None
        # A level that reduced to one operand through operator folding (or a
        # single source atom) unwraps, UNLESS an occur override must be kept.
        if len(operands) == 1 and source_atoms <= _operand_width(operands[0][2]):
            occ, _, node = operands[0]
            if occ is None or occ is Occur.SHOULD:
                return node
            return Boolean((BooleanClause(occ, node),), operator=None)
        # stable sibling dedup on syntax keys
        seen: set = set()
        deduped = []
        for occ, key, node in operands:
            k = ("k", occ, key) if key is not None else ("id", id(node))
            if k in seen:
                continue
            seen.add(k)
            deduped.append((occ, key, node))
        if len(deduped) == 1:
            occ, _, node = deduped[0]
            if occ is not None and occ is not Occur.SHOULD:
                return Boolean((BooleanClause(occ, node),), operator=None)
            return _flatten_should_of_should(
                Boolean((BooleanClause(Occur.SHOULD, node),), operator=None)
            )
        clauses = [
            BooleanClause(occ if occ is not None else Occur.SHOULD, node)
            for occ, _, node in deduped
        ]
        return _flatten_should_of_should(Boolean(tuple(clauses), operator=None))


def _operand_width(node: Query) -> int:
    """How many source atoms an operator-folded operand accounts for."""
    if isinstance(node, Boolean) and node.operator in ("AND", "OR"):
        return sum(_operand_width(c.query) for c in node.clauses)
    if isinstance(node, Boost):
        return _operand_width(node.query)
    return 1


def _fold_binary(operands, ops, op_name: str, occur: Occur):
    """Fold runs of one binary operator into Boolean nodes (left to right)."""
    if op_name not in ops:
        return operands, ops
    new_operands = [operands[0]]
    new_ops = []
    for i, op in enumerate(ops):
        right = operands[i + 1]
        if op == op_name:
            prev_occ, prev_key, prev = new_operands[-1]
            r_occ, r_key, r_node = right
            clauses = []
            # flatten only occur-less booleans: folds built by THIS run
            # always carry occ=None, but a user-written '-(a AND b)' or
            # 'NOT (a OR b)' group arrives with a MUST_NOT prefix that
            # splicing would silently discard — inverting the query
            if prev_occ is None and isinstance(prev, Boolean) and prev.operator == op_name:
                clauses.extend(prev.clauses)
            else:
                clauses.append(BooleanClause(prev_occ or occur, prev))
            clauses.append(BooleanClause(r_occ or occur, r_node))
            merged = Boolean(tuple(clauses), operator=op_name)
            new_operands[-1] = (None, (op_name.lower(), prev_key, r_key), merged)
        else:
            new_ops.append(op)
            new_operands.append(right)
    return new_operands, new_ops


def _normalize_value(raw: str, kind: FieldType) -> Union[str, int]:
    if kind is FieldType.I64:
        try:
            return int(raw)
        except ValueError:
            return raw
    if kind is FieldType.TEXT:
        toks = analyze_positional(raw)
        return toks[0][1] if toks else raw.lower()
    return raw


def _flatten_should_of_should(node: Boolean) -> Boolean:
    """Splice nested operator-less all-Should booleans into the parent."""
    out: list[BooleanClause] = []
    for clause in node.clauses:
        q = clause.query
        if (
            clause.occur is Occur.SHOULD
            and isinstance(q, Boolean)
            and q.operator is None
            and all(c.occur is Occur.SHOULD for c in q.clauses)
        ):
            out.extend(q.clauses)
        else:
            out.append(clause)
    return Boolean(tuple(out), operator=node.operator)


def _repair_root_all_negative(tree: Query, diagnostics: list[Diagnostic]) -> Query:
    """All-negative roots match nothing; repair with Must(All)-style Should."""
    if isinstance(tree, Boolean) and tree.clauses:
        if all(c.occur is Occur.MUST_NOT for c in tree.clauses):
            diagnostics.append(
                Diagnostic("repair", "all-negative query repaired with All")
            )
            return Boolean(
                tree.clauses + (BooleanClause(Occur.SHOULD, All()),),
                operator=tree.operator,
            )
    return tree


# ── Canonicalization (score-neutral; reference query.rs:379) ───────────────


def canonicalize_query(tree: Query) -> Query:
    if isinstance(tree, Boolean):
        clauses = [
            BooleanClause(c.occur, canonicalize_query(c.query)) for c in tree.clauses
        ]
        # dedupe exact-duplicate MustNot clauses
        seen = set()
        out = []
        for c in clauses:
            if c.occur is Occur.MUST_NOT:
                key = repr(c.query)
                if key in seen:
                    continue
                seen.add(key)
            out.append(c)
        # stable sort by occur rank
        out.sort(key=lambda c: OCCUR_RANK[c.occur])
        return Boolean(tuple(out), operator=tree.operator)
    if isinstance(tree, Boost):
        return Boost(canonicalize_query(tree.query), tree.factor)
    if isinstance(tree, Glob):
        return Glob(tuple(sorted(tree.fields)), tree.pattern)
    return tree
