"""Default analyzer: split on non-alphanumeric, lowercase.

Reimplements the reference's default analyzer semantics (reference:
``crates/frankensearch-lexical/src/lib.rs:1108-1217`` FrankensearchTokenizer,
fused SimpleTokenizer + LowerCaser):

* A token is a maximal run of alphanumeric scalar values.  "Alphanumeric"
  follows ``char::is_alphanumeric`` — for ASCII, exactly ``[a-zA-Z0-9]``;
  for non-ASCII, the Unicode Alphabetic/Nd/Nl/No classes.  Python's
  ``str.isalnum`` (and the regex class ``[^\\W_]``) matches the same set up
  to the Other_Alphabetic combining marks, which never occur in the
  conformance corpora.
* Each token is lowercased with the full Unicode lowercase mapping
  (``char::to_lowercase``): one scalar may expand to several
  (e.g. ``İ`` -> ``i`` + U+0307), which Python's ``str.lower`` reproduces.
* Lowercasing happens per token AFTER boundary detection, so combining
  marks produced by lowering can never split a token.
* Positions are 0-based token ordinals; offsets are UTF-8 BYTE offsets into
  the original text (the reference fixture expectations are byte offsets).
* Tokens longer than ``MAX_TERM_BYTES`` (65,530) UTF-8 bytes are rejected at
  admission but still consume a position (reference: ``scribe.rs:214``
  analyze_admitted, ``grimoire.rs:22``).

Two surfaces:

* :func:`tokenize` — pure-python reference used by the oracle, the query
  parser (query text must analyze identically to indexed text), and the
  conformance tests.
* :func:`tokens_udf_column` — the Spark-side vectorized pandas UDF used by
  the index build; returns ``array<string>`` where the array index is the
  analyzer position and rejected tokens are NULL placeholders (so positions
  survive ``posexplode`` + null filter).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .contract import MAX_TERM_BYTES

# [^\W_] == "word character except underscore" == Python isalnum() semantics,
# scanned by the C regex engine (fast path for batch tokenization).
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# ASCII batch fast path: map every non-[a-z0-9] byte to space, then split.
# For ASCII text this is exactly the analyzer — [^\W_]+ restricted to ASCII
# is [a-zA-Z0-9]+, ASCII lower() can't change token boundaries or byte
# lengths, and split() preserves token ordinals (= analyzer positions).
_ASCII_DELIM = bytes(
    b if chr(b) in "abcdefghijklmnopqrstuvwxyz0123456789" else 0x20
    for b in range(256)
)

# Underscore is NOT alphanumeric in the reference analyzer, and neither is
# it matched by [^\W_]; both engines split on it.


@dataclass(frozen=True)
class Token:
    """One analyzed token with position and UTF-8 byte offsets."""

    text: str
    position: int
    offset_from: int
    offset_to: int


def tokenize(text: str) -> list[Token]:
    """Reference tokenizer with byte offsets (pure python, test/oracle path).

    Emits every token (including ones that fail length admission — callers
    that index must apply :func:`is_admitted`).
    """
    out: list[Token] = []
    # Byte offset bookkeeping: compute incrementally to stay O(n).
    byte_pos = 0
    char_pos = 0
    for position, match in enumerate(_TOKEN_RE.finditer(text)):
        start_c, end_c = match.start(), match.end()
        byte_pos += len(text[char_pos:start_c].encode("utf-8"))
        start_b = byte_pos
        byte_pos += len(text[start_c:end_c].encode("utf-8"))
        char_pos = end_c
        out.append(
            Token(
                text=match.group().lower(),
                position=position,
                offset_from=start_b,
                offset_to=byte_pos,
            )
        )
    return out


def is_admitted(term: str) -> bool:
    """Token admission: reject terms longer than MAX_TERM_BYTES UTF-8 bytes."""
    # Cheap pre-check: utf-8 is at most 4 bytes per scalar.
    if len(term) * 4 <= MAX_TERM_BYTES:
        return True
    return len(term.encode("utf-8")) <= MAX_TERM_BYTES


def analyze_terms(text: str) -> list[str]:
    """Admitted lowercased terms in order (positions == list index only when
    no token was rejected; use :func:`analyze_positional` when positions
    matter)."""
    return [t.text for t in tokenize(text) if is_admitted(t.text)]


def analyze_positional(text: str) -> list[tuple[int, str]]:
    """Admitted (position, term) pairs; positions are pre-admission ordinals."""
    return [(t.position, t.text) for t in tokenize(text) if is_admitted(t.text)]


def tokenize_batch(texts) -> list[list[str | None]]:
    """Tokenize a batch of strings; rejected tokens become None placeholders.

    The array index IS the analyzer position.  This is the hot path run
    inside the Spark pandas UDF — one C-regex scan per row, one lower()
    per token, no other per-row work.
    """
    out: list[list[str | None]] = []
    findall = _TOKEN_RE.findall
    admit = MAX_TERM_BYTES // 4  # chars; tokens shorter than this always pass
    for text in texts:
        if not text:
            out.append([])
            continue
        if text.isascii() and len(text) <= MAX_TERM_BYTES:
            # ASCII whole-string fast path (~4x the regex scan, measured
            # 126 -> 32 ms per 6,250-row batch): lower() first is safe
            # because ASCII case mapping never changes character class or
            # byte length, so boundaries and admission are unaffected —
            # and no token can exceed MAX_TERM_BYTES when the whole text
            # doesn't.  translate+split is the analyzer restricted to
            # ASCII: maximal [a-z0-9] runs, ordinals preserved.
            out.append(
                text.lower().encode("ascii").translate(_ASCII_DELIM).decode("ascii").split()
            )
            continue
        raw = findall(text)
        row: list[str | None] = [None] * len(raw)
        for i, tok in enumerate(raw):
            low = tok.lower()
            if len(low) <= admit or len(low.encode("utf-8")) <= MAX_TERM_BYTES:
                row[i] = low
        out.append(row)
    return out


def tokens_udf_column(column):
    """Return a Spark Column: ``array<string>`` of analyzer tokens for a text
    column (NULL entries = rejected tokens, index = analyzer position).

    Implemented as an Arrow-batched pandas UDF; import is deferred so the
    pure-python surfaces above stay importable without a JVM.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def _tokenize(texts: pd.Series) -> pd.Series:
        return pd.Series(tokenize_batch(texts.fillna("").tolist()))

    return _tokenize(column)
