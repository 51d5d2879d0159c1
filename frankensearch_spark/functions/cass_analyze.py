"""CASS analyzer family: hyphen-compound tokenizer, CJK bigrams, edge
n-grams, preview.

Behavioral rebuild of the reference's CASS analyzers (reference:
``crates/frankensearch-quill/src/scribe.rs:808`` CassAnalyzer and the
incumbent ``crates/frankensearch-lexical/src/cass_compat.rs``), pinned by
the ``hyphen_normalize`` / ``prefix_normalize`` analyzer cases and the
helper cases of ``tests/fixtures/quill_language_contract.json``:

* A token run starts at an ASCII alphanumeric (run = ASCII alnums plus
  interior single hyphens between alnums) or at a CASS-CJK scalar (run =
  consecutive CJK scalars).  Every other scalar is a separator.
* ASCII runs emit the compound (ASCII-lowercased) and — hyphen_normalize
  only — each non-empty ``-``-split part, ALL at the same position with
  the compound's byte offsets (same-position alternatives).
* CJK runs emit character bigrams (a single scalar emits itself), all at
  the run's position/offsets; CJK text is not case-mapped.
* Tokens longer than 256 bytes are dropped (``CASS_MAX_TOKEN_BYTES``).
* ``cass_generate_edge_ngrams``: per alphanumeric word, prefixes of 2..20
  Unicode scalars in word-then-length order, space-joined, case
  preserved (the prefix-field source text).
* ``cass_build_preview``: first ``max_chars`` scalars plus ``…`` exactly
  when input remains.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

CASS_MAX_TOKEN_BYTES = 256
CASS_MAX_EDGE_NGRAM_CHARS = 20

#: Splitter matching Rust ``!char::is_alphanumeric`` one scalar at a time
#: (underscore is a separator; empty words between separators are fine —
#: they produce no prefixes).
_NON_ALNUM_SPLIT = re.compile(r"[\W_]", re.UNICODE)


def is_cass_cjk(ch: str) -> bool:
    """Exact CJK ranges of the incumbent CASS tokenizer (scribe.rs:820)."""
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


@dataclass(frozen=True)
class CassToken:
    text: str
    position: int
    offset_from: int  # UTF-8 byte offset
    offset_to: int
    position_length: int = 1


def _ascii_lower(s: str) -> str:
    """ASCII-only lowercase (Rust make_ascii_lowercase: é stays é)."""
    return "".join(
        chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in s
    )


def cass_analyze(text: str, hyphen_decompose: bool = True) -> list[CassToken]:
    """Token stream for ``hyphen_normalize`` (default) or
    ``prefix_normalize`` (``hyphen_decompose=False``)."""
    return cass_token_stream(text, hyphen_decompose)[0]


def cass_token_stream(
    text: str, hyphen_decompose: bool = True
) -> tuple[list[CassToken], int]:
    """(tokens, position_count) — the position count includes runs whose
    tokens were all dropped by byte-length admission (the reference
    increments the position per source run regardless)."""
    out: list[CassToken] = []
    n = len(text)
    # precompute byte offsets per char index (O(n))
    byte_at = [0] * (n + 1)
    for i, ch in enumerate(text):
        byte_at[i + 1] = byte_at[i] + len(ch.encode("utf-8"))

    def emit(source: str, position: int, b_from: int, b_to: int) -> None:
        if len(source.encode("utf-8")) > CASS_MAX_TOKEN_BYTES:
            return
        out.append(CassToken(_ascii_lower(source), position, b_from, b_to))

    i = 0
    position = 0
    while i < n:
        ch = text[i]
        if ch.isascii() and ch.isalnum():
            # ascii run: alnums + interior single hyphen between alnums
            j = i
            end = i
            last_alnum = False
            while j < n:
                c = text[j]
                if c.isascii() and c.isalnum():
                    j += 1
                    end = j
                    last_alnum = True
                    continue
                if (
                    c == "-"
                    and last_alnum
                    and j + 1 < n
                    and text[j + 1].isascii()
                    and text[j + 1].isalnum()
                ):
                    j += 1
                    end = j
                    last_alnum = False
                    continue
                break
            source = text[i:end]
            b_from, b_to = byte_at[i], byte_at[end]
            emit(source, position, b_from, b_to)
            if hyphen_decompose and "-" in source:
                for part in source.split("-"):
                    if part:
                        emit(part, position, b_from, b_to)
            position += 1
            i = end
        elif is_cass_cjk(ch):
            j = i + 1
            while j < n and is_cass_cjk(text[j]):
                j += 1
            chars = text[i:j]
            b_from, b_to = byte_at[i], byte_at[j]
            if len(chars) == 1:
                emit(chars, position, b_from, b_to)
            else:
                for k in range(len(chars) - 1):
                    # CJK is never ASCII-case-mapped; bigram emit bypasses
                    # lowering but keeps the byte-length admission check
                    bigram = chars[k : k + 2]
                    if len(bigram.encode("utf-8")) <= CASS_MAX_TOKEN_BYTES:
                        out.append(CassToken(bigram, position, b_from, b_to))
            position += 1
            i = j
        else:
            i += 1
    return out, position


def cass_analyze_prefix(text: str) -> list[CassToken]:
    """``prefix_normalize``: identical scan, no hyphen decomposition."""
    return cass_analyze(text, hyphen_decompose=False)


def cass_tokenize_batch(
    texts, hyphen_decompose: bool = True, edge_ngrams: bool = False
) -> tuple[list[list[dict]], list[int]]:
    """Batch tokenizer for the Spark build path.

    Returns per row: a list of ``{"pos": int, "term": str}`` structs (the
    same-position compound/part/bigram alternatives keep their shared
    position) and the position count (the CASS doc length).  With
    ``edge_ngrams=True`` the row text is first expanded through
    :func:`cass_generate_edge_ngrams` (the ``*_prefix`` field source).
    """
    rows: list[list[dict]] = []
    lens: list[int] = []
    for text in texts:
        text = text or ""
        if edge_ngrams:
            text = cass_generate_edge_ngrams(text)
        toks, n_positions = cass_token_stream(text, hyphen_decompose)
        rows.append([{"pos": t.position, "term": t.text} for t in toks])
        lens.append(n_positions)
    return rows, lens


def cass_generate_edge_ngrams(text: str) -> str:
    """Edge-prefix field source: 2..20-scalar prefixes per word."""
    prefixes: list[str] = []
    for word in _NON_ALNUM_SPLIT.split(text):
        upper = min(len(word), CASS_MAX_EDGE_NGRAM_CHARS)
        for end in range(2, upper + 1):
            prefixes.append(word[:end])
    return " ".join(prefixes)


def cass_build_preview(content: str, max_chars: int) -> str:
    """First ``max_chars`` scalars, ``…``-suffixed when truncated."""
    if len(content) <= max_chars:
        return content
    return content[:max_chars] + "…"
