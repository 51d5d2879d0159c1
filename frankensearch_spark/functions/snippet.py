"""Snippet generation over already-analyzed query terms.

Behavioral rebuild of the reference's native snippet kernel (reference:
``crates/frankensearch-quill/src/snippet.rs``), which itself mirrors the
pinned Tantivy 0.26.1 incumbent:

* term weight = ``1 / (1 + document_frequency)`` as float32; empty terms and
  df==0 terms are dropped; duplicate term text keeps its greatest weight;
* token offsets are UTF-8 **byte** offsets; a fragment closes when the next
  token's end would exceed ``max_chars`` bytes from the fragment start, and
  the new fragment starts at that token's start offset (fragments never
  split a token, so one token may exceed ``max_chars``);
* fragment score = f32 sum of one weight per matching token occurrence;
  best fragment = highest score, then earliest start, then smallest stop;
* rendering HTML-escapes the source (``" & ' < >`` only) and wraps each
  highlighted range in trusted caller tags, collapsing overlapping ranges
  (adjacent ranges stay separate);
* ``snippet`` returns None when nothing matched; ``snippet_or_prefix``
  falls back to the escaped longest token-aligned prefix within
  ``max_chars`` bytes (or a char-boundary cut when no token fits).

Snippets run driver-side over the k winners only (k rows — the reference
also generates snippets post-collection, ``index.rs:8414``).
"""

from __future__ import annotations

import numpy as np

from .analyze import tokenize
from .contract import MAX_TERM_BYTES

#: Incumbent ``search_with_snippets`` window default (snippet.rs:23).
DEFAULT_SNIPPET_MAX_CHARS = 200


def _escape_html(text: str) -> str:
    out = []
    for ch in text:
        if ch == '"':
            out.append("&quot;")
        elif ch == "&":
            out.append("&amp;")
        elif ch == "'":
            out.append("&#x27;")
        elif ch == "<":
            out.append("&lt;")
        elif ch == ">":
            out.append("&gt;")
        else:
            out.append(ch)
    return "".join(out)


class _Fragment:
    __slots__ = ("score", "start", "stop", "highlighted")

    def __init__(self, start: int):
        self.score = np.float32(0.0)
        self.start = start
        self.stop = start
        self.highlighted: list[tuple[int, int]] = []


def _better(a: _Fragment, b: _Fragment) -> bool:
    """True when fragment ``a`` beats ``b``: score desc, start asc, stop asc."""
    if a.score != b.score:
        return a.score > b.score
    if a.start != b.start:
        return a.start < b.start
    return a.stop < b.stop


def _collapse(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort/dedup and merge overlapping (not merely adjacent) ranges."""
    ranges = sorted(set(ranges))
    out: list[tuple[int, int]] = []
    for start, end in ranges:
        if out and out[-1][1] > start:
            out[-1] = (out[-1][0], max(out[-1][1], end))
        else:
            out.append((start, end))
    return out


class SnippetGenerator:
    """Reusable generator for one compiled query's analyzed terms.

    ``term_dfs`` maps analyzed term text -> snapshot document frequency for
    the snippet field.  Weights are compiled once; ``snippet`` can then be
    called per winning document.
    """

    def __init__(
        self,
        term_dfs: dict[str, int],
        max_chars: int = DEFAULT_SNIPPET_MAX_CHARS,
        highlight_prefix: str = "<b>",
        highlight_postfix: str = "</b>",
    ):
        self.max_chars = max_chars
        self.highlight_prefix = highlight_prefix
        self.highlight_postfix = highlight_postfix
        self.term_weights: dict[str, np.float32] = {}
        for text, df in term_dfs.items():
            if not text or df == 0:
                continue
            weight = np.float32(1.0) / (np.float32(1.0) + np.float32(df))
            prev = self.term_weights.get(text)
            if prev is None or weight > prev:
                self.term_weights[text] = weight

    # ── public API ────────────────────────────────────────────────────────

    def snippet(self, source: str) -> str | None:
        """Highlighted best window, or None when no term occurs."""
        return self._generate(source, fallback_prefix=False)

    def snippet_or_prefix(self, source: str) -> str | None:
        """Like :meth:`snippet`, falling back to the escaped prefix."""
        return self._generate(source, fallback_prefix=True)

    # ── kernel ────────────────────────────────────────────────────────────

    def _generate(self, source: str, fallback_prefix: bool) -> str | None:
        source = source.strip()
        if not source:
            return None
        raw = source.encode("utf-8")
        current = _Fragment(0)
        best: _Fragment | None = None
        fallback_stop = 0
        max_chars = self.max_chars

        for token in tokenize(source):
            if token.offset_to <= max_chars:
                fallback_stop = token.offset_to
            if token.offset_to - current.start > max_chars:
                completed = current
                current = _Fragment(token.offset_from)
                if completed.score > 0 and (best is None or _better(completed, best)):
                    best = completed
            current.stop = token.offset_to
            if len(token.text.encode("utf-8")) <= MAX_TERM_BYTES:
                weight = self.term_weights.get(token.text)
                if weight is not None:
                    current.score = np.float32(current.score + weight)
                    current.highlighted.append((token.offset_from, token.offset_to))
        if current.score > 0 and (best is None or _better(current, best)):
            best = current

        if best is not None:
            return self._render(raw, best)
        if not fallback_prefix:
            return None
        if len(raw) <= max_chars:
            stop = len(raw)
        elif fallback_stop == 0:
            stop = max_chars
            while stop > 0 and (raw[stop] & 0xC0) == 0x80:  # char boundary
                stop -= 1
        else:
            stop = fallback_stop
        if stop == 0:
            return None
        return _escape_html(raw[:stop].decode("utf-8"))

    def _render(self, raw: bytes, fragment: _Fragment) -> str:
        text = raw[fragment.start : fragment.stop]
        relative = [
            (s - fragment.start, e - fragment.start) for s, e in fragment.highlighted
        ]
        out: list[str] = []
        cursor = 0
        for start, end in _collapse(relative):
            out.append(_escape_html(text[cursor:start].decode("utf-8")))
            out.append(self.highlight_prefix)
            out.append(_escape_html(text[start:end].decode("utf-8")))
            out.append(self.highlight_postfix)
            cursor = end
        out.append(_escape_html(text[cursor:].decode("utf-8")))
        return "".join(out)
