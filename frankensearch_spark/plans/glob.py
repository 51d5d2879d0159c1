"""Glob (wildcard) pattern classification, matching, and expansion.

Behavioral rebuild of the reference's shipping wildcard classes (reference:
``crates/frankensearch-quill/src/query.rs:3415-3463`` CassWildcardPattern and
``grimoire.rs:1604`` star_glob_matches):

* Only ``*`` is a wildcard (zero-or-more scalars); there is no ``?``.
* Classes: ``Exact`` (no star), ``Prefix`` (one trailing star), ``Suffix``
  (one leading star), ``Substring`` (leading+trailing), ``Complex``
  (interior stars).  The core is lowercased at parse time.
* A glob lowers to the union of all dictionary terms matching the pattern,
  expanded in deterministic term order and capped at
  :data:`DEFAULT_GLOB_EXPANSION_LIMIT` (reference ``config.rs:33``);
  matching documents receive a **constant score** (the inherited boost),
  never per-term BM25 (reference ``index.rs`` lower_leaf_string_predicate:
  unscored union wrapped in constant_score).
"""

from __future__ import annotations

import re

#: Maximum dictionary terms one glob may expand to (reference config.rs:33).
DEFAULT_GLOB_EXPANSION_LIMIT = 16_384

EXACT = "exact"
PREFIX = "prefix"
SUFFIX = "suffix"
SUBSTRING = "substring"
COMPLEX = "complex"


def classify(pattern: str) -> tuple[str, str]:
    """Classify a wildcard pattern; returns ``(class, lowercased core)``.

    For ``COMPLEX`` the core is the full lowercased pattern (stars kept).
    An all-star pattern classifies as ``(EXACT, "")`` — matches nothing.
    """
    starts = pattern.startswith("*")
    ends = pattern.endswith("*")
    core = pattern.strip("*")
    if not core:
        return EXACT, ""
    if "*" in core:
        return COMPLEX, pattern.lower()
    core = core.lower()
    if starts and ends:
        return SUBSTRING, core
    if starts:
        return SUFFIX, core
    if ends:
        return PREFIX, core
    return EXACT, core


def star_glob_matches(pattern: str, term: str) -> bool:
    """Greedy ``*``-only glob match over complete terms."""
    parts = pattern.split("*")
    if len(parts) == 1:
        return term == pattern
    first, last = parts[0], parts[-1]
    if not term.startswith(first):
        return False
    if not term.endswith(last):
        return False
    pos = len(first)
    end_limit = len(term) - len(last)
    for mid in parts[1:-1]:
        if not mid:
            continue
        found = term.find(mid, pos, end_limit)
        if found == -1:
            return False
        pos = found + len(mid)
    return pos <= end_limit


def matches(pattern: str, term: str) -> bool:
    """Match one dictionary term against a (raw, case-preserved) pattern."""
    kind, core = classify(pattern)
    if kind == EXACT:
        return term == core
    if kind == PREFIX:
        return term.startswith(core)
    if kind == SUFFIX:
        return term.endswith(core)
    if kind == SUBSTRING:
        return core in term
    return star_glob_matches(core, term)


def expand(
    sorted_terms, pattern: str, limit: int = DEFAULT_GLOB_EXPANSION_LIMIT
) -> list[str]:
    """First ``limit`` matching terms from an ascending term iterable."""
    out: list[str] = []
    for term in sorted_terms:
        if matches(pattern, term):
            out.append(term)
            if len(out) >= limit:
                break
    return out


def to_regex(pattern: str) -> str:
    """Anchored regex equivalent for Complex patterns (JVM ``rlike``)."""
    parts = pattern.lower().split("*")
    return "^" + ".*".join(re.escape(p) for p in parts) + "$"
