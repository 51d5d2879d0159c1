"""Snippet kernel conformance — expectations pinned to the reference's
snippet unit tests (crates/frankensearch-quill/src/snippet.rs tests)."""

from __future__ import annotations

from frankensearch_spark.functions.snippet import SnippetGenerator


def gen(entries, max_chars=200, **kw):
    return SnippetGenerator(dict(entries), max_chars=max_chars, **kw)


def test_unicode_window_uses_byte_offsets():
    g = gen([("éé", 1)], max_chars=6)
    assert g.snippet("éé alpha") == "<b>éé</b>"


def test_df_weights_choose_the_rare_term_window():
    g = gen([("common", 2), ("rust", 1)], max_chars=12)
    assert g.snippet("common alpha beta gamma rust") == "<b>rust</b>"


def test_repeated_occurrences_each_contribute():
    g = gen([("rare", 1), ("common", 3)], max_chars=20)
    assert (
        g.snippet("rare xxxxxxxxxxxxxxxxxxxxxxxxxxxxxx common common common")
        == "<b>common</b> <b>common</b> <b>common</b>"
    )


def test_escaping_and_custom_tags():
    g = gen(
        [("rust", 1), ("café", 1), ("quote", 1), ("single", 1), ("end", 1)],
        max_chars=200,
        highlight_prefix="<em>",
        highlight_postfix="</em>",
    )
    assert g.snippet("Rust & <tag> café \"quote\" 'single' end") == (
        "<em>Rust</em> &amp; &lt;tag&gt; <em>café</em> &quot;<em>quote</em>&quot;"
        " &#x27;<em>single</em>&#x27; <em>end</em>"
    )


def test_exact_mode_vs_prefix_fallback():
    g = gen([("missing", 1)], max_chars=6)
    assert g.snippet("alpha beta gamma") is None
    assert g.snippet_or_prefix("alpha beta gamma") == "alpha"
    assert g.snippet(" <&> ") is None
    assert g.snippet_or_prefix(" <&> ") == "&lt;&amp;&gt;"
    g7 = gen([("missing", 1)], max_chars=7)
    assert g7.snippet_or_prefix("(alpha)") == "(alpha)"
    assert g.snippet_or_prefix("   ") is None


def test_zero_df_and_empty_terms_ignored():
    g = gen([("", 5), ("ghost", 0), ("hit", 4)])
    assert set(g.term_weights) == {"hit"}
    assert g.snippet("a ghost hit") == "a ghost <b>hit</b>"


def test_tie_prefers_earliest_then_shortest():
    # two windows with identical single-match score: earliest wins
    g = gen([("x", 9)], max_chars=5)
    out = g.snippet("x aaa x")
    assert out == "<b>x</b> aaa"
