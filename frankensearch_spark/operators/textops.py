"""Training-data pipeline operators over document corpora.

Large-scale corpus preparation ops that complement the lexical index:
exact dedup, token statistics, language-ID heuristics, quality signals,
and normalization fingerprints.  All of them are pure Catalyst plans
(whole-stage-codegen, no Python in the hot path): at 100 TB these are
single-shuffle (or shuffle-free) scans.

Tokenization here uses the JVM ``split`` fast path, which equals the
engine's full Unicode analyzer for ASCII-only corpora (the synthetic
testdata is verified pure ``[a-z0-9 ]``).  Corpora with uppercase or
non-ASCII text must go through the pandas-UDF analyzer in
``functions/analyze.py`` instead — the regex here lowercases first, which
can merge tokens the reference analyzer would split (e.g. ``İ``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Minimal English stopword list for the language-ID heuristic.  Pinned —
#: both the Spark implementation and any SQL oracle must use this exact set.
EN_STOPWORDS = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "this", "that",
)


def ascii_tokens(col):
    """JVM-side tokens: lowercase, split on non-[a-z0-9] runs.

    SCOPE: ASCII-only by design — non-ASCII letters act as separators.
    This is the training-data-pipeline tokenizer (dedup, quality signals,
    token counts, fingerprints — this module and ``operators/dedup.py``),
    chosen so the DuckDB oracles can mirror it with one regex and so the
    whole pipeline stays inside whole-stage codegen.  It is deliberately
    NOT the search analyzer: the index build uses the Unicode-correct
    ``functions/analyze.py`` tokenizer, whose semantics are pinned by the
    reference conformance fixtures.  For multilingual pipeline corpora,
    swap in a Unicode-class regex here and mirror it in the oracle.
    """
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != "")


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", ascii_tokens(F.col(text_col)))


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate marking: keep-first by id within identical text.

    Returns (doc_id, is_duplicate).  One shuffle; the window partitions on
    ``(xxhash64(text), text)``: routing is identical to partitioning on the
    text alone, but the within-partition sort comparator now short-circuits
    on the leading 8-byte hash instead of full-string compares — on a
    near-duplicate-heavy corpus (long shared prefixes) that is the
    difference between O(8) and O(doc length) per comparison.  The full
    text stays in the key, so an xxhash64 collision cannot merge two
    different documents — semantics are exactly groupBy(text).
    """
    w = Window.partitionBy(F.xxhash64(F.col(text_col)), F.col(text_col)).orderBy(
        id_col
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        (F.row_number().over(w) > 1).alias("is_duplicate"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_unique) — shuffle-free scan."""
    toks = ascii_tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_unique"),
    )


def langid_stopword(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language ID: (doc_id, stop_ratio, is_en).

    ratio = stopword tokens / total tokens (double, rounded to 6);
    is_en when ratio >= 0.05.
    """
    toks = ascii_tokens(F.col(text_col))
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    n_tok = F.size(toks)
    ratio = F.when(n_tok > 0, F.round(n_stop.cast("double") / n_tok.cast("double"), 6)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        ratio.alias("stop_ratio"),
        (ratio >= 0.05).alias("is_en"),
    )


def quality_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len) quality features."""
    toks = ascii_tokens(F.col(text_col))
    n_tok = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("int").alias("n_chars"),
        n_tok.cast("int").alias("n_tokens"),
        F.when(
            n_tok > 0, F.round(tok_chars.cast("double") / n_tok.cast("double"), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalization fingerprint: md5 of the space-joined token stream.

    Token-level normalization (not a raw-text hash) so whitespace/punct
    variants collide — the cheap exact-dup key for content-defined dedup.
    """
    toks = ascii_tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
    )


def events_hourly_rollup(events: DataFrame) -> DataFrame:
    """Batch analogue of the streaming hourly rollup: per (event_type, hour)
    counts and exact decimal sums (decimal so the aggregate is
    order-insensitive — float sums are not reproducible across partitions).
    """
    return (
        events.groupBy(
            "event_type",
            (
                F.floor(F.col("ts").cast("timestamp").cast("long") / F.lit(3600)) * 3600
            ).alias("hour_epoch"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value_dec"),
        )
        .select(
            "event_type",
            F.col("hour_epoch").cast("long").alias("hour_epoch"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("total_value_dec").cast("double").alias("total_value"),
        )
    )
