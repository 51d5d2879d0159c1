"""Deterministic synthetic transcript corpus (the north-rule input shape).

Generates the canonical table ``(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)`` fully distributed and fully
deterministic: every value is a pure function of the row id (via Spark's
murmur ``hash``), so the corpus is identical across partition counts,
cluster sizes, and re-runs — no driver-side data generation, no RNG state.

Text is a Zipf-skewed bag of ~``vocab_size`` words (``w0`` is ~8x more
frequent than the tail) with occasional identifier-shaped tokens
(``pol-358``-style hyphenations) to exercise the analyzer's split
behavior, 10-120 words per turn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURNS_PER_CONV = 16
ROLES = ["user", "assistant", "tool"]


def synthetic_transcripts(
    spark: SparkSession,
    n_turns: int,
    vocab_size: int = 10_000,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    base = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    rid = F.col("id")
    conv = (rid / TURNS_PER_CONV).cast("long")
    turn_idx = (rid % TURNS_PER_CONV).cast("int")
    # words per turn: 10..129, deterministic per row
    n_words = (F.pmod(F.hash(rid, F.lit(seed), F.lit(1)), F.lit(120)) + F.lit(10)).cast("int")
    # word at position i: zipf-ish via cubing a uniform hash
    word_idx = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.pmod(F.hash(rid, i, F.lit(seed)), F.lit(1_000_000)),
    )
    words = F.transform(
        word_idx,
        lambda u: F.concat(
            F.lit("w"),
            F.floor(
                F.pow(u.cast("double") / F.lit(1_000_000.0), F.lit(3.0))
                * F.lit(float(vocab_size))
            ).cast("long"),
        ),
    )
    # sprinkle identifier-shaped tokens: every ~17th turn appends "pol-NNN src/main.rs"
    ident = F.when(
        F.pmod(F.hash(rid, F.lit(seed), F.lit(2)), F.lit(17)) == 0,
        F.concat(
            F.lit(" pol-"),
            F.pmod(F.hash(rid, F.lit(seed), F.lit(3)), F.lit(1000)).cast("string"),
            F.lit(" src/main.rs"),
        ),
    ).otherwise(F.lit(""))
    text = F.concat(F.array_join(words, " "), ident)
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (turn_idx % len(ROLES)) + 1
    )
    tool = F.when(
        role == "tool",
        F.concat(F.lit("tool_"), F.pmod(F.hash(rid, F.lit(seed), F.lit(4)), F.lit(8)).cast("string")),
    ).otherwise(F.lit(None).cast("string"))
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + rid * 7)
    return base.select(
        F.concat(F.lit("conv-"), F.lpad(conv.cast("string"), 8, "0")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
