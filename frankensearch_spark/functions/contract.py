"""Pinned BM25 scoring contract (float32, fixed operation order).

Rank-exact conformance with the reference lexical engine requires three
things, all pinned here:

1. The 256-entry fieldnorm quantization table (doc length -> 1-byte bucket),
   vendored from the public Tantivy 0.26.1 fieldnorm code table.  The
   reference vendors the identical table (see
   ``crates/frankensearch-quill/src/contract.rs:19-276`` in the reference
   repo); its u64 sum is pinned to 24_696_067_732 by test.
2. The BM25 constants k1=1.2, b=0.75 and the exact float32 expressions:
       idf       = ln(1 + (N - n + 0.5) / (n + 0.5))
       norm      = k1 * (1 - b + b * fieldnorm / avgdl)
       weight    = idf * (1 + k1) * boost
       tf_factor = f / (f + norm)
       score     = weight * tf_factor
   (reference: ``contract.rs:376-402``, ``argus.rs:1521,1602-1626``).
3. The conservative block-max codes used for rank-safe pruning
   (``contract.rs:306-367``): max-frequency code 255 is an unbounded
   sentinel, min fieldnorm id decodes through the same table.

Everything here is numpy float32; no arithmetic may be re-associated.  These
functions are used on the driver (per-query weights) and inside pandas UDFs
(per-posting scores); they are the single source of truth for both the Spark
engine and the pure-python oracle used in differential tests.
"""

from __future__ import annotations

import numpy as np

BM25_K1 = np.float32(1.2)
BM25_B = np.float32(0.75)

#: Maximum term length in bytes admitted to the index (reference:
#: ``quill/src/grimoire.rs:22`` MAX_TERM_BYTES).
MAX_TERM_BYTES = 65_530

#: Queries are truncated to this many Unicode scalar values
#: (reference: ``quill/src/query.rs:17`` MAX_QUERY_LENGTH).
MAX_QUERY_LENGTH = 10_000

#: Maximum recursive group depth accepted by the lenient parser
#: (reference: ``quill/src/query.rs:23`` MAX_QUERY_DEPTH).
MAX_QUERY_DEPTH = 64

#: Postings are grouped into blocks of this many documents; block-max
#: metadata is tracked per block (reference: ``quiver.rs:395-430``).
POSTINGS_PER_BLOCK = 128


def _build_field_norms_table() -> np.ndarray:
    """Construct the 256-entry fieldnorm decode table.

    This is the public Lucene/Tantivy "SmallFloat byte4" quantization:
    ids 0..=40 decode exactly; above that each id decodes to
    ``(8 | mantissa) << exponent`` rescaled so the sequence continues at 42
    with geometrically widening buckets.  We generate it arithmetically and
    pin the result with landmarks + a checksum test rather than vendoring
    256 literals.
    """
    table = np.zeros(256, dtype=np.uint64)
    for i in range(41):
        table[i] = i
    # Ids 41.. follow byte4 semantics: id = (exponent << 3) | mantissa
    # offset so that id 40 corresponds to mantissa 0 / exponent 2 of the
    # continued sequence.  Derive directly from the inverse mapping:
    # decode(id) for id >= 40 is (8 + (id & 7)) << ((id >> 3) - 5) ... the
    # cleanest pinned form reproduces the observed deltas: blocks of 8 ids
    # share a step that doubles every 8 ids starting at step=2 for 41..48.
    value = 40
    step = 2
    idx = 41
    count_in_block = 0
    # First block after the exact range has 8 entries of step 2 (41..48),
    # then each subsequent block of 8 doubles the step.
    while idx < 256:
        value += step
        table[idx] = value
        idx += 1
        count_in_block += 1
        if count_in_block == 8:
            count_in_block = 0
            step *= 2
    return table


FIELD_NORMS_TABLE: np.ndarray = _build_field_norms_table()


def id_to_fieldnorm(fieldnorm_id: int) -> int:
    """Decode a one-byte fieldnorm id to its quantized document length."""
    return int(FIELD_NORMS_TABLE[fieldnorm_id])


def fieldnorm_to_id(fieldnorm: int | np.ndarray) -> np.ndarray:
    """Encode document length(s) to fieldnorm id(s), rounding down.

    Vectorized: accepts a scalar or ndarray of lengths, returns uint8 ids.
    Mirrors ``contract.rs::fieldnorm_to_id`` (binary search, floor).
    """
    lengths = np.asarray(fieldnorm, dtype=np.uint64)
    ids = np.searchsorted(FIELD_NORMS_TABLE, lengths, side="right") - 1
    return ids.astype(np.uint8)


def block_max_frequency_to_code(max_frequency: int) -> int:
    """Encode a block's max term frequency to one byte (255 == unbounded)."""
    return 255 if max_frequency >= 255 else int(max_frequency)


def block_max_frequency_from_code(code: int) -> int:
    """Decode a conservative max-frequency code (255 -> u32::MAX sentinel)."""
    return 0xFFFF_FFFF if code == 255 else int(code)


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """Tantivy-compatible BM25 idf in float32.

    ``ratio = ((N - n) as f32 + 0.5) / (n as f32 + 0.5); ln(1 + ratio)``
    computed with plain ``ln`` (NOT ln_1p), matching the pinned operation
    order of the oracle.  The logarithm itself is evaluated in f64 and
    rounded once to f32: that equals the correctly-rounded ``logf`` used by
    the reference's libm (numpy's vectorized float32 log is a SIMD
    polynomial that differs in the last ulp ~25% of the time, so it must
    NOT be used here).
    """
    import math

    if doc_count < doc_freq:
        raise ValueError(f"doc_count {doc_count} < doc_freq {doc_freq}")
    ratio = (np.float32(doc_count - doc_freq) + np.float32(0.5)) / (
        np.float32(doc_freq) + np.float32(0.5)
    )
    return np.float32(math.log(float(np.float32(1.0) + ratio)))


def cached_tf_component(fieldnorm: int | np.ndarray, average_fieldnorm: float) -> np.float32:
    """One BM25 tf-cache entry: ``k1 * (1 - b + b * fieldnorm / avgdl)``.

    ``average_fieldnorm`` is the RAW average field length
    (total_tokens / doc_count over the snapshot), never an average of
    decoded fieldnorm buckets.
    """
    fn = np.asarray(fieldnorm, dtype=np.float32)
    avg = np.float32(average_fieldnorm)
    return (
        BM25_K1 * (np.float32(1.0) - BM25_B + BM25_B * fn / avg)
    ).astype(np.float32)


def compute_tf_cache(average_fieldnorm: float) -> np.ndarray:
    """Precompute the 256 float32 tf-cache entries for one field snapshot."""
    norms = FIELD_NORMS_TABLE.astype(np.float32)
    return cached_tf_component(norms, average_fieldnorm)


def term_weight(doc_freq: int, doc_count: int, boost: float = 1.0) -> np.float32:
    """BM25 term weight: ``idf * (1 + k1)`` then ``*= boost`` (f32 order).

    Matches ``argus.rs:1521-1523``: the multiply by boost is a separate
    float32 operation after the idf * (1 + k1) product.
    """
    weight = idf(doc_freq, doc_count) * (np.float32(1.0) + BM25_K1)
    weight = np.float32(weight * np.float32(boost))
    return weight


def term_scores(
    freqs: np.ndarray, fieldnorm_ids: np.ndarray, tf_cache: np.ndarray, weight: np.float32
) -> np.ndarray:
    """Vectorized per-posting BM25 scores in float32.

    ``score = weight * f / (f + tf_cache[fieldnorm_id])`` — the exact
    per-document arithmetic of ``argus.rs:1602-1626``.
    """
    f = np.asarray(freqs, dtype=np.float32)
    norms = tf_cache[np.asarray(fieldnorm_ids, dtype=np.int64)]
    tf_factor = f / (f + norms)
    return (np.float32(weight) * tf_factor).astype(np.float32)


def block_max_tf_factor(
    max_frequency_code: int, min_fieldnorm_id: int, live_avgdl: float
) -> float | None:
    """Conservative BM25 tf-factor bound for one posting block."""
    if max_frequency_code == 0 or not np.isfinite(live_avgdl) or live_avgdl <= 0.0:
        return None
    frequency = np.float32(block_max_frequency_from_code(max_frequency_code))
    norm = cached_tf_component(id_to_fieldnorm(min_fieldnorm_id), live_avgdl)
    factor = frequency / (frequency + norm)
    return float(factor) if np.isfinite(factor) else None


def block_max_score(
    max_frequency_code: int,
    min_fieldnorm_id: int,
    live_avgdl: float,
    nonnegative_weight: float,
) -> float | None:
    """Upper-bound score for one posting block (None disables pruning)."""
    if not np.isfinite(nonnegative_weight) or nonnegative_weight < 0.0:
        return None
    factor = block_max_tf_factor(max_frequency_code, min_fieldnorm_id, live_avgdl)
    if factor is None:
        return None
    score = np.float32(nonnegative_weight) * np.float32(factor)
    return float(score) if np.isfinite(score) else None
