"""Driver-side vectorized XXH64 matching Spark's ``xxhash64`` builtin.

The driver-side micro-commit path (operators/microcommit.py) computes the
per-doc content witness without a Spark job, so it needs the EXACT hash
``content_hash_expr`` produces: Spark's XxHash64 expression — the
reference xxHash64 algorithm over the column's UTF-8 bytes, little-endian
words, seed 42, with multi-column chaining (each column's hash seeds the
next).  Nulls never reach the hash (``content_hash_expr`` coalesces to
``''`` first), so this implementation only needs string bytes.

Implemented as numpy vector ops over a whole pyarrow string column at
once: per 32-byte-stripe iteration every row advances one stripe under a
validity mask, so the loop count is max(len)//32, not the row count —
~10 ms for a 6k-row micro-batch.  uint64 arithmetic wraps mod 2^64 in C
exactly like the JVM's long.  Bit-equality with Spark is pinned by
``tests/test_xxh64.py`` across lengths 0..200, multi-byte UTF-8, and
multi-column chaining.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_XXHASH64_SEED = 42


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _gather_words(data: np.ndarray, idx: np.ndarray, nbytes: int) -> np.ndarray:
    """Little-endian unsigned words of ``nbytes`` at ``idx`` positions."""
    rows = data[idx[:, None] + np.arange(nbytes)]
    dt = {8: np.uint64, 4: np.uint32, 1: np.uint8}[nbytes]
    out = np.ascontiguousarray(rows).view(dt).ravel()
    return out.astype(np.uint64)


def xxh64_bytes_arrays(
    starts: np.ndarray, lengths: np.ndarray, data: np.ndarray, seeds: np.ndarray
) -> np.ndarray:
    """XXH64 of ``n`` byte strings described by (start, length) into
    ``data`` (uint8, padded with >= 8 trailing bytes so masked lanes can
    gather safely), seeded per row.  Returns uint64[n]."""
    with np.errstate(over="ignore"):
        return _xxh64_impl(starts, lengths, data, seeds)


def _xxh64_impl(starts, lengths, data, seeds):
    n = len(starts)
    starts = starts.astype(np.int64)
    L = lengths.astype(np.int64)
    seeds = seeds.astype(np.uint64)
    h = seeds + _P5

    # ── 32-byte stripes (rows with L >= 32) ───────────────────────────
    stripes = np.where(L >= 32, L // 32, 0)
    big = np.flatnonzero(L >= 32)
    if len(big):
        s_b = starts[big]
        v1 = seeds[big] + _P1 + _P2
        v2 = seeds[big] + _P2
        v3 = seeds[big].copy()
        v4 = seeds[big] - _P1
        remaining = stripes[big].copy()
        off = s_b.copy()
        live = np.arange(len(big))
        while len(live):
            w0 = _gather_words(data, off[live], 8)
            w1 = _gather_words(data, off[live] + 8, 8)
            w2 = _gather_words(data, off[live] + 16, 8)
            w3 = _gather_words(data, off[live] + 24, 8)
            v1[live] = _rotl(v1[live] + w0 * _P2, 31) * _P1
            v2[live] = _rotl(v2[live] + w1 * _P2, 31) * _P1
            v3[live] = _rotl(v3[live] + w2 * _P2, 31) * _P1
            v4[live] = _rotl(v4[live] + w3 * _P2, 31) * _P1
            off[live] += 32
            remaining[live] -= 1
            live = live[remaining[live] > 0]
        hb = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            hb ^= _rotl(v * _P2, 31) * _P1
            hb = hb * _P1 + _P4
        h[big] = hb

    h = h + L.astype(np.uint64)

    # ── trailing 8-byte words (0..3 per row) ──────────────────────────
    word_base = starts + stripes * 32
    nwords = (L - stripes * 32) // 8
    for j in range(3):
        m = np.flatnonzero(nwords > j)
        if not len(m):
            break
        k1 = _gather_words(data, word_base[m] + 8 * j, 8)
        k1 = _rotl(k1 * _P2, 31) * _P1
        h[m] = _rotl(h[m] ^ k1, 27) * _P1 + _P4

    # ── trailing 4-byte word ──────────────────────────────────────────
    pos = (L // 8) * 8
    m = np.flatnonzero(L - pos >= 4)
    if len(m):
        w = _gather_words(data, starts[m] + pos[m], 4)
        h[m] = _rotl(h[m] ^ (w * _P1), 23) * _P2 + _P3
    pos = pos + np.where(L - pos >= 4, 4, 0)

    # ── trailing bytes (0..3 per row) ─────────────────────────────────
    nb = L - pos
    for j in range(3):
        m = np.flatnonzero(nb > j)
        if not len(m):
            break
        b = _gather_words(data, starts[m] + pos[m] + j, 1)
        h[m] = _rotl(h[m] ^ (b * _P5), 11) * _P1

    # ── avalanche ─────────────────────────────────────────────────────
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def _string_parts(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(starts, lengths, padded uint8 data) of a pyarrow string array,
    nulls treated as ''. Handles sliced arrays (non-zero offset)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dt = np.int64
    else:
        off_dt = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dt, count=len(arr) + 1, offset=arr.offset * np.dtype(off_dt).itemsize)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    padded = np.concatenate([data, np.zeros(40, np.uint8)])
    return starts, lengths, padded


def spark_xxhash64_columns(columns: list) -> np.ndarray:
    """Spark's ``xxhash64(col0, col1, ...)`` over pyarrow string arrays
    (nulls as ''), returned as uint64[n] — chain each column's hash as
    the next column's seed, starting from Spark's fixed seed 42."""
    n = len(columns[0])
    seeds = np.full(n, SPARK_XXHASH64_SEED, dtype=np.uint64)
    for col in columns:
        starts, lengths, data = _string_parts(col)
        seeds = xxh64_bytes_arrays(starts, lengths, data, seeds)
    return seeds
