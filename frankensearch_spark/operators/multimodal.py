"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media ride along as opaque ``binary`` columns with typed metadata; decode /
feature-extract / frame-sample run as Arrow-batched ``mapInPandas`` stages
so one executor task processes one columnar batch of blobs (the shape that
scales: media bytes never leave the executor, only small feature rows
shuffle).

The image/audio codec libraries are not installed in this environment, so
the actual pixel/sample decode is STUBBED: blobs use a deterministic
``FAKE`` container (magic + width/height/channels header + pseudo-pixel
payload) and the decoders parse that container for real.  Swapping in PIL/
soundfile is a one-function change (see ``_decode_real``) — the Spark-side
plumbing (schemas, batch iteration, partitioning, UDF signatures) is the
tested, permanent part.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"FAKE"
HEADER_FMT = "<4sHHB"  # magic, width, height, channels
HEADER_SIZE = struct.calcsize(HEADER_FMT)

FEATURE_DIM = 8


def make_blob(key: str, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake media container for one logical asset."""
    payload_len = width * height * channels
    seed = hashlib.blake2b(key.encode("utf-8"), digest_size=8).digest()
    reps = -(-payload_len // len(seed))
    payload = (seed * reps)[:payload_len]
    return struct.pack(HEADER_FMT, MAGIC, width, height, channels) + payload


def media_dims_for_id(doc_id: str) -> tuple[int, int, int]:
    """Deterministic (width, height, channels) of the fake asset for one id.

    Single source of truth shared by :func:`attach_fake_media` and the
    DuckDB-side expected-metadata oracle — dims are a pure function of the
    doc_id so any runtime can precompute them.
    """
    h = int.from_bytes(hashlib.blake2b(doc_id.encode(), digest_size=4).digest(), "little")
    return 8 + (h % 25), 8 + ((h >> 8) % 25), 3


def expected_media_meta(doc_ids) -> list[tuple[str, int, int, int, int]]:
    """(doc_id, width, height, channels, n_bytes) rows the decode stage
    must produce — the oracle's ground truth, computed without Spark."""
    out = []
    for doc_id in doc_ids:
        doc_id = str(doc_id)
        width, height, channels = media_dims_for_id(doc_id)
        out.append(
            (doc_id, width, height, channels, HEADER_SIZE + width * height * channels)
        )
    return out


def attach_fake_media(
    df: DataFrame, id_col: str = "doc_id", kind: str = "image"
) -> DataFrame:
    """Synthesize a media column: (id, media binary, media_kind, media_len).

    Dimensions derive deterministically from the id, so the corpus is
    reproducible across partitionings and runs.
    """
    out_schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("media", BinaryType(), False),
            StructField("media_kind", StringType(), False),
            StructField("media_len", LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype(str)
            blobs = []
            for i in ids:
                width, height, _ = media_dims_for_id(i)
                blobs.append(make_blob(i, width, height))
            yield pd.DataFrame(
                {
                    "doc_id": ids.values,
                    "media": blobs,
                    "media_kind": kind,
                    "media_len": [len(b) for b in blobs],
                }
            )

    return df.select(F.col(id_col)).mapInPandas(gen, schema=out_schema)


def _decode_header(blob: bytes) -> tuple[int, int, int]:
    magic, width, height, channels = struct.unpack_from(HEADER_FMT, blob)
    if magic != MAGIC:
        raise ValueError("not a FAKE container")
    return width, height, channels


def _decode_real(blob: bytes) -> tuple[int, int, int]:
    """Real image decode: PIL when importable, else a declared seam.

    ``decode_media_meta`` routes any blob that is NOT a FAKE container
    here, so plugging in PIL (or extending to soundfile / av for
    audio/video kinds) upgrades the whole pipeline without touching the
    Spark plumbing — the mapInPandas batch shape, schema, and
    partitioning are identical either way.  The FAKE container remains
    the deterministic conformance gate (its oracle parquet is
    precomputed); real decodes are covered by a PIL-marked test that
    skips cleanly when the library is absent.
    """
    try:
        import PIL.Image
    except ImportError as exc:  # pragma: no cover - PIL present in some envs
        raise NotImplementedError(
            "real media decode requires an image library (PIL); "
            "this environment ships the FAKE-container stub only"
        ) from exc
    import io

    with PIL.Image.open(io.BytesIO(blob)) as im:
        return int(im.width), int(im.height), len(im.getbands())


def decode_media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Parse per-blob metadata: (doc_id, width, height, channels, n_bytes)."""
    out_schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("channels", IntegerType(), False),
            StructField("n_bytes", LongType(), False),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[media_col]):
                blob = bytes(blob)
                try:
                    width, height, channels = _decode_header(blob)
                except (ValueError, struct.error):
                    # not a FAKE container → the real-decode seam (PIL
                    # when importable, NotImplementedError otherwise)
                    width, height, channels = _decode_real(blob)
                rows.append((doc_id, width, height, channels, len(blob)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "n_bytes"]
            )

    return df.mapInPandas(decode, schema=out_schema)


def extract_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Fixed-dim feature vector per blob (mean-pooled payload planes).

    The stub pools the fake payload; a real model would run here with the
    identical batch shape (one Arrow batch of blobs in, one float array
    column out).
    """
    out_schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("features", ArrayType(FloatType()), False),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[media_col]):
                blob = bytes(blob)
                _decode_header(blob)
                payload = np.frombuffer(blob, dtype=np.uint8, offset=HEADER_SIZE)
                planes = np.array_split(
                    payload.astype(np.float32), FEATURE_DIM
                )
                feats = [float(p.mean()) if p.size else 0.0 for p in planes]
                out.append((doc_id, feats))
            yield pd.DataFrame(out, columns=["doc_id", "features"])

    return df.mapInPandas(featurize, schema=out_schema)


def frame_sample(
    df: DataFrame, media_col: str = "media", every_n: int = 4
) -> DataFrame:
    """Sample every n-th "frame" (height-row) of each blob as its own row.

    The video analogue: one blob fans out to (doc_id, frame_idx, frame
    binary) rows, partition-local, ready for a per-frame featurizer.
    """
    out_schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[media_col]):
                blob = bytes(blob)
                width, height, channels = _decode_header(blob)
                stride = width * channels
                for frame_idx in range(0, height, every_n):
                    start = HEADER_SIZE + frame_idx * stride
                    rows.append((doc_id, frame_idx, blob[start : start + stride]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.mapInPandas(sample, schema=out_schema)
