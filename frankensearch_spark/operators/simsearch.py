"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
variant as the scale path.  Both are pure Catalyst plans over
``array<float>`` columns: the dot products run as JVM higher-order
functions (``zip_with`` + ``aggregate``), so no Python touches the data.

At 100 TB the brute-force path is a single scan + TakeOrdered (fine for
one query vector); batched query sets should go through
:func:`lsh_bucket_candidates` which prunes to hash-bucket collisions
before exact re-scoring.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    """Left-to-right f64 fold of the element products (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def cosine_scores(
    df: DataFrame, query_vec: Sequence[float], vec_col: str = "embedding"
) -> DataFrame:
    """Add a ``cosine`` column: cos(query, row) in float64."""
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    qn = sum(float(v) * float(v) for v in query_vec) ** 0.5
    dot = _dot(F.col(vec_col), q)
    dn = _norm(F.col(vec_col))
    return df.withColumn(
        "cosine",
        F.when(dn > 0, dot / (dn * F.lit(qn))).otherwise(F.lit(0.0)),
    )


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: scan + TakeOrdered (no shuffle)."""
    scored = cosine_scores(df, query_vec, vec_col)
    return (
        scored.select(F.col(id_col), F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket_candidates(
    df: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane (SimHash) LSH bucketing for ANN pre-filtering.

    Adds a ``lsh_bucket`` long column: the sign pattern of ``n_planes``
    deterministic pseudo-random hyperplanes.  Candidate retrieval is then
    a bucket-equality join (hash partition pruning) followed by exact
    cosine re-scoring — the standard two-phase ANN plan.
    """
    import random

    rng = random.Random(seed)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        proj = _dot(F.col(vec_col), F.array(*[F.lit(v).cast("double") for v in plane]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("lsh_bucket", bucket)
