"""Near-duplicate detection suite for training-data pipelines.

Four families, all expressed as pure Catalyst plans (JVM expressions, no
Python in the hot path) so they hold at 100 TB:

* **MinHash + LSH** — word-shingle sets -> k min-hash signatures under
  pinned affine permutations -> banded LSH bucketing -> candidate pairs ->
  exact-Jaccard verification.  One shuffle per stage; the band self-join is
  the only quadratic-risk step and is bounded by bucket size.
* **SimHash** — token-frequency-weighted bitwise fingerprints (pinned
  polynomial token hash), Hamming-comparable.
* **n-gram Jaccard set-similarity join** — inverted shingle index
  self-join (the classic prefix-filter shape): |A∩B| from pair counts,
  |A∪B| from set sizes; optionally frequency-pruned for scale.
* **Embedding near-dup** — random-hyperplane LSH buckets (pinned plane
  matrix) -> in-bucket pairs -> exact cosine threshold.

Every operator is deterministic and mirrored 1:1 by a DuckDB oracle in
``sources/duckdb_oracle.py``; the shared primitive is the pinned
polynomial rolling hash ``h = fold(chars, (h,c) -> (h*31 + ascii(c)) mod
1_000_000_007)``, which both engines evaluate with identical 64-bit
integer arithmetic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import ascii_tokens

#: Modulus of the pinned polynomial hash (fits 64-bit products: a*h < 2^63).
HASH_MOD = 1_000_000_007

#: MinHash permutation count and pinned affine coefficients (a*x+b mod P).
MINHASH_K = 16
MINHASH_A = [2 * i + 3 for i in range(MINHASH_K)]  # 3,5,7,... odd, < 40
MINHASH_B = [(7919 * (i + 1)) % HASH_MOD for i in range(MINHASH_K)]

#: LSH banding: 8 bands x 2 rows — s-curve threshold ~ (1/8)^(1/2) ≈ 0.35.
LSH_BANDS = 8
LSH_ROWS = MINHASH_K // LSH_BANDS

#: SimHash width: the polynomial hash is < 2^30, so 30 informative bits.
SIMHASH_BITS = 30

#: Hyperplanes for embedding LSH: pinned seed, 8 planes x 64 dims (the
#: single-probe point-query path, :func:`cosine_topk_lsh`).
EMBED_LSH_SEED = 1337
EMBED_LSH_PLANES = 8
EMBED_DIM = 64

#: Banded multi-probe blocking for the near-dup JOIN (OR-of-ANDs like the
#: MinHash path): candidates must agree on ALL rows of ANY band.  4 bands
#: x 4 rows = 16 planes; at cos >= 0.9 (sign-agreement p ~ 0.857) recall is
#: 1-(1-p^4)^4 ~ 0.95 while each band splits the corpus 16 ways — the
#: N^2/256 blow-up of a single 8-plane bucket join is gone.
EMBED_LSH_BANDS = 4
EMBED_LSH_ROWS = 4

#: Per-band bucket cardinality caps: buckets larger than this are DROPPED
#: from candidate generation (boilerplate/identical content lands one key
#: with millions of members and would go quadratic; exact/hash dedup is
#: the right tool for those).  Standard practice at 100 TB; the DuckDB
#: oracles apply the identical cap so results stay bit-comparable.
DEFAULT_MINHASH_BUCKET_CAP = 1024
DEFAULT_EMBED_BUCKET_CAP = 4096


def lsh_planes(n_planes: int = EMBED_LSH_PLANES, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic hyperplane matrix shared with the SQL oracle."""
    rng = np.random.RandomState(EMBED_LSH_SEED)
    return rng.standard_normal((n_planes, dim))


def poly_hash(col):
    """Pinned polynomial rolling hash of a string column (JVM fold)."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda h, c: (h * F.lit(31) + c) % F.lit(HASH_MOD),
    )


def word_shingles(col, n: int = 3):
    """Distinct space-joined word n-gram shingles of a text column."""
    toks = ascii_tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingles = F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )
    return F.array_distinct(shingles)


def shingle_frame(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).where(F.size("shingles") > 0)


# ── MinHash + LSH ──────────────────────────────────────────────────────────


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingles, sig array<long>[k]) — one scan, no shuffle.

    The per-shingle polynomial hash is materialized as its OWN projection
    (``_sh_hashes``) before the k permutation mins: inlining it under all
    k ``array_min(transform(...))`` expressions re-evaluated the
    char-level fold k times per shingle — higher-order-function lambdas
    sit outside Catalyst's subexpression elimination.  The separate alias
    is referenced k times by non-cheap expressions, which keeps
    CollapseProject from re-inlining it (same staging discipline as the
    codec's Hillis-Steele passes).  Measured 2.6x on the signature scan
    at sf0.01 (plans/r06/dedup_minhash_lsh_after.txt).
    """
    sh = shingle_frame(df, text_col, id_col)
    hashed = sh.withColumn(
        "_sh_hashes", F.transform(F.col("shingles"), lambda s: poly_hash(s))
    )

    def perm(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(HASH_MOD)

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_sh_hashes"), perm(a, b)))
            for a, b in zip(MINHASH_A, MINHASH_B)
        ]
    )
    return hashed.select("doc_id", "shingles", sig.alias("sig"))


def _cap_band_buckets(bands: DataFrame, key: str, id_: str, cap: int | None) -> DataFrame:
    """Drop rows of band buckets larger than ``cap`` (skew guard).

    A window count reuses the band-key hash partitioning the subsequent
    self-join needs, so the cap costs no extra shuffle.  Dropping (not
    sampling) keeps the operator deterministic and oracle-mirrorable; the
    dropped keys are observable via :func:`band_bucket_overflow`.
    """
    if cap is None:
        return bands
    from pyspark.sql import Window

    w = Window.partitionBy(key)
    return (
        bands.withColumn("_bc", F.count(id_).over(w))
        .where(F.col("_bc") <= cap)
        .drop("_bc")
    )


def band_bucket_overflow(bands: DataFrame, key: str, cap: int) -> DataFrame:
    """(band_key, n_members) of buckets the cap would drop — the
    observability hook ("no silent caps"): pipelines log/inspect this
    frame to see what candidate mass was discarded."""
    return (
        bands.groupBy(key)
        .agg(F.count("*").alias("n_members"))
        .where(F.col("n_members") > cap)
    )


def _bands_of(signed: DataFrame) -> DataFrame:
    """(doc_id, band_key) rows — one row per doc per LSH band."""
    return signed.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        F.lit(i),
                        *[
                            F.element_at("sig", i * LSH_ROWS + r + 1).cast("string")
                            for r in range(LSH_ROWS)
                        ],
                    )
                    for i in range(LSH_BANDS)
                ]
            )
        ).alias("band_key"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_band_bucket: int | None = DEFAULT_MINHASH_BUCKET_CAP,
    signed: DataFrame | None = None,
) -> DataFrame:
    """Distinct candidate pairs from the capped band self-join."""
    if signed is None:
        signed = minhash_signatures(df, text_col, id_col)
    bands = _cap_band_buckets(
        _bands_of(signed), "band_key", "doc_id", max_band_bucket
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on="band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_band_bucket: int | None = DEFAULT_MINHASH_BUCKET_CAP,
) -> DataFrame:
    """Verified near-duplicate pairs (doc_id_a < doc_id_b, jaccard).

    LSH generates candidates (same signature slice in any band, bucket
    size capped at ``max_band_bucket``); the exact word-shingle Jaccard
    then verifies against ``threshold`` — so LSH affects only
    recall-vs-cost, never emits a false positive.  The cap bounds the
    self-join at cap^2/2 pairs per bucket no matter how degenerate the
    corpus (templated/boilerplate text); route identical docs through
    exact dedup first.
    """
    signed = minhash_signatures(df, text_col, id_col)
    cand = minhash_lsh_candidates(
        df, text_col, id_col, max_band_bucket, signed=signed
    )
    sh = signed.select("doc_id", "shingles")
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("shingles", "sh_a"), "doc_id_a")
        .join(sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("shingles", "sh_b"), "doc_id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )
    return verified


# ── SimHash ────────────────────────────────────────────────────────────────


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash long) frequency-weighted bitwise fingerprint."""
    toks = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.explode(ascii_tokens(F.col(text_col))).alias("term"),
    )
    freqs = toks.groupBy("doc_id", "term").agg(F.count("*").alias("freq"))
    hashed = freqs.withColumn("h", poly_hash(F.col("term")))
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    (F.col("h").bitwiseAND(F.lit(1 << j))) > 0, F.col("freq")
                ).otherwise(-F.col("freq"))
            ).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return bit_sums.select("doc_id", fp.cast("long").alias("simhash"))


# ── n-gram Jaccard set-similarity join ─────────────────────────────────────


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs word-n-gram Jaccard ≥ threshold via an inverted
    shingle index self-join (|A∩B| = shared-shingle count).

    ``max_shingle_df`` drops ubiquitous shingles before pairing — the
    frequency-prune used at scale; exactness then holds for pairs whose
    intersection survives (the oracle applies the identical prune).
    """
    sh = shingle_frame(df, text_col, id_col, n)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        keep = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        inv = inv.join(keep, "shingle")
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("n_sh", "na"), "doc_id_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("n_sh", "nb"), "doc_id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )
    return out


# ── Embedding near-dup + LSH ANN ───────────────────────────────────────────


def _dot(vec_col, weights: np.ndarray):
    """Left-fold dot product against a literal plane (f64, fold order
    pinned so the SQL oracle's list_reduce matches bit-for-bit)."""
    arr = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), arr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def embedding_bucket(vec_col, planes: np.ndarray):
    """LSH bucket id = bitmap of hyperplane signs."""
    out = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        out = out + F.when(_dot(vec_col, plane) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def embedding_band_keys(vec_col, planes: np.ndarray, n_bands: int, n_rows: int):
    """Array of per-band LSH keys: ``"<band>_<row-sign-bitmap>"``.

    OR-of-ANDs banding (same shape as the MinHash path): a pair is a
    candidate when ALL ``n_rows`` sign bits of ANY band agree.  More
    bands -> recall; more rows -> selectivity.
    """
    keys = []
    for band in range(n_bands):
        code = F.lit(0).cast("long")
        for r in range(n_rows):
            plane = planes[band * n_rows + r]
            code = code + F.when(_dot(vec_col, plane) > 0, F.lit(1 << r)).otherwise(
                F.lit(0)
            )
        keys.append(F.concat_ws("_", F.lit(band), code.cast("string")))
    return F.array(*keys)


def embedding_near_dup_candidates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = EMBED_LSH_BANDS,
    n_rows: int = EMBED_LSH_ROWS,
    max_band_bucket: int | None = DEFAULT_EMBED_BUCKET_CAP,
) -> DataFrame:
    """Distinct (vec_id_a < vec_id_b) candidates from the capped banded
    self-join — the blocking stage, exposed for skew observability."""
    planes = lsh_planes(n_bands * n_rows)
    bands = emb.select(
        F.col(id_col).cast("long").alias("vid"),
        F.explode(
            embedding_band_keys(F.col(vec_col), planes, n_bands, n_rows)
        ).alias("band_key"),
    )
    bands = _cap_band_buckets(bands, "band_key", "vid", max_band_bucket)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on="band_key")
        .where(F.col("a.vid") < F.col("b.vid"))
        .select(F.col("a.vid").alias("vid_a"), F.col("b.vid").alias("vid_b"))
        .distinct()
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = EMBED_LSH_BANDS,
    n_rows: int = EMBED_LSH_ROWS,
    max_band_bucket: int | None = DEFAULT_EMBED_BUCKET_CAP,
) -> DataFrame:
    """(id_a < id_b, cosine) pairs with cosine ≥ threshold, LSH-blocked.

    Banded multi-probe blocking (``n_bands`` x ``n_rows`` hyperplanes,
    OR-of-ANDs) generates candidates; exact cosine verifies — LSH tunes
    recall-vs-cost, never emits a false positive.  Per-band buckets are
    capped at ``max_band_bucket`` members so a dense embedding cluster
    (near-identical boilerplate) cannot go quadratic: the blow-up bound
    is ``n_bands * cap^2/2`` pairs per bucket, independent of corpus
    size.  At 10^9 vectors this plan is ~n_bands joins of 2^n_rows-way
    split buckets instead of the old single 2^8-bucket join (~N^2/256).
    """
    cand = embedding_near_dup_candidates(
        emb, id_col, vec_col, n_bands, n_rows, max_band_bucket
    )
    based = emb.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).alias("v"),
        F.sqrt(_norm_sq(F.col(vec_col))).alias("nrm"),
    )
    joined = (
        cand.join(
            based.select(
                F.col("vid").alias("vid_a"),
                F.col("v").alias("v_a"),
                F.col("nrm").alias("nrm_a"),
            ),
            "vid_a",
        )
        .join(
            based.select(
                F.col("vid").alias("vid_b"),
                F.col("v").alias("v_b"),
                F.col("nrm").alias("nrm_b"),
            ),
            "vid_b",
        )
    )
    dot_ab = F.aggregate(
        F.zip_with(
            F.col("v_a").cast("array<double>"),
            F.col("v_b").cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        joined.select(
            F.col("vid_a").alias("vec_id_a"),
            F.col("vid_b").alias("vec_id_b"),
            F.round(dot_ab / (F.col("nrm_a") * F.col("nrm_b")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _norm_sq(vec_col):
    return F.aggregate(
        F.zip_with(
            vec_col.cast("array<double>"), vec_col.cast("array<double>"), lambda x, y: x * y
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_lsh(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = EMBED_LSH_PLANES,
) -> DataFrame:
    """Approximate top-k cosine: LSH-bucket candidates, exact re-rank.

    The scale path of the brute-force ``simsearch.cosine_topk``: only the
    query's bucket is scanned (IVF-style partition pruning when the table
    is clustered by bucket).  Deterministic — the oracle computes the same
    bucket and candidate re-rank.
    """
    planes = lsh_planes(n_planes)
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for j, plane in enumerate(planes):
        acc = 0.0
        for x, w in zip(q, plane):  # same left-fold order as the engines
            acc += float(x) * float(w)
        if acc > 0:
            qbucket |= 1 << j
    qnorm = float(np.sqrt((q * q).sum()))
    qarr = F.array(*[F.lit(float(v)) for v in q])
    dot_q = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qarr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.where(embedding_bucket(F.col(vec_col), planes) == F.lit(qbucket))
        .select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.round(
                F.when(
                    _norm_sq(F.col(vec_col)) > 0,
                    dot_q / (F.sqrt(_norm_sq(F.col(vec_col))) * F.lit(qnorm)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
