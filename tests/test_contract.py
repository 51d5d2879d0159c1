"""Scoring-contract conformance vs the reference fixture corpus."""

from __future__ import annotations

import numpy as np

from frankensearch_spark.functions import contract as c


def test_field_norms_table_landmarks_and_checksum(contract_fixture):
    case = next(
        s for s in contract_fixture["scoring_cases"] if s["id"] == "score-fieldnorm-landmarks"
    )
    for key, value in case["decoded"].items():
        assert int(c.FIELD_NORMS_TABLE[int(key)]) == value
    assert int(c.FIELD_NORMS_TABLE.sum()) == case["table_checksum_u64"]


def test_fieldnorm_roundtrip_floor():
    for doclen in [0, 1, 40, 41, 42, 43, 100, 1000, 65_000, 10**9]:
        fid = int(c.fieldnorm_to_id(doclen))
        assert c.id_to_fieldnorm(fid) <= doclen
        if fid < 255:
            assert c.id_to_fieldnorm(fid + 1) > doclen


def test_bm25_constants(contract_fixture):
    case = next(
        s
        for s in contract_fixture["scoring_cases"]
        if s["id"] == "score-bm25-constants-operation-order"
    )
    assert c.BM25_K1 == np.float32(case["k1"])
    assert c.BM25_B == np.float32(case["b"])


def test_idf_is_f32_plain_ln():
    import math

    # idf(1, 1) = f32(ln(f64(1 + 0.5/1.5))) — correctly-rounded logf semantics
    arg = np.float32(1.0) + np.float32(0.5) / np.float32(1.5)
    assert c.idf(1, 1) == np.float32(math.log(float(arg)))
    assert c.idf(0, 0) == np.float32(math.log(2.0))


def test_avgdl_uses_raw_statistics(contract_fixture):
    case = next(
        s
        for s in contract_fixture["scoring_cases"]
        if s["id"] == "score-avgdl-uses-raw-statistics"
    )
    total_docs = sum(case["segment_max_docs"])
    total_tokens = sum(case["segment_total_tokens"])
    assert total_docs == case["expected_total_num_docs"]
    assert total_tokens == case["expected_total_num_tokens"]
    assert total_tokens / total_docs == case["expected_avgdl"]


def test_block_max_codes():
    assert c.block_max_frequency_to_code(0) == 0
    assert c.block_max_frequency_to_code(254) == 254
    assert c.block_max_frequency_to_code(255) == 255
    assert c.block_max_frequency_to_code(10_000) == 255
    assert c.block_max_frequency_from_code(255) == 0xFFFF_FFFF
    assert c.block_max_frequency_from_code(7) == 7


def test_block_max_score_is_conservative():
    # the bound must dominate every achievable in-block score
    avgdl = 7.0
    cache = c.compute_tf_cache(avgdl)
    weight = float(c.term_weight(3, 100, 1.0))
    for max_freq in [1, 3, 10]:
        for min_fnid in [0, 5, 40]:
            bound = c.block_max_score(
                c.block_max_frequency_to_code(max_freq), min_fnid, avgdl, weight
            )
            for f in range(1, max_freq + 1):
                for fnid in range(min_fnid, min(min_fnid + 20, 256)):
                    score = float(
                        c.term_scores(
                            np.array([f]), np.array([fnid]), cache, np.float32(weight)
                        )[0]
                    )
                    assert score <= bound + 1e-6


def test_term_weight_operation_order():
    w = c.term_weight(5, 100, boost=2.0)
    manual = c.idf(5, 100) * (np.float32(1.0) + c.BM25_K1)
    manual = np.float32(manual * np.float32(2.0))
    assert w == manual
    assert w.dtype == np.float32


def test_jvm_scoring_matches_numpy(spark):
    """The JVM cast-chain in SearchEngine._score_rows and the in-plan term
    weight must be bit-identical to the numpy float32 contract functions.

    Each float32 op evaluated in float64 and cast once back to float32 is
    exactly the float32 result (double rounding is innocuous: 53 >= 2*24+2),
    and Spark's LN + cast matches the pinned f64-ln-rounded-once idf.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    n = 50_000
    freq = rng.integers(1, 5_000, n).astype(np.int64)
    fnid = rng.integers(0, 256, n).astype(np.int32)
    cache = c.compute_tf_cache(47.3)
    weight = c.term_weight(12_345, 1_000_000, boost=2.0)
    ff = freq.astype(np.float32)
    expected = (np.float32(weight) * (ff / (ff + cache[fnid]))).astype(np.float32)

    df = spark.createDataFrame(pd.DataFrame({"freq": freq, "fnid": fnid}))
    f32 = lambda col: col.cast("float")  # noqa: E731
    arr = F.lit([float(x) for x in cache]).cast("array<float>")
    norm = F.element_at(arr, F.col("fnid") + F.lit(1))
    ffc = f32(F.col("freq"))
    tf_factor = f32(ffc / f32(ffc + norm))
    score = f32(f32(F.lit(float(weight))) * tf_factor)
    got = (
        df.select(score.alias("s"))
        .toPandas()["s"]
        .to_numpy(dtype=np.float32)
    )
    assert np.array_equal(got.view(np.int32), expected.view(np.int32))

    # in-plan term weight: idf chain vs contract.term_weight
    cases = [(1, 10), (5, 10), (9_999, 10_000), (1, 10**9), (123_456, 10**9)]
    rows = [(i, int(dfreq), float(b)) for i, (dfreq, N) in enumerate(cases) for b in (1.0, 2.0)]
    pdf = pd.DataFrame(rows, columns=["i", "df", "boost"])
    sdf = spark.createDataFrame(pdf)
    out = []
    for dfreq, N in cases:
        for b in (1.0, 2.0):
            out.append(float(c.term_weight(dfreq, N, boost=b)))
    # build the JVM chain per-case (N is a plan literal in the engine)
    got_w = []
    for (dfreq, N) in cases:
        for b in (1.0, 2.0):
            one = spark.sql("SELECT CAST(%d AS BIGINT) AS df, CAST(%f AS FLOAT) AS boost" % (dfreq, b))
            nn = F.col("df")
            num = f32(f32(F.lit(N) - nn) + F.lit(0.5).cast("float"))
            den = f32(f32(nn) + F.lit(0.5).cast("float"))
            ratio = f32(num / den)
            idf_ = f32(F.log(f32(F.lit(1.0).cast("float") + ratio)))
            k1p = float(np.float32(1.0) + c.BM25_K1)
            w = f32(idf_ * F.lit(k1p).cast("float"))
            wt = f32(w * f32(F.col("boost")))
            got_w.append(float(one.select(wt.alias("w")).collect()[0]["w"]))
    assert [np.float32(a).view(np.int32) for a in got_w] == [
        np.float32(a).view(np.int32) for a in out
    ]
