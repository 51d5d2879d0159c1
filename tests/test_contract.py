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
