"""Differential: the JVM-compiled eval tree ≡ the numpy oracle evaluator.

``SearchEngine._combine`` evaluates the compiled query spec with
``plans.eval.compile_tree_columns`` (whole-stage-codegen expressions) while
the DuckDB/numpy oracle keeps ``evaluate_tree``.  Rank-exactness requires
the two to agree bit-for-bit on every float32 accumulation, so this test
throws randomized trees and leaf matrices at both and compares raw bits.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from frankensearch_spark.plans.eval import compile_tree_columns, evaluate_tree


def _random_tree(rng: random.Random, n_leaves: int, depth: int = 0) -> dict:
    kinds = ["leaf", "union", "bool", "boost"] if depth < 3 else ["leaf"]
    t = rng.choice(kinds)
    if t == "leaf":
        return {"t": "leaf", "id": rng.randrange(n_leaves)}
    if t == "union":
        return {
            "t": "union",
            "ch": [_random_tree(rng, n_leaves, depth + 1) for _ in range(rng.randint(1, 3))],
        }
    if t == "boost":
        return {
            "t": "boost",
            "f": rng.choice([0.5, 1.0, 2.0, 3.7]),
            "ch": _random_tree(rng, n_leaves, depth + 1),
        }
    must = [_random_tree(rng, n_leaves, depth + 1) for _ in range(rng.randint(0, 2))]
    should = [_random_tree(rng, n_leaves, depth + 1) for _ in range(rng.randint(0, 2))]
    must_not = [_random_tree(rng, n_leaves, depth + 1) for _ in range(rng.randint(0, 1))]
    if not must and not should:
        should = [_random_tree(rng, n_leaves, depth + 1)]
    return {"t": "bool", "must": must, "should": should, "not": must_not}


def test_compile_tree_columns_matches_evaluate_tree(spark):
    rng = random.Random(20260817)
    nprng = np.random.default_rng(99)
    for trial in range(12):
        n_leaves = rng.randint(1, 6)
        n_docs = 400
        spec = _random_tree(rng, n_leaves)
        # leaf matrices: ~60% matched, scores random positive f32
        matched = nprng.random((n_leaves, n_docs)) < 0.6
        scores = (nprng.random((n_leaves, n_docs)) * 37.0 + 0.001).astype(np.float32)
        exp_m, exp_s = evaluate_tree(
            spec, lambda i: matched[i], lambda i: scores[i], n_docs
        )
        # mirror the pivot shape: one nullable float column per leaf
        cols = {"docid": np.arange(n_docs, dtype=np.int64)}
        for i in range(n_leaves):
            col = scores[i].astype(np.float64)
            cols[str(i)] = pd.Series(col).where(pd.Series(matched[i]), other=None)
        df = spark.createDataFrame(pd.DataFrame(cols))
        zero = F.lit(0.0).cast("float")
        m_col, s_col = compile_tree_columns(
            spec,
            lambda i: F.col(str(i)).isNotNull(),
            lambda i: F.coalesce(F.col(str(i)).cast("float"), zero),
        )
        got = (
            df.where(m_col)
            .select("docid", s_col.cast("float").alias("score"))
            .toPandas()
            .sort_values("docid")
        )
        exp_ids = np.arange(n_docs)[exp_m]
        assert np.array_equal(got["docid"].to_numpy(), exp_ids), f"trial {trial}"
        assert np.array_equal(
            got["score"].to_numpy(dtype=np.float32).view(np.int32),
            exp_s[exp_m].view(np.int32),
        ), f"trial {trial}: score bits diverge"
