"""Scalar-quantization ANN: reconstruction bounds, recall, degenerate dims."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _vec_df(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sq_reconstruction_error_bounded(spark):
    from ala_name_matching_spark.operators.sq import (
        sq_dim_stats,
        sq_encode_col,
        sq_recon_col,
    )

    rng = np.random.RandomState(3)
    mat = rng.randn(50, 8).astype("float32")
    d = _vec_df(spark, mat)
    vmins, vmaxs = sq_dim_stats(d)
    rec = d.select(
        "vec_id",
        sq_recon_col(
            sq_encode_col(F.col("embedding"), vmins, vmaxs), vmins, vmaxs
        ).alias("rv"),
    ).collect()
    # linear 8-bit quantization error is at most half a step per dim
    steps = [(vmaxs[j] - vmins[j]) / 255.0 for j in range(8)]
    for r in rec:
        orig = mat[r["vec_id"]]
        for j, v in enumerate(r["rv"]):
            assert abs(v - float(orig[j])) <= steps[j] / 2 + 1e-9


def test_sq_topk_recall_vs_brute_force(spark):
    from ala_name_matching_spark.operators.sq import sq_topk

    rng = np.random.RandomState(11)
    mat = rng.randn(200, 16).astype("float32")
    d = _vec_df(spark, mat)
    q = d.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sq_topk(q, d, dim=16, rerank=30, topk=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid in range(3):
        dists = ((mat - mat[qid]) ** 2).sum(axis=1)
        true5 = set(np.argsort(dists, kind="stable")[:5].tolist())
        pred5 = {r["vec_id"] for r in by_q[qid]}
        # rerank makes the top-5 exact unless SQ error evicts a true
        # neighbor from the top-30 shortlist -- at 8-bit it never does here
        assert pred5 == true5
        # and the exact distances are right
        for r in by_q[qid]:
            assert r["dist"] == pytest.approx(
                float(dists[r["vec_id"]]), abs=1e-4
            )


def test_sq_constant_dimension_is_safe(spark):
    from ala_name_matching_spark.operators.sq import (
        sq_dim_stats,
        sq_encode_col,
        sq_recon_col,
    )

    mat = np.ones((10, 4), dtype="float32") * 7.0
    mat[:, 1] = np.arange(10)
    d = _vec_df(spark, mat)
    vmins, vmaxs = sq_dim_stats(d)
    rec = d.select(
        sq_recon_col(
            sq_encode_col(F.col("embedding"), vmins, vmaxs), vmins, vmaxs
        ).alias("rv")
    ).collect()
    for r in rec:
        assert r["rv"][0] == pytest.approx(7.0)  # constant dim survives
