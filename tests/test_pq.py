"""Product Quantization: codebooks, encoding, ADC search."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)


def _vecs(spark, n=60, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim).astype(np.float64)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [list(r) for r in m]})
    return spark.createDataFrame(pdf), m


def test_codebook_shape_and_code_range(spark):
    df, _ = _vecs(spark)
    cb = train_pq_codebooks(df, m_subs=4, k=5, iters=2, dim=16)
    rows = cb.collect()
    assert len(rows) == 4 * 5
    assert all(len(r["centroid"]) == 4 for r in rows)
    codes = pq_encode(df, cb, m_subs=4, subdim=4).collect()
    assert len(codes) == 60 * 4
    assert all(0 <= r["code"] < 5 for r in codes)


def test_identical_vectors_get_identical_codes(spark):
    df, m = _vecs(spark, n=40)
    dup = pd.DataFrame(
        {"vec_id": [1000 + i for i in range(5)], "embedding": [list(m[i]) for i in range(5)]}
    )
    both = df.unionByName(spark.createDataFrame(dup))
    cb = train_pq_codebooks(both, m_subs=4, k=5, iters=2, dim=16)
    codes = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(both, cb, m_subs=4, subdim=4).collect()
    }
    for i in range(5):
        for s in range(4):
            assert codes[(i, s)] == codes[(1000 + i, s)]


def test_adc_approximates_true_distance(spark):
    """ADC distance = distance to the RECONSTRUCTED (quantized) vector;
    its gap to the true distance is bounded by quantization error, and a
    query that IS a database vector ranks its own copy first."""
    df, m = _vecs(spark, n=50)
    q = df.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_adc_topk(q, df, m_subs=4, k=8, iters=2, topk=50, dim=16)
    rows = out.collect()
    # exact self-match: adist(q, q) is the quantization residual, which is
    # minimal among all vectors sharing ALL codes -- the self vector must
    # appear (topk=n) and its adist must equal the residual >= 0
    got = {(r["query_id"], r["vec_id"]): (r["adist"], r["rank"]) for r in rows}
    for qid in (0, 1, 2):
        assert (qid, qid) in got
        assert got[(qid, qid)][0] >= -1e-9
    # rank-1 neighbors: ADC rank correlates with true distance -- the
    # true nearest neighbor should sit in the ADC top-5 for these params
    for qid in (0, 1, 2):
        true = np.argsort(((m - m[qid]) ** 2).sum(axis=1))
        adc_top5 = sorted(
            [v for (q_, v), (_, rk) in got.items() if q_ == qid and rk <= 5]
        )
        assert true[0] in adc_top5


def test_adc_deterministic_across_runs(spark):
    df, _ = _vecs(spark)
    q = df.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, pq_adc_topk(q, df, m_subs=4, k=6, iters=2, topk=7, dim=16).collect()))
    b = sorted(map(tuple, pq_adc_topk(q, df, m_subs=4, k=6, iters=2, topk=7, dim=16).collect()))
    assert a == b


def test_dim_not_divisible_raises(spark):
    df, _ = _vecs(spark, dim=15)
    with pytest.raises(ValueError):
        train_pq_codebooks(df, m_subs=4, k=4, iters=1, dim=15)


def test_ivfpq_full_probe_reproduces_pq(spark):
    """Probing ALL lists makes IVF-PQ exactly pq_adc_topk: the coarse
    quantizer prunes nothing, the ADC scoring is shared."""
    import numpy as np

    from ala_name_matching_spark.operators.pq import ivfpq_topk, pq_adc_topk

    rng = np.random.RandomState(5)
    mat = rng.randn(120, 16).astype("float64")
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    q = vecs.where("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding"
    )
    full = {
        (r["query_id"], r["vec_id"]): (r["adist"], r["rank"])
        for r in ivfpq_topk(
            q, vecs, m_subs=4, k=8, iters=2, topk=8,
            n_centroids=8, nprobe=8, exclude_self=False,
        ).collect()
    }
    pq = {
        (r["query_id"], r["vec_id"]): (r["adist"], r["rank"])
        for r in pq_adc_topk(
            q, vecs, m_subs=4, k=8, iters=2, topk=8
        ).collect()
    }
    assert full == pq


def test_ivfpq_recall_on_clustered_data(spark):
    """On clustered data (the regime IVF exploits) the pruned search
    still finds most true neighbors; candidates shrink with nprobe."""
    import numpy as np

    from ala_name_matching_spark.operators.pq import ivfpq_topk

    rng = np.random.RandomState(9)
    centers = rng.randn(8, 16) * 6
    mat = np.vstack(
        [centers[i % 8] + rng.randn(16) * 0.3 for i in range(240)]
    )
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    q = vecs.where("vec_id < 4").selectExpr(
        "vec_id as query_id", "embedding"
    )
    got = ivfpq_topk(
        q, vecs, m_subs=4, k=8, iters=2, topk=5,
        n_centroids=8, nprobe=2,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    # 4x8 codes cannot resolve WITHIN-cluster order (same-cluster members
    # share codes; ties break by id), so the honest metric is cluster
    # recall: returned neighbors belong to the query's true cluster
    same = 0
    total = 0
    for qid in range(4):
        for v in by_q.get(qid, set()):
            total += 1
            same += int(v % 8 == qid % 8)
    assert total == 20 and same / total >= 0.8
