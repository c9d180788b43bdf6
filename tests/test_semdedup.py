"""SemDeDup (embedding-cluster near-dedup): operators/semdedup.py.

Covers the keep-one-per-duplicate-set policy, cross-cluster miss semantics,
determinism, and the empty-cluster carry-forward in the Lloyd loop. The
full Spark-vs-DuckDB replay (unrolled-CTE oracle) runs under
tools/check_oracles.py as `semdedup_prune`.
"""

import numpy as np
import pytest

from ala_name_matching_spark.operators.semdedup import (
    kmeans_fit,
    semdedup,
    unit_rounded_col,
)

from pyspark.sql import functions as F


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


@pytest.fixture(scope="module")
def fixture_vectors():
    rng = np.random.RandomState(7)
    base = rng.standard_normal((40, 16))
    rows = [(i, base[i]) for i in range(40)]
    # planted duplicate set: three colinear copies of vector 3 (scale
    # invariance of cosine) -> one survivor, the lowest id (3 itself)
    rows += [(100, base[3] * 2.0), (101, base[3] * 0.5)]
    return rows


def test_keep_one_per_duplicate_set(spark, fixture_vectors):
    out = semdedup(_vec_df(spark, fixture_vectors), n_clusters=4, iters=2,
                   threshold=0.95, dim=16)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 42
    # colinear copies share the lowest-id vector's cluster and are pruned
    assert rows[3]["keep"] is True
    assert rows[100]["keep"] is False
    assert rows[101]["keep"] is False
    assert rows[100]["cluster_id"] == rows[3]["cluster_id"]
    assert rows[101]["cluster_id"] == rows[3]["cluster_id"]
    # 16-d gaussian vectors essentially never hit cosine >= 0.95 organically
    organic = [r for i, r in rows.items() if i < 100 and i != 3]
    assert all(r["keep"] for r in organic)


def test_deterministic_across_runs(spark, fixture_vectors):
    df = _vec_df(spark, fixture_vectors)
    a = sorted(map(tuple, semdedup(df, n_clusters=4, iters=2, dim=16).collect()))
    b = sorted(map(tuple, semdedup(df, n_clusters=4, iters=2, dim=16).collect()))
    assert a == b


def test_empty_cluster_carries_previous_centroid(spark):
    # 6 near-identical vectors, k=4: after the first update at most one
    # cluster keeps members; the other seeds must carry forward (no crash,
    # k x dim matrix stays intact) and every vector still gets a label.
    base = np.ones(8)
    rows = [(i, base + 1e-4 * np.eye(8)[i % 8]) for i in range(6)]
    df = _vec_df(spark, rows)
    v = df.select("vec_id", unit_rounded_col(F.col("embedding")).alias("nv"))
    cents = kmeans_fit(v, n_clusters=4, iters=2, dim=8)
    assert cents.shape == (4, 8)
    assert not np.isnan(cents).any()
    out = semdedup(df, n_clusters=4, iters=2, threshold=0.95, dim=8)
    got = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert len(got) == 6
    # all six are mutual near-dups in one cluster -> only vec 0 survives
    assert got[0] is True
    assert sum(got.values()) == 1


def test_cross_cluster_pairs_are_missed_by_design(spark):
    # two orthogonal directions force two clusters; a pair split across
    # them is invisible to the within-cluster verify -- the documented
    # SemDeDup recall trade (both members keep=True)
    e0, e1 = np.eye(2)[0], np.eye(2)[1]
    rows = [(0, e0), (1, e1), (2, -e0), (3, -e1)]
    out = semdedup(_vec_df(spark, rows), n_clusters=2, iters=1,
                   threshold=0.95, dim=2)
    by_id = {r["vec_id"]: r for r in out.collect()}
    if by_id[0]["cluster_id"] != by_id[2]["cluster_id"]:
        assert by_id[0]["keep"] and by_id[2]["keep"]
