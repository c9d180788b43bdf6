"""PageRank operator: known-graph values, dangling mass, determinism."""

import pandas as pd
import pytest

from ala_name_matching_spark.operators.pagerank import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    return {r["node_id"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_star_graph_center_dominates(spark):
    # spokes all point at the hub: hub must outrank every spoke
    edges = [(i, 0) for i in range(1, 6)]
    r = _ranks(spark, edges, iters=3)
    assert set(r) == set(range(6))
    assert all(r[0] > r[i] for i in range(1, 6))
    # spokes are symmetric -> identical ranks
    assert len({r[i] for i in range(1, 6)}) == 1


def test_total_mass_conserved_with_dangling(spark):
    # node 2 is dangling; with redistribution total rank stays ~1
    edges = [(0, 1), (1, 2)]
    r = _ranks(spark, edges, iters=4)
    assert abs(sum(r.values()) - 1.0) < 1e-6


def test_two_cycle_is_uniform(spark):
    # a 2-cycle is its own stationary distribution: ranks stay 1/2
    r = _ranks(spark, [(0, 1), (1, 0)], iters=5)
    assert r[0] == pytest.approx(0.5, abs=1e-6)
    assert r[0] == r[1]


def test_deterministic_across_runs(spark):
    edges = [(i, (i * 7) % 11) for i in range(11)]
    a = _ranks(spark, edges, iters=3)
    b = _ranks(spark, edges, iters=3)
    assert a == b
