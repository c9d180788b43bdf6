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


def test_hits_bipartite_separation(spark):
    import pandas as pd

    from ala_name_matching_spark.operators.pagerank import hits

    # bipartite: 0,1 -> 10,11,12 ; node 1 points at more parts
    edges = [(0, 10), (0, 11), (1, 10), (1, 11), (1, 12)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    r = {x["node_id"]: (x["hub"], x["authority"]) for x in hits(df, iters=3).collect()}
    # sources are pure hubs, sinks pure authorities
    assert r[0][1] == 0.0 and r[1][1] == 0.0
    assert r[10][0] == 0.0 and r[11][0] == 0.0 and r[12][0] == 0.0
    # the higher-out-degree source is the stronger hub; the part linked by
    # both sources outranks the part linked by one
    assert r[1][0] > r[0][0]
    assert r[10][1] == r[11][1] > r[12][1]
    # L2 norms ~ 1
    hub_norm = sum(v[0] ** 2 for v in r.values()) ** 0.5
    auth_norm = sum(v[1] ** 2 for v in r.values()) ** 0.5
    assert abs(hub_norm - 1) < 1e-6 and abs(auth_norm - 1) < 1e-6


def test_hits_deterministic(spark):
    import pandas as pd

    from ala_name_matching_spark.operators.pagerank import hits

    edges = [(i, 100 + (i * 3) % 7) for i in range(20)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    a = sorted(map(tuple, hits(df, iters=3).collect()))
    b = sorted(map(tuple, hits(df, iters=3).collect()))
    assert a == b


def test_pagerank_iters_lower_bound_pinned(spark):
    """iters < 1 is an error on BOTH engines' generators (pinned to match
    hits()): a 0-iteration call would silently return the uniform vector
    and hide a mis-wired parameter."""
    import pytest

    from ala_name_matching_spark.operators.pagerank import (
        pagerank,
        pagerank_oracle_sql,
    )

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="iters must be >= 1"):
        pagerank(edges, iters=0)
    with pytest.raises(ValueError, match="iters must be >= 1"):
        pagerank_oracle_sql("SELECT 1 AS src, 2 AS dst", iters=0)
