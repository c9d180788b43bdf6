"""Connected-components correctness on known graphs (SURVEY.md §2.6 B6)."""

import pandas as pd
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.clustering import (
    assign_clusters,
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    rows = connected_components(df).collect()
    return {r["record_id"]: r["cluster_id"] for r in rows}


def test_chain(spark):
    # long chain exercises the O(log n) contraction
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(15)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"n00"}
    assert len(got) == 16


def test_two_components_and_cycle(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")]
    got = _cc(spark, edges)
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == "x"


def test_star_and_duplicate_edges(spark):
    edges = [("m", "a"), ("m", "b"), ("m", "c"), ("a", "m"), ("m", "a")]
    got = _cc(spark, edges)
    assert set(got.values()) == {"a"}
    assert set(got) == {"a", "b", "c", "m"}


def test_assign_clusters_singletons(spark):
    records = spark.createDataFrame(
        pd.DataFrame({"record_id": ["a", "b", "c", "d"], "v": [1, 2, 3, 4]})
    )
    edges = spark.createDataFrame(pd.DataFrame([("a", "b")], columns=["src", "dst"]))
    got = {
        r["record_id"]: r["cluster_id"]
        for r in assign_clusters(records, edges).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "c", "d": "d"}


def test_empty_edges(spark):
    records = spark.createDataFrame(pd.DataFrame({"record_id": ["a", "b"], "v": [1, 2]}))
    edges = spark.createDataFrame([], schema="src string, dst string")
    got = {
        r["record_id"]: r["cluster_id"]
        for r in assign_clusters(records, edges).collect()
    }
    assert got == {"a": "a", "b": "b"}


def test_distributed_matches_driver_path(spark):
    """Large-star/small-star must produce identical labels to driver UF."""
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"),
        ("m", "n"), ("n", "o"), ("o", "p"), ("p", "m"), ("q", "m"),
    ]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    driver = {r["record_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    dist = {
        r["record_id"]: r["cluster_id"]
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert driver == dist


def test_via_groups_driver_vs_distributed_parity(spark):
    """assign_clusters_via_groups: driver-side election == distributed election.

    Runs the full pipeline on the synthetic fixture twice, forcing the
    distributed groupBy-election path the second time, and asserts identical
    (cluster_id, representative) assignments for every record.
    """
    from ala_name_matching_spark.operators import clustering as cl
    from ala_name_matching_spark.plans.pipeline import run_pipeline
    from ala_name_matching_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, 2000, partitions=4).drop("entity_id")

    def snap(df):
        return {
            r["record_id"]: (r["cluster_id"], r["representative_id"], r["is_representative"])
            for r in df.select(
                "record_id", "cluster_id", "representative_id", "is_representative"
            ).collect()
        }

    got_driver = snap(run_pipeline(t))
    saved = cl._DRIVER_CC_MAX_EDGES
    try:
        cl._DRIVER_CC_MAX_EDGES = 0
        got_dist = snap(run_pipeline(t))
    finally:
        cl._DRIVER_CC_MAX_EDGES = saved
    assert got_driver == got_dist


def test_incremental_cc_parity_with_full_recompute(spark):
    import pandas as pd

    from ala_name_matching_spark.operators.clustering import (
        connected_components,
        incremental_cc_update,
    )

    old = [(1, 2), (3, 4), (10, 11)]
    new = [(2, 3), (20, 21), (11, 20)]  # merges {1..4}; chains 10-11-20-21
    old_e = spark.createDataFrame(pd.DataFrame(old, columns=["src", "dst"]))
    new_e = spark.createDataFrame(pd.DataFrame(new, columns=["src", "dst"]))
    labels = connected_components(old_e)
    inc = {
        r["record_id"]: r["cluster_id"]
        for r in incremental_cc_update(labels, new_e).collect()
    }
    full = {
        r["record_id"]: r["cluster_id"]
        for r in connected_components(old_e.unionByName(new_e)).collect()
    }
    assert inc == full
    assert inc[4] == 1 and inc[21] == 10
    # newcomers 20, 21 were never in the committed labeling
    assert 20 in inc and 21 in inc


def test_incremental_cc_no_merge_batch_is_identity(spark):
    import pandas as pd

    from ala_name_matching_spark.operators.clustering import (
        connected_components,
        incremental_cc_update,
    )

    old_e = spark.createDataFrame(
        pd.DataFrame([(1, 2), (2, 3)], columns=["src", "dst"])
    )
    labels = connected_components(old_e)
    # edge inside an existing cluster: nothing changes
    same = spark.createDataFrame(
        pd.DataFrame([(1, 3)], columns=["src", "dst"])
    )
    out = {
        r["record_id"]: r["cluster_id"]
        for r in incremental_cc_update(labels, same).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}
