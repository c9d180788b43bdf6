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
