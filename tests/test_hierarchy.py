"""B2 nested-set encoding tests: driver DFS goldens, driver/distributed
parity, V2 species-split containment."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.hierarchy import (
    nested_set_encode,
    species_split_check,
)


def _edges(spark, pairs):
    pdf = pd.DataFrame(pairs, columns=["node_id", "parent_id"])
    return spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None))


TREE = [
    ("a", None),
    ("b", "a"),
    ("c", "a"),
    ("d", "b"),
    ("e", "b"),
    ("f", None),  # second root: forest layout follows root order
]


def test_nested_set_golden(spark):
    # DFS with lexicographic children: a(1,..) b(2,..) d(3,4) e(5,6) ->
    # b rgt=7, c(8,9), a rgt=10, f(11,12)
    out = {r["node_id"]: r for r in nested_set_encode(_edges(spark, TREE)).collect()}
    assert (out["a"]["lft"], out["a"]["rgt"], out["a"]["depth"]) == (1, 10, 0)
    assert (out["b"]["lft"], out["b"]["rgt"], out["b"]["depth"]) == (2, 7, 1)
    assert (out["d"]["lft"], out["d"]["rgt"], out["d"]["depth"]) == (3, 4, 2)
    assert (out["e"]["lft"], out["e"]["rgt"]) == (5, 6)
    assert (out["c"]["lft"], out["c"]["rgt"]) == (8, 9)
    assert (out["f"]["lft"], out["f"]["rgt"], out["f"]["depth"]) == (11, 12, 0)
    # nesting invariant
    assert out["a"]["lft"] < out["d"]["lft"] < out["d"]["rgt"] < out["a"]["rgt"]


def test_driver_distributed_parity(spark):
    # deterministic random-ish forest: 3 roots, branching by modulus
    pairs = [("n000", None), ("n001", None), ("n002", None)]
    for i in range(3, 120):
        parent = i // 3  # shallow wide tree, depth ~ log3
        pairs.append((f"n{i:03d}", f"n{parent:03d}"))
    edges = _edges(spark, pairs)
    want = sorted(
        nested_set_encode(edges, max_driver_nodes=10**9).collect(),
        key=lambda r: r["node_id"],
    )
    got = sorted(
        nested_set_encode(edges, max_driver_nodes=0).collect(),
        key=lambda r: r["node_id"],
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_species_split_check(spark):
    intervals = nested_set_encode(_edges(spark, TREE))
    syn = spark.createDataFrame(
        pd.DataFrame(
            [
                ("d", "e", "b"),  # e nests inside b -> contained split
                ("d", "c", "b"),  # c is outside b's interval -> not contained
            ],
            columns=["child_id", "accepted_id", "parent_id"],
        )
    )
    out = {r["accepted_id"]: r["contained"] for r in species_split_check(syn, intervals).collect()}
    assert out == {"e": True, "c": False}


def test_resolve_loops_b8(spark):
    """B8: a directed parent cycle is cut at its lexicographically smallest
    node (deterministic), which becomes a root; chains that merely lead
    INTO the cycle keep their parents; the result encodes cleanly."""
    from ala_name_matching_spark.operators.hierarchy import resolve_loops

    pairs = [
        ("x", "y"), ("y", "z"), ("z", "x"),   # 3-cycle -> cut at 'x'
        ("w", "x"),                             # enters the cycle, kept
        ("a", None), ("b", "a"),               # clean tree untouched
        ("q", "missing"),                       # dangling parent tolerated
    ]
    fixed = resolve_loops(_edges(spark, pairs))
    rows = fixed.collect()
    got = {r["node_id"]: r["parent_id"] for r in rows}
    assert got["x"] is None          # cycle cut here
    assert got["y"] == "z" and got["z"] == "x" and got["w"] == "x"
    assert got["a"] is None and got["b"] == "a" and got["q"] == "missing"
    codes = {r["node_id"]: r["error_code"] for r in rows}
    assert codes["x"] == "PARENT_CHILD_SYNONYM"  # ErrorType.java:59 analog
    assert all(codes[n] is None for n in ("y", "z", "w", "a", "b", "q"))
    # and the repaired forest nested-set-encodes without infinite walk
    enc = nested_set_encode(
        fixed.withColumn(
            "parent_id",
            F.when(F.col("parent_id") == "missing", F.lit(None)).otherwise(
                F.col("parent_id")
            ),
        )
    )
    out = {r["node_id"]: r for r in enc.collect()}
    assert out["w"]["lft"] > out["x"]["lft"] and out["w"]["rgt"] < out["x"]["rgt"]
