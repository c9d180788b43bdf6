"""Distributed ER scorecards: pair P/R/F1 and blocking RR/PC."""

import pandas as pd
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.er_metrics import (
    blocking_quality,
    pair_quality,
)


def _pairs(spark, rows, cols=("conv_l", "conv_r")):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=list(cols))
    )


def test_pair_quality_confusion_counts(spark):
    """2 TP, 1 FP, 2 FN: precision 2/3, recall 1/2, f1 = 4/7."""
    pred = _pairs(spark, [("a", "b"), ("c", "d"), ("x", "y")])
    gold = _pairs(spark, [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")])
    r = pair_quality(pred, gold).collect()[0]
    assert (r["n_pred"], r["n_gold"], r["n_tp"]) == (3, 4, 2)
    assert r["precision"] == 0.666667
    assert r["recall"] == 0.5
    assert r["f1"] == round(2 * 0.666667 * 0.5 / (0.666667 + 0.5), 6)


def test_pair_quality_unordered_and_dedup(spark):
    """(b,a) == (a,b); duplicate and self pairs collapse before scoring."""
    pred = _pairs(spark, [("b", "a"), ("a", "b"), ("a", "a")])
    gold = _pairs(spark, [("a", "b")])
    r = pair_quality(pred, gold).collect()[0]
    assert (r["n_pred"], r["n_gold"], r["n_tp"]) == (1, 1, 1)
    assert r["f1"] == 1.0


def test_pair_quality_empty_sides(spark):
    empty = _pairs(spark, [("z", "z")])  # collapses to nothing
    gold = _pairs(spark, [("a", "b")])
    r = pair_quality(empty, gold).collect()[0]
    assert (r["n_pred"], r["n_tp"], r["precision"], r["f1"]) == (0, 0, 0.0, 0.0)


def test_blocking_quality_counts(spark):
    """Blocks {b1: a,b,c}, {b2: c,d}: candidates = 3+1 = 4 of 10 all-pairs
    (rr=0.6); gold (a,b) covered, (a,d) not -> pc = 0.5."""
    blocks = spark.createDataFrame(
        pd.DataFrame(
            [("b1", "a"), ("b1", "b"), ("b1", "c"), ("b2", "c"), ("b2", "d")],
            columns=["block_id", "record_id"],
        )
    )
    gold = _pairs(
        spark, [("a", "b"), ("a", "d")], cols=("record_id_l", "record_id_r")
    )
    r = blocking_quality(blocks, gold, n_records=5).collect()[0]
    assert (r["n_records"], r["n_candidates"]) == (5, 4)
    assert (r["n_gold"], r["n_gold_covered"]) == (2, 1)
    assert r["reduction_ratio"] == 0.6
    assert r["pairs_completeness"] == 0.5


def test_blocking_quality_multiblock_pair_counted_once_for_coverage(spark):
    """A gold pair sharing TWO blocks is covered once (distinct), while the
    candidate budget counts it twice (the multiset the matcher pays)."""
    blocks = spark.createDataFrame(
        pd.DataFrame(
            [("b1", "a"), ("b1", "b"), ("b2", "a"), ("b2", "b")],
            columns=["block_id", "record_id"],
        )
    )
    gold = _pairs(spark, [("a", "b")], cols=("record_id_l", "record_id_r"))
    r = blocking_quality(blocks, gold, n_records=2).collect()[0]
    assert r["n_candidates"] == 2  # multiset budget
    assert r["n_gold_covered"] == 1
    assert r["pairs_completeness"] == 1.0
