"""Misra-Gries heavy hitters: exactness under adversarial partitioning."""

import pandas as pd
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.sketches import heavy_hitters


def _exact(df, col, phi):
    n = df.count()
    return {
        (r["item"], r["c"])
        for r in df.groupBy(F.col(col).alias("item"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > phi * n)
        .collect()
    }


def test_heavy_hitters_exact_on_skew(spark):
    """Zipf-ish stream scattered over 16 partitions: sketch+verify output ==
    brute-force groupBy, including items just above/below the bar."""
    rows = (
        ["hot"] * 400
        + ["warm"] * 120
        + ["edge"] * 52  # just above phi=0.05 of 1000
        + ["cold%d" % i for i in range(428)]
    )
    assert len(rows) == 1000
    df = (
        spark.createDataFrame(pd.DataFrame({"tok": rows}))
        .repartition(16)  # scatter: every partition sees a mixed slice
    )
    got = {
        (r["item"], r["exact_count"])
        for r in heavy_hitters(df, "tok", phi=0.05).collect()
    }
    assert got == _exact(df, "tok", 0.05)
    assert ("hot", 400) in got and ("edge", 52) in got
    assert not any(i.startswith("cold") for i, _ in got)


def test_heavy_hitters_empty_and_tiny_capacity(spark):
    e = spark.createDataFrame([], "tok string")
    assert heavy_hitters(e, "tok", phi=0.1).count() == 0
    # capacity floor: phi=0.5 -> capacity 5; single dominant item survives
    d = spark.createDataFrame(pd.DataFrame({"tok": ["a"] * 9 + ["b"]}))
    got = {(r["item"], r["exact_count"]) for r in heavy_hitters(d, "tok", phi=0.5).collect()}
    assert got == {("a", 9)}
