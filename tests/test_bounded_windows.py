"""bounded_window_input / bounded_topk_ranked: rank semantics and the
non-foldable partition column contract."""

import pandas as pd
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.blocking import (
    bounded_topk_ranked,
    bounded_window_input,
)


def test_bounded_topk_ranked_matches_manual_sort(spark):
    pdf = pd.DataFrame(
        {"id": range(20), "score": [((i * 37) % 13) / 10.0 for i in range(20)]}
    )
    df = spark.createDataFrame(pdf)
    got = bounded_topk_ranked(
        df, [F.col("score").desc(), F.col("id").asc()], 5, rank_col="rk"
    ).collect()
    expect = sorted(
        pdf.itertuples(index=False), key=lambda r: (-r.score, r.id)
    )[:5]
    assert [(r["id"], r["rk"]) for r in sorted(got, key=lambda r: r["rk"])] == [
        (e.id, i + 1) for i, e in enumerate(expect)
    ]


def test_bounded_window_input_adds_materialized_constant(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1, 2, 3]}))
    out = bounded_window_input(df)
    assert "_one" in out.columns
    assert {r["_one"] for r in out.collect()} == {0}
    # the checkpoint severed lineage: the constant is a scan attribute,
    # not a foldable literal, so a window partitioned by it keeps a
    # non-empty partition spec in the optimized plan
    plan = (
        out.select(
            F.row_number()
            .over(
                __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
                    "_one"
                ).orderBy("x")
            )
            .alias("r")
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "windowspecdefinition(_one" in plan
