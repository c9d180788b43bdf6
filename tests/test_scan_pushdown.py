"""Scan hygiene: filters and projections must reach the parquet reader."""


def test_filter_and_projection_pushed_to_parquet(spark, tmp_path):
    import pandas as pd

    path = str(tmp_path / "pd_docs")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": range(100), "text": ["x"] * 100, "lang": ["en"] * 100})
    ).write.parquet(path)
    df = spark.read.parquet(path).filter("doc_id > 90").select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(doc_id,90)" in plan
    # column pruning: the scan schema must not include the text payload
    assert "ReadSchema: struct<doc_id:bigint>" in plan
