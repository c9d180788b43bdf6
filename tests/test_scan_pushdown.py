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


def test_chunk_documents_is_map_only(spark, tmp_path):
    """The chunker's 'zero shuffle' claim, asserted on the executed plan."""
    import pandas as pd

    from ala_name_matching_spark.operators.sampling import chunk_documents

    path = str(tmp_path / "chunk_docs")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": range(50), "text": ["a b c d e f g h"] * 50})
    ).write.parquet(path)
    df = chunk_documents(spark.read.parquet(path), chunk_tokens=4, stride=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """A lang-partitioned write must let Catalyst prune directories at scan
    time: the filter appears as a PartitionFilter, not a data Filter."""
    import pandas as pd

    path = str(tmp_path / "part_docs")
    pdf = pd.DataFrame(
        {
            "doc_id": range(90),
            "text": ["x"] * 90,
            "lang": (["en"] * 30 + ["fr"] * 30 + ["de"] * 30),
        }
    )
    spark.createDataFrame(pdf).write.partitionBy("lang").parquet(path)
    df = spark.read.parquet(path).filter("lang = 'fr'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert df.count() == 30
    # and the pruned scan reads only the fr directory
    scan_line = [l for l in plan.splitlines() if "Location" in l or "PartitionFilters" in l]
    assert any("fr" in l or "PartitionFilters" in l for l in scan_line)
