"""Bucketed-table layout for co-located, shuffle-free joins.

At 100 TB the dominant recurring cost of the ER pipeline's JOIN-shaped
phases is re-shuffling the same key (record/canonical/cluster ids) run
after run. Hash-bucketing the committed tables on that key moves the
shuffle to WRITE TIME, once: subsequent equi-joins between tables bucketed
the same way execute as SortMergeJoin with NO Exchange on either side
(Catalyst recognizes the matching output partitioning). This is the
parquet/catalog analog of the reference's persistent Lucene index -- pay
the organization cost at build, amortize over every query
(DwcaNameIndexer.java builds once, ALANameSearcher reads many).

tests/test_bucketed.py asserts the physical plan contains zero Exchange
operators for a bucketed-bucketed join -- the property itself, not a proxy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_by: str | list[str],
    n_buckets: int = 8,
) -> None:
    """Save `df` as an external parquet table hash-bucketed (and sorted)
    on `bucket_by` (one column or a list).

    Bucket count is a layout contract: join partners must agree on
    (columns, n_buckets) to join exchange-free, so treat it like a schema
    field -- pick once per key domain (e.g. 2048 for record ids at 100 TB)
    and record it with the table. Bucket on EXACTLY the join keys: Spark's
    planner requires all join keys to match the bucket spec before it
    trusts the layout (requireAllClusterKeysForCoPartition, default true)
    -- a subset bucketing is 'disabled by query planner' and re-shuffles.
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *cols)
        .sortBy(*cols)
        .option("path", path)
        .saveAsTable(name)
    )


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read -- bucketing metadata only survives via the catalog
    (a raw spark.read.parquet(path) of the same files loses the layout and
    re-shuffles)."""
    return spark.table(name)
