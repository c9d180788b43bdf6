"""Incremental entity resolution via Structured Streaming.

The reference is batch-only (index build + point queries; SURVEY.md §2.7
"Streaming: none"). This module is the Spark-native extension the north_star
architecture implies: new transcript turns arrive as a stream and are matched
against the existing cluster state with the same tier ladder, exactly-once
via foreachBatch.

Design for scale:
  * state (the clustered feature table) lives in the checkpointed table
    store (Iceberg in production); each micro-batch broadcast- or
    hash-joins against it with the SAME batch operators (operators/ladder) --
    no separate streaming codepath to keep semantically in sync.
  * watermarked tumbling-window aggregation gives per-window match-rate
    metrics for monitoring (late turns handled by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.blocking import (
    with_blocking_columns,
    with_record_id,
)
from ala_name_matching_spark.operators.ladder import search_ladder

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of transcript turns (parquet drops into `path`).

    In production this is readStream on Kafka or an Iceberg streaming scan;
    the file source exercises identical semantics hermetically.
    """
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def incremental_match(
    stream: DataFrame,
    index: DataFrame,
    out_path: str,
    checkpoint_path: str,
):
    """Match each arriving turn against the cluster-representative index.

    foreachBatch applies the batch search ladder to the micro-batch --
    exactly-once append of (query_id, index_id, score, match_type) to
    `out_path`. Returns the StreamingQuery (caller stops it).
    """
    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matched = search_ladder(batch_df, index)
        (
            matched.withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def windowed_turn_counts(stream: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Watermarked tumbling-window turn counts per role (late data handled).

    The monitoring aggregation: append-mode compatible (watermark closes
    windows), usable with any sink.
    """
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), F.col("role"))
        # exact countDistinct is unsupported on streams; HLL sketch instead
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "n_convs",
        )
    )
