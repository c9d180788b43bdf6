"""Pairwise-F1 evaluation (SURVEY.md §2.6 B11 analog, north_rule gate).

The reference evaluates matching quality by bulk-comparing matched vs
original name lists (NameListComparer, ala-name-matching-tools/src/main/java/
au/org/ala/names/tools/NameListComparer.java:145-218). Our quantitative gate
is pairwise F1 >= 0.99 on labeled pairs *under the same blocking key*
(BASELINE.json): for every candidate pair proposed by blocking, gold label =
same entity_id, prediction = same cluster_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.blocking import (
    block_table,
    salt_and_cap_blocks,
)
from ala_name_matching_spark.operators.pairs import candidate_pairs


def labeled_pairs(features: DataFrame, block_cap: int = 200) -> DataFrame:
    """FIXTURES.md §2: candidate pairs sharing a blocking key, gold-labeled.

    `features` must carry record_id, blocking columns, and gold entity_id.
    Positives = intra-entity pairs within a block; negatives = cross-entity
    pairs sharing a block.
    """
    blocks, _ = salt_and_cap_blocks(block_table(features), block_cap=block_cap)
    pairs = candidate_pairs(blocks)
    gold = features.select("record_id", "entity_id")
    return (
        pairs.join(
            gold.select(
                F.col("record_id").alias("record_id_l"),
                F.col("entity_id").alias("entity_l"),
            ),
            "record_id_l",
        )
        .join(
            gold.select(
                F.col("record_id").alias("record_id_r"),
                F.col("entity_id").alias("entity_r"),
            ),
            "record_id_r",
        )
        .withColumn("is_match", F.col("entity_l") == F.col("entity_r"))
        .select("record_id_l", "record_id_r", "is_match")
    )


def pairwise_f1(clustered: DataFrame, labeled: DataFrame) -> dict:
    """Precision/recall/F1 of same-cluster prediction over labeled pairs."""
    assign = clustered.select("record_id", "cluster_id")
    scored = (
        labeled.join(
            assign.select(
                F.col("record_id").alias("record_id_l"),
                F.col("cluster_id").alias("cluster_l"),
            ),
            "record_id_l",
        )
        .join(
            assign.select(
                F.col("record_id").alias("record_id_r"),
                F.col("cluster_id").alias("cluster_r"),
            ),
            "record_id_r",
        )
        .withColumn("pred", F.col("cluster_l") == F.col("cluster_r"))
    )
    agg = scored.agg(
        F.sum((F.col("pred") & F.col("is_match")).cast("long")).alias("tp"),
        F.sum((F.col("pred") & ~F.col("is_match")).cast("long")).alias("fp"),
        F.sum((~F.col("pred") & F.col("is_match")).cast("long")).alias("fn"),
        F.count("*").alias("n"),
    ).collect()[0]
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "pairs": agg["n"],
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def text_equality_invariant(original: DataFrame, clustered: DataFrame) -> int:
    """Per-turn text equality under stable (conv_id, turn_idx) ordering.

    Returns the number of violating rows (must be 0): every input turn is
    present exactly once in the output with byte-identical text.
    """
    a = original.select("conv_id", "turn_idx", "text")
    b = clustered.select("conv_id", "turn_idx", "text")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    return diff
