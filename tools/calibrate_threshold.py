"""Threshold calibration for the pair scorer (A2 MATCH_LIMIT analog).

Runs blocking + scoring on the synthetic fixture WITHOUT thresholding,
joins gold labels, and prints the score distribution per label plus the
F1-optimal threshold. Run: python tools/calibrate_threshold.py [n_turns]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ala_name_matching_spark.operators.blocking import (  # noqa: E402
    block_table,
    canon_group_representatives,
    salt_and_cap_blocks,
    with_blocking_columns,
    with_record_id,
)
from ala_name_matching_spark.operators.pairs import candidate_pairs, score_pairs  # noqa: E402
from ala_name_matching_spark.session import get_spark  # noqa: E402
from ala_name_matching_spark.sources.transcripts import synthesize_transcripts  # noqa: E402


def main(n_turns: int = 3000):
    spark = get_spark("calibrate", master="local[8]", shuffle_partitions=8)
    t = synthesize_transcripts(spark, n_turns, partitions=8).cache()
    feats = with_blocking_columns(with_record_id(t)).cache()
    reps = canon_group_representatives(feats)
    blocks, _ = salt_and_cap_blocks(block_table(reps, tiers=(3,)))
    pairs = candidate_pairs(blocks)
    scored = score_pairs(pairs, reps).cache()

    gold = feats.select("record_id", "entity_id")
    labeled = (
        scored.join(
            gold.select(F.col("record_id").alias("record_id_l"), F.col("entity_id").alias("el")),
            "record_id_l",
        )
        .join(
            gold.select(F.col("record_id").alias("record_id_r"), F.col("entity_id").alias("er")),
            "record_id_r",
        )
        .withColumn("is_match", F.col("el") == F.col("er"))
        .cache()
    )
    print("\n=== rep-level candidate pair score distribution by gold label ===")
    labeled.groupBy("is_match", "homonym_conflict").agg(
        F.count("*").alias("n"),
        F.round(F.min("score"), 3).alias("min"),
        F.round(F.expr("percentile(score, 0.05)"), 3).alias("p05"),
        F.round(F.expr("percentile(score, 0.5)"), 3).alias("p50"),
        F.round(F.expr("percentile(score, 0.95)"), 3).alias("p95"),
        F.round(F.max("score"), 3).alias("max"),
    ).orderBy("is_match", "homonym_conflict").show(truncate=False)

    rows = labeled.filter(~F.col("homonym_conflict")).select("score", "is_match").collect()
    scores = sorted({round(r["score"], 3) for r in rows})
    best = None
    for th in scores:
        tp = sum(1 for r in rows if r["score"] >= th and r["is_match"])
        fp = sum(1 for r in rows if r["score"] >= th and not r["is_match"])
        fn = sum(1 for r in rows if r["score"] < th and r["is_match"])
        p = tp / (tp + fp) if tp + fp else 1.0
        rcl = tp / (tp + fn) if tp + fn else 1.0
        f1 = 2 * p * rcl / (p + rcl) if p + rcl else 0.0
        if best is None or f1 > best[1]:
            best = (th, f1, p, rcl)
    print(f"best threshold={best[0]} f1={best[1]:.4f} p={best[2]:.4f} r={best[3]:.4f}")
    # show hardest false examples near the boundary
    print("\nworst negatives (highest-scoring non-matches):")
    labeled.filter(~F.col("is_match") & ~F.col("homonym_conflict")).orderBy(
        F.col("score").desc()
    ).select("score", "canon_text_l", "canon_text_r").show(5, truncate=60)
    print("worst positives (lowest-scoring matches):")
    labeled.filter(F.col("is_match") & ~F.col("homonym_conflict")).orderBy("score").select(
        "score", "canon_text_l", "canon_text_r"
    ).show(5, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
