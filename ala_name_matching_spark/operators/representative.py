"""Per-cluster representative (principal) election -- SURVEY.md §2.6 B7.

The reference elects a principal instance per concept as the max-score
primary instance above a cutoff, with documented non-determinism on ties
(ALATaxonResolver.principals, ala-name-matching-builder/src/main/java/au/org/
ala/names/index/ALATaxonResolver.java:63-85,147-151). We use the same
max-priority rule but add a total ordering (record_id) so election is
deterministic, as SURVEY.md §7 requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PRIORITY = 1000  # MatchMetrics.DEFAULT_PRIORITY, MatchMetrics.java:33


def elect_representatives(
    clustered: DataFrame,
    priority_col: str | None = None,
) -> DataFrame:
    """Adds is_representative + representative_id per cluster.

    Priority defaults to text length (longer, more complete text wins --
    analog of the builder's provider-priority boost, DwcaNameIndexer.java:
    950-956); ties break on earliest (conv_id, turn_idx) via record_id asc.
    One window shuffle partitioned by cluster_id.
    """
    prio = F.col(priority_col) if priority_col else F.length(F.col("canon_text"))
    # Aggregation, NOT a window: a window partitioned by cluster_id puts a
    # hot cluster (the planted 5%-of-rows entity; at production scale, any
    # mega-entity) into ONE sort task -- a serial tail that grows with data
    # and caps scaling at high parallelism. groupBy gets map-side partial
    # aggregation (skew-immune); the winner is min(struct(-priority,
    # record_id)) -- lexicographic struct ordering = max priority, ties to
    # smallest record_id, same total order as before. Labels then extend
    # back with one hash join (AQE turns it into a broadcast when the winner
    # table is small, and handles residual join skew otherwise).
    winners = clustered.groupBy("cluster_id").agg(
        F.min(
            F.struct(
                (-F.coalesce(prio.cast("long"), F.lit(-(1 << 40)))).alias("_np"),
                F.col("record_id").alias("_rid"),
            )
        )["_rid"].alias("representative_id")
    )
    out = clustered.join(winners, "cluster_id")
    return out.withColumn(
        "is_representative", F.col("record_id") == F.col("representative_id")
    )
