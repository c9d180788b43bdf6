"""Per-cluster representative (principal) election -- SURVEY.md §2.6 B7.

The reference elects a principal instance per concept as the max-score
primary instance above a cutoff, with documented non-determinism on ties
(ALATaxonResolver.principals, ala-name-matching-builder/src/main/java/au/org/
ala/names/index/ALATaxonResolver.java:63-85,147-151). We use the same
max-priority rule but add a total ordering (record_id) so election is
deterministic, as SURVEY.md §7 requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    w = Window.partitionBy("cluster_id").orderBy(
        prio.desc_nulls_last(), F.col("record_id").asc()
    )
    out = clustered.withColumn("_rn", F.row_number().over(w))
    out = out.withColumn("is_representative", F.col("_rn") == 1)
    wrep = Window.partitionBy("cluster_id")
    out = out.withColumn(
        "representative_id",
        F.first(F.when(F.col("_rn") == 1, F.col("record_id")), ignorenulls=True).over(wrep),
    ).drop("_rn")
    return out
