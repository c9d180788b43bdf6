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
    # ONE window pass: first record_id over the full ordered frame is the
    # winner; is_representative falls out by equality (record_id is unique).
    # The previous two-window form (row_number then unbounded first) cost a
    # second WindowExec pass over the full output table.
    w = (
        Window.partitionBy("cluster_id")
        .orderBy(prio.desc_nulls_last(), F.col("record_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    out = clustered.withColumn("representative_id", F.first("record_id").over(w))
    return out.withColumn(
        "is_representative", F.col("record_id") == F.col("representative_id")
    )
