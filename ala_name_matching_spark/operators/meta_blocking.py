"""Meta-blocking: prune low-evidence candidate pairs before scoring.

The reference bounds candidate explosion by searching at most one Lucene
query per record (ALANameSearcher.java's per-name search); a distributed
blocking pipeline instead materializes within-block pairs, and when
records carry SEVERAL blocking keys (canonical + phonetic + q-gram...),
the published way to cut the pair table before the expensive comparator
stage is meta-blocking (Papadakis et al., TKDE 2014): weight each
candidate edge by its co-occurrence evidence across blocks, then prune
edges that are weak relative to their endpoints.

This implements CBS weighting (Common Blocks Scheme: weight = number of
blocks the two records share) with node-centric pruning: an edge (a, b)
survives if its weight reaches the mean edge weight of EITHER endpoint
(the union variant of Weighted Node Pruning, which the paper shows keeps
recall while dropping the bulk of singleton-evidence comparisons).

Why this is oracle-exact: every quantity is an integer. The keep
condition `w * deg(a) >= sum_w(a) OR w * deg(b) >= sum_w(b)` multiplies
through by the denominator, so no float mean is ever computed -- both
engines compare BIGINTs.

Scale shape: one self-join per block (the same shuffle candidate_pairs
already pays; hot blocks are assumed capped upstream by
salt_and_cap_blocks), one partial-agg groupBy to collapse multi-block
pairs into weights, one explode + groupBy for per-node degree/weight
sums (linear in edges), and one join back. Nothing is ever collected;
no window over a hot node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cbs_edges(
    assignments: DataFrame,
    record_col: str = "record_id",
    block_col: str = "block_id",
) -> DataFrame:
    """(id_a, id_b, weight): candidate pairs weighted by shared-block count.

    `assignments` is the (record, block) membership table -- one row per
    key per record, exactly what a multi-key blocking pass emits.
    """
    m = assignments.select(
        F.col(block_col).alias("_blk"), F.col(record_col).alias("_id")
    ).distinct()
    l = m.select(F.col("_blk"), F.col("_id").alias("id_a"))
    r = m.select(F.col("_blk"), F.col("_id").alias("id_b"))
    return (
        l.join(r, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def weighted_node_prune(edges: DataFrame) -> DataFrame:
    """Keep (id_a, id_b, weight) edges with weight >= mean weight of either
    endpoint. Integer cross-multiplied comparison -- exact.

    Adds kept = true rows only (the pruned complement is `edges` minus
    this output; callers wanting both can left_anti).
    """
    incident = edges.select(
        F.col("id_a").alias("node"), F.col("weight")
    ).unionByName(edges.select(F.col("id_b").alias("node"), F.col("weight")))
    stats = incident.groupBy("node").agg(
        F.count("*").cast("long").alias("deg"),
        F.sum("weight").cast("long").alias("sum_w"),
    )
    sa = stats.select(
        F.col("node").alias("id_a"),
        F.col("deg").alias("deg_a"),
        F.col("sum_w").alias("sum_w_a"),
    )
    sb = stats.select(
        F.col("node").alias("id_b"),
        F.col("deg").alias("deg_b"),
        F.col("sum_w").alias("sum_w_b"),
    )
    return (
        edges.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            (F.col("weight") * F.col("deg_a") >= F.col("sum_w_a"))
            | (F.col("weight") * F.col("deg_b") >= F.col("sum_w_b"))
        )
        .select("id_a", "id_b", "weight")
    )


def meta_blocking_prune(
    assignments: DataFrame,
    record_col: str = "record_id",
    block_col: str = "block_id",
) -> DataFrame:
    """CBS weighting + weighted node pruning in one call."""
    return weighted_node_prune(cbs_edges(assignments, record_col, block_col))
