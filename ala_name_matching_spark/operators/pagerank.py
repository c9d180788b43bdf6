"""Distributed PageRank over an edge table (Page/Brin/Motwani/Winograd,
Stanford InfoLab 1999), with dangling-mass redistribution.

Why it belongs in a training-data engine: graph centrality over the
document/link graph is a standard corpus-curation signal -- seed-quality
ranking for crawl frontiers, importance weighting for sampling (the
"harvest high-PageRank hosts first" rule of the Common Crawl lineage),
and a structural complement to content quality scores. The same kernel
ranks entities in an ER graph (which cluster members are hubs).

Spark shape, built for 10^11-edge graphs:
  * per iteration: ONE shuffle join (ranks x edges on src -- edges carry
    their out-degree, precomputed once) and ONE partial-aggregated
    groupBy(dst). Dangling mass (nodes with no out-edges) is a 1-row
    aggregate broadcast back -- never a driver scalar in the loop.
  * ranks are materialized per iteration (localCheckpoint), so the
    lineage never grows with iteration count; superseded iterations'
    blocks are dead references the driver GC / ContextCleaner reclaim
    (the bench harness forces that GC between queries).
  * the node, degree, and degree-carrying edge tables are each computed
    once and checkpointed -- every per-iteration join reads a
    materialized table, never the raw edge lineage.

Determinism contract (the unrolled-Lloyd/EM construction applied to
PageRank): every rank is 9-dp rounded per iteration, and every
cross-row SUM runs on integer-quantized nano-units
(CAST(round(x * 1e9) AS BIGINT)) so aggregation order cannot flip a
bit. Division/multiplication are IEEE-deterministic on identical
inputs, so the whole trajectory replays as unrolled DuckDB CTEs
(pagerank_oracle_sql). Quantization bound: each contribution is
<= 1e9 nano-units, so a BIGINT per-dst sum is exact up to ~9.2e9
in-edges per node -- beyond any real in-degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1_000_000_000  # nano-unit quantization for order-free rank sums


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node_id, rank): `iters` power iterations from the uniform vector.

    `edges` is a directed edge list; duplicate edges should be
    de-duplicated by the caller if multiplicity is not intended (each
    row contributes rank/out_degree). Nodes = union of both endpoints.
    Dangling nodes' mass is redistributed uniformly (the standard
    stochastic-matrix completion), so total rank stays ~1 up to the
    documented 9-dp per-iteration rounding.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # deg is checkpointed: the per-iteration dangling anti-join probes it,
    # and without the barrier each iteration would replay the full edge
    # scan + groupBy behind it
    deg = (
        e.groupBy("src")
        .agg(F.count("*").cast("long").alias("_deg"))
        .localCheckpoint(eager=True)
    )
    # edges carry their out-degree once, so the per-iteration join is
    # ranks-vs-edges only (the degree join never repeats)
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nn = nodes.groupBy().agg(F.count("*").cast("long").alias("_n"))

    ranks = (
        nodes.crossJoin(F.broadcast(nn))
        .select(
            "node_id",
            F.round(F.lit(1.0) / F.col("_n"), 9).alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("node_id", "src"), "src")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(
                F.sum(
                    F.round(F.col("rank") / F.col("_deg") * F.lit(float(_Q)))
                    .cast("long")
                ).cast("long").alias("_cq")
            )
        )
        dang = (
            ranks.join(deg.withColumnRenamed("src", "node_id"), "node_id", "left_anti")
            .groupBy()
            .agg(
                F.coalesce(
                    F.sum(F.round(F.col("rank") * F.lit(float(_Q))).cast("long")),
                    F.lit(0),
                ).cast("long").alias("_dq")
            )
        )
        cs = F.coalesce(F.col("_cq"), F.lit(0)).cast("double") / F.lit(float(_Q))
        ds = F.col("_dq").cast("double") / F.lit(float(_Q))
        nxt = (
            nodes.join(contrib, "node_id", "left")
            .crossJoin(F.broadcast(dang))
            .crossJoin(F.broadcast(nn))
            .select(
                "node_id",
                F.round(
                    F.lit(1.0 - damping) / F.col("_n")
                    + F.lit(damping) * (cs + ds / F.col("_n")),
                    9,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        ranks = nxt
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    damping: float = 0.85,
    iters: int = 3,
) -> str:
    """DuckDB replay of pagerank(): unrolled power iterations, identical
    quantized sums and 9-dp rounds. `edges_sql` must yield (src, dst)
    BIGINT columns. Emits (node_id, rank)."""
    d = damping
    parts = [
        f"e AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node_id FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "r0 AS (SELECT node_id, round(1.0 / n, 9) AS r FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""c{i} AS (
          SELECT e.dst AS node_id,
                 CAST(sum(CAST(round(r.r / deg.d * 1e9) AS BIGINT)) AS BIGINT) AS cq
          FROM e
          JOIN r{i - 1} r ON r.node_id = e.src
          JOIN deg ON deg.src = e.src
          GROUP BY e.dst)""")
        parts.append(f"""d{i} AS (
          SELECT CAST(coalesce(sum(CAST(round(r.r * 1e9) AS BIGINT)), 0)
                      AS BIGINT) AS dq
          FROM r{i - 1} r LEFT JOIN deg ON deg.src = r.node_id
          WHERE deg.src IS NULL)""")
        parts.append(f"""r{i} AS (
          SELECT n0.node_id,
                 round({(1.0 - d)!r} / nn.n
                       + {d} * (coalesce(c.cq, 0) / 1000000000.0
                                + (dd.dq / 1000000000.0) / nn.n), 9) AS r
          FROM nodes n0
          LEFT JOIN c{i} c ON c.node_id = n0.node_id
          CROSS JOIN d{i} dd CROSS JOIN nn)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node_id, r AS rank FROM r{iters}"
    )
