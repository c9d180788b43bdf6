"""Mergeable frequency sketches: Misra-Gries heavy hitters, exactly verified.

The 100 TB problem: "which tokens appear in more than phi of the corpus?"
A plain groupBy(token) shuffles the ENTIRE vocabulary (trillions of rows ->
billions of keys). The sketch route shuffles almost nothing:

  pass 1  per-partition Misra-Gries summaries (capacity k), built in one
          Arrow-batched mapInPandas sweep -- each partition reduces to at
          most k (token, weight) rows plus its exact item count.
  merge   summaries are MERGEABLE (Agarwal et al., "Mergeable Summaries",
          PODS 2012): concatenate and re-prune keeps the deterministic
          undercount bound <= n/k. The merged summary is n_partitions x k
          rows -- driver-trivial at any corpus size.
  pass 2  exact counts for the candidate set only (broadcast semi-join +
          one candidate-sized groupBy).

The MG guarantee makes the final answer EXACT, not approximate: every item
with true frequency > n/k survives pass 1/merge (undercount is bounded by
n/k, and a heavy hitter's weight cannot reach zero), so for phi >= 1/k the
candidate set provably contains all phi-heavy hitters, and pass 2 replaces
sketch weights with exact counts. Hence the operator is oracle-checkable
against a plain GROUP BY ... HAVING in DuckDB -- rare for a sketch, and the
reason this lane is trustworthy enough to gate data-quality decisions on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(counts: dict, capacity: int) -> None:
    """In-place Misra-Gries decrement step: shrink to < capacity keys."""
    if len(counts) < capacity:
        return
    dec = sorted(counts.values())[len(counts) - capacity]
    for t in list(counts):
        c = counts[t] - dec
        if c > 0:
            counts[t] = c
        else:
            del counts[t]


def heavy_hitters(
    df: DataFrame,
    col: str,
    phi: float = 0.001,
    capacity: int | None = None,
) -> DataFrame:
    """(item, exact_count) for every value of `col` with frequency > phi*n.

    Exact output via the sketch-then-verify protocol above. `capacity`
    defaults to ceil(2/phi) -- the factor-2 margin keeps the candidate set
    comfortably complete after merging (guarantee needs only ceil(1/phi)).
    """
    if capacity is None:
        capacity = int(2.0 / phi) + 1

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n = 0
        for pdf in batches:
            vals = pdf[col].dropna()
            n += len(vals)
            # batch pre-aggregation: value_counts collapses repeats before
            # the MG loop, so the per-item python cost is per DISTINCT item
            for t, c in vals.value_counts().items():
                counts[t] = counts.get(t, 0) + int(c)
                _mg_reduce(counts, capacity)
        yield pd.DataFrame(
            {
                "item": list(counts.keys()) + [None],
                "weight": list(counts.values()) + [0],
                "n_part": [0] * len(counts) + [n],
            }
        )

    summaries = df.select(col).mapInPandas(
        summarize, schema="item string, weight long, n_part long"
    ).collect()
    n_total = sum(r["n_part"] for r in summaries)
    if n_total == 0:
        return df.sparkSession.createDataFrame([], "item string, exact_count long")
    merged: dict = {}
    for r in summaries:
        if r["item"] is not None:
            merged[r["item"]] = merged.get(r["item"], 0) + r["weight"]
            _mg_reduce(merged, capacity)
    spark = df.sparkSession
    cand = spark.createDataFrame([(t,) for t in merged], "item string")
    return (
        df.select(F.col(col).alias("item"))
        .join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("exact_count"))
        .filter(F.col("exact_count") > phi * n_total)
    )
