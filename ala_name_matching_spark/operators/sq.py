"""Scalar quantization (SQ8) ANN with exact rerank.

The fourth and simplest member of the ANN family (after hyperplane-LSH,
IVF and PQ): FAISS's SQ8 compresses each dimension independently to an
8-bit code under a per-dimension linear map learned from the corpus
min/max -- 4x smaller than float32 with near-lossless recall, and unlike
PQ it needs no codebook training. The standard deployment is two-stage:
score EVERY vector against the query using reconstructed (dequantized)
values -- cheap, memory-resident -- then re-rank the top R candidates
with the true vectors (asymmetric distance + exact refinement; Jégou et
al. 2011 §VI call this ADC + re-ranking).

Spark shape, built for 100 TB:
  * per-dimension min/max: one posexplode + partial-agg groupBy to a
    dim-row table, collected driver-side (the FS/Misra-Gries bounded-
    summary discipline) and re-broadcast as literal arrays;
  * encoding is a map-only transform (no shuffle, no UDF);
  * the approximate scan is map-only per (query, vector) -- queries are
    broadcast -- followed by one per-query top-R window;
  * exact rerank touches only |Q| x R true vectors via an id join.

Determinism contract: quantize/dequantize expressions are written in the
SAME operand order in Spark and the DuckDB oracle ((x - vmin) * L /
(vmax - vmin); vmin + c * ((vmax - vmin) / L)) so both engines produce
identical codes and reconstructions; distances go through the unrolled
left-associated dot (dot_expanded_col) whose DuckDB list_dot_product
agreement the semdedup/PQ oracles established; ranking orders by the
6-dp ROUNDED distance with vec_id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.similarity_search import (
    dot_expanded_col,
)


def sq_dim_stats(
    vectors: DataFrame,
    vec_col: str = "embedding",
) -> tuple[list[float], list[float]]:
    """Per-dimension (vmin, vmax) lists -- the entire SQ 'model'.

    One posexplode + partial-agg groupBy; the collect is dim rows.
    Elements are cast to double BEFORE the min/max so the stats are the
    exact doubles the quantizer divides by.
    """
    rows = (
        vectors.select(
            F.posexplode(F.col(vec_col)).alias("j", "x")
        )
        .select("j", F.col("x").cast("double").alias("x"))
        .groupBy("j")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    by_j = {r["j"]: (r["lo"], r["hi"]) for r in rows}
    dim = len(by_j)
    vmins = [float(by_j[j][0]) for j in range(dim)]
    vmaxs = [float(by_j[j][1]) for j in range(dim)]
    return vmins, vmaxs


def _lit_arr(vals: list[float]):
    return F.array(*[F.lit(float(v)) for v in vals])


def sq_encode_col(
    vec_col, vmins: list[float], vmaxs: list[float], levels: int = 255
):
    """array<int> codes: round((x - vmin) * levels / (vmax - vmin)),
    clipped to [0, levels]; constant dimensions encode 0."""
    lo = _lit_arr(vmins)
    hi = _lit_arr(vmaxs)
    lv = float(levels)

    def enc(x, i):
        a = F.element_at(lo, i + 1)
        b = F.element_at(hi, i + 1)
        raw = F.round((x.cast("double") - a) * F.lit(lv) / (b - a))
        code = F.least(F.greatest(raw, F.lit(0.0)), F.lit(lv)).cast("int")
        return F.when(b > a, code).otherwise(F.lit(0))

    return F.transform(vec_col, enc)


def sq_recon_col(
    codes_col, vmins: list[float], vmaxs: list[float], levels: int = 255
):
    """array<double> dequantized vector: vmin + c * ((vmax - vmin) / L)."""
    lo = _lit_arr(vmins)
    hi = _lit_arr(vmaxs)
    lv = float(levels)
    return F.transform(
        codes_col,
        lambda c, i: F.element_at(lo, i + 1)
        + c.cast("double")
        * ((F.element_at(hi, i + 1) - F.element_at(lo, i + 1)) / F.lit(lv)),
    )


def sq_topk(
    queries: DataFrame,
    vectors: DataFrame,
    dim: int,
    rerank: int = 30,
    topk: int = 10,
    levels: int = 255,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, adist, dist, rank): SQ8 scan + exact rerank.

    Stage 1 scores every vector by squared L2 to the query against its
    RECONSTRUCTION (what a memory-resident SQ index does); stage 2 takes
    the top `rerank` per query and re-scores them with the true vectors;
    the final top-`topk` ranks by the exact distance (6-dp rounded,
    vec_id tie-break). adist is kept so callers can see the compression
    error the rerank absorbed.
    """
    from pyspark.sql import Window

    vmins, vmaxs = sq_dim_stats(vectors, vec_col)
    recon = vectors.select(
        F.col(id_col).alias("vec_id"),
        sq_recon_col(
            sq_encode_col(F.col(vec_col), vmins, vmaxs, levels),
            vmins,
            vmaxs,
            levels,
        ).alias("rv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    approx = recon.join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(
            dot_expanded_col(F.col("qv"), F.col("qv"), dim)
            - 2.0 * dot_expanded_col(F.col("qv"), F.col("rv"), dim)
            + dot_expanded_col(F.col("rv"), F.col("rv"), dim),
            6,
        ).alias("adist"),
    )
    w1 = Window.partitionBy("query_id").orderBy("adist", "vec_id")
    cands = approx.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= rerank
    )
    tv = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("tv"),
    )
    exact = (
        cands.join(tv, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            "adist",
            F.round(
                dot_expanded_col(F.col("qv"), F.col("qv"), dim)
                - 2.0 * dot_expanded_col(F.col("qv"), F.col("tv"), dim)
                + dot_expanded_col(F.col("tv"), F.col("tv"), dim),
                6,
            ).alias("dist"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= topk)
        .select("query_id", "vec_id", "adist", "dist", "rank")
    )
