"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k -- pure built-ins (zip_with + aggregate dot
    product, window top-k). The correctness baseline; O(|Q| x |C|) -- fine
    when the query side is small or broadcastable.
  * LSH-bucketed ANN -- deterministic random-hyperplane signatures computed
    in a numpy-vectorized Arrow kernel; candidates = bucket collisions,
    verified with exact cosine. The scale path: shuffle is linear in rows,
    the quadratic term is confined to in-bucket pairs.

At 100 TB the corpus side stays partitioned (bucketed by vector id); only
signatures (a few bytes/row) shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANN_SEED = 42


def dot_col(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns, JVM built-ins only.

    Elements are cast to double BEFORE multiplying so results are
    reproducible against engines that compute in float64 (float32 products
    differ in the low bits).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Query side is broadcast.

    Columns out: query_id, vec_id, cosine, rank. Deterministic tie-break on
    vec_id (A2's tie-break discipline, MatchMetrics.java:211-216 analog).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", cosine_col(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.RandomState(ANN_SEED)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_signature_udf(dim: int, n_planes: int = 16):
    """Arrow-vectorized random-hyperplane signature: int bitmask per vector."""
    planes = _hyperplanes(dim, n_planes)

    def sig(batch: pd.Series) -> pd.Series:
        m = np.stack(batch.to_numpy())  # (rows, dim)
        bits = (m @ planes.T) > 0  # (rows, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return F.pandas_udf(sig, T.LongType())


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: hyperplane-bucket join, exact cosine inside buckets.

    Recall < 1 by construction; multiprobe (flipping one bit) would raise it.
    Output schema matches brute_force_topk for drop-in comparison.
    """
    sig = lsh_signature_udf(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", sig(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket", sig(F.col("qv")))
    scored = c.join(q, "bucket").withColumn(
        "cosine", cosine_col(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets + exact verify."""
    if dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    sig = lsh_signature_udf(dim, n_planes)
    v = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", sig(F.col("v")))
    left = v.select("bucket", F.col("vec_id").alias("vec_id_l"), F.col("v").alias("v_l"))
    right = v.select("bucket", F.col("vec_id").alias("vec_id_r"), F.col("v").alias("v_r"))
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_id_l") < F.col("vec_id_r"))
        .withColumn("cosine", cosine_col(F.col("v_l"), F.col("v_r")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_id_l", "vec_id_r", F.round("cosine", 6).alias("cosine"))
        .distinct()
    )
