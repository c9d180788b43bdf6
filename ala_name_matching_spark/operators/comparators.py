"""Hybrid token-level pair comparators: Monge-Elkan and TF-IDF cosine.

The reference scores candidate pairs with field-level edit distances and
boosts (SURVEY.md §2.4 A1; `matching-algorithm-v2.md`); the published
record-linkage generalizations of that idea are

- Monge & Elkan (1996): sim(A,B) = mean over tokens a of A of the BEST
  inner similarity max_b sim'(a,b) -- tolerant of token reordering and
  per-token typos at once, which plain whole-string Levenshtein is not.
  Inner sim' here is normalized Levenshtein similarity
  1 - lev(a,b)/max(|a|,|b|) so both engines (Spark `levenshtein`, DuckDB
  `levenshtein`) compute bit-identical IEEE doubles -- the same
  cross-engine anchor pair_scores_lev already relies on.
- Cohen/Ravikumar/Fienberg-style TF-IDF cosine over token sets: rare
  shared tokens count more than stopwords; the sparse-vector dot product
  is the classic "soft" corpus-weighted ER feature.

Scale shape:
- monge_elkan: evaluated entirely inside whole-stage codegen via
  higher-order functions (transform/array_max/aggregate) on the blocked
  pair table -- no UDF, no extra shuffle beyond the block join the pair
  table already paid. Cost per pair is O(K^2) bounded by `max_tokens`
  (name-shaped fields; K defaults to 10), NOT O(len^2) of the raw text.
- tfidf_cosine_pairs: never materializes per-pair token loops. It is the
  standard sparse formulation: one explode to a token-postings table, one
  partial-aggregated groupBy for document frequencies, a token-keyed
  self-join restricted to the blocking key for the dot product, and one
  groupBy per pair. Everything is linear in postings + shared-token hits;
  the only quadratic term is confined inside blocks, exactly like the
  rest of the blocking family.

Determinism contract (what makes both oracle-checkable): token lists are
sorted distinct (array_sort both engines = binary collation), folds are
left-associated in token-sorted order (Spark `aggregate`, DuckDB
`list_sum` over the identically-sorted list), and the single libm call
(ln in idf) is absorbed by 6-dp rounding on the outputs -- the same
contract linkage.py's EM oracle uses for log2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sorted_tokens(text_col: str, max_tokens: int) -> str:
    """SQL fragment: first max_tokens of the sorted distinct lowercase
    whitespace tokens of `text_col` (sorted-distinct = deterministic fold
    order on both engines)."""
    return (
        f"slice(array_sort(array_distinct(split(lower({text_col}), ' '))), "
        f"1, {max_tokens})"
    )


def monge_elkan_expr(toks_l: str, toks_r: str) -> str:
    """SQL expression for Monge-Elkan similarity of token array `toks_l`
    against `toks_r` (asymmetric: mean over toks_l of best match in
    toks_r). Pure higher-order functions -- stays in codegen."""
    inner = (
        f"transform({toks_l}, a -> array_max(transform({toks_r}, "
        f"b -> 1.0D - CAST(levenshtein(a, b) AS DOUBLE) / "
        f"greatest(length(a), length(b)))))"
    )
    return (
        f"CASE WHEN size({toks_l}) > 0 AND size({toks_r}) > 0 THEN "
        f"aggregate({inner}, 0.0D, (acc, x) -> acc + x) / size({toks_l}) "
        f"END"
    )


def monge_elkan_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "block_key",
    max_tokens: int = 10,
) -> DataFrame:
    """Within-block candidate pairs scored with Monge-Elkan (both
    directions + the symmetric mean).

    Output: (id_l, id_r, me_lr, me_rl, me_sym), me_* rounded to 6 dp.
    One block-keyed self-join (the same shape as pair_scores_lev); the
    comparator itself adds zero shuffles.
    """
    d = docs.select(
        F.col(block_col).alias("_bk"),
        F.col(id_col).alias("_id"),
        F.expr(_sorted_tokens(text_col, max_tokens)).alias("_toks"),
    )
    l = d.select(
        F.col("_bk"),
        F.col("_id").alias("id_l"),
        F.col("_toks").alias("toks_l"),
    )
    r = d.select(
        F.col("_bk"),
        F.col("_id").alias("id_r"),
        F.col("_toks").alias("toks_r"),
    )
    me_lr = monge_elkan_expr("toks_l", "toks_r")
    me_rl = monge_elkan_expr("toks_r", "toks_l")
    return (
        l.join(r, "_bk")
        .filter(F.col("id_l") < F.col("id_r"))
        .select(
            "id_l",
            "id_r",
            F.round(F.expr(me_lr), 6).alias("me_lr"),
            F.round(F.expr(me_rl), 6).alias("me_rl"),
            F.round((F.expr(me_lr) + F.expr(me_rl)) / F.lit(2.0), 6).alias(
                "me_sym"
            ),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "block_key",
) -> DataFrame:
    """Within-block pairs scored by TF-IDF cosine over distinct tokens.

    Weights: binary tf x smooth idf, idf = ln((N+1)/(df+1)) + 1 (the
    sklearn-documented smoothing; df over the WHOLE corpus, not the
    block). cos = sum_shared(idf^2) / (norm_l * norm_r), rounded to 6 dp.

    Distributed shape (the sparse classic): explode -> df groupBy ->
    token-keyed self-join filtered to the block -> per-pair fold. Norms
    and dots are folded in token-sorted order via sort_array + aggregate
    so the float trajectory is engine-independent.
    """
    n_docs = docs.count()  # one job; corpus-level constant, like k-means N
    tok = docs.select(
        F.col(block_col).alias("_bk"),
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
        ).alias("token"),
    ).filter(F.col("token") != "")
    df_t = tok.groupBy("token").agg(F.count("*").alias("df"))
    w = tok.join(df_t, "token").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0,
    )
    # Deterministic norms: fold idf^2 in token-sorted order.
    norms = (
        w.groupBy("_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("token"), F.col("idf")))
            ).alias("tw")
        )
        .select(
            "_id",
            F.sqrt(
                F.expr("aggregate(tw, 0.0D, (acc, x) -> acc + x.idf * x.idf)")
            ).alias("norm"),
        )
    )
    lw = w.select(
        F.col("_bk"),
        F.col("token"),
        F.col("_id").alias("id_l"),
        F.col("idf").alias("idf_l"),
    )
    rw = w.select(
        F.col("_bk"),
        F.col("token"),
        F.col("_id").alias("id_r"),
        F.col("idf").alias("idf_r"),
    )
    dots = (
        lw.join(rw, ["_bk", "token"])
        .filter(F.col("id_l") < F.col("id_r"))
        .groupBy("id_l", "id_r")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("token"), (F.col("idf_l") * F.col("idf_r")).alias("p")
                    )
                )
            ).alias("tp")
        )
        .select(
            "id_l",
            "id_r",
            F.expr("aggregate(tp, 0.0D, (acc, x) -> acc + x.p)").alias("dot"),
        )
    )
    nl = norms.select(F.col("_id").alias("id_l"), F.col("norm").alias("norm_l"))
    nr = norms.select(F.col("_id").alias("id_r"), F.col("norm").alias("norm_r"))
    return (
        dots.join(nl, "id_l")
        .join(nr, "id_r")
        .select(
            "id_l",
            "id_r",
            F.round(
                F.col("dot") / (F.col("norm_l") * F.col("norm_r")), 6
            ).alias("cosine"),
        )
    )
