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


def _soft_tfidf_expr(toks_l: str, toks_r: str, theta: float) -> str:
    """SQL expression: Soft-TF-IDF of weighted token array `toks_l`
    against `toks_r` (asymmetric). Elements are structs (t, w) with w the
    doc-normalized idf weight, arrays token-sorted.

    For each a in toks_l: best = max normalized-Levenshtein similarity to
    any b in toks_r; if best > theta the contribution is
    a.w * w(argmax b) * best. The argmax is resolved as the FIRST
    token-sorted b attaining the max -- `filter(..., == best)[0]` -- which
    is deterministic because nlev similarities are exact rationals
    computed identically on both engines (the pair_scores_lev anchor), so
    the double equality is safe cross-engine.
    """
    def sim(v: str) -> str:
        return (
            f"1.0D - CAST(levenshtein(a.t, {v}.t) AS DOUBLE) / "
            f"greatest(length(a.t), length({v}.t))"
        )

    # distinct lambda-variable names per nesting level: the filter binds
    # `b` while re-evaluating `best` (which binds `bb`) inside it
    best = f"array_max(transform({toks_r}, bb -> {sim('bb')}))"
    best_w = f"filter({toks_r}, b -> ({sim('b')}) == ({best}))[0].w"
    contrib = (
        f"CASE WHEN ({best}) > {theta!r}D THEN "
        f"a.w * ({best_w}) * ({best}) ELSE 0.0D END"
    )
    return (
        f"CASE WHEN size({toks_l}) > 0 AND size({toks_r}) > 0 THEN "
        f"aggregate({toks_l}, 0.0D, (acc, a) -> acc + ({contrib})) "
        f"END"
    )


def soft_tfidf_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "block_key",
    theta: float = 0.9,
    max_tokens: int = 10,
) -> DataFrame:
    """Within-block pairs scored with Soft-TF-IDF (Cohen, Ravikumar &
    Fienberg 2003) -- the hybrid their name-matching study found dominant:
    TF-IDF's rare-token weighting composed with a per-token edit-distance
    CLOSE(theta) match, so 'jon smyth' vs 'john smith' scores high where
    plain TF-IDF cosine sees zero shared tokens and plain Levenshtein
    drowns in the unshared ones.

    score_lr = sum over tokens a of L with best-match similarity
    (normalized Levenshtein, the cross-engine-exact inner metric this
    module standardizes on) above theta of
    V(a, L) * V(argmax_b, R) * max_b sim(a, b), with V the doc-L2-
    normalized smooth idf weight (same idf as tfidf_cosine_pairs).
    Output: (id_l, id_r, soft_lr, soft_rl, soft_sym), 6-dp rounded.

    Scale shape: one explode + one partial-agg groupBy for df, one
    groupBy(_id) building the bounded (max_tokens) weighted-token arrays,
    then the O(K^2)-per-pair comparator runs entirely inside whole-stage
    codegen on the block self-join -- the monge_elkan shape with an idf
    dimension table folded into the token arrays instead of a per-pair
    join. Determinism: token arrays sorted, folds left-associated in
    token order, idf's ln absorbed by the 6-dp round.
    """
    n_docs = docs.count()  # corpus-level constant, like tfidf_cosine_pairs
    base = docs.select(
        F.col(block_col).alias("_bk"),
        F.col(id_col).alias("_id"),
        F.expr(_sorted_tokens(text_col, max_tokens)).alias("_toks"),
    )
    tok = base.select(
        "_bk", "_id", F.explode("_toks").alias("token")
    ).filter(F.col("token") != "")
    df_t = tok.groupBy("token").agg(F.count("*").alias("df"))
    w = tok.join(df_t, "token").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0,
    )
    weighted = (
        w.groupBy("_bk", "_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("token").alias("t"), F.col("idf")))
            ).alias("tw")
        )
        .select(
            "_bk",
            "_id",
            F.expr(
                "transform(tw, x -> struct(x.t AS t, x.idf / "
                "sqrt(aggregate(tw, 0.0D, (acc, y) -> acc + y.idf * y.idf))"
                " AS w))"
            ).alias("_wt"),
        )
    )
    l = weighted.select(
        "_bk", F.col("_id").alias("id_l"), F.col("_wt").alias("toks_l")
    )
    r = weighted.select(
        "_bk", F.col("_id").alias("id_r"), F.col("_wt").alias("toks_r")
    )
    lr = _soft_tfidf_expr("toks_l", "toks_r", theta)
    rl = _soft_tfidf_expr("toks_r", "toks_l", theta)
    return (
        l.join(r, "_bk")
        .filter(F.col("id_l") < F.col("id_r"))
        .select(
            "id_l",
            "id_r",
            F.round(F.expr(lr), 6).alias("soft_lr"),
            F.round(F.expr(rl), 6).alias("soft_rl"),
            F.round((F.expr(lr) + F.expr(rl)) / F.lit(2.0), 6).alias(
                "soft_sym"
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
