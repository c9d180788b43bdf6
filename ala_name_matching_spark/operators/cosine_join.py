"""All-pairs TF-IDF cosine similarity self-join over an inverted index.

The third exact text-similarity join, completing the family:
set_join.similarity_join answers threshold JACCARD on token SETS,
ed_join.edit_similarity_join answers threshold EDIT DISTANCE on strings;
this module answers threshold COSINE on TF-IDF-weighted token VECTORS --
the weighted-overlap notion (Bayardo/Ma/Srikant, "Scaling Up All Pairs
Similarity Search", WWW 2007) that, unlike Jaccard, lets a rare shared
term outweigh many common ones. It is the exact counterpart of what the
embedding lanes (LSH/IVF/PQ) approximate in dense space, and the
pairwise generalization of BM25's query-side scoring.

Pipeline (all DataFrame built-ins, no UDFs):

  weight   tf(d,t) * (ln((N+1)/(df+1)) + 1)  (smooth idf, all positive),
           L2-normalized per document.
  index    postings (term, doc, w_hat); candidate generation is the
           postings self-join on term -- LOSSLESS for any threshold > 0
           because weights are positive, so cos > 0 requires a shared
           term (same completeness argument as dedup.jaccard_edges).
  verify   dot product of unit vectors on co-occurring terms only,
           filter >= threshold.

Determinism contract (what makes a FLOAT similarity join
oracle-checkable): IEEE-double sums are order-dependent, and neither
Spark nor DuckDB guarantees aggregation order -- so no raw double is
ever summed. Both the per-doc norm and the per-pair dot accumulate
integer-quantized terms (round(x * SCALE) cast to BIGINT; integer
addition is associative), then perform identical scalar float ops on the
sums. Quantization error is bounded by terms/SCALE (documented per
site); the THRESHOLD compares the quantized dot against the quantized
threshold, so both engines keep/drop bit-identical pairs. Overflow
margins: norm terms w^2*1e9 <= ~1.3e14 each, dot terms <= 1e12 each --
sums stay orders of magnitude under 2^63 for any realistic doc length
(asserted nowhere cheaper than here: 9.2e18 / 1e12 = 9.2e6 shared terms
before overflow).

SCALE: vocabulary df is one partial-agg groupBy; the postings self-join
shuffles on term, so a boilerplate term shared by 10^9 docs is the
classic quadratic hot key -- `max_df` drops postings above the cap
BEFORE the join with the same lost-pair accounting discipline as
dedup.cap_lsh_buckets / set_join's max_prefix_df (dropping high-df terms
is also the textbook relevance move: their idf, and hence their dot
contribution, is smallest). Default None = exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NORM_SCALE = 1_000_000_000  # 1e9: per-doc norm accumulation
DOT_SCALE = 1_000_000_000_000  # 1e12: per-pair dot accumulation


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term, w): L2-normalized TF-IDF weights, one row per (doc, term).

    tf = raw in-doc count; idf = ln((N+1)/(df+1)) + 1 (strictly positive,
    so the shared-term completeness argument holds). The norm is the
    sqrt of an integer-quantized sum (see module determinism contract).
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.split(
                F.lower(
                    F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
                ),
                " ",
            )
        ).alias("term"),
    ).where(F.length("term") > 0)
    tf = toks.groupBy("_id", "term").agg(F.count("*").alias("_tf"))
    n_docs = docs.select(F.countDistinct(id_col).alias("_n"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("_df"))
    w = (
        tf.join(df_t, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "_w",
            F.col("_tf").cast("double")
            * (
                F.log(
                    (F.col("_n") + F.lit(1)).cast("double")
                    / (F.col("_df") + F.lit(1)).cast("double")
                )
                + F.lit(1.0)
            ),
        )
    )
    norms = w.groupBy("_id").agg(
        F.sum(
            F.round(F.col("_w") * F.col("_w") * F.lit(NORM_SCALE))
            .cast("long")
        ).alias("_nq")
    )
    return (
        w.join(norms, "_id")
        .select(
            F.col("_id").alias(id_col),
            "term",
            (
                F.col("_w")
                / F.sqrt(F.col("_nq").cast("double") / F.lit(float(NORM_SCALE)))
            ).alias("w"),
        )
    )


def tfidf_cosine_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """(id_l, id_r, cosine): every pair with TF-IDF cosine >= threshold.

    Exact when max_df is None (lossless shared-term candidates); with
    max_df set, postings of terms above the cap are excluded from
    CANDIDATE GENERATION only -- use `dropped_term_accounting` for the
    ledger. Pairs are emitted once with id_l < id_r; cosine is 6-dp
    rounded, the keep decision is made on the quantized integer dot so
    both engines agree at the boundary.
    """
    # the weighted-postings projection feeds BOTH sides of the self-join
    # (plus the optional hot-term filter) -- persist it, or the lazy DAG
    # runs the whole tf-idf chain once per branch (bm25_topk's
    # analyze-once discipline); the thresholded result is eagerly
    # checkpointed so the corpus-sized cache is released before returning
    base = tfidf_weights(docs, id_col, text_col)
    base.persist()
    try:
        wts = base
        if max_df is not None:
            hot = (
                base.groupBy("term")
                .agg(F.count("*").alias("_df"))
                .where(F.col("_df") > max_df)
                .select("term")
            )
            wts = base.join(hot, "term", "left_anti")
        a = wts.select(
            F.col("term"), F.col(id_col).alias("_l"), F.col("w").alias("_wl")
        )
        b = wts.select(
            F.col("term"), F.col(id_col).alias("_r"), F.col("w").alias("_wr")
        )
        t_q = int(round(threshold * DOT_SCALE))
        dots = (
            a.join(b, "term")
            .where(F.col("_l") < F.col("_r"))
            .groupBy("_l", "_r")
            .agg(
                F.sum(
                    F.round(F.col("_wl") * F.col("_wr") * F.lit(DOT_SCALE))
                    .cast("long")
                ).alias("_dq")
            )
            .where(F.col("_dq") >= F.lit(t_q))
        )
        return dots.select(
            F.col("_l").alias("id_l"),
            F.col("_r").alias("id_r"),
            F.round(
                F.col("_dq").cast("double") / F.lit(float(DOT_SCALE)), 6
            ).alias("cosine"),
        ).localCheckpoint(eager=True)
    finally:
        base.unpersist()


def dropped_term_accounting(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 1000,
) -> DataFrame:
    """One-row ledger of what a max_df cap discards: number of capped
    terms, their postings, and the max pairs a single capped term could
    have contributed -- the same honesty contract as cap_lsh_buckets."""
    wts = tfidf_weights(docs, id_col, text_col)
    dfs = wts.groupBy("term").agg(F.count("*").alias("_df"))
    return dfs.where(F.col("_df") > max_df).agg(
        F.count("*").cast("long").alias("n_capped_terms"),
        F.coalesce(F.sum("_df"), F.lit(0)).cast("long").alias(
            "n_dropped_postings"
        ),
        F.coalesce(
            F.max(F.expr("_df * (_df - 1L) div 2")), F.lit(0)
        ).cast("long").alias("max_pairs_per_capped_term"),
    )
