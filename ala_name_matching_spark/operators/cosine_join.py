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
classic quadratic hot key -- `max_df` REDEFINES THE VECTOR SPACE by
dropping terms above the cap BEFORE weighting and normalization (the
textbook stopword-pruning move: those terms carry the least idf and the
most join cost). With the cap the join is exact *in the capped space*
-- identical documents still score 1.0 because norms exclude the capped
terms too -- and `dropped_term_accounting` ledgers what was pruned,
same honesty contract as dedup.cap_lsh_buckets. Default None = exact in
the full space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.text_analysis import _tokens

NORM_SCALE = 1_000_000_000  # 1e9: per-doc norm accumulation
DOT_SCALE = 1_000_000_000_000  # 1e12: per-pair dot accumulation


def _term_freqs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, term, _tf): per-doc term counts under the canonical corpus
    tokenization (text_analysis._tokens -- the single source of truth the
    shared _TOKS oracle macro replays)."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    ).where(F.length("term") > 0)
    return toks.groupBy("_id", "term").agg(F.count("*").alias("_tf"))


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(id, term, w): L2-normalized TF-IDF weights, one row per (doc, term).

    tf = raw in-doc count; idf = ln((N+1)/(df+1)) + 1 (strictly positive,
    so the shared-term completeness argument holds). With `max_df`, terms
    above the document-frequency cap are dropped BEFORE weighting and
    normalization, so the output is a proper unit-norm vector in the
    capped space. The norm is the sqrt of an integer-quantized sum (see
    module determinism contract).
    """
    tf = _term_freqs(docs, id_col, text_col)
    n_docs = docs.select(F.countDistinct(id_col).alias("_n"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("_df"))
    if max_df is not None:
        df_t = df_t.where(F.col("_df") <= max_df)
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

    Exact in the full vector space when max_df is None; with max_df set,
    exact in the CAPPED space (terms above the cap removed before
    weighting/normalization -- see module SCALE note; ledger via
    `dropped_term_accounting`). Pairs are emitted once with
    id_l < id_r; cosine is 6-dp rounded, the keep decision is made on
    the quantized integer dot so both engines agree at the boundary.
    """
    # the weighted-postings projection feeds BOTH sides of the self-join
    # -- persist it, or the lazy DAG runs the whole tf-idf chain once per
    # branch (bm25_topk's analyze-once discipline); the thresholded
    # result is eagerly checkpointed so the corpus-sized cache is
    # released before returning
    wts = tfidf_weights(docs, id_col, text_col, max_df=max_df)
    wts.persist()
    try:
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
        wts.unpersist()


def dropped_term_accounting(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 1000,
) -> DataFrame:
    """One-row ledger of what a max_df cap discards: number of capped
    terms, their postings, and the max pairs a single capped term could
    have generated -- the same honesty contract as cap_lsh_buckets.
    Computed from the raw term-frequency table alone (no weighting or
    normalization work)."""
    tf = _term_freqs(docs, id_col, text_col)
    dfs = tf.groupBy("term").agg(F.count("*").alias("_df"))
    return dfs.where(F.col("_df") > max_df).agg(
        F.count("*").cast("long").alias("n_capped_terms"),
        F.coalesce(F.sum("_df"), F.lit(0)).cast("long").alias(
            "n_dropped_postings"
        ),
        F.coalesce(
            F.max(F.expr("_df * (_df - 1L) div 2")), F.lit(0)
        ).cast("long").alias("max_pairs_per_capped_term"),
    )
