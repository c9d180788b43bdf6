"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship: full ER pipeline (blocking -> scoring -> CC ->
                  representatives) over the sf0.001 documents table viewed as
                  transcripts; returns the cluster summary.
queries()      -- one callable per implemented operator (SURVEY.md §2 +
                  training-data extensions), each (spark, sf_dir) -> DataFrame.
oracle_sql()   -- DuckDB-equivalent SQL per query. ALL 129 queries are
                  value-checked (incl. an independent DuckDB treat_word
                  re-implementation for the phonetic blocking key, an
                  unrolled-CTE replay of the SemDeDup k-means loop, a
                  recursive-CTE closure replay of the full ER pipeline, a
                  bit-exact SQL replay of the SimHash kernel in its
                  pigeonhole regime, an independent F6-soundEx SQL chain,
                  planted-colinear-copy constructions that make the
                  approximate ANN top-k rows analytically pinned, and
                  hand-derived published-vector pins for the Double
                  Metaphone automaton).

Column names are aliased identically on both sides; floats are rounded on
both sides to survive value-hash comparison.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end entity-resolution of sf0.001 documents-as-transcripts."""
    from ala_name_matching_spark.plans.pipeline import cluster_summary, run_pipeline
    from ala_name_matching_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, SF_DEFAULT)
    clustered = run_pipeline(t)
    return cluster_summary(clustered)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def _q_normalize_text(spark, sf_dir):
    from ala_name_matching_spark.functions.normalize import norm_text_col

    return _docs(spark, sf_dir).select(
        "doc_id", F.lower(norm_text_col(F.col("text"))).alias("norm_text")
    )


def _q_concat_key(spark, sf_dir):
    from ala_name_matching_spark.functions.normalize import concat_name_col

    return _docs(spark, sf_dir).select(
        "doc_id", concat_name_col(F.col("text")).alias("concat_key")
    )


def _q_canon_text(spark, sf_dir):
    from ala_name_matching_spark.functions.normalize import canon_text_col

    return _docs(spark, sf_dir).select(
        "doc_id", canon_text_col(F.col("text")).alias("canon_text")
    )


def _q_exact_dup_groups(spark, sf_dir):
    from ala_name_matching_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir)).select(
        "text_hash", "n_dups", "keep_id"
    )


def _q_canon_groups(spark, sf_dir):
    # J1/J2 linear canonical grouping (the exact/canonical blocking tiers)
    from ala_name_matching_spark.functions.normalize import canon_text_col

    return (
        _docs(spark, sf_dir)
        .select(canon_text_col(F.col("text")).alias("canon_text"), "doc_id")
        .groupBy("canon_text")
        .agg(F.count("*").alias("group_size"), F.min("doc_id").alias("group_rep"))
    )


_BLOCK_KEY = "lower(split_part(text, ' ', 1)) || '|' || lower(split_part(text, ' ', 2))"


def _block_key_col():
    return F.concat_ws(
        "|",
        F.lower(F.split_part(F.col("text"), F.lit(" "), F.lit(1))),
        F.lower(F.split_part(F.col("text"), F.lit(" "), F.lit(2))),
    )


def _spread(df):
    """Round-robin repartition a candidate-pair table before a CPU-heavy
    comparator projection (full-text levenshtein here is ~90k DP cells
    per pair).

    Local-mode scan-split compensation, not a production shuffle: at
    bench scale the documents table is ONE parquet split, the block
    self-join broadcasts, and the joined pairs land in a single task --
    so the comparator runs on one core (measured: threshold_sweep's
    scoring 12 s -> sub-second at sf0.1/local[32] once spread). An
    explicit-N repartition is exempt from AQE partition coalescing. At
    production scale the blocked join already arrives in thousands of
    scan/shuffle partitions and inherits full parallelism; the exchange
    here carries only the bench-scale pair table (a few MB).
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def _q_block_pair_counts(spark, sf_dir):
    # blocking-key histogram + pair counts (the J4 block-size accounting)
    return (
        _docs(spark, sf_dir)
        .select(_block_key_col().alias("block_key"))
        .groupBy("block_key")
        .agg(F.count("*").alias("block_size"))
        .withColumn(
            "n_pairs", (F.col("block_size") * (F.col("block_size") - 1) / 2).cast("long")
        )
    )


def _q_pair_scores_lev(spark, sf_dir):
    # within-block pairwise Levenshtein (J4 join + A1's edit-distance slot)
    d = _docs(spark, sf_dir).select(
        _block_key_col().alias("bk"), "doc_id", "text"
    )
    l = d.select(
        F.col("bk"), F.col("doc_id").alias("doc_id_l"), F.col("text").alias("text_l")
    )
    r = d.select(
        F.col("bk"), F.col("doc_id").alias("doc_id_r"), F.col("text").alias("text_r")
    )
    return _spread(
        l.join(r, "bk").filter(F.col("doc_id_l") < F.col("doc_id_r"))
    ).select(
        "doc_id_l",
        "doc_id_r",
        F.levenshtein("text_l", "text_r").alias("lev_dist"),
    )


def _q_pair_scores_jw(spark, sf_dir):
    # within-block pairwise Jaro-Winkler -- the A1 scorer's string kernel
    # (north-star-named), batch-vectorized in functions/jw_vectorized.
    # Value-checked against DuckDB's INDEPENDENT jaro_winkler_similarity:
    # both floor the transposition count (strcmp95 integer halving) and
    # boost at jaro > 0.7 with the 4-char prefix, so raw doubles agree
    # bit-for-bit on 64-char-capped inputs (30k-pair randomized stress);
    # the 6-dp round is belt-and-braces.
    from ala_name_matching_spark.functions.similarity import jaro_winkler_udf

    d = _docs(spark, sf_dir).select(
        _block_key_col().alias("bk"), "doc_id", "text"
    )
    l = d.select(
        F.col("bk"), F.col("doc_id").alias("doc_id_l"), F.col("text").alias("text_l")
    )
    r = d.select(
        F.col("bk"), F.col("doc_id").alias("doc_id_r"), F.col("text").alias("text_r")
    )
    return _spread(
        l.join(r, "bk").filter(F.col("doc_id_l") < F.col("doc_id_r"))
    ).select(
        "doc_id_l",
        "doc_id_r",
        F.round(jaro_winkler_udf(F.col("text_l"), F.col("text_r")), 6).alias(
            "jw_sim"
        ),
    )


def _q_token_jaccard_pairs(spark, sf_dir):
    # within-block token-set Jaccard (A1 token-set slot), rounded for hashing
    from ala_name_matching_spark.functions.similarity import token_set_similarity_col

    d = _docs(spark, sf_dir).select(_block_key_col().alias("bk"), "doc_id", "text")
    l = d.select(F.col("bk"), F.col("doc_id").alias("doc_id_l"), F.col("text").alias("text_l"))
    r = d.select(F.col("bk"), F.col("doc_id").alias("doc_id_r"), F.col("text").alias("text_r"))
    return _spread(
        l.join(r, "bk").filter(F.col("doc_id_l") < F.col("doc_id_r"))
    ).select(
        "doc_id_l",
        "doc_id_r",
        F.round(
            token_set_similarity_col(F.lower(F.col("text_l")), F.lower(F.col("text_r"))), 4
        ).alias("jaccard"),
    )


def _q_minhash_unigram_sig(spark, sf_dir):
    # MinHash signature (2 hashes) over unigram shingles -- md5-min family.
    # Tokens staged in their own projection: minhash_signature_cols
    # references the shingle array once per hash, and lambda interpretation
    # would re-split the text per reference (see shingles_from_tokens).
    from ala_name_matching_spark.operators.dedup import (
        minhash_signature_cols,
        shingles_from_tokens,
        tokens_col,
    )

    staged = _docs(spark, sf_dir).select(
        "doc_id", tokens_col(F.col("text")).alias("__toks")
    ).select("doc_id", shingles_from_tokens(F.col("__toks"), 1).alias("__sh"))
    return staged.select(
        "doc_id", *minhash_signature_cols(F.col("__sh"), num_hashes=2)
    )


def _q_fingerprint(spark, sf_dir):
    from ala_name_matching_spark.operators.text_analysis import fingerprint_col

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint_col(F.col("text")).alias("fingerprint")
    )


def _q_token_counts(spark, sf_dir):
    from ala_name_matching_spark.operators.text_analysis import (
        bpe_token_count_col,
        whitespace_token_count_col,
    )

    return _docs(spark, sf_dir).select(
        "doc_id",
        whitespace_token_count_col(F.col("text")).alias("ws_tokens"),
        bpe_token_count_col(F.col("text")).alias("bpe_tokens"),
    )


def _q_lang_id(spark, sf_dir):
    from ala_name_matching_spark.operators.text_analysis import language_id_col

    return _docs(spark, sf_dir).select(
        "doc_id", language_id_col(F.col("text")).alias("lang_pred")
    )


def _q_quality_score(spark, sf_dir):
    from ala_name_matching_spark.operators.text_analysis import quality_score_col

    return _docs(spark, sf_dir).select(
        "doc_id", quality_score_col(F.col("text")).alias("quality")
    )


def _q_gopher_flags(spark, sf_dir):
    # Gopher-rule corpus pre-filter signals (Rae et al. 2021 §A1.1), pure
    # JVM expressions, value-hash-checked against DuckDB list functions
    from ala_name_matching_spark.operators.text_analysis import (
        gopher_quality_columns,
    )

    d = _docs(spark, sf_dir)
    cols = gopher_quality_columns(F.col("text"))
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])




def _q_tfidf_topk(spark, sf_dir):
    # keyword extraction: top-3 TF-IDF terms per doc; term-asc tie-break
    # makes the ranking engine-reproducible (equal-(tf,df) terms score
    # byte-identically in both engines).
    from ala_name_matching_spark.operators.text_analysis import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir), k=3)


def _q_length_stats_by_lang(spark, sf_dir):
    # Per-language length distribution: count, mean, exact interpolated
    # median/p90 (Spark percentile == DuckDB quantile_cont). The per-group
    # exact percentile is a sort within each language partition -- at 100 TB
    # switch to approx_percentile (t-digest, map-side combinable); the exact
    # form here is the oracle-checkable baseline.
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("mean_chars"),
            F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50_chars"),
            F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90_chars"),
        )
    )


def _q_neardup_cluster_sizes(spark, sf_dir):
    # Cluster-size histogram over the exact-Jaccard near-dup clusters:
    # (cluster_size, n_clusters). The ops-dashboard query for dedup runs --
    # a size-2 spike means mirrors, a mega-cluster means boilerplate.
    from ala_name_matching_spark.operators.dedup import neardup_clusters

    cl = neardup_clusters(_docs(spark, sf_dir), shingle_n=3, threshold=0.5)
    return (
        cl.groupBy("cluster_rep")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
    )


def _q_heavy_hitter_tokens(spark, sf_dir):
    # Misra-Gries sketch-then-verify: tokens with frequency > 0.5% of the
    # corpus, EXACT via the mergeable-summary guarantee + a candidate-only
    # verify pass (no full-vocabulary shuffle). Oracle: plain GROUP
    # BY/HAVING -- the sketch's exactness contract makes it hash-matchable.
    from ala_name_matching_spark.operators.sketches import heavy_hitters
    from ala_name_matching_spark.operators.text_analysis import _tokens

    toks = _docs(spark, sf_dir).select(
        F.explode(_tokens(F.col("text"))).alias("tok")
    )
    return heavy_hitters(toks, "tok", phi=0.005)


def _q_profile_documents(spark, sf_dir):
    # Deequ-style column profile: per-column n/null/distinct/min/max in one
    # single-row aggregate pass, unpivoted via stack (no driver loop).
    from ala_name_matching_spark.operators.profiling import profile_columns

    return profile_columns(_docs(spark, sf_dir))


def _q_unigram_logprob(spark, sf_dir):
    # KenLM-perplexity stand-in: mean ln p(token) under the corpus's own
    # unigram LM (conditional-sum shape, two scans, no self-join).
    from ala_name_matching_spark.operators.text_analysis import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


def _q_repetition_signals(spark, sf_dir):
    # Gopher duplicate-n-gram family: dup-token fraction (projection) +
    # top-bigram fraction (explode -> two partial-agg groupBys, linear).
    from ala_name_matching_spark.operators.text_analysis import (
        repetition_signals,
    )

    return repetition_signals(_docs(spark, sf_dir))


def _q_benchmark_contamination(spark, sf_dir):
    # GPT-3-style eval-set decontamination scan: corpus docs sharing >= 1
    # word 4-gram with the "benchmark" split (deterministic md5 bucket of
    # doc_id, ~1/16 of docs). Benchmark n-gram set is broadcast; the corpus
    # side is one scan + map-side-combinable groupBys.
    from ala_name_matching_spark.operators.text_analysis import (
        benchmark_contamination,
    )

    d = _docs(spark, sf_dir)
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    return benchmark_contamination(d.filter(~is_bench), d.filter(is_bench), n=4)


def _q_pii_scrub(spark, sf_dir):
    # PII scrub over deterministic contact lines synthesized from customer
    # keys (the slim fixture has no phone/comment columns, so email / phone /
    # SSN / IP strings are derived from c_custkey arithmetic -- identically
    # in the DuckDB oracle). Counts + typed-token redaction, all
    # whole-stage-codegen JVM regexes.
    from ala_name_matching_spark.operators.text_analysis import pii_scrub_cols

    c = _read(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    line = F.concat_ws(
        " ",
        F.col("c_name"),
        F.lit("at"),
        F.concat(
            F.lower(F.regexp_replace(F.col("c_name"), "[^A-Za-z0-9]+", ".")),
            F.lit("@example.com"),
        ),
        F.lit("or call"),
        F.format_string("%03d-%03d-%04d", k % 1000, (k * 7) % 1000, (k * 13) % 10000),
        F.lit("ssn"),
        F.format_string("%03d-%02d-%04d", (k * 3) % 900 + 100, k % 100, (k * 11) % 10000),
        F.lit("from ip"),
        F.format_string("%d.%d.%d.%d", k % 256, (k * 3) % 256, (k * 5) % 256, F.lit(1)),
    )
    cols = pii_scrub_cols(line)
    return c.select(
        "c_custkey", *[col.alias(n) for n, col in cols.items()]
    )


def _q_cosine_topk(spark, sf_dir):
    from ala_name_matching_spark.operators.similarity_search import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return brute_force_topk(emb, queries, k=5)


def _q_topk_orders_per_customer(spark, sf_dir):
    # A2/A3: per-group top-k with deterministic tie-break
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rk")
    )


def _q_homonym_counts(spark, sf_dir):
    # A7: count-based homonym detection (name shared by >1 key)
    p = _read(spark, sf_dir, "part")
    return (
        p.groupBy("p_type")
        .agg(F.count("*").alias("n"), F.countDistinct("p_brand").alias("n_brands"))
        .filter(F.col("n") > 1)
    )


def _q_broadcast_lookup_join(spark, sf_dir):
    # J7/S4: broadcast lookup join + aggregation
    li = _read(spark, sf_dir, "lineitem")
    p = _read(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def _q_anti_join_ladder(spark, sf_dir):
    # J11: the miss-fall-through side -- customers with no orders
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def _q_range_filter(spark, sf_dir):
    # J5: range predicate pushdown (IntPoint range analog)
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
            & (F.col("l_shipdate") >= "1995-01-01")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def _q_distinct_accepted(spark, sf_dir):
    # V6: common-accepted dedupe -- countDistinct per group
    o = _read(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )


def _q_collect_set_names(spark, sf_dir):
    # B3: multi-valued name-set assembly (sorted, concatenated for hashing)
    c = _read(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias("segments"),
        F.count("*").alias("n"),
    )


def _q_priority_election(spark, sf_dir):
    # B7: deterministic principal election (max priority, id tie-break)
    c = _read(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_custkey").alias("principal_id"),
                F.round("c_acctbal", 2).alias("acctbal"))
    )


def _q_range_join(spark, sf_dir):
    # V2 interval-containment analog: equi+range join
    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") <= F.date_add(F.col("o_orderdate"), 90))
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_shipped_90d"))
    )


def _q_asof_attribution(spark, sf_dir):
    # As-of join (custom operator Spark lacks): each click attributed to the
    # user's most recent view at-or-before it. Union + ordered-window form:
    # ONE shuffle of |L|+|R| rows, no range-join pair blowup (temporal.py).
    # Oracle is DuckDB's NATIVE ASOF JOIN. lag rounded to whole seconds via
    # integer micros (engine-exact).
    from ala_name_matching_spark.operators.temporal import asof_join

    e = _read(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    j = asof_join(
        clicks, views, on="user_id", payload=["event_id"], tiebreak="event_id"
    )
    return j.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("r_event_id").alias("view_id"),
        F.when(
            F.col("r_ts").isNotNull(),
            F.floor(
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))  # parquet ts is NTZ
                    - F.unix_micros(F.col("r_ts").cast("timestamp"))
                )
                / F.lit(1_000_000)
            ),
        ).alias("lag_sec"),
    )


def _q_sessionization(spark, sf_dir):
    # B2 stable-ordering analog: gap-based sessionization via lag + cumsum
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microseconds: events carry sub-second timestamps, so whole-second
    # truncation splits sessions differently from the oracle near the boundary
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))  # parquet ts is NTZ
    gap = epoch_us - F.lag(epoch_us).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )


def _q_windowed_counts(spark, sf_dir):
    # streaming-style tumbling window agg (batch form)
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def _q_scd2_user_versions(spark, sf_dir):
    # SCD type-2: each user's event stream as versioned rows with
    # [effective_from, effective_to) validity. One lead() window per key.
    from ala_name_matching_spark.operators.temporal import scd2_intervals

    e = _read(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return scd2_intervals(e, key_cols="user_id", tiebreak="event_id")


def _q_rollup_cascade(spark, sf_dir):
    # Hypertable rollup: minute/hour/day continuous aggregates, each coarser
    # level re-aggregated from the finer one (raw scanned ONCE). Oracle
    # computes each resolution directly from raw -- proving cascade ==
    # direct, which is the operator's entire contract.
    from ala_name_matching_spark.operators.temporal import rollup_cascade

    return rollup_cascade(_read(spark, sf_dir, "events"))


def _q_soundex_normalize(spark, sf_dir):
    # F4 -- TaxonNameSoundEx.normalize effective behavior
    from ala_name_matching_spark.functions.normalize import soundex_normalize_col

    return _docs(spark, sf_dir).select(
        "doc_id", soundex_normalize_col(F.col("text")).alias("sx_norm")
    )


def _q_name_complete(spark, sf_dir):
    # F8 -- name+author assembly with containment dedup
    # (ALANameIndexer.java:991-1010): append the qualifier only when not
    # already contained in the name.
    d = _docs(spark, sf_dir)
    contained = F.contains(F.lower(F.col("text")), F.lower(F.col("source")))
    return d.select(
        "doc_id",
        F.when(contained, F.col("text"))
        .otherwise(F.concat_ws(" ", F.col("text"), F.concat(F.lit("["), F.col("source"), F.lit("]"))))
        .alias("name_complete"),
    )


def _q_homonym_probe(spark, sf_dir):
    # J9 -- iterative homonym narrowing as precomputed prefix-level counts
    from ala_name_matching_spark.operators.validation import homonym_probe

    p = _read(spark, sf_dir, "part")
    return homonym_probe(
        p,
        [["p_brand"], ["p_brand", "p_type"], ["p_brand", "p_type", "p_size"]],
        "p_partkey",
    ).select("p_partkey", "resolve_level")


def _q_autocomplete(spark, sf_dir):
    # J10 -- exact/prefix/contains union with Levenshtein rerank
    from ala_name_matching_spark.operators.validation import autocomplete

    c = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("record_id"), F.col("c_name").alias("canon_text")
    )
    return autocomplete(c, "customer#00000001", k=10).select(
        F.col("record_id").alias("c_custkey"), "ac_score", "rank"
    )


def _q_nested_set_intervals(spark, sf_dir):
    # B2 -- hierarchy walk + nested-set left/right encoding
    # (DwcaNameIndexer.java:654-854): region -> nation -> customer as the
    # taxonomy-tree analog; the oracle recomputes the same intervals with a
    # closed-form window-sum formulation (two independent algorithms, one
    # answer). Deterministic child order: lexicographic node_id.
    from ala_name_matching_spark.operators.hierarchy import nested_set_encode

    r = _read(spark, sf_dir, "region").select(
        F.concat(F.lit("r"), F.col("r_regionkey")).alias("node_id"),
        F.lit(None).cast("string").alias("parent_id"),
    )
    n = _read(spark, sf_dir, "nation").select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("node_id"),
        F.concat(F.lit("r"), F.col("n_regionkey")).alias("parent_id"),
    )
    c = _read(spark, sf_dir, "customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("node_id"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("parent_id"),
    )
    return nested_set_encode(r.unionByName(n).unionByName(c))


def _q_lca_pairs(spark, sf_dir):
    # Lowest-common-ancestor over the B2 nested-set tree: for sampled
    # customer-leaf pairs, the deepest node whose [lft, rgt] contains
    # both -- the query the reference's left/right encoding exists to
    # answer in O(1) per candidate (doc/matching-algorithm-v2.md:17-24).
    # Ancestors of a node form a chain, so argmax depth is unique;
    # cross-forest pairs (different regions) have no LCA and drop out.
    # At scale the ancestor probe joins a depth-bounded path table, not
    # the full node set -- here the node set IS small (the tree's
    # internal layer), so the direct interval join is the honest shape.
    from pyspark.sql import Window

    from ala_name_matching_spark.operators.hierarchy import nested_set_encode

    r = _read(spark, sf_dir, "region").select(
        F.concat(F.lit("r"), F.col("r_regionkey")).alias("node_id"),
        F.lit(None).cast("string").alias("parent_id"),
    )
    n = _read(spark, sf_dir, "nation").select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("node_id"),
        F.concat(F.lit("r"), F.col("n_regionkey")).alias("parent_id"),
    )
    c = _read(spark, sf_dir, "customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("node_id"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("parent_id"),
    )
    ns = nested_set_encode(r.unionByName(n).unionByName(c)).localCheckpoint(
        eager=True
    )
    sample = _read(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 100 == 0
    ).select(F.concat(F.lit("c"), F.col("c_custkey")).alias("node_id"))
    leaves = ns.join(sample, "node_id").select(
        F.col("node_id").alias("_n"), F.col("lft").alias("_l"),
    )
    # both sides of the pair product and the internal-node probe table
    # are tiny -- broadcast them, or the Cartesian/BNLJ schedules ~1000
    # near-empty tasks (measured: 10.8 s -> sub-second at sf0.1)
    pairs = (
        leaves.alias("a")
        .crossJoin(F.broadcast(leaves.alias("b")))
        .where(F.col("a._n") < F.col("b._n"))
        .select(
            F.col("a._n").alias("node_a"),
            F.col("a._l").alias("_la"),
            F.col("b._n").alias("node_b"),
            F.col("b._l").alias("_lb"),
        )
    )
    anc = pairs.join(
        F.broadcast(
            ns.where(F.col("depth") < 2).select(
                F.col("node_id").alias("lca"), "lft", "rgt", "depth"
            )
        ),
        (F.col("lft") <= F.col("_la"))
        & (F.col("_la") <= F.col("rgt"))
        & (F.col("lft") <= F.col("_lb"))
        & (F.col("_lb") <= F.col("rgt")),
    )
    w = Window.partitionBy("node_a", "node_b").orderBy(F.col("depth").desc())
    return (
        anc.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "node_a",
            "node_b",
            "lca",
            F.col("depth").cast("int").alias("lca_depth"),
        )
    )


def _q_species_split_containment(spark, sf_dir):
    # V2 -- species-split check over REAL nested-set intervals
    # (ALANameSearcher.java:1315-1358): synthetic synonym rows (every 7th
    # customer "split" to customer+1) are contained iff the target customer
    # sits under the same nation interval.
    from ala_name_matching_spark.operators.hierarchy import (
        nested_set_encode,
        species_split_check,
    )

    intervals = _q_nested_set_intervals(spark, sf_dir)
    c = _read(spark, sf_dir, "customer")
    syn = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("child_id"),
        F.concat(F.lit("c"), F.col("c_custkey") + 1).alias("accepted_id"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("parent_id"),
    )
    out = species_split_check(syn, intervals)
    # drop synonyms whose accepted target does not exist (custkey+1 past the
    # table end) -- species_split_check's inner join already does
    return out


def _q_interval_containment(spark, sf_dir):
    # V2 -- nested-interval containment (checkForSpeciesSplit left/right
    # nesting, ALANameSearcher.java:1315-1358): order pairs of one customer
    # where one 30-day window contains the other's start.
    o = _read(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderdate").alias("d1"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").alias("d2"),
    )
    pairs = (
        a.join(b, "ck")
        .filter(
            (F.col("k1") != F.col("k2"))
            & (F.col("d2") >= F.col("d1"))
            & (F.col("d2") <= F.date_add(F.col("d1"), 30))
        )
        .groupBy("ck")
        .agg(F.count("*").alias("n_contained"))
    )
    return pairs


def _q_json_extract(spark, sf_dir):
    # S2' -- semi-structured props extraction (JSON string column)
    e = _read(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def _q_train_holdout_split(spark, sf_dir):
    # deterministic md5-prefix train/holdout split (training-data extension);
    # pure narrow projection, reproducible at any scale/partitioning
    from ala_name_matching_spark.operators.sampling import deterministic_split

    d = _docs(spark, sf_dir)
    return deterministic_split(d.select("doc_id"), "doc_id", holdout_frac=0.1)


def _q_stratified_sample(spark, sf_dir):
    # per-language quota downsample keyed on the salted md5 bucket --
    # deterministic corpus rebalancing without RNG state or a join
    from ala_name_matching_spark.operators.sampling import stratified_sample

    d = _docs(spark, sf_dir)
    return stratified_sample(
        d.select("doc_id", "lang"),
        "doc_id",
        "lang",
        fractions={"en": 0.25, "zh": 0.9},
        default_frac=0.5,
    )



def _q_weighted_sample(spark, sf_dir):
    # Efraimidis-Spirtes A-ES weighted sampling without replacement:
    # length-weighted top-100 draw, es_key = ln(md5-uniform)/weight rounded
    # to 9 dp pre-rank, top-k via the distributed global_rank (never a
    # single-partition window).
    from ala_name_matching_spark.operators.sampling import weighted_sample

    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return weighted_sample(d, "doc_id", "n_chars", k=100).select(
        "doc_id", "n_chars", "es_key", "es_rank"
    )


def _q_weighted_sample_per_lang(spark, sf_dir):
    # per-domain quota sampling: 20 length-weighted docs PER LANGUAGE
    # (A-ES keys, rank partitioned by lang -- never a global sort)
    from ala_name_matching_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    return weighted_sample_per_group(
        d, "n_chars", k=20, group_col="lang"
    ).select("doc_id", "lang", "n_chars", "es_key", "es_rank")


def _q_pack_sequences(spark, sf_dir):
    # GPT-style sequence packing: per-shard token streams chunked at a
    # 64-token budget; every offset/chunk index reproduced by the DuckDB
    # windowed-cumsum oracle (shard = md5 hex prefix, order = doc_id).
    from ala_name_matching_spark.operators.sampling import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), token_budget=64)


def _q_cosine_neardups_exact(spark, sf_dir):
    # embedding-cosine near-dup (exact baseline; LSH variant is rows-only)
    from ala_name_matching_spark.operators.similarity_search import cosine_col

    emb = _read(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_id_l"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_id_r"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_id_l") < F.col("vec_id_r"))
        .withColumn("_cos", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("_cos") >= 0.4)  # filter BEFORE rounding (oracle parity)
        .select("vec_id_l", "vec_id_r", F.round("_cos", 6).alias("cosine"))
    )


def _q_embedding_neardups_lsh(spark, sf_dir):
    # The LSH scale path for embedding near-dups, FULLY oracle-checked: the
    # fixture's uniform-random vectors have no pairs at cosine >= 0.95
    # (0.95 is ~7.6 sigma for 64-d), so near-dups are planted as scaled
    # copies (vec_id + 1000000, v * 1.001 -- same direction, cosine exactly
    # 1). Hyperplane signs are scale-invariant, so multi-table LSH recall on
    # colinear pairs is provably 1.0 and the output equals the exact truth
    # set the DuckDB crossJoin computes.
    from ala_name_matching_spark.operators.similarity_search import (
        embedding_near_duplicates,
    )

    emb = _read(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    scaled = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.001).alias("embedding"),
    )
    return embedding_near_duplicates(base.unionByName(scaled), threshold=0.95)


def _q_semdedup_prune(spark, sf_dir):
    # SemDeDup (Abbas et al. 2023): k-means over embeddings, near-dup prune
    # confined to within-cluster pairs. Deterministic end to end (lowest-id
    # init, 6-dp rounding anchors, argmax tie-break to lower cluster_id) so
    # the whole 2-iteration Lloyd loop + prune replays as unrolled DuckDB
    # CTEs. Near-dups are planted as scaled copies (vec_id + 1000000,
    # v * 1.001) -- colinear, so base and copy share a cluster by
    # construction and every copy must be pruned (keep = false).
    from ala_name_matching_spark.operators.semdedup import semdedup

    emb = _read(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    scaled = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.001).alias("embedding"),
    )
    # k scales with the corpus (k = max(8, n/125), the paper's
    # k ~ |C|/target rule): cell size stays ~constant, so the
    # within-cell verify cost is LINEAR in the input, not quadratic --
    # a fixed k made the benched cost grow as sf^2 (VERDICT r03 #2).
    # The oracle computes the same k from count(nv_t) (see
    # _semdedup_oracle), so both engines fit the same Lloyd run.
    n_vectors = 2 * emb.count()
    k = max(8, n_vectors // 125)
    # _spread parallelizes the normalize/assign projections over the
    # single-split scan; the within-cluster verify is one Arrow matmul
    # per cluster inside semdedup() (r05 blocked-scoring shape).
    return semdedup(
        _spread(base.unionByName(scaled)),
        n_clusters=k,
        iters=2,
        threshold=0.95,
        dim=64,
    )


def _q_prefix_containment(spark, sf_dir):
    # sort-based strict-prefix containment (truncated re-crawl class).
    # Planted: every doc gets a half-length twin (doc_id + 2000000), which
    # must flag contained=true; the word-salad originals have no organic
    # prefix relations, so the expected split is exact.
    from ala_name_matching_spark.operators.dedup import prefix_containment_flags

    d = _docs(spark, sf_dir).select("doc_id", "text")
    halves = d.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.expr("substring(text, 1, cast(floor(length(text)/2) as int))").alias("text"),
    )
    return prefix_containment_flags(d.unionByName(halves))


def _q_bm25_topk(spark, sf_dir):
    # Lucene-replacement lane: inverted postings + BM25 ranked retrieval
    # (Lucene's default similarity since v6 -- the scoring the reference's
    # searchers actually run). Queries synthesized from every 25th doc's
    # first three tokens; rank on the 6-dp-rounded score, tie-break doc_id.
    from ala_name_matching_spark.operators.dedup import tokens_col
    from ala_name_matching_spark.operators.retrieval import bm25_topk

    d = _docs(spark, sf_dir).select("doc_id", "text")
    q = d.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens_col(F.col("text")), 1, 3), " ").alias("qtext"),
    )
    return bm25_topk(d, q, k=5)


# --------------------------------------------------------------------------
# Streaming lanes surfaced as value-checked batch-parity queries (VERDICT
# r03 #8): each runs the REAL Structured Streaming job (file source,
# availableNow trigger, epoch-partitioned idempotent sink), reads the sink
# back, and value-matches a DuckDB oracle expressing the batch-equivalent
# semantics. The rows are micro-batch-split invariant by construction --
# every stream row is processed exactly once against a static index, so
# the union over epochs equals the one-shot batch result (the parity the
# pytest lanes assert); dropping the epoch column makes that literal.
# --------------------------------------------------------------------------

def _stream_stage(df, spark, prefix):
    """Stage a DataFrame as the parquet file-source of a streaming query;
    returns (stream_df, tmp_dir). Fresh dir per call so repeated runs
    (strict partition-invariance sweeps) never collide; callers hand the
    dir to _finish_stream, which removes it after the sink is read back.
    If staging itself fails mid-way the dir is removed before re-raising
    (the cleanup-in-finally discipline extended to the setup phase)."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix=prefix)
    try:
        src = f"{tmp}/in"
        df.write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        return spark.readStream.schema(schema).parquet(src), tmp
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def _stream_wired(start_fn, *tmp_dirs):
    """Run a streaming query's WIRING phase (index build + .start()) with
    scratch-dir cleanup on failure: if wiring raises, the already-created
    tmp dirs are removed before re-raising, so a failed setup never leaks
    /tmp state (previously only the await/read-back phase was covered by
    _finish_stream's finally)."""
    import shutil

    try:
        return start_fn()
    except BaseException:
        for d in tmp_dirs:
            shutil.rmtree(d, ignore_errors=True)
        raise


def _finish_stream(q, build_result, *tmp_dirs):
    """Await an availableNow streaming query, materialize the read-back
    result, and remove the scratch dirs (staging + checkpoint + sink --
    repeated sweep runs would otherwise leak GBs of /tmp state; the
    cleanup runs in a finally so the TIMEOUT path cannot leak either).

    `build_result` is a CALLABLE constructing the read-back DataFrame: the
    sink paths exist (and their parquet file listings are complete) only
    after the stream terminates -- a DataFrame built earlier would snapshot
    a missing or partial file index. awaitTermination returns False on
    timeout WITHOUT raising; a partial sink must be an error, not a
    silently-truncated result."""
    import shutil

    try:
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("streaming query did not finish within 300 s")
        return build_result().localCheckpoint(eager=True)
    finally:
        for d in tmp_dirs:
            shutil.rmtree(d, ignore_errors=True)


def _q_render_conversations(spark, sf_dir):
    # Turn-grain -> document-grain assembly over the planted conversation
    # table (roles alternate user/assistant by parity); sorted-fold join
    # replays as string_agg(... ORDER BY turn_idx).
    from ala_name_matching_spark.operators.conversations import (
        render_conversations,
    )

    t = _conv_turns(spark, sf_dir).withColumn(
        "role",
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
    )
    return render_conversations(t)


def _q_sft_pairs(spark, sf_dir):
    # SFT pair mining over the planted conversations (parity roles:
    # even turns user, odd assistant -> every odd turn pairs with its
    # predecessor); lag window partitioned by conversation.
    from ala_name_matching_spark.operators.conversations import (
        extract_sft_pairs,
    )

    t = _conv_turns(spark, sf_dir).withColumn(
        "role",
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
    )
    return extract_sft_pairs(t)


def _q_jl_projection(spark, sf_dir):
    # Johnson-Lindenstrauss projection 64 -> 16 dims (Achlioptas
    # Rademacher signs from md5 parity; 1/sqrt(16) = 0.25 exact). Each
    # output dim is a fixed-order codegen +- chain -- no aggregation, so
    # the oracle is the SAME chain textually and values match bit-for-bit
    # before the 6-dp round.
    from ala_name_matching_spark.operators.random_projection import (
        random_projection,
    )

    return random_projection(
        _read(spark, sf_dir, "embeddings"), dim=64, k=16
    )


def _q_pagerank_supply_graph(spark, sf_dir):
    # PageRank over the supplier->part supply graph (distinct lineitem
    # edges; parts offset to a disjoint id space). Every part is a
    # dangling node (no out-edges), so the run exercises the dangling
    # -mass redistribution, not just the join+agg loop. 3 power
    # iterations; 9-dp per-iteration rounds + nano-quantized sums make
    # the whole trajectory replay as unrolled CTEs.
    from ala_name_matching_spark.operators.pagerank import pagerank

    li = _read(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey").cast("long") + 1000000).alias("dst"),
    ).distinct()
    return pagerank(edges, damping=0.85, iters=3)


def _q_hits_supply_graph(spark, sf_dir):
    # HITS hubs/authorities over the same supplier->part graph as
    # pagerank_supply_graph: suppliers are pure hubs, parts pure
    # authorities (bipartite), so the two scores separate cleanly and the
    # 3-iteration trajectory replays via the unrolled oracle.
    from ala_name_matching_spark.operators.pagerank import hits

    li = _read(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey").cast("long") + 1000000).alias("dst"),
    ).distinct()
    return hits(edges, iters=3)


def _q_streaming_neardup_match(spark, sf_dir):
    # Streaming MinHash-LSH near-dup match vs the static corpus index:
    # the stream is every 20th doc re-ingested verbatim under a shifted id
    # (the re-crawl shape). Identical text -> identical signatures, so the
    # stream row band-collides exactly where its original does, and the
    # batch lane's green all-pairs oracle at these parameters
    # (num_hashes=16, bands=8, shingle_n=3, threshold=0.4 -- the
    # minhash_lsh_neardups audit) proves LSH recall 1.0 on every fixture
    # pair >= 0.4, so the all-pairs DuckDB oracle is the exact truth set.
    from ala_name_matching_spark.streaming.incremental import (
        streaming_neardup_match,
    )

    corpus = _docs(spark, sf_dir).select("doc_id", "text")
    qdocs = corpus.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"), "text"
    )
    stream, tmp = _stream_stage(qdocs, spark, "stream_nd_")
    q = _stream_wired(
        lambda: streaming_neardup_match(
            stream,
            corpus,
            f"{tmp}/out",
            f"{tmp}/ckpt",
            num_hashes=16,
            bands=8,
            shingle_n=3,
            threshold=0.4,
        ),
        tmp,
    )
    return _finish_stream(
        q,
        lambda: spark.read.parquet(f"{tmp}/out").select(
            "doc_id_l", "doc_id_r", F.round("jaccard", 4).alias("jaccard")
        ),
        tmp,
    )


def _q_streaming_index_update(spark, sf_dir):
    # Incremental retrieval-index maintenance: half the corpus is indexed
    # up front (build_index, epoch=-1), the other half arrives as a
    # stream and is appended one epoch per micro-batch. The returned
    # postings+doclen tables must equal a one-shot build over the FULL
    # corpus -- BM25's global stats derive from these tables, so this
    # equality IS the score-parity guarantee the pytest lane asserts.
    from ala_name_matching_spark.operators.retrieval import build_index
    from ala_name_matching_spark.streaming.incremental import (
        streaming_index_update,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    import tempfile

    idx = tempfile.mkdtemp(prefix="stream_idx_")

    def _wire():
        build_index(d.where(F.col("doc_id") % 2 == 0), idx)
        stream, tmp = _stream_stage(
            d.where(F.col("doc_id") % 2 == 1), spark, "stream_idx_in_"
        )
        return (
            _stream_wired(
                lambda: streaming_index_update(stream, idx, f"{tmp}/ckpt"), tmp
            ),
            tmp,
        )

    q, tmp = _stream_wired(_wire, idx)

    def build():
        posts = spark.read.parquet(f"{idx}/postings").select(
            "doc_id", "term", F.col("tf").cast("long").alias("tf")
        )
        dl = spark.read.parquet(f"{idx}/doclen").select(
            "doc_id", F.col("dl").cast("long").alias("dl")
        )
        return posts.join(dl, "doc_id").select("doc_id", "term", "tf", "dl")

    return _finish_stream(q, build, tmp, idx)


def _q_streaming_semdedup_match(spark, sf_dir):
    # Streaming SemDeDup against the corpus k-means index: queries are
    # scaled copies (vec_id + 1000000, v * 1.001) of every corpus vector
    # -- colinear, so after unit-rounding each copy lands in its
    # original's cluster and matches it at cosine 1.0; organic uniform
    # -random pairs never reach 0.95. The oracle replays corpus Lloyd +
    # query assignment + within-cluster cosine via the SAME CTE generator
    # as the batch semdedup oracle.
    from ala_name_matching_spark.streaming.incremental import (
        streaming_semdedup_match,
    )

    emb = _read(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    qvec = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.001).alias(
            "embedding"
        ),
    )
    stream, tmp = _stream_stage(qvec, spark, "stream_sd_")
    # n_clusters=None -> k = max(8, n_corpus // 125) computed inside the
    # operator: cluster membership stays ~constant with corpus scale, so
    # the per-batch within-cluster verify is linear, not superlinear (the
    # same k rule as _q_semdedup_prune; the oracle derives the identical k
    # from count(nv_t) via k_sql -- VERDICT r04 #1).
    q = _stream_wired(
        lambda: streaming_semdedup_match(
            stream,
            corpus,
            f"{tmp}/out",
            f"{tmp}/ckpt",
            n_clusters=None,
            iters=2,
            threshold=0.95,
            dim=64,
        ),
        tmp,
    )
    return _finish_stream(
        q,
        lambda: spark.read.parquet(f"{tmp}/out").select(
            "vec_id", "corpus_vec_id", "cluster_id", "cosine"
        ),
        tmp,
    )


def _q_streaming_drift_monitor(spark, sf_dir):
    # Streaming drift monitoring vs a STATIC reference slice: the English
    # documents pin the binning range (ref min/max collected once at
    # wiring), the non-English slice arrives as the stream and its
    # n_chars histogram is scored per micro-batch with the SAME smoothed
    # PSI / JS bin terms as the batch distribution_drift lane
    # (profiling.drift_term_cols -- one definition, both lanes). The
    # stream is staged as ONE file so availableNow processes it as ONE
    # batch: the sink rows then equal the batch drift of the whole
    # slice, which is what the oracle replays (per-batch histograms are
    # composition-dependent, so single-batch staging is what makes this
    # lane value-checkable; the multi-batch path is pytest-covered).
    from ala_name_matching_spark.streaming.incremental import (
        streaming_drift_monitor,
    )

    d = _docs(spark, sf_dir)
    ref = d.where(F.col("lang") == "en").select("doc_id", "n_chars")
    cur = d.where(F.col("lang") != "en").select("doc_id", "n_chars")
    stream, tmp = _stream_stage(cur.coalesce(1), spark, "stream_drift_")
    q = _stream_wired(
        lambda: streaming_drift_monitor(
            stream,
            ref,
            "n_chars",
            f"{tmp}/out",
            f"{tmp}/ckpt",
            n_bins=10,
            smoothing=0.5,
        ),
        tmp,
    )
    return _finish_stream(
        q,
        lambda: spark.read.parquet(f"{tmp}/out").select(
            "bin", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term", "jsd_term"
        ),
        tmp,
    )


def _q_compaction_checksum(spark, sf_dir):
    # S3 compaction content-parity as a VALUE-CHECKED query (was
    # tests-only): documents are written as 16 small files, bin-packed by
    # compact_table (readers.py:100 -- the reference's index
    # optimize/forceMerge(1), DwcaNameIndexer.java:614-626), and the
    # read-back is content-checksummed per lang. The oracle computes the
    # same (n_rows, checksum) directly over the source table, so a green
    # row proves the rewrite preserved the exact row multiset; the
    # `compacted` literal additionally value-checks that the bin-pack
    # actually RAN (16 files > n_target * slack by construction).
    import shutil
    import tempfile

    from ala_name_matching_spark.operators.profiling import content_checksum
    from ala_name_matching_spark.sources.readers import compact_table

    d = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    tmp = tempfile.mkdtemp(prefix="compact_ck_")
    try:
        path = f"{tmp}/docs"
        d.repartition(16).write.parquet(path)
        stats = compact_table(spark, path, target_file_mb=1024)
        back = spark.read.parquet(path)
        return (
            content_checksum(back, ["doc_id", "lang", "text"], group_col="lang")
            .withColumn("compacted", F.lit(bool(stats["compacted"])))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_ann_ivf_persisted_topk(spark, sf_dir):
    # Persisted-IVF roundtrip (was tests-only): build_ivf_index writes
    # centroids + list_id-partitioned lists to disk, ivf_topk_from_index
    # answers from the files alone (partition pruning on the probed
    # lists). Same planted fixture + (16 lists, nprobe=6, rounded-rank)
    # config as ann_ivf_topk, so the analytic truth set -- the five
    # colinear copies per query at cosine 1.0 -- is unchanged and the
    # oracle is shared verbatim: a green row proves the index survives
    # the disk roundtrip bit-for-bit.
    import shutil
    import tempfile

    from ala_name_matching_spark.operators.similarity_search import (
        build_ivf_index,
        ivf_topk_from_index,
    )

    corpus, queries = _ann_planted_corpus_and_queries(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        build_ivf_index(corpus, f"{tmp}/idx", n_centroids=16)
        return ivf_topk_from_index(
            spark,
            f"{tmp}/idx",
            queries,
            k=5,
            nprobe=6,
            rank_rounded=True,
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_streaming_incremental_er(spark, sf_dir):
    # Streaming incremental ER (was tests-only): arriving turns are
    # matched against the static cluster-representative index with the
    # BATCH search ladder inside foreachBatch (operators/ladder.py;
    # ALANameSearcher.searchForRecordMetrics analog) -- the north-rule
    # operator's streaming form. Planted-truth construction, one lane
    # per ladder outcome, each analytically exact:
    #   q<id>: verbatim copy of index doc <id>  -> EXACT, score 1.0
    #          (identical canon/role, JW=Lev=token=1, renormalized
    #          weighted mean collapses to exactly 1.0), no codes;
    #   m<id>: copy + ' ?'                      -> norm_key differs,
    #          canon strips punctuation -> CANONICAL, score 1.0,
    #          error_codes [QUESTION] (the F10 marker rides through);
    #   x<id>: nonsense tokens                  -> NO_MATCH + code.
    # Every query row meets the static index independently, so the
    # result is micro-batch-split invariant and the oracle is the
    # planted expectation itself (the fuzzy-tier arithmetic is
    # value-checked by the pair-score oracles and gated by the
    # pipeline F1 test; this row pins tier precedence, ranking, the
    # marker/NO_MATCH/homonym code assembly, and the streaming
    # exactly-once plumbing end to end).
    from ala_name_matching_spark.functions.normalize import canon_text_col
    from ala_name_matching_spark.streaming.incremental import (
        incremental_match,
    )

    # restrict to CANON-unique docs (canon is coarser than norm, so this
    # also removes norm collisions): within an organic collision group
    # the tier winner is the min index_id, not necessarily the query's
    # own source, which would break the planted q<id>->i<id> truth --
    # sf0.01 has zero such groups but sf0.1 has some, and the lane must
    # be deterministic at any SF. The oracle applies the same HAVING=1.
    raw = _docs(spark, sf_dir).select("doc_id", "text")
    cc = raw.select("doc_id", canon_text_col(F.col("text")).alias("_c"))
    uniq = cc.groupBy("_c").agg(F.count("*").alias("_n")).where(F.col("_n") == 1)
    d = raw.join(
        cc.join(uniq, "_c", "left_semi").select("doc_id"), "doc_id", "left_semi"
    )
    role = F.lit("user").alias("role")
    tool = F.lit(None).cast("string").alias("tool")
    idx = d.select(
        F.concat(F.lit("i"), F.col("doc_id").cast("string")).alias(
            "record_id"
        ),
        "text",
        role,
        tool,
    )
    qs = (
        d.select(
            F.concat(F.lit("q"), F.col("doc_id").cast("string")).alias(
                "record_id"
            ),
            "text",
            role,
            tool,
        )
        .unionByName(
            d.where(F.col("doc_id") % 5 == 0).select(
                F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias(
                    "record_id"
                ),
                F.concat("text", F.lit(" ?")).alias("text"),
                role,
                tool,
            )
        )
        .unionByName(
            d.where(F.col("doc_id") % 25 == 0).select(
                F.concat(F.lit("x"), F.col("doc_id").cast("string")).alias(
                    "record_id"
                ),
                F.concat(
                    F.lit("qqqxv jjjzv wwwkv token"),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
                role,
                tool,
            )
        )
    )
    stream, tmp = _stream_stage(qs, spark, "stream_er_")
    q = _stream_wired(
        lambda: incremental_match(stream, idx, f"{tmp}/out", f"{tmp}/ckpt"),
        tmp,
    )
    return _finish_stream(
        q,
        lambda: spark.read.parquet(f"{tmp}/out").select(
            "query_id",
            "index_id",
            "score",
            "match_type",
            F.array_join("error_codes", ",").alias("error_codes"),
        ),
        tmp,
    )


_CLEAN_TAIL = " the of"
_CLEAN_BOILER = " click here to subscribe now today"


def _q_clean_pipeline(spark, sf_dir):
    # The end-to-end corpus-cleaning pipeline (was tests-only): quality
    # gates -> exact dedup -> near-dup keep-best -> duplicated-span strip
    # (plans/clean_pipeline.py -- the documents-side sibling of the ER
    # pipeline). The oracle composes the four stages' EXISTING green
    # fragments (gopher_flags, char_entropy, exact keep-min, the
    # keep-best recursive-CC election, strip_dup_spans) as stage-scoped
    # CTEs -- each stage's SQL runs over the PREVIOUS stage's survivors
    # exactly as the pipeline wires them, so a green row proves the
    # stage sequencing and survivor threading, not just each operator
    # in isolation.
    #
    # Fixture: the raw word-salad corpus carries ZERO Gopher stopwords
    # (stop_hits < 2 would flag every doc and make the check vacuous),
    # so every doc gets a TWO-token stopword tail -- long enough to pass
    # the gate, too short to form any shared 3-token shingle (a
    # corpus-wide boilerplate tail was measured to inflate the pairwise
    # jaccard baseline and blow the LSH candidate volume quadratic).
    # Every 10th doc ALSO gets a 6-token boilerplate sentence: the
    # cross-doc duplicated span c4 must strip, shared by only ~10% of
    # docs so candidate volume stays banded-sparse. Planted work for
    # the dedup stages: every 20th doc gets a verbatim copy
    # (doc_id+7000000; c2 must keep the lower id), every 25th a
    # first-token-swapped near twin (doc_id+8000000; shingle jaccard
    # ~0.9 -> one c3 cluster, keep-best elects by rounded quality + id
    # tie-break), and one junk row (3 words -> flagged) that the c1
    # gate must DROP. Returns the `clean` table: one row per surviving
    # doc with its span-stripped text.
    from ala_name_matching_spark.plans.clean_pipeline import (
        run_clean_pipeline,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    base = d.select(
        "doc_id",
        F.concat(
            "text",
            F.lit(_CLEAN_TAIL),
            F.when(F.col("doc_id") % 10 == 0, F.lit(_CLEAN_BOILER)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    exact_twin = base.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 7000000).alias("doc_id"), "text"
    )
    near_twin = base.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 8000000).alias("doc_id"),
        F.concat(
            F.lit("zzz "),
            F.expr("substring(text, instr(text, ' ') + 1)"),
        ).alias("text"),
    )
    junk = spark.createDataFrame(
        spark.sparkContext.parallelize([(9000000, "a b c")], 1),
        "doc_id long, text string",
    )
    aug = base.unionByName(exact_twin).unionByName(near_twin).unionByName(junk)
    return run_clean_pipeline(aug)["clean"]


def _q_streaming_exact_dedup(spark, sf_dir):
    # Watermarked streaming exact dedup (was tests-only): every document
    # is staged TWICE verbatim -- the replay/re-ingest shape -- and
    # dropDuplicatesWithinWatermark must pass exactly one copy of each.
    # The within-batch survivor pick is processing-order, but the planted
    # duplicates are byte-identical rows, so ANY pick yields the same
    # values and the lane is fully value-checked. Only the
    # COLLISION-FREE subset is staged (docs whose normalized-text hash
    # is unique in the corpus; the oracle applies the identical HAVING
    # filter): among an ORGANIC collision group the survivor's doc_id
    # would be processing-order -- sf0.01 happens to have zero such
    # groups but sf0.1 has 8, and the query must be deterministic at
    # ANY scale factor, not just the one the driver checks.
    from ala_name_matching_spark.functions.normalize import norm_text_col
    from ala_name_matching_spark.streaming.incremental import (
        streaming_exact_dedup,
    )

    raw = _docs(spark, sf_dir).select("doc_id", "text")
    hh = raw.select(
        "doc_id", F.md5(F.lower(norm_text_col(F.col("text")))).alias("_h")
    )
    uniq = hh.groupBy("_h").agg(F.count("*").alias("_c")).where(F.col("_c") == 1)
    keep = hh.join(uniq, "_h", "left_semi").select("doc_id")
    d = raw.join(keep, "doc_id", "left_semi").withColumn(
        "ts", F.lit("2026-01-01 00:00:00").cast("timestamp")
    )
    staged = d.unionByName(d)
    stream, tmp = _stream_stage(staged.coalesce(1), spark, "stream_xd_")
    q = _stream_wired(
        lambda: streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", f"{tmp}/out")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start(),
        tmp,
    )
    return _finish_stream(
        q,
        lambda: spark.read.parquet(f"{tmp}/out").select("doc_id", "text_hash"),
        tmp,
    )


def _q_bucketed_join_parity(spark, sf_dir):
    # Bucketed-layout roundtrip (was plan-tested only): orders + lineitem
    # are written hash-bucketed on the join key (shuffle paid once at
    # WRITE time), read back through the catalog, and joined+aggregated.
    # The zero-Exchange property stays pinned by test_bucketed.py; this
    # row value-checks that the bucketed write/read roundtrip preserves
    # content exactly (the oracle is the plain join over the source
    # tables). Money sums ride the cents-quantized order-free contract.
    import shutil
    import tempfile

    from ala_name_matching_spark.sources.bucketed import (
        read_table,
        write_bucketed,
    )

    o = (
        _read(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_custkey")
    )
    li = _read(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_extendedprice"
    )
    tmp = tempfile.mkdtemp(prefix="bucketed_q_")
    try:
        write_bucketed(o, "bkq_orders", f"{tmp}/o", "o_orderkey")
        write_bucketed(li, "bkq_lineitem", f"{tmp}/l", "o_orderkey")
        j = read_table(spark, "bkq_orders").join(
            read_table(spark, "bkq_lineitem"), "o_orderkey"
        )
        return (
            j.groupBy("o_orderkey", "o_custkey")
            .agg(
                F.count("*").cast("long").alias("n_items"),
                F.sum(F.round(F.col("l_quantity")).cast("long"))
                .cast("long")
                .alias("sum_qty"),
                (
                    F.sum(
                        F.round(F.col("l_extendedprice") * F.lit(100.0)).cast(
                            "long"
                        )
                    ).cast("double")
                    / 100.0
                ).alias("revenue"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bkq_orders")
        spark.sql("DROP TABLE IF EXISTS bkq_lineitem")
        shutil.rmtree(tmp, ignore_errors=True)


def _q_jaccard_verify_cross(spark, sf_dir):
    # Cross-table exact-Jaccard verify (was tests-only): the query-vs
    # -corpus verify kernel of the streaming near-dup lane, surfaced on a
    # planted candidate set -- every 10th doc pairs with its own
    # re-ingest (jaccard exactly 1.0) AND with its successor's re-ingest
    # (organic word-salad similarity, exactly replayed by the DuckDB
    # shingle SQL). threshold=0 keeps the low-similarity pairs in the
    # output, so the verify arithmetic is value-checked across the whole
    # range, not just the planted hits.
    from ala_name_matching_spark.operators.dedup import jaccard_verify_cross

    d = _docs(spark, sf_dir).select("doc_id", "text")
    right = d.select((F.col("doc_id") + 3000000).alias("doc_id"), "text")
    tenth = d.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("doc_id_l")
    )
    succ = d.select((F.col("doc_id") - 1).alias("doc_id_l"), "doc_id")
    cands = tenth.select(
        "doc_id_l", (F.col("doc_id_l") + 3000000).alias("doc_id_r")
    ).unionByName(
        tenth.join(succ, "doc_id_l").select(
            "doc_id_l", (F.col("doc_id") + 3000000).alias("doc_id_r")
        )
    )
    return jaccard_verify_cross(
        d, right, cands, shingle_n=3, threshold=0.0
    ).withColumn("jaccard", F.round("jaccard", 4))


def _q_ivfpq_full_probe_topk(spark, sf_dir):
    # IVF-PQ composition at FULL probe (was parity-tested only,
    # test_pq.py): with nprobe = n_centroids the coarse quantizer prunes
    # nothing, so ivfpq_topk must reproduce pq_adc_topk bit-for-bit --
    # and therefore shares its unrolled train+encode+ADC oracle verbatim.
    # A green row value-checks the IVF->PQ candidate plumbing (home-list
    # assign, probed-list equi-join, per-pair grid lookup) end to end;
    # the pruning configs' recall floors stay pytest-covered.
    from ala_name_matching_spark.operators.pq import ivfpq_topk

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # exclude_self=False: pq_adc_topk keeps the self pair (its quantized
    # self-distance is informative), so bit-for-bit parity requires it
    return ivfpq_topk(
        q,
        emb,
        m_subs=4,
        k=8,
        iters=2,
        topk=10,
        n_centroids=8,
        nprobe=8,
        exclude_self=False,
    )


# Hand-derived golden encodings: Philips's classic CUJ-2000 vectors plus the
# frozen rule-corner corpus (CIA->S/X, -ough silents, CC palatalization,
# slavo-germanic W/CZ, pinyin ZH, ...). Same pins as
# tests/test_double_metaphone.py GOLDENS/EXTENDED -- hand-walked from the
# PUBLISHED cascade, so the VALUES oracle below is an independent derivation
# of the expected keys, not a snapshot of this engine's output (a drift test
# asserts the two pin sets stay identical).
_DM_GOLDEN = {
    "smith": ("SM0", "XMT"), "smyth": ("SM0", "XMT"), "schmidt": ("XMT", "SMT"),
    "johnson": ("JNSN", "ANSN"), "williams": ("ALMS", "FLMS"),
    "thomas": ("TMS", "TMS"), "catherine": ("K0RN", "KTRN"),
    "katherine": ("K0RN", "KTRN"), "jose": ("HS", "HS"),
    "xavier": ("SF", "SFR"), "wasserman": ("ASRM", "FSRM"),
    "vasserman": ("FSRM", "FSRM"), "filipowicz": ("FLPT", "FLPF"),
    "school": ("SKL", "SKL"), "sugar": ("XKR", "SKR"),
    "island": ("ALNT", "ALNT"), "ghost": ("KST", "KST"), "edge": ("AJ", "AJ"),
    "edgar": ("ATKR", "ATKR"), "thumb": ("0M", "TM"),
    "cabrillo": ("KPRL", "KPR"), "caesar": ("SSR", "SSR"),
    "michael": ("MKL", "MXL"), "orchestra": ("ARKS", "ARKS"),
    "accident": ("AKST", "AKST"), "knight": ("NT", "NT"),
    "pneumonia": ("NMN", "NMN"), "wrestle": ("RSTL", "RSTL"),
    "psalm": ("SLM", "SLM"), "gnome": ("NM", "NM"), "zhao": ("J", "J"),
    "laugh": ("LF", "LF"), "breaux": ("PR", "PR"),
    "jones": ("JNS", "ANS"), "brown": ("PRN", "PRN"),
    "garcia": ("KRS", "KRX"), "rodriguez": ("RTRK", "RTRK"),
    "nguyen": ("NKN", "NKN"), "wright": ("RT", "RT"), "knox": ("NKS", "NKS"),
    "campbell": ("KMPL", "KMPL"), "sanchez": ("SNXS", "SNKS"),
    "chavez": ("XFS", "XFS"), "rivera": ("RFR", "RFR"),
    "gomez": ("KMS", "KMS"), "diaz": ("TS", "TS"), "cruz": ("KRS", "KRS"),
    "ortiz": ("ARTS", "ARTS"), "cagney": ("KKN", "KKN"),
    "gebhart": ("KPRT", "JPRT"), "bough": ("P", "P"),
    "ranger": ("RNJR", "RNKR"), "danger": ("TNJR", "TNKR"),
    "wachowski": ("AKSK", "FKFS"), "czerny": ("SRN", "XRN"),
    "focaccia": ("FKX", "FKX"), "zhivago": ("JFK", "JFK"),
    "jose maria": ("HSMR", "HSMR"), "mcclellan": ("MKLL", "MKLL"),
}


def _q_double_metaphone_keys(spark, sf_dir):
    # DM keys (primary + alternate) -- the union-of-two-keys blocking column
    # a person-name tier explodes on -- over the pinned golden lexicon.
    # Value-checked since r03: the 450-line automaton has no SQL analog, but
    # its expected outputs on the published vectors are hand-derivable, so
    # the oracle is a VALUES table of independently-derived encodings
    # covering every branch corner the frozen corpus exercises.
    from ala_name_matching_spark.functions.double_metaphone import (
        double_metaphone_udf,
    )

    words = spark.createDataFrame(
        [(w,) for w in sorted(_DM_GOLDEN)], "word string"
    )
    return words.select(
        "word", double_metaphone_udf(F.col("word")).alias("dm")
    ).select(
        "word",
        F.col("dm.primary").alias("primary"),
        F.col("dm.alternate").alias("alternate"),
    )


def _q_fuzzy_bm25_topk(spark, sf_dir):
    # Taxamatch-style fuzzy ranked retrieval: BM25 where BOTH sides pass
    # through the treatWord phonetic analyzer (Lucene analyzer-symmetry).
    # Queries are the first 3 tokens of every 25th doc with planted
    # phonetic-class misspellings (e->i, o->a on non-initial chars --
    # exactly the vowel folds treatWord collapses), so the fuzzy lane must
    # rank the source doc while an exact-term search would miss the
    # corrupted terms entirely. Oracle composes the independent DuckDB
    # treat_word chain with the BM25 SQL.
    from ala_name_matching_spark.functions.phonetic import phonetic_tokens_udf
    from ala_name_matching_spark.operators.dedup import tokens_col
    from ala_name_matching_spark.operators.retrieval import bm25_topk

    d = _docs(spark, sf_dir).select("doc_id", "text")
    toks3 = F.slice(tokens_col(F.col("text")), 1, 3)
    corrupted = F.transform(
        toks3,
        lambda w: F.concat(
            w.substr(F.lit(1), F.lit(1)),
            F.translate(w.substr(F.lit(2), F.length(w)), "eo", "ia"),
        ),
    )
    q = d.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(corrupted, " ").alias("qtext"),
    )
    return bm25_topk(d, q, k=5, analyzer=phonetic_tokens_udf)


def _q_frame_schedule(spark, sf_dir):
    # multimodal scheduling lane, metadata-only: media rows synthesized
    # deterministically from doc_id arithmetic (kind cycle, duration from
    # n_chars) so the schedule itself is oracle-checkable; the payload
    # never enters the plan (column pruning keeps binaries on disk).
    from ala_name_matching_spark.operators.multimodal import frame_schedule

    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        (F.col("n_chars") * 7 % 4000).cast("int").alias("duration_ms"),
    )
    return frame_schedule(media, every_ms=200)


def _q_chunk_documents(spark, sf_dir):
    # RAG/pretrain chunker: 32-token windows, stride 24 (overlap 8); the
    # stride grid is extended one step past n-chunk+1 so the tail is
    # always covered, and chunk_idx falls out of the grid arithmetic.
    from ala_name_matching_spark.operators.sampling import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir).select("doc_id", "text"), chunk_tokens=32, stride=24
    )


def _q_event_transitions(spark, sf_dir):
    # First-order Markov transition matrix of the event stream: lead()
    # over (user, ts, event_id) -- deterministic same-timestamp order --
    # then a |types|^2-bounded count + row-normalized probabilities.
    from ala_name_matching_spark.operators.temporal import event_transitions

    return event_transitions(_read(spark, sf_dir, "events"))


def _q_rfm_segments(spark, sf_dir):
    # RFM segmentation over purchases: recency/frequency/monetary
    # quintiles with the perplexity_buckets determinism contract (rank on
    # rounded metric + user_id tie-break, integer bucket boundaries).
    from ala_name_matching_spark.operators.temporal import rfm_segments

    return rfm_segments(_read(spark, sf_dir, "events"))


def _q_funnel_stages(spark, sf_dir):
    # Ordered first-touch funnel view -> click -> purchase: one
    # conditional-min groupBy per stage joined on the user key (no event
    # self-join, no raw-stream window). Strictly-increasing timestamps
    # advance the funnel; same-instant ties do not (pinned rule).
    from ala_name_matching_spark.operators.temporal import funnel_stages

    return funnel_stages(
        _read(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def _q_cohort_retention(spark, sf_dir):
    # Weekly cohort-retention triangle: cohort = ISO week of first event,
    # n_users active at each week offset. Two partial-agg groupBys + one
    # first-seen join.
    from ala_name_matching_spark.operators.temporal import cohort_retention

    return cohort_retention(_read(spark, sf_dir, "events"), max_weeks=12)


def _q_gap_fill(spark, sf_dir):
    # hypertable gap-fill: per-user minute grid with forward-filled values
    from ala_name_matching_spark.operators.temporal import gap_fill

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id") % 200 == 0)
    return gap_fill(ev)


def _q_strip_dup_spans(spark, sf_dir):
    # ExactSubstr-style removal product (Lee et al. 2022): every token
    # covered by a cross-doc duplicated 4-gram is dropped, text rebuilt.
    from ala_name_matching_spark.operators.dedup import strip_dup_spans

    return strip_dup_spans(_docs(spark, sf_dir).select("doc_id", "text"))


def _q_line_dedup(spark, sf_dir):
    # CCNet line-level dedup (Wenzek et al. 2019): remove lines duplicated
    # across >= 2 documents, keeping the first occurrence (min doc, min
    # line index). The fixture is a single-line token stream, so the line
    # unit is the 10-token chunk (unit="tokens") -- the newline unit is
    # exercised on synthesized multi-line docs in tests/test_dedup.py.
    from ala_name_matching_spark.operators.dedup import line_dedup

    return line_dedup(
        _docs(spark, sf_dir).select("doc_id", "text"),
        unit="tokens",
        tokens_per_line=10,
        min_docs=2,
        policy="keep_first",
    )


def _q_winnowing_pairs(spark, sf_dir):
    # MOSS winnowing: planted 25-token quote twins (doc_id + 4000000) must
    # share fingerprints by the w + k - 1 guarantee (25 >= 5 + 4 - 1).
    from ala_name_matching_spark.operators.dedup import (
        tokens_col,
        winnowing_candidate_pairs,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    quotes = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.array_join(F.slice(tokens_col(F.col("text")), 5, 25), " ").alias("text"),
    )
    return winnowing_candidate_pairs(
        d.unionByName(quotes), k=4, w=5, min_shared=3, max_df=50
    )


def _q_skew_salted_join(spark, sf_dir):
    # replicate-and-scatter salted join on a PLANTED hot key (90% of
    # events collapse onto key 0); result must equal the plain join,
    # which is exactly what the oracle computes.
    from ala_name_matching_spark.operators.blocking import salted_join

    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.when(F.col("user_id") % 10 < 9, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("k"),
    )
    dim = ev.select("k").distinct().withColumn(
        "attr", F.concat(F.lit("grp-"), F.col("k").cast("string"))
    )
    joined = salted_join(ev, dim, on="k", row_col="event_id", n_salts=8)
    return joined.groupBy("k", "attr").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    )


def _q_event_pivot(spark, sf_dir):
    # relational pivot: per-user event-type counts as columns. The value
    # list is pinned (Catalyst otherwise runs an extra distinct job to
    # discover it -- never do that at 100 TB); oracle is the conditional-
    # aggregation form pivot desugars to.
    ev = _read(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
    )


def _q_order_cube(spark, sf_dir):
    # OLAP cube: all 4 grouping-set combinations in one pass (Expand, not
    # 4 scans); NULL marks the rolled-up level (status/priority never null
    # in the data, so the marker is unambiguous).
    o = _read(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def _q_table_checksum(spark, sf_dir):
    # anti-entropy primitive: per-returnflag (n_rows, checksum) for the
    # lineitem content columns -- one partial-agg pass, order-insensitive.
    from ala_name_matching_spark.operators.profiling import content_checksum

    li = _read(spark, sf_dir, "lineitem")
    return content_checksum(
        li,
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_shipdate"],
        group_col="l_returnflag",
    )


def _q_hll_distinct_tokens(spark, sf_dir):
    # Deterministic HyperLogLog: per-lang distinct-token estimate next to
    # the exact count. The sketch is engine-replayable (md5-prefix hash,
    # bin()-based rank, integer-summed 2^-M series), so -- rare for an HLL
    # -- the ESTIMATE itself is value-checked against a full SQL replay,
    # not just recall-gated. At 100 TB the register table (<= 2^p rows per
    # group, partial-agg'd) replaces the full-vocabulary distinct shuffle.
    from ala_name_matching_spark.operators.sketches import hll_distinct
    from ala_name_matching_spark.operators.text_analysis import _tokens

    toks = _docs(spark, sf_dir).select(
        "lang", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    est = hll_distinct(toks, "tok", ["lang"], p=10)
    exact = toks.groupBy("lang").agg(F.count_distinct("tok").alias("n_exact"))
    return est.join(exact, "lang").select("lang", "hll_estimate", "n_exact")


def _q_mad_outliers(spark, sf_dir):
    # Robust per-group outlier screen (Hampel identifier): median/MAD
    # flags on order totals per priority class -- the data-quality rule
    # mean/stddev z-scores get dragged off by the very outliers they
    # hunt. Two percentile aggs (inherent two-pass), map-only flags.
    from ala_name_matching_spark.operators.profiling import mad_outliers

    orders = _read(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 10 == 0
    )
    return mad_outliers(
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        "o_totalprice",
        ["o_orderpriority"],
    ).select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        "median",
        "mad",
        "robust_z",
        "is_outlier",
    )


def _q_benford_profile(spark, sf_dir):
    # Benford first-significant-digit forensics on order totals: string
    # arithmetic digit extraction (no float log boundary), 9-row output
    # with expected log10(1 + 1/d) and deviation.
    from ala_name_matching_spark.operators.profiling import benford_profile

    return benford_profile(_read(spark, sf_dir, "orders"), "o_totalprice")


def _q_pricing_summary(spark, sf_dir):
    # TPC-H Q1 shape (pricing summary): the canonical single-pass
    # wide-aggregate scan -- every measure from one partial-agg groupBy
    # over the fact table, no joins. Money sums quantized to cents
    # (order-free); averages derived as quantized-sum / count so they
    # replay exactly.
    # the fixture's shipdates run 1995-01..2001-11 (not TPC-H's 1998
    # horizon), so this cutoff excludes the trailing ~2.5% of rows --
    # the filter is live, matching Q1's shipped-before-cutoff shape
    li = _read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    cents = lambda c: F.round(c * F.lit(100.0)).cast("long")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long"))
        .cast("long")
        .alias("sum_qty"),
        (F.sum(cents(F.col("l_extendedprice"))).cast("double") / 100.0)
        .alias("sum_base_price"),
        (F.sum(cents(disc_price)).cast("double") / 100.0)
        .alias("sum_disc_price"),
        (F.sum(cents(charge)).cast("double") / 100.0).alias("sum_charge"),
        F.count("*").cast("long").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.round(
            F.col("sum_qty").cast("double") / F.col("count_order"), 6
        ).alias("avg_qty"),
        F.round(F.col("sum_base_price") / F.col("count_order"), 6).alias(
            "avg_price"
        ),
        "count_order",
    )


def _q_local_supplier_volume(spark, sf_dir):
    # TPC-H Q5 shape (local supplier volume): the six-table snowflake --
    # region -> nation -> (customer, supplier) -> orders -> lineitem,
    # revenue only where customer and supplier share a nation. All dims
    # broadcast; the two fact joins stay keyed. Quantized-cents revenue.
    r = _read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _read(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = _read(spark, sf_dir, "customer").join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    s = _read(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("_sn")
    )
    o = _read(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _read(spark, sf_dir, "lineitem")
    rev_q = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        * F.lit(100.0)
    ).cast("long")
    joined = (
        li.join(
            F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                c.select("c_custkey", "n_name", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .where(F.col("c_nationkey") == F.col("_sn"))
    )
    return (
        joined.groupBy("n_name")
        .agg((F.sum(rev_q).cast("double") / 100.0).alias("revenue"))
        .select("n_name", "revenue")
    )


def _q_shipping_priority(spark, sf_dir):
    # TPC-H Q3 shape (shipping priority): selective dim filter ->
    # broadcast customer into orders -> keyed lineitem join -> revenue
    # agg -> global top-10 via orderBy().limit(10), which Spark plans as
    # TakeOrderedAndProject (per-partition top-k + driver merge of
    # 10 x partitions rows -- never a single-partition sort of the
    # order-grain aggregate); the 1..10 rank is a window over the BOUNDED
    # 10-row result. Revenue sums integer-quantized cents (the
    # cosine_join order-free contract) so the float agg AND the rank on
    # it replay cross-engine; rank ties break on orderkey.
    from ala_name_matching_spark.operators.blocking import bounded_topk_ranked

    cutoff = "1998-06-01"
    cust = _read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _read(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = _read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    rev_q = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        * F.lit(100.0)
    ).cast("long")
    joined = (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust.select("c_custkey")),
                    orders["o_custkey"] == F.col("c_custkey"),
                ).select("o_orderkey", "o_orderdate", "o_orderpriority")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_q).cast("double") / F.lit(100.0)).alias("revenue"))
    )
    return bounded_topk_ranked(
        joined,
        [F.col("revenue").desc(), F.col("l_orderkey").asc()],
        10,
        rank_col="rk",
    ).select(
        "l_orderkey",
        "o_orderdate",
        "o_orderpriority",
        "revenue",
        F.col("rk").cast("int").alias("rk"),
    )


def _icws_tf(spark, sf_dir):
    """Sampled-doc tf table shared by the two ICWS queries -- ONE
    definition so the LSH lane provably runs over the same weighted sets
    as the estimate lane."""
    from ala_name_matching_spark.operators.text_analysis import _tokens

    docs = _docs(spark, sf_dir).where(F.col("doc_id") % 50 == 0)
    return (
        docs.select(
            "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
        )
        .where(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=True)
    )


def _q_icws_weighted_jaccard(spark, sf_dir):
    # ICWS weighted MinHash (Ioffe 2010): slot-collision estimates of
    # WEIGHTED Jaccard over tf vectors -- the overlap notion plain
    # MinHash (set Jaccard) cannot express -- next to the exact
    # sum(min)/sum(max), per sampled doc pair. Deterministic gamma draws
    # from salted md5 uniforms, so signatures AND estimates replay.
    from ala_name_matching_spark.operators.sketches import (
        icws_pair_estimates,
        icws_signatures,
    )

    k = 32
    tf = _icws_tf(spark, sf_dir)
    sigs = icws_signatures(tf, k=k)
    est = icws_pair_estimates(sigs, k)
    ta = tf.select(
        F.col("doc_id").alias("id_a"), "term", F.col("w").alias("_wa")
    )
    tb = tf.select(
        F.col("doc_id").alias("id_b"), "term", F.col("w").alias("_wb")
    )
    inter = (
        ta.join(tb, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("_wa", "_wb")).cast("long").alias("_smin"))
    )
    tot = tf.groupBy("doc_id").agg(F.sum("w").cast("long").alias("_tot"))
    return (
        est.join(inter, ["id_a", "id_b"], "left")
        .join(tot.select(F.col("doc_id").alias("id_a"), F.col("_tot").alias("_ta")), "id_a")
        .join(tot.select(F.col("doc_id").alias("id_b"), F.col("_tot").alias("_tb")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_match",
            "est_wjaccard",
            F.round(
                F.coalesce(F.col("_smin"), F.lit(0)).cast("double")
                / (
                    F.col("_ta") + F.col("_tb")
                    - F.coalesce(F.col("_smin"), F.lit(0))
                ).cast("double"),
                6,
            ).alias("exact_wjaccard"),
        )
    )


def _q_icws_lsh_candidates(spark, sf_dir):
    # Weighted-Jaccard LSH: band the ICWS signatures (8 bands x 4 slots)
    # for candidate pairs whose tf vectors overlap heavily -- the
    # weighted analog of MinHash-LSH, no all-pairs product. Same sampled
    # docs as icws_weighted_jaccard so recall against the exact WJ table
    # is inspectable.
    from ala_name_matching_spark.operators.sketches import (
        icws_lsh_candidates,
    )

    return icws_lsh_candidates(_icws_tf(spark, sf_dir), k=32, n_bands=8)


def _q_kmv_containment(spark, sf_dir):
    # Asymmetric overlap from the same theta sketches: containment(A,B) =
    # |A n B| / |A| -- the differently-sized-slices question Jaccard
    # blurs (a small slice inside a huge one: Jaccard ~0, containment 1).
    # Estimates next to exact values, all from k-row tables.
    from ala_name_matching_spark.operators.sketches import (
        kmv_containment,
        kmv_sketch_table,
    )
    from ala_name_matching_spark.operators.text_analysis import _tokens

    toks = _docs(spark, sf_dir).select(
        "lang", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    sk = kmv_sketch_table(toks, "tok", ["lang"], k=64)
    cont = kmv_containment(sk, "lang", k=64)
    d = (
        toks.where(F.col("tok").isNotNull())
        .select("lang", "tok")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = d.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    xi = (
        d.alias("a")
        .join(d.alias("b"), "tok")
        .where(F.col("a.lang") < F.col("b.lang"))
        .groupBy(F.col("a.lang").alias("g_a"), F.col("b.lang").alias("g_b"))
        .agg(F.count("*").cast("long").alias("_xi"))
    )
    return (
        cont.join(n.select(F.col("lang").alias("g_a"), F.col("n").alias("_na")), "g_a")
        .join(n.select(F.col("lang").alias("g_b"), F.col("n").alias("_nb")), "g_b")
        .join(xi, ["g_a", "g_b"], "left")
        .select(
            "g_a",
            "g_b",
            "est_containment_a",
            "est_containment_b",
            F.round(
                F.coalesce(F.col("_xi"), F.lit(0)).cast("double")
                / F.col("_na").cast("double"),
                6,
            ).alias("exact_containment_a"),
            F.round(
                F.coalesce(F.col("_xi"), F.lit(0)).cast("double")
                / F.col("_nb").cast("double"),
                6,
            ).alias("exact_containment_b"),
        )
    )


def _q_cosine_join_pairs(spark, sf_dir):
    # Exact all-pairs TF-IDF cosine join (Bayardo 2007 family) at 0.85:
    # the weighted-overlap similarity the Jaccard set-join cannot express
    # (a rare shared term outweighs many common ones). Float sums are
    # integer-quantized (round(x*SCALE) -> BIGINT) so the keep/drop
    # decision and the score replay across engines despite IEEE
    # aggregation-order freedom -- see operators/cosine_join.py.
    # Deterministic quarter of the corpus (gap_fill precedent): the
    # synthetic fixture's ~200-word vocabulary makes EVERY doc pair share
    # terms, so exact all-pairs degenerates to sum(df^2) ~ N^2 candidate
    # rows regardless of algorithm -- a fixture pathology, not an
    # operator property (Zipfian corpora prune via idf + max_df).
    from ala_name_matching_spark.operators.cosine_join import (
        tfidf_cosine_join,
    )

    docs = _docs(spark, sf_dir).where(F.col("doc_id") % 4 == 0)
    return tfidf_cosine_join(
        docs.select("doc_id", "text"), threshold=0.85
    )


def _q_drift_psi_bins(spark, sf_dir):
    # Slice-drift monitoring: per-bin PSI + Jensen-Shannon terms of the
    # n_chars distribution, English slice vs the rest. Integer-arithmetic
    # equal-width bins over the combined range, additive smoothing, zero
    # bins materialized via a spine -- every term replays cross-engine.
    # Totals are a bounded driver fold (drift_totals), per the FS/
    # Misra-Gries bounded-summary discipline.
    from ala_name_matching_spark.operators.profiling import (
        distribution_drift,
    )

    return distribution_drift(
        _docs(spark, sf_dir), "n_chars", "lang", "en", n_bins=10
    )


def _q_perplexity_buckets(spark, sf_dir):
    # CCNet head/middle/tail (Wenzek 2019): per-language quality tertiles
    # under the corpus's own unigram LM. Ranking keys on the 6-dp ROUNDED
    # score + doc_id tie-break and buckets are integer arithmetic, so the
    # boundaries replay cross-engine. Completes the CCNet pipeline story:
    # line_dedup -> lang_id -> perplexity bucketing.
    from ala_name_matching_spark.operators.text_analysis import (
        perplexity_buckets,
    )

    return perplexity_buckets(_docs(spark, sf_dir), n_buckets=3)


def _q_kmv_overlap(spark, sf_dir):
    # Theta-sketch set algebra: per-language-pair vocabulary union /
    # intersection / Jaccard ESTIMATES from k=64-row KMV sketches, next to
    # the exact values. Like the HLL lane, the deterministic md5-prefix
    # hash makes the estimates themselves oracle-checkable -- and unlike
    # HLL, KMV supports intersection (rho * U), the cross-slice overlap
    # question a mixture-planning run asks of every slice pair at 100 TB
    # without shuffling any vocabulary twice.
    from ala_name_matching_spark.operators.sketches import (
        kmv_pair_overlap,
        kmv_sketch_table,
    )
    from ala_name_matching_spark.operators.text_analysis import _tokens

    toks = _docs(spark, sf_dir).select(
        "lang", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    sk = kmv_sketch_table(toks, "tok", ["lang"], k=64)
    ov = kmv_pair_overlap(sk, "lang", k=64)
    # exact lane (exists only to exhibit estimator quality next to the
    # estimates): the distinct vocabulary feeds both the per-lang counts
    # and the intersection join -- materialize it once
    d = (
        toks.where(F.col("tok").isNotNull())
        .select("lang", "tok")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = d.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    xi = (
        d.alias("a")
        .join(d.alias("b"), "tok")
        .where(F.col("a.lang") < F.col("b.lang"))
        .groupBy(
            F.col("a.lang").alias("g_a"), F.col("b.lang").alias("g_b")
        )
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    return (
        ov.join(n.select(F.col("lang").alias("g_a"), F.col("n").alias("_na")), "g_a")
        .join(n.select(F.col("lang").alias("g_b"), F.col("n").alias("_nb")), "g_b")
        .join(xi, ["g_a", "g_b"], "left")
        .select(
            "g_a",
            "g_b",
            "est_union",
            "est_inter",
            "est_jaccard",
            (F.col("_na") + F.col("_nb")
             - F.coalesce(F.col("exact_inter"), F.lit(0))
             ).cast("long").alias("exact_union"),
            F.coalesce(F.col("exact_inter"), F.lit(0)).cast("long").alias(
                "exact_inter"
            ),
        )
    )


def _q_bloom_prefilter_join(spark, sf_dir):
    # Bloom-prefiltered join accounting: orders (fact) against the selective
    # high-balance BUILDING customers (dim). The m-bit filter is built with
    # one partial-agg'd bit_or groupBy (<= m/64 rows collected), broadcast
    # as a literal, and applied BEFORE any exchange on the fact side --
    # Spark's own runtime bloom pushdown shape, here deterministic (md5
    # positions) so the whole pass/match/false-positive ledger replays in
    # SQL. No true match is lost (tested); false positives at this sizing
    # are ~0.1%.
    from ala_name_matching_spark.operators.bloom import bloom_join_stats

    orders = _read(spark, sf_dir, "orders")
    dim = _read(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    )
    return bloom_join_stats(
        orders, dim, "o_custkey", "c_custkey", m_bits=1 << 16, k=3
    )


def _q_quantile_profile_chars(spark, sf_dir):
    # Exact per-lang quantile ladder of n_chars via Spark's percentile
    # (PERCENTILE_CONT interpolation, the definition DuckDB's quantile_cont
    # shares): (lang, q, value) rows -- the profiling companion to
    # length_stats_by_lang with a full quantile grid.
    from ala_name_matching_spark.operators.profiling import quantile_profile

    return quantile_profile(_docs(spark, sf_dir), "n_chars", ["lang"])


def _q_setsim_join(spark, sf_dir):
    # Prefix-filtered set-similarity self-join (AllPairs/PPJoin,
    # Bayardo 2007 / Xiao 2008): every doc pair with 3-gram-shingle
    # Jaccard >= 0.6, computed WITHOUT the all-pairs product -- candidates
    # come from an equi-join on each set's rarest-token prefix, which is
    # provably lossless at the threshold, so the sub-quadratic engine
    # output EQUALS the brute-force truth set (the oracle below).
    from ala_name_matching_spark.operators.set_join import similarity_join

    return similarity_join(
        _docs(spark, sf_dir), threshold=0.6, shingle_n=3
    )


def _q_ed_join_pairs(spark, sf_dir):
    # Exact threshold edit-distance self-join (Gravano 2001 q-gram
    # count/position filters + Xiao 2008 Ed-Join rarest-first prefix
    # index): every doc pair with levenshtein <= 4, WITHOUT the all-pairs
    # product. All filters are lossless, so the sub-quadratic engine
    # output EQUALS the brute-force length-filtered truth set (the
    # oracle). The edit-distance complement of setsim_join_pairs.
    from ala_name_matching_spark.operators.ed_join import edit_similarity_join

    return edit_similarity_join(
        _docs(spark, sf_dir), id_col="doc_id", str_col="text", d=4, q=3
    ).select(
        F.col("id_l").alias("doc_id_l"),
        F.col("id_r").alias("doc_id_r"),
        F.col("dist").cast("long").alias("dist"),
    )


_BLOCKLIST = ["slow", "hash join", "broken pipeline"]


def _q_bigram_logprob(spark, sf_dir):
    # Interpolated bigram LM scoring (the CCNet perplexity-filter shape,
    # n=2 with Jelinek-Mercer mixing against the unigram back-off):
    # per-doc mean ln(lam*p_bi + (1-lam)*p_uni) over adjacent pairs.
    from ala_name_matching_spark.operators.text_analysis import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir), lam=0.7)


def _q_zorder_key_orders(spark, sf_dir):
    # Z-order (Morton) key over (o_custkey, o_orderkey) -- the
    # multi-dimension data-skipping layout key (Delta/Iceberg OPTIMIZE
    # ZORDER BY). All-integer grid mapping + bit interleave, so the key
    # replays bit-for-bit in SQL; write_zordered uses it to give every
    # parquet file a tight min-max envelope on EVERY dimension.
    from ala_name_matching_spark.sources.zorder import zorder_key

    o = _read(spark, sf_dir, "orders")
    key, _ = zorder_key(o, ["o_custkey", "o_orderkey"], bits=8)
    return o.select("o_orderkey", key.alias("zkey"))


def _q_symspell_lookup(spark, sf_dir):
    # SymSpell symmetric-delete fuzzy lookup (the reference's
    # dictionary-lookup shape made O(1)-per-query): dictionary = corpus
    # word vocabulary, queries = the deterministic md5-prefix 1/16 sample
    # of it; all dictionary words within edit distance 2 of each query,
    # exact (shared-delete-variant equi-join + banded verify).
    from ala_name_matching_spark.operators.bpe import word_counts
    from ala_name_matching_spark.operators.symspell import symspell_lookup

    vocab = word_counts(_docs(spark, sf_dir), min_count=1).select(
        F.col("w").alias("term")
    )
    d = vocab.select(F.col("term").alias("dict_id"), "term")
    q = vocab.where(
        F.substring(F.md5("term"), 1, 1) == "0"
    ).select(F.col("term").alias("query_id"), "term")
    return symspell_lookup(d, q, d=2).select(
        "query_term", "dict_term", F.col("dist").cast("long").alias("dist")
    )


def _q_hdr_quantile_chars(spark, sf_dir):
    # HdrHistogram-style mergeable quantile sketch: all-integer bucketing
    # (bit-length exponent + 5-bit linear sub-buckets -- no libm in
    # bucket assignment, unlike DDSketch's log-gamma), so the sketch AND
    # its inverse-CDF estimates replay bit-for-bit in SQL. The bounded
    # counter table replaces the per-group sort exact percentiles need.
    from ala_name_matching_spark.operators.sketches import (
        hdr_histogram,
        hdr_quantiles,
    )

    h = hdr_histogram(
        _docs(spark, sf_dir), "n_chars", group_cols=["lang"], sub_bits=5
    )
    return hdr_quantiles(h, [0.5, 0.9, 0.99], group_cols=["lang"]).select(
        "lang", "q", "est", F.col("n").cast("long").alias("n")
    )


def _q_blocklist_filter(spark, sf_dir):
    # C4-style word-boundary blocklist gate (Raffel et al. 2020): docs
    # exploded into word n-grams only for the n values in the (tiny,
    # broadcast) phrase list; multi-word phrases anchor exactly, no
    # cross-boundary substring false positives.
    from ala_name_matching_spark.operators.text_analysis import blocklist_hits

    return blocklist_hits(_docs(spark, sf_dir), _BLOCKLIST).select(
        F.col("id").alias("doc_id"), "n_hits", "flagged"
    )


def _q_quality_lr_weights(spark, sf_dir):
    # Distributed quality-classifier training (the CCNet/GPT-3 linear
    # filter shape): hashed-TF logistic regression, 3 full-batch GD
    # iterations, per-iteration 6-dp weight rounding -- the Lloyd/EM/BPE
    # bounded-statistic trajectory, fully replayed by the unrolled oracle.
    # Labels: lang == 'en' (the same proxy target as dsir_selection).
    from ala_name_matching_spark.operators.logreg import tf_features, train_logreg

    d = _docs(spark, sf_dir)
    feats = tf_features(d, n_buckets=256)
    labels = d.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    return train_logreg(feats, labels, iters=3, lr=0.5)


def _q_dsir_selection(spark, sf_dir):
    # DSIR data selection (Xie et al. 2023): hashed-unigram importance
    # weights log p_target/p_source per doc (target = the English slice),
    # deterministic top-quota selection (md5 tie-break) standing in for
    # the paper's Gumbel draw -- replayable end to end. Both LMs are
    # 1024-bucket count vectors: bounded statistics at any corpus size.
    from ala_name_matching_spark.operators.dsir import (
        importance_weights,
        select_top_quota,
    )

    d = _docs(spark, sf_dir)
    w = importance_weights(
        d, d.where(F.col("lang") == "en"), n_buckets=1024, alpha=1.0
    )
    return select_top_quota(w, quota=100).select(
        F.col("id").alias("doc_id"), "log_weight", "selected"
    )


def _q_pprl_dice_pairs(spark, sf_dir):
    # Privacy-preserving linkage (Schnell et al. 2009): records encoded as
    # Bloom-filter bigram bit sets (map-only, md5 positions), compared via
    # the Dice coefficient within the standard blocking key. The bit set
    # is carried as the sorted position array, so every pair's
    # (inter, dice) replays bit-for-bit in DuckDB list ops.
    from ala_name_matching_spark.operators.pprl import bloom_encode, dice_pairs

    d = _docs(spark, sf_dir)
    enc = bloom_encode(d, "doc_id", "text", m_bits=4096, k=2).join(
        d.select(F.col("doc_id").alias("id"), _block_key_col().alias("bk")),
        "id",
    )
    return dice_pairs(enc, "bk", threshold=0.9).select(
        F.col("id_l").alias("doc_id_l"),
        F.col("id_r").alias("doc_id_r"),
        "inter",
        "dice",
    )


def _q_bpe_pair_counts(spark, sf_dir):
    # BPE training's sufficient statistic (Sennrich 2016): the weighted
    # adjacent-symbol-pair histogram over the word VOCABULARY (one corpus
    # scan, then corpus-size-independent work). Iteration-1 counts =
    # char pairs; the full merge trajectory is bpe_merges below.
    from ala_name_matching_spark.operators.bpe import (
        encode_symbols,
        pair_counts,
        word_counts,
    )

    pc = pair_counts(
        encode_symbols(word_counts(_docs(spark, sf_dir), min_count=2))
    )
    return pc.select(
        F.col("left").alias("left_sym"),
        F.col("right").alias("right_sym"),
        F.col("cnt").cast("long").alias("pair_count"),
    )


def _q_bpe_merges(spark, sf_dir):
    # Three full BPE iterations (count -> argmax -> left-to-right
    # non-overlapping merge): the double-delimiter literal-replace
    # encoding makes every iteration's rewrite bit-identical across
    # Spark/DuckDB/Python, so the WHOLE trajectory is SQL-replayable
    # (the unrolled-Lloyd/EM oracle construction applied to BPE).
    from ala_name_matching_spark.operators.bpe import learn_merges, word_counts

    mt, _ = learn_merges(word_counts(_docs(spark, sf_dir), min_count=2), 3)
    return mt.select(
        F.col("step").cast("long").alias("step"),
        F.col("left").alias("left_sym"),
        F.col("right").alias("right_sym"),
        F.col("cnt").cast("long").alias("pair_count"),
    )


def _q_bpe_tokenize(spark, sf_dir):
    # The APPLY side of the tokenizer: learn 3 merges on the vocabulary,
    # then segment EVERY document (map-only literal-replace chain, no
    # OOV -- unmerged symbols stay characters). Output: per-doc word and
    # BPE-token counts.
    from ala_name_matching_spark.operators.bpe import (
        learn_merges,
        tokenize_with_merges,
        word_counts,
    )

    d = _docs(spark, sf_dir)
    mt, _ = learn_merges(word_counts(d, min_count=2), 3)
    merges = [(r.left, r.right) for r in mt.orderBy("step").collect()]
    return tokenize_with_merges(d, merges).select(
        F.col("id").alias("doc_id"),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )


def _q_cm_token_counts(spark, sf_dir):
    # Count-Min sketch (Cormode & Muthukrishnan 2005) point-frequency
    # estimates next to exact counts. Deterministic md5-row hashing makes
    # the whole d x w grid AND every estimate replay bit-for-bit in SQL;
    # estimates are one-sided (cm >= exact, asserted in tests). At 100 TB
    # the d*w-row grid replaces the full-vocabulary groupBy for point
    # queries; the exact lane here exists to expose the overcount delta.
    from ala_name_matching_spark.operators.dedup import tokens_col
    from ala_name_matching_spark.operators.sketches import (
        cm_estimate,
        cm_sketch_table,
    )

    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    grid = cm_sketch_table(toks, "tok", d=3, w=1024)
    probes = toks.where(F.col("doc_id") % 97 == 0).select("tok")
    est = cm_estimate(grid, probes, "tok", d=3, w=1024)
    exact = toks.groupBy(F.col("tok").alias("item")).agg(
        F.count("*").alias("n_exact")
    )
    return est.join(exact, "item", "left").select(
        "item",
        F.col("cm_estimate").cast("long").alias("cm_estimate"),
        F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
    )


def _conv_turns(spark, sf_dir):
    """Deterministic conversation table with PLANTED conversation-level
    duplicates, derived from `documents` (SQL-replayable on both engines).

    Base conversations d{k} hold docs 10k..10k+9 as turns. Every 5th
    conversation gains a near-dup repost v{k} (last three turns edited:
    Jaccard 7/13 vs d{k}); every 7th gains a re-scrape r{k} (its first five
    turns verbatim: a strict turn-prefix of d{k}). The fixture's documents
    are all unique, so these plants ARE the conversation-level dup signal
    -- and their expected pair inventory is known analytically (tested).
    """
    base = _docs(spark, sf_dir).select(
        (F.col("doc_id") / 10).cast("long").alias("k"),
        F.pmod(F.col("doc_id"), F.lit(10)).cast("int").alias("turn_idx"),
        "text",
    )
    d = base.select(
        F.concat(F.lit("d"), F.col("k").cast("string")).alias("conv_id"),
        "turn_idx",
        "text",
    )
    v = base.where(F.col("k") % 5 == 0).select(
        F.concat(F.lit("v"), F.col("k").cast("string")).alias("conv_id"),
        "turn_idx",
        F.when(
            F.col("turn_idx") >= 7, F.concat(F.col("text"), F.lit(" [edited]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    r = base.where((F.col("k") % 7 == 0) & (F.col("turn_idx") < 5)).select(
        F.concat(F.lit("r"), F.col("k").cast("string")).alias("conv_id"),
        "turn_idx",
        "text",
    )
    return d.unionByName(v).unionByName(r)


def _q_conv_neardup_pairs(spark, sf_dir):
    # Conversation-grain near-dup (reposts with edits): threshold Jaccard
    # over distinct turn-fingerprint sets, candidates generated by the
    # shared-fingerprint inverted-index join -- exact and linear, no
    # conv x conv product. The transcripts-axis lift of ngram_jaccard_pairs.
    from ala_name_matching_spark.operators.conversations import (
        conv_neardup_pairs,
    )

    return conv_neardup_pairs(_conv_turns(spark, sf_dir), threshold=0.5)


def _q_conv_prefix_rescrape(spark, sf_dir):
    # Re-scrape chain detection: conversation A's ENTIRE ordered turn
    # sequence == the first |A| turns of conversation B, via rolling prefix
    # hashes (one md5 per prefix, sum(len) rows total) and a hash equi-join.
    from ala_name_matching_spark.operators.conversations import (
        conv_prefix_pairs,
    )

    return conv_prefix_pairs(_conv_turns(spark, sf_dir))


def _q_conv_dup_profile(spark, sf_dir):
    # Per-conversation boilerplate ledger: fraction of distinct turns whose
    # content also appears in >= 1 other conversation (fp-df groupBy + join
    # back; the copypasta/canned-response signal).
    from ala_name_matching_spark.operators.conversations import (
        conv_dup_turn_profile,
    )

    return conv_dup_turn_profile(_conv_turns(spark, sf_dir))


def _conv_gold_pairs(spark, sf_dir):
    """The planted conversation-pair gold set, derived analytically from the
    k % 5 / k % 7 plant schedule of _conv_turns (documents are unique, so
    the plants are the complete truth set)."""
    ks = (
        _docs(spark, sf_dir)
        .select((F.col("doc_id") / 10).cast("long").alias("k"))
        .distinct()
    )

    def pair(pl, pr, mod):
        return ks.where(F.col("k") % mod == 0).select(
            F.concat(F.lit(pl), F.col("k").cast("string")).alias("conv_l"),
            F.concat(F.lit(pr), F.col("k").cast("string")).alias("conv_r"),
        )

    return (
        pair("d", "v", 5)
        .unionByName(pair("d", "r", 7))
        .unionByName(pair("r", "v", 35))
    )


def _q_er_pair_quality(spark, sf_dir):
    # Distributed pairwise precision/recall/F1 (Christen 2012) of the
    # conversation near-dup detector at threshold 0.52 against the planted
    # gold: reposts (J=7/13~0.538) clear the bar, re-scrapes (J=0.5) fall
    # under it -- precision 1.0, recall 0.5, a non-degenerate scorecard
    # both engines must reproduce exactly.
    from ala_name_matching_spark.operators.conversations import (
        conv_neardup_pairs,
    )
    from ala_name_matching_spark.operators.er_metrics import pair_quality

    pred = conv_neardup_pairs(_conv_turns(spark, sf_dir), threshold=0.52)
    return pair_quality(pred, _conv_gold_pairs(spark, sf_dir))


def _q_er_blocking_quality(spark, sf_dir):
    # Blocking scorecard (reduction ratio / pairs completeness) for the
    # shared-turn-fingerprint inverted index over conversations: candidate
    # budget = sum s*(s-1)/2 over block sizes (one groupBy, pairs never
    # materialized -- the only affordable form at 10^12 records); coverage
    # joins the gold pairs through block membership.
    from ala_name_matching_spark.operators.conversations import (
        conv_fingerprints,
    )
    from ala_name_matching_spark.operators.er_metrics import blocking_quality

    turns = _conv_turns(spark, sf_dir)
    blocks = conv_fingerprints(turns).select(
        F.col("fp").alias("block_id"), F.col("conv_id").alias("record_id")
    )
    return blocking_quality(
        blocks,
        _conv_gold_pairs(spark, sf_dir),
        records=turns.select(F.col("conv_id").alias("record_id")),
        gold_cols=("conv_l", "conv_r"),
    )


def _q_snm_pairs(spark, sf_dir):
    # Sorted-neighborhood blocking (Hernandez & Stolfo 1995): candidate
    # pairs within a 5-position window of the lower(trim(text)) sort
    # order. Global ranks come from the distributed range-partition +
    # local-window + offset-table construction (never a single-partition
    # global window); pairing is the div-w bucket trick -- linear pair
    # budget, immune to key skew.
    from ala_name_matching_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", F.lower(F.trim("text")).alias("snm_key")
    )
    return sorted_neighborhood_pairs(d, "snm_key", "doc_id", window=5)


_FS_ITERS = 4


def _q_fs_match_weights(spark, sf_dir):
    # Fellegi-Sunter probabilistic linkage (Fellegi & Sunter 1969; EM per
    # Winkler 1988). Pair universe = blocked candidates UNION a
    # deterministic non-match sample (doc_id+257 pairing -- the labeled-
    # free "random pairs" u-estimation trick); 3 binary agreement fields
    # (token-jaccard>=0.5 as an integer cross-multiply, levenshtein<=20,
    # length-within-10%). m/u probabilities are fitted by 4 EM iterations
    # on the <=2^3-row agreement-pattern histogram (the bounded sufficient
    # statistic -- the whole fit costs one groupBy at any corpus size).
    # Output: per-pattern match weight log2(P(gamma|M)/P(gamma|U)) and
    # posterior P(M|gamma). The oracle replays the identical IEEE-double
    # EM trajectory as unrolled CTEs.
    from ala_name_matching_spark.operators.linkage import fellegi_sunter_weights

    d = _docs(spark, sf_dir).select(
        _block_key_col().alias("bk"),
        "doc_id",
        "text",
        "n_chars",
        F.array_distinct(F.split(F.lower("text"), " ")).alias("toks"),
    )
    sides = {}
    for side in ("l", "r"):
        sides[side] = d.select(
            F.col("bk"),
            F.col("doc_id").alias(f"doc_id_{side}"),
            F.col("text").alias(f"text_{side}"),
            F.col("n_chars").alias(f"n_chars_{side}"),
            F.col("toks").alias(f"toks_{side}"),
        )
    l, r = sides["l"], sides["r"]
    blocked = _spread(
        l.join(r, "bk").filter(F.col("doc_id_l") < F.col("doc_id_r"))
    )
    shifted = _spread(
        l.drop("bk").join(
            r.drop("bk"), F.col("doc_id_l") + F.lit(257) == F.col("doc_id_r")
        )
    )
    gamma = [
        (
            F.size(F.array_intersect("toks_l", "toks_r")) * 2
            >= F.size(F.array_union("toks_l", "toks_r"))
        )
        .cast("int")
        .alias("g_jacc"),
        # banded DP: threshold arg caps the edit-distance computation at
        # O(len*20) instead of O(len^2) (returns -1 past the band -- the
        # <=20 decision is bit-identical, measured 11 s -> ~2 s at sf0.1)
        (F.levenshtein("text_l", "text_r", 20) >= 0).cast("int").alias("g_lev"),
        (
            F.abs(F.col("n_chars_l") - F.col("n_chars_r")) * 10
            <= F.greatest("n_chars_l", "n_chars_r")
        )
        .cast("int")
        .alias("g_len"),
    ]
    pairs = blocked.select(*gamma).unionByName(shifted.select(*gamma))
    return fellegi_sunter_weights(
        pairs, ["g_jacc", "g_lev", "g_len"], iters=_FS_ITERS
    )


def _fs_ml_pairs(spark, sf_dir):
    # Multi-level (Splink-style) Fellegi-Sunter pair universe: the same
    # blocked + shifted-257 construction as fs_match_weights, but each
    # comparison grades into 3 levels (exact-ish / close / other)
    # instead of one bit. Graded levels separate "one typo apart" from
    # "different text" -- the distinction the binary gamma blurs.
    # Consumed by fs_multilevel_weights (per-pattern weights) and
    # fs_level_weights (the fitted model table); both fit EM on the
    # <= 27-row mixed-radix histogram, oracle = unrolled-CTE EM replay.
    d = _docs(spark, sf_dir).select(
        _block_key_col().alias("bk"),
        "doc_id",
        "text",
        "n_chars",
        F.array_distinct(F.split(F.lower("text"), " ")).alias("toks"),
    )
    sides = {}
    for side in ("l", "r"):
        sides[side] = d.select(
            F.col("bk"),
            F.col("doc_id").alias(f"doc_id_{side}"),
            F.col("text").alias(f"text_{side}"),
            F.col("n_chars").alias(f"n_chars_{side}"),
            F.col("toks").alias(f"toks_{side}"),
        )
    l, r = sides["l"], sides["r"]
    blocked = _spread(
        l.join(r, "bk").filter(F.col("doc_id_l") < F.col("doc_id_r"))
    )
    shifted = _spread(
        l.drop("bk").join(
            r.drop("bk"), F.col("doc_id_l") + F.lit(257) == F.col("doc_id_r")
        )
    )
    inter = F.size(F.array_intersect("toks_l", "toks_r"))
    union = F.size(F.array_union("toks_l", "toks_r"))
    lev = F.levenshtein("text_l", "text_r", 30)
    dlen = F.abs(F.col("n_chars_l") - F.col("n_chars_r"))
    mlen = F.greatest("n_chars_l", "n_chars_r")
    gamma = [
        F.when(inter * 2 >= union, F.lit(2))
        .when(inter * 4 >= union, F.lit(1))
        .otherwise(F.lit(0))
        .alias("g_jacc"),
        F.when((lev >= 0) & (lev <= 10), F.lit(2))
        .when(lev >= 0, F.lit(1))
        .otherwise(F.lit(0))
        .alias("g_lev"),
        F.when(dlen * 10 <= mlen, F.lit(2))
        .when(dlen * 10 <= mlen * 3, F.lit(1))
        .otherwise(F.lit(0))
        .alias("g_len"),
    ]
    ids = [F.col("doc_id_l"), F.col("doc_id_r")]
    return blocked.select(*ids, *gamma).unionByName(
        shifted.select(*ids, *gamma)
    )


def _q_fs_multilevel_weights(spark, sf_dir):
    from ala_name_matching_spark.operators.linkage import (
        fellegi_sunter_multilevel_weights,
    )

    return fellegi_sunter_multilevel_weights(
        _fs_ml_pairs(spark, sf_dir),
        ["g_jacc", "g_lev", "g_len"],
        levels=[3, 3, 3],
        iters=_FS_ITERS,
    )


def _q_uncertain_pairs(spark, sf_dir):
    # Active-learning pair selection (the dedupe.io loop): candidate pairs
    # whose fitted multilevel-FS posterior sits in the uncertain band
    # (0.05, 0.95) -- exactly the pairs a human labeler should see next,
    # because labels there move the model most. The per-pattern posterior
    # broadcast-joins back onto the pair table on the gamma levels; no
    # per-pair model evaluation.
    from ala_name_matching_spark.operators.linkage import (
        fellegi_sunter_multilevel_weights,
    )

    feats = ["g_jacc", "g_lev", "g_len"]
    # the gamma pair table feeds the histogram collect AND the posterior
    # join -- persist it or the levenshtein comparator runs twice
    pairs = _fs_ml_pairs(spark, sf_dir)
    pairs.persist()
    try:
        w = fellegi_sunter_multilevel_weights(
            pairs, feats, levels=[3, 3, 3], iters=_FS_ITERS
        )
        return (
            pairs.join(F.broadcast(w.select(*feats, "posterior")), feats)
            .where((F.col("posterior") > 0.05) & (F.col("posterior") < 0.95))
            .select("doc_id_l", "doc_id_r", *feats, "posterior")
            .localCheckpoint(eager=True)
        )
    finally:
        pairs.unpersist()


def _q_fs_level_weights(spark, sf_dir):
    # The fitted multi-level FS MODEL itself, one row per (field, level):
    # P(level|M), P(level|U) and the log2 Bayes-factor that level
    # contributes -- the Splink "comparison level weights" model-QA
    # table. Same EM fit as fs_multilevel_weights; near-zero level
    # weights flag levels worth merging, non-monotone weights flag a
    # mis-specified comparison.
    from ala_name_matching_spark.operators.linkage import (
        fellegi_sunter_level_weights,
    )

    return fellegi_sunter_level_weights(
        _fs_ml_pairs(spark, sf_dir),
        ["g_jacc", "g_lev", "g_len"],
        levels=[3, 3, 3],
        iters=_FS_ITERS,
    )


def _multikey_assignments(spark, sf_dir):
    """(record_id, block_id) under THREE blocking keys (word-pair,
    concat-alpha prefix, first-token prefix) -- shared by the
    meta-blocking and block-histogram queries."""
    d = _docs(spark, sf_dir)
    keys = [
        F.concat(
            F.lit("w|"),
            F.lower(F.split_part(F.col("text"), F.lit(" "), F.lit(1))),
            F.lit("|"),
            F.lower(F.split_part(F.col("text"), F.lit(" "), F.lit(2))),
        ),
        F.concat(
            F.lit("c|"),
            F.substring(
                F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")),
                1,
                12,
            ),
        ),
        F.concat(
            F.lit("p|"),
            F.substring(
                F.lower(F.split_part(F.col("text"), F.lit(" "), F.lit(1))),
                1,
                4,
            ),
        ),
    ]
    return d.select(
        F.col("doc_id").alias("record_id"),
        F.explode(F.array(*keys)).alias("block_id"),
    )


def _q_tf_adjusted_weights(spark, sf_dir):
    # Winkler 1989 / Splink-style term-frequency adjustment: per-value
    # agreement weights from exact BIGINT frequency statistics (rare-value
    # agreement outweighs "Smith"-grade agreement). Field = first token of
    # the lowercased text -- a skewed name-like distribution.
    from ala_name_matching_spark.operators.linkage import tf_adjusted_weights

    d = _docs(spark, sf_dir).select(
        F.split(F.lower(F.col("text")), " ").getItem(0).alias("first_tok")
    )
    return tf_adjusted_weights(d, "first_tok")


def _q_meta_blocking_prune(spark, sf_dir):
    # Meta-blocking (Papadakis et al., TKDE 2014): records carry THREE
    # blocking keys; candidate edges are CBS-weighted by shared-block count
    # and pruned node-centrically (weight >= mean weight of either endpoint,
    # integer cross-multiplied -- exact). The published pre-comparator cut.
    from ala_name_matching_spark.operators.meta_blocking import (
        meta_blocking_prune,
    )

    assignments = _multikey_assignments(spark, sf_dir)
    return meta_blocking_prune(assignments).select(
        F.col("id_a").alias("doc_id_l"),
        F.col("id_b").alias("doc_id_r"),
        "weight",
    )


def _labels(spark, sf_dir):
    """Deterministic (pred, gold) cluster labels over documents: gold =
    groups of 10; pred keeps the first 8 of each but merges the tail two
    of each adjacent gold pair -- non-degenerate splits AND merges, so
    precision and recall both move. SQL-replayable on both engines."""
    d = _docs(spark, sf_dir)
    return d.select(
        F.col("doc_id"),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(10)) >= 8,
            F.concat(F.lit("m"), (F.col("doc_id") / 20).cast("long").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("c"), (F.col("doc_id") / 10).cast("long").cast("string"))
        )
        .alias("pred_cluster"),
        F.concat(
            F.lit("g"), (F.col("doc_id") / 10).cast("long").cast("string")
        ).alias("gold_cluster"),
    )


def _q_bcubed_scorecard(spark, sf_dir):
    # B-cubed precision/recall/F1 (Bagga & Baldwin 1998) -- the cluster-
    # level ER metric that scores singletons and weights records equally.
    # Contingency-cell decomposition: exact BIGINT inner sums, cluster-id-
    # sorted final folds (the EM/ME float contract).
    from ala_name_matching_spark.operators.er_metrics import bcubed_quality

    return bcubed_quality(_labels(spark, sf_dir))


def _q_adjusted_rand(spark, sf_dir):
    # Adjusted Rand Index (Hubert & Arabie 1985) over the same planted
    # split/merge labels: all sufficient statistics are exact integer
    # C(n,2) sums (div, not /), the index is four double ops.
    from ala_name_matching_spark.operators.er_metrics import adjusted_rand

    return adjusted_rand(_labels(spark, sf_dir))


def _q_nmi_scorecard(spark, sf_dir):
    # Information-theoretic clustering scorecard over the same planted
    # split/merge labels: MI + marginal entropies from exact BIGINT
    # contingency statistics (key-sorted double folds), homogeneity /
    # completeness / V-measure (= arithmetic-mean NMI at beta=1).
    from ala_name_matching_spark.operators.er_metrics import nmi_scorecard

    return nmi_scorecard(_labels(spark, sf_dir))


def _q_cluster_cohesion(spark, sf_dir):
    # Per-cluster edge-density QA (over-merge detector): gold groups of 10
    # carry either a CHAIN of 9 edges (density 0.2, low_cohesion) or -- for
    # every 3rd group -- a full clique (density 1.0). The operator must
    # separate them exactly.
    from ala_name_matching_spark.operators.er_metrics import cluster_cohesion

    d = _docs(spark, sf_dir).select("doc_id")
    grp = (F.col("doc_id") / 10).cast("long")
    labels = d.select(
        F.col("doc_id").alias("record_id"),
        F.concat(F.lit("g"), grp.cast("string")).alias("cluster_id"),
    )
    a = d.select(F.col("doc_id").alias("id_a"))
    b = d.select(F.col("doc_id").alias("id_b"))
    chain = a.join(
        b,
        (F.col("id_b") == F.col("id_a") + 1)
        & ((F.col("id_a") / 10).cast("long") == (F.col("id_b") / 10).cast("long")),
    ).select("id_a", "id_b")
    g0 = d.where(grp % 3 == 0).select(grp.alias("_g"), "doc_id")
    clique = (
        g0.select(F.col("_g"), F.col("doc_id").alias("id_a"))
        .join(g0.select(F.col("_g"), F.col("doc_id").alias("id_b")), "_g")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return cluster_cohesion(labels, chain.unionByName(clique)).select(
        "cluster_id", "n_members", "n_internal_edges", "density", "low_cohesion"
    )


def _q_cluster_repair(spark, sf_dir):
    # Iterative threshold refinement: flagged chain clusters (density 0.2)
    # re-cluster on their strict (score >= 0.8) subgraph -- only the first
    # chain link carries 0.9, so each flagged group splits into one pair
    # plus singletons, while clique clusters (density 1.0) pass untouched.
    from ala_name_matching_spark.operators.clustering import (
        repair_low_cohesion,
    )

    d = _docs(spark, sf_dir).select("doc_id")
    grp = (F.col("doc_id") / 10).cast("long")
    labels = d.select(
        F.col("doc_id").alias("record_id"),
        F.concat(F.lit("g"), grp.cast("string")).alias("cluster_id"),
    )
    a = d.select(F.col("doc_id").alias("id_a"))
    b = d.select(F.col("doc_id").alias("id_b"))
    chain = (
        a.join(
            b,
            (F.col("id_b") == F.col("id_a") + 1)
            & (
                (F.col("id_a") / 10).cast("long")
                == (F.col("id_b") / 10).cast("long")
            ),
        )
        .select(
            "id_a",
            "id_b",
            F.when(F.pmod(F.col("id_a"), F.lit(10)) == 0, F.lit(0.9))
            .otherwise(F.lit(0.55))
            .alias("score"),
        )
    )
    g0 = d.where(grp % 3 == 0).select(grp.alias("_g"), "doc_id")
    clique = (
        g0.select(F.col("_g"), F.col("doc_id").alias("id_a"))
        .join(g0.select(F.col("_g"), F.col("doc_id").alias("id_b")), "_g")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0.9).alias("score"))
    )
    return repair_low_cohesion(
        labels, chain.unionByName(clique), strict_threshold=0.8
    ).select("record_id", "cluster_id", "repaired")


def _q_two_source_linkage(spark, sf_dir):
    # Two-dataset 1:1 linkage: split documents into A (even doc_id) and B
    # (odd), block on the word-pair key, score with normalized
    # Levenshtein, keep reciprocal-best pairs only -- the at-most-one
    # assignment a cross-source link table needs.
    from ala_name_matching_spark.operators.linkage import reciprocal_best_match

    d = _docs(spark, sf_dir).select(
        _block_key_col().alias("bk"), "doc_id", "text"
    )
    a = d.where(F.pmod(F.col("doc_id"), F.lit(2)) == 0).select(
        "bk", F.col("doc_id").alias("id_a"), F.col("text").alias("text_a")
    )
    b = d.where(F.pmod(F.col("doc_id"), F.lit(2)) == 1).select(
        "bk", F.col("doc_id").alias("id_b"), F.col("text").alias("text_b")
    )
    maxlen = F.greatest(F.length("text_a"), F.length("text_b"))
    pairs = _spread(a.join(b, "bk")).select(
        "id_a",
        "id_b",
        (
            F.lit(1.0)
            - F.levenshtein("text_a", "text_b").cast("double") / maxlen
        ).alias("score"),
    )
    out = reciprocal_best_match(pairs)
    return out.select("id_a", "id_b", F.round("score", 6).alias("score"))


def _q_threshold_sweep(spark, sf_dir):
    # Threshold-selection table: P/R/F1 at every 2-dp score band from ONE
    # histogram pass + a cumsum over the <=100-row band table. Gold =
    # planted groups of 10; predictions = blocked pairs scored with
    # normalized Levenshtein.
    from ala_name_matching_spark.operators.er_metrics import threshold_sweep

    d = _docs(spark, sf_dir).select(
        _block_key_col().alias("bk"), "doc_id", "text"
    )
    l = d.select("bk", F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    r = d.select("bk", F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    scored = _spread(
        l.join(r, "bk").filter(F.col("id_a") < F.col("id_b"))
    ).select(
        "id_a",
        "id_b",
        (
            F.lit(1.0)
            - F.levenshtein("ta", "tb").cast("double")
            / F.greatest(F.length("ta"), F.length("tb"))
        ).alias("score"),
    )
    dd = _docs(spark, sf_dir).select("doc_id")
    ga = dd.select(F.col("doc_id").alias("id_a"))
    gb = dd.select(F.col("doc_id").alias("id_b"))
    gold = ga.join(
        gb,
        (F.col("id_a") < F.col("id_b"))
        & ((F.col("id_a") / 10).cast("long") == (F.col("id_b") / 10).cast("long")),
    ).select("id_a", "id_b")
    return threshold_sweep(scored, gold)


def _q_block_size_histogram(spark, sf_dir):
    # Skew probe: log2-bucketed block sizes + pair mass per bucket over
    # the same three-key assignment table meta_blocking uses; shows where
    # the comparison budget sits without materializing a pair.
    from ala_name_matching_spark.operators.er_metrics import (
        block_size_histogram,
    )

    assignments = _multikey_assignments(spark, sf_dir)
    return block_size_histogram(assignments)


def _q_monge_elkan_pairs(spark, sf_dir):
    # Monge-Elkan hybrid comparator (Monge & Elkan 1996) over the standard
    # blocked pair universe: mean-of-best normalized-Levenshtein token
    # similarity, both directions + symmetric mean. Whole-stage-codegen
    # higher-order functions; zero shuffles beyond the block self-join.
    from ala_name_matching_spark.operators.comparators import monge_elkan_pairs

    d = _spread(
        _docs(spark, sf_dir).select(
            _block_key_col().alias("bk"), "doc_id", "text"
        )
    )
    return monge_elkan_pairs(
        d, id_col="doc_id", text_col="text", block_col="bk", max_tokens=10
    ).select(
        F.col("id_l").alias("doc_id_l"),
        F.col("id_r").alias("doc_id_r"),
        "me_lr",
        "me_rl",
        "me_sym",
    )


def _q_soft_tfidf_pairs(spark, sf_dir):
    # Soft-TF-IDF (Cohen/Ravikumar/Fienberg 2003): TF-IDF weighting
    # composed with a CLOSE(theta=0.9) normalized-Levenshtein token match
    # -- the hybrid comparator their study found dominant for name
    # matching. Same blocked pair universe as monge_elkan/tfidf_cosine.
    from ala_name_matching_spark.operators.comparators import soft_tfidf_pairs

    d = _spread(
        _docs(spark, sf_dir).select(
            _block_key_col().alias("bk"), "doc_id", "text"
        )
    )
    return soft_tfidf_pairs(
        d, id_col="doc_id", text_col="text", block_col="bk", theta=0.9,
        max_tokens=10,
    ).select(
        F.col("id_l").alias("doc_id_l"),
        F.col("id_r").alias("doc_id_r"),
        "soft_lr",
        "soft_rl",
        "soft_sym",
    )


def _q_tfidf_cosine_pairs(spark, sf_dir):
    # Corpus-weighted "soft" pair score: TF-IDF cosine over distinct
    # tokens (binary tf x smooth idf), sparse token-join formulation --
    # no per-pair token loops; folds in token-sorted order for the
    # cross-engine float contract.
    from ala_name_matching_spark.operators.comparators import tfidf_cosine_pairs

    d = _docs(spark, sf_dir).select(
        _block_key_col().alias("bk"), "doc_id", "text"
    )
    return tfidf_cosine_pairs(
        d, id_col="doc_id", text_col="text", block_col="bk"
    ).select(
        F.col("id_l").alias("doc_id_l"),
        F.col("id_r").alias("doc_id_r"),
        "cosine",
    )


def _q_golden_record(spark, sf_dir):
    # Data-fusion survivor per canonical cluster: per-attribute majority
    # vote (ties -> lexicographically smallest) + the longest-text/min-id
    # representative -- one skew-immune groupBy per fused attribute.
    from ala_name_matching_spark.functions.normalize import canon_text_col
    from ala_name_matching_spark.operators.fusion import golden_record

    d = _docs(spark, sf_dir).withColumn("canon", canon_text_col(F.col("text")))
    return golden_record(
        d,
        cluster_col="canon",
        attr_cols=["lang", "source"],
        id_col="doc_id",
        text_col="text",
    ).select(
        F.col("canon").alias("canon_text"),
        "n_members",
        "rep_id",
        "lang_gold",
        "lang_support",
        "source_gold",
        "source_support",
    )


def _fs_oracle_sql(bk_macro: str, iters: int) -> str:
    """Unrolled-CTE DuckDB replay of the Fellegi-Sunter EM fit.

    Mirrors fs_em's determinism contract exactly: same init, conditional
    factors in the same left-associated order, M-step sums in ascending
    pattern_id order (sum ... ORDER BY pid; the interleaved 0.0 terms of
    the CASE guards are exact float identities).
    """
    feats = ["g_jacc", "g_lev", "g_len"]

    def prod(prefix, it):
        fs = " * ".join(
            f"(CASE WHEN {g} = 1 THEN {it}.{prefix}{i + 1} "
            f"ELSE 1.0 - {it}.{prefix}{i + 1} END)"
            for i, g in enumerate(feats)
        )
        return fs

    gamma = """
          SELECT CASE WHEN len(list_intersect(l.toks, r.toks)) * 2
                           >= len(list_distinct(list_concat(l.toks, r.toks)))
                      THEN 1 ELSE 0 END AS g_jacc,
                 CASE WHEN levenshtein(l.text, r.text) <= 20 THEN 1 ELSE 0 END AS g_lev,
                 CASE WHEN abs(l.n_chars - r.n_chars) * 10 <= greatest(l.n_chars, r.n_chars) THEN 1 ELSE 0 END AS g_len"""
    ctes = [
        f"""d AS (SELECT {bk_macro} AS bk, doc_id, text, n_chars,
                       list_distinct(string_split(lower(text), ' ')) AS toks
                  FROM documents),
        pairs AS (
          {gamma}
          FROM d l JOIN d r ON l.bk = r.bk AND l.doc_id < r.doc_id
          UNION ALL
          {gamma}
          FROM d l JOIN d r ON l.doc_id + 257 = r.doc_id),
        pat AS (
          SELECT g_jacc, g_lev, g_len,
                 g_jacc + 2*g_lev + 4*g_len AS pid, count(*) AS c
          FROM pairs GROUP BY 1, 2, 3),
        ntot AS (SELECT sum(c ORDER BY pid) AS n FROM pat),
        it0 AS (SELECT 0.5 AS p, 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
                       0.1 AS u1, 0.1 AS u2, 0.1 AS u3)"""
    ]
    for t in range(1, iters + 1):
        prev = f"it{t - 1}"
        ctes.append(
            f"""w{t} AS (
          SELECT pat.*,
                 ({prev}.p * {prod("m", prev)}) AS nm,
                 ((1.0 - {prev}.p) * {prod("u", prev)}) AS nu
          FROM pat, {prev})"""
        )
        msums = ", ".join(
            f"sum(CASE WHEN {g} = 1 THEN c * (nm / (nm + nu)) ELSE 0.0 END ORDER BY pid)"
            f" / sum(c * (nm / (nm + nu)) ORDER BY pid) AS m{i + 1}"
            for i, g in enumerate(feats)
        )
        usums = ", ".join(
            f"sum(CASE WHEN {g} = 1 THEN c * (1.0 - nm / (nm + nu)) ELSE 0.0 END ORDER BY pid)"
            f" / (ntot.n - sum(c * (nm / (nm + nu)) ORDER BY pid)) AS u{i + 1}"
            for i, g in enumerate(feats)
        )
        ctes.append(
            f"""it{t} AS (
          SELECT sum(c * (nm / (nm + nu)) ORDER BY pid) / ntot.n AS p,
                 {msums}, {usums}
          FROM w{t}, ntot GROUP BY ntot.n)"""
        )
    last = f"it{iters}"
    return f"""
            WITH {", ".join(ctes)},
            fin AS (
              SELECT pat.pid, pat.g_jacc, pat.g_lev, pat.g_len, pat.c,
                     (1.0 * {prod("m", last)}) AS pm,
                     (1.0 * {prod("u", last)}) AS pu,
                     {last}.p AS p
              FROM pat, {last})
            SELECT CAST(pid AS INTEGER) AS pattern_id,
                   CAST(g_jacc AS INTEGER) AS g_jacc,
                   CAST(g_lev AS INTEGER) AS g_lev,
                   CAST(g_len AS INTEGER) AS g_len,
                   CAST(c AS BIGINT) AS n_pairs,
                   round(log2(pm / pu), 6) AS match_weight,
                   round((p * pm) / (p * pm + (1.0 - p) * pu), 6) AS posterior
            FROM fin"""


def _fs_ml_prod(prefix: str, it: str) -> str:
    feats = ["g_jacc", "g_lev", "g_len"]
    return " * ".join(
        f"(CASE {g} WHEN 0 THEN {it}.{prefix}{i + 1}_0 "
        f"WHEN 1 THEN {it}.{prefix}{i + 1}_1 "
        f"ELSE {it}.{prefix}{i + 1}_2 END)"
        for i, g in enumerate(feats)
    )


def _fs_ml_cte_prefix(bk_macro: str, iters: int) -> str:
    """The shared unrolled-EM CTE chain of the MULTI-LEVEL Fellegi-Sunter
    replay (fs_em_multilevel): 3 fields x 3 levels, pinned geometric init
    m[l] = 2^l/7 / u[l] = 2^(2-l)/7, per-(field, level) M-step sums in
    ascending pattern_id order. Same float-identity argument as
    _fs_oracle_sql (python skips terms the SQL adds as 0.0). Returns the
    "WITH ..." prefix ending after it{iters}; both oracle variants attach
    their own final select."""
    feats = ["g_jacc", "g_lev", "g_len"]
    nl = 3
    gamma = """
          SELECT l.doc_id AS doc_id_l, r.doc_id AS doc_id_r,
                 CASE WHEN len(list_intersect(l.toks, r.toks)) * 2
                           >= len(list_distinct(list_concat(l.toks, r.toks)))
                      THEN 2
                      WHEN len(list_intersect(l.toks, r.toks)) * 4
                           >= len(list_distinct(list_concat(l.toks, r.toks)))
                      THEN 1 ELSE 0 END AS g_jacc,
                 CASE WHEN levenshtein(l.text, r.text) <= 10 THEN 2
                      WHEN levenshtein(l.text, r.text) <= 30 THEN 1
                      ELSE 0 END AS g_lev,
                 CASE WHEN abs(l.n_chars - r.n_chars) * 10
                           <= greatest(l.n_chars, r.n_chars) THEN 2
                      WHEN abs(l.n_chars - r.n_chars) * 10
                           <= greatest(l.n_chars, r.n_chars) * 3 THEN 1
                      ELSE 0 END AS g_len"""
    init_cols = ", ".join(
        f"({1 << lv}.0 / 7.0) AS m{i + 1}_{lv}, "
        f"({1 << (nl - 1 - lv)}.0 / 7.0) AS u{i + 1}_{lv}"
        for i in range(len(feats))
        for lv in range(nl)
    )
    ctes = [
        f"""d AS (SELECT {bk_macro} AS bk, doc_id, text, n_chars,
                       list_distinct(string_split(lower(text), ' ')) AS toks
                  FROM documents),
        pairs AS (
          {gamma}
          FROM d l JOIN d r ON l.bk = r.bk AND l.doc_id < r.doc_id
          UNION ALL
          {gamma}
          FROM d l JOIN d r ON l.doc_id + 257 = r.doc_id),
        pat AS (
          SELECT g_jacc, g_lev, g_len,
                 g_jacc + 3*g_lev + 9*g_len AS pid, count(*) AS c
          FROM pairs GROUP BY 1, 2, 3),
        ntot AS (SELECT sum(c ORDER BY pid) AS n FROM pat),
        it0 AS (SELECT 0.5 AS p, {init_cols})"""
    ]
    sw = "sum(c * (nm / (nm + nu)) ORDER BY pid)"
    for t in range(1, iters + 1):
        prev = f"it{t - 1}"
        ctes.append(
            f"""w{t} AS (
          SELECT pat.*,
                 ({prev}.p * {_fs_ml_prod("m", prev)}) AS nm,
                 ((1.0 - {prev}.p) * {_fs_ml_prod("u", prev)}) AS nu
          FROM pat, {prev})"""
        )
        mlsums = ", ".join(
            f"sum(CASE WHEN {g} = {lv} THEN c * (nm / (nm + nu)) "
            f"ELSE 0.0 END ORDER BY pid) / {sw} AS m{i + 1}_{lv}, "
            f"sum(CASE WHEN {g} = {lv} THEN c * (1.0 - nm / (nm + nu)) "
            f"ELSE 0.0 END ORDER BY pid) / (ntot.n - {sw}) AS u{i + 1}_{lv}"
            for i, g in enumerate(feats)
            for lv in range(nl)
        )
        ctes.append(
            f"""it{t} AS (
          SELECT {sw} / ntot.n AS p, {mlsums}
          FROM w{t}, ntot GROUP BY ntot.n)"""
        )
    return f"""
            WITH {", ".join(ctes)}"""


def _fs_ml_oracle_sql(bk_macro: str, iters: int) -> str:
    """Per-pattern weights variant over the shared multilevel EM CTEs."""
    head = _fs_ml_cte_prefix(bk_macro, iters)
    last = f"it{iters}"
    return f"""{head},
            fin AS (
              SELECT pat.pid, pat.g_jacc, pat.g_lev, pat.g_len, pat.c,
                     (1.0 * {_fs_ml_prod("m", last)}) AS pm,
                     (1.0 * {_fs_ml_prod("u", last)}) AS pu,
                     {last}.p AS p
              FROM pat, {last})
            SELECT CAST(pid AS INTEGER) AS pattern_id,
                   CAST(g_jacc AS INTEGER) AS g_jacc,
                   CAST(g_lev AS INTEGER) AS g_lev,
                   CAST(g_len AS INTEGER) AS g_len,
                   CAST(c AS BIGINT) AS n_pairs,
                   round(log2(pm / pu), 6) AS match_weight,
                   round((p * pm) / (p * pm + (1.0 - p) * pu), 6) AS posterior
            FROM fin"""


def _fs_uncertain_oracle_sql(bk_macro: str, iters: int) -> str:
    """Active-learning variant over the same CTEs: per-pattern posterior
    (the fin construction) joined back onto the id-carrying pairs CTE,
    filtered to the uncertain band on the ROUNDED posterior."""
    head = _fs_ml_cte_prefix(bk_macro, iters)
    last = f"it{iters}"
    return f"""{head},
            post AS (
              SELECT pat.g_jacc, pat.g_lev, pat.g_len,
                     round(({last}.p * (1.0 * {_fs_ml_prod("m", last)}))
                           / (({last}.p * (1.0 * {_fs_ml_prod("m", last)}))
                              + ((1.0 - {last}.p)
                                 * (1.0 * {_fs_ml_prod("u", last)}))), 6)
                       AS posterior
              FROM pat, {last})
            SELECT p.doc_id_l, p.doc_id_r,
                   CAST(p.g_jacc AS INTEGER) AS g_jacc,
                   CAST(p.g_lev AS INTEGER) AS g_lev,
                   CAST(p.g_len AS INTEGER) AS g_len,
                   post.posterior
            FROM pairs p
            JOIN post USING (g_jacc, g_lev, g_len)
            WHERE post.posterior > 0.05 AND post.posterior < 0.95"""


def _fs_ml_levels_oracle_sql(bk_macro: str, iters: int) -> str:
    """Model-table variant over the same CTEs: unpivot the fitted
    it{iters} parameters into one row per (field, level) with the log2
    Bayes-factor level weight."""
    head = _fs_ml_cte_prefix(bk_macro, iters)
    feats = ["g_jacc", "g_lev", "g_len"]
    last = f"it{iters}"
    rows = " UNION ALL ".join(
        f"""SELECT '{g}' AS field, {lv} AS level,
                   round({last}.m{i + 1}_{lv}, 6) AS m,
                   round({last}.u{i + 1}_{lv}, 6) AS u,
                   CASE WHEN {last}.m{i + 1}_{lv} > 0.0
                         AND {last}.u{i + 1}_{lv} > 0.0
                        THEN round(log2({last}.m{i + 1}_{lv}
                                        / {last}.u{i + 1}_{lv}), 6)
                   END AS level_weight
            FROM {last}"""
        for i, g in enumerate(feats)
        for lv in range(3)
    )
    return f"""{head}
            SELECT field, CAST(level AS INTEGER) AS level, m, u,
                   level_weight
            FROM ({rows})"""


def _q_phrase_match(spark, sf_dir):
    # positional-index exact-phrase search (Lucene PhraseQuery analog):
    # queries are tokens 4..8 of every 25th doc, so each query matches its
    # source at least once; the vote-on-start algorithm needs no rescans.
    from ala_name_matching_spark.operators.dedup import tokens_col
    from ala_name_matching_spark.operators.retrieval import phrase_match

    d = _docs(spark, sf_dir).select("doc_id", "text")
    q = d.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens_col(F.col("text")), 4, 5), " ").alias("qtext"),
    )
    return phrase_match(d, q)


def _q_ngram_containment(spark, sf_dir):
    # quote/partial-dup detection: containment over word-4-gram sets (the
    # asymmetric complement of Jaccard -- a 20-token quote inside a long
    # doc scores ~1.0 containment but ~0.1 Jaccard). Planted: every 10th
    # doc gets a quote twin (doc_id + 3000000, tokens 5..24), whose shingle
    # set is fully contained in its source.
    from ala_name_matching_spark.operators.dedup import (
        ngram_containment_pairs,
        tokens_col,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    quotes = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.array_join(F.slice(tokens_col(F.col("text")), 5, 20), " ").alias("text"),
    )
    return ngram_containment_pairs(
        d.unionByName(quotes), shingle_n=4, threshold=0.9, max_df=100
    )


def _q_hard_negatives(spark, sf_dir):
    # DPR-style hard-negative mining: per query (gold = its source doc),
    # the top BM25 hits EXCLUDING the gold, re-ranked -- the standard
    # contrastive-training negative set, composed on the retrieval engine.
    from ala_name_matching_spark.operators.dedup import tokens_col
    from ala_name_matching_spark.operators.retrieval import bm25_topk

    d = _docs(spark, sf_dir).select("doc_id", "text")
    q = d.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens_col(F.col("text")), 1, 3), " ").alias("qtext"),
    )
    res = bm25_topk(d, q, k=6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        res.filter(F.col("doc_id") != F.col("query_id"))
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= 5)
        .select("query_id", "doc_id", "score", "neg_rank")
    )


def _q_char_entropy(spark, sf_dir):
    from ala_name_matching_spark.operators.text_analysis import char_entropy

    return char_entropy(_docs(spark, sf_dir).select("doc_id", "text"))


def _q_issue_flags(spark, sf_dir):
    # F10 -- marker/issue detection (?/cf./aff./spp. analogs). Marker-bearing
    # texts are constructed deterministically from doc_id so all flag paths
    # are exercised (the raw documents are marker-free word salad).
    from ala_name_matching_spark.operators.phrase import issue_flags_col

    d = _docs(spark, sf_dir)
    marked = d.withColumn(
        "mtext",
        F.when(F.col("doc_id") % 4 == 1, F.concat(F.lit("Re: "), F.col("text")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.col("text"), F.lit(" ...")))
        .when(F.col("doc_id") % 4 == 3, F.upper(F.col("text")))
        .otherwise(F.concat(F.col("text"), F.lit(" ?"))),
    )
    return marked.select(
        "doc_id",
        F.concat_ws(",", F.array_sort(issue_flags_col(F.col("mtext")))).alias("flags"),
    )


def _q_phrase_parse(spark, sf_dir):
    # F13 -- phrase-name parse: (head, phrase, voucher) via precompiled
    # regexes over a constructed phrase-bearing text (p_type 'container' ref N)
    from ala_name_matching_spark.operators.phrase import parse_phrase_cols

    p = _read(spark, sf_dir, "part")
    t = F.concat(
        F.col("p_type"), F.lit(" '"), F.col("p_brand"), F.lit("'"),
        F.when(F.col("p_partkey") % 3 == 0,
               F.concat(F.lit(" ref "), F.col("p_partkey").cast("string"))
               ).otherwise(F.lit("")),
    )
    cols = parse_phrase_cols(t)
    return p.select(
        "p_partkey",
        cols["head"].alias("head"),
        cols["phrase"].alias("phrase"),
        cols["voucher"].alias("voucher"),
    )


def _q_phrase_join(spark, sf_dir):
    # J3 -- compound-key phrase join with the "<null>" voucher sentinel
    from ala_name_matching_spark.operators.phrase import phrase_join

    p = _read(spark, sf_dir, "part")
    base = p.select(
        "p_partkey",
        F.lower(F.split_part(F.col("p_type"), F.lit(" "), F.lit(1))).alias("head"),
        F.lower(F.col("p_brand")).alias("phrase"),
        F.when(F.col("p_partkey") % 3 == 0, (F.col("p_size") % 10).cast("string"))
        .alias("voucher"),
    )
    q = base.filter(F.col("p_partkey") % 2 == 1).withColumnRenamed("p_partkey", "query_id")
    idx = base.filter(F.col("p_partkey") % 2 == 0).withColumnRenamed("p_partkey", "index_id")
    return (
        phrase_join(q, idx)
        .groupBy("head", "phrase")
        .agg(F.count("*").alias("n_matches"), F.min("query_id").alias("first_query"))
    )


def _q_alias_lookup(spark, sf_dir):
    # J8 -- common-name lookup + containment-style ambiguity resolution
    from ala_name_matching_spark.operators.phrase import common_name_lookup

    p = _read(spark, sf_dir, "part")
    aliases = p.select(
        F.upper(F.regexp_replace(F.col("p_type"), "[^a-zA-Z0-9]", "")).alias("alias_key"),
        F.col("p_partkey").alias("target_id"),
        F.col("p_brand"),
    )
    # query_id = rank of the distinct alias_key -- a window over the
    # BOUNDED distinct-key table (p_type has a ~150-value domain), made
    # explicit via bounded_window_input so the partition spec is non-empty
    from ala_name_matching_spark.operators.blocking import bounded_window_input

    queries_df = (
        bounded_window_input(aliases.select("alias_key").distinct())
        .withColumn(
            "query_id",
            F.dense_rank().over(
                Window.partitionBy("_one").orderBy("alias_key")
            ),
        )
        .drop("_one")
    )
    return common_name_lookup(
        queries_df, aliases, cls_cols=("p_brand",)
    ).select("alias_key", "target_id", "ambiguous")


def _q_misapplied_resolution(spark, sf_dir):
    # V3 -- misapplied-synonym resolution (checkForMisapplied analog):
    # 'F'-status orders act as misapplied synonyms pointing at an accepted id
    from ala_name_matching_spark.operators.validation import resolve_misapplied

    o = _read(spark, sf_dir, "orders")
    cand = o.select(
        F.col("o_custkey"),
        F.col("o_orderkey").alias("index_id"),
        F.when(F.col("o_orderstatus") == "F", F.lit("MISAPPLIED")).alias("syn_type"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey") % 1000).alias(
            "accepted_id"
        ),
    )
    return resolve_misapplied(cand, query_col="o_custkey")


def _q_synonym_enrich(spark, sf_dir):
    # B4 -- synonym context enrichment: every 3rd customer is a "synonym" of
    # its predecessor and inherits the missing segment from it
    from ala_name_matching_spark.operators.validation import synonym_enrich

    c = _read(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey"),
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_custkey") - 1).alias(
            "accepted_id"
        ),
        F.when(F.col("c_custkey") % 3 != 0, F.col("c_mktsegment")).alias("segment"),
    )
    return synonym_enrich(base, ["segment"], id_col="c_custkey").select(
        "c_custkey", "accepted_id", "segment"
    )


def _q_rematch_stragglers(spark, sf_dir):
    # B10 -- second-pass straggler re-match: exact-hash clusters, then
    # singletons re-join the multi-record cluster reps on a coarser key
    from ala_name_matching_spark.functions.normalize import canon_text_col
    from ala_name_matching_spark.operators.phrase import rematch_stragglers

    d = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("record_id"),
        canon_text_col(F.col("text")).alias("canon_text"),
    )
    w = Window.partitionBy(F.substring("canon_text", 1, 20))
    clustered = d.withColumn("cluster_id", F.min("record_id").over(w))
    out = rematch_stragglers(
        clustered, F.substring(F.col("canon_text"), 1, 8)
    )
    return out.select("record_id", "cluster_id", "rematch_cluster_id")


# --- rows-only checks (genuinely not SQL-expressible) -----------------------

def _q_er_clusters(spark, sf_dir):
    # the full fuzzy pipeline (phonetic UDF + blocking + scoring + CC +
    # election) -- FULLY value-checked since r03 against the stage-by-stage
    # DuckDB replay in _er_clusters_oracle()
    from ala_name_matching_spark.plans.pipeline import cluster_summary, run_pipeline
    from ala_name_matching_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, sf_dir)
    return cluster_summary(run_pipeline(t))


def _q_phonetic_keys(spark, sf_dir):
    # Taxamatch phonetic key per document (Arrow UDF) -- rows-only check
    from ala_name_matching_spark.functions.phonetic import phonetic_key_udf

    return _docs(spark, sf_dir).select(
        "doc_id", phonetic_key_udf(F.col("text")).alias("phonetic_key")
    )


def _q_simhash_neardups(spark, sf_dir):
    # max_hamming = n_bands - 1 (3 at the default 4 bands): the pigeonhole
    # regime, where banded candidate generation PROVABLY finds every
    # qualifying pair -- so the banded engine output equals the exact
    # all-pairs truth set the oracle computes (the md5-prefix token hash is
    # replayed in SQL; higher radii, where recall is probabilistic, stay
    # covered by tests/test_dedup.py). Value-checked since r03.
    from ala_name_matching_spark.operators.dedup import simhash_near_duplicates

    return simhash_near_duplicates(_docs(spark, sf_dir), max_hamming=3)


def _q_minhash_lsh_neardups(spark, sf_dir):
    from ala_name_matching_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _docs(spark, sf_dir)
    cands = minhash_lsh_candidates(d, num_hashes=16, bands=8, shingle_n=3)
    return ngram_jaccard_pairs(d, cands, shingle_n=3, threshold=0.4).withColumn(
        "jaccard", F.round("jaccard", 4)
    )


def _q_neardup_doc_clusters(spark, sf_dir):
    # Transitive near-dup clusters over exact token-3-gram Jaccard >= 0.5
    # edges, labeled by the pipeline's connected-components engine
    # (large-star/small-star + gated driver union-find). This is the CC
    # kernel's full DuckDB oracle: the oracle recomputes the same edges
    # all-pairs and closes them with a recursive CTE (min reachable id ==
    # component min == our cluster_id semantics). Singletons map to
    # themselves, so the output is one row per document.
    from ala_name_matching_spark.operators.dedup import neardup_clusters

    return neardup_clusters(_docs(spark, sf_dir), shingle_n=3, threshold=0.5)


def _q_cluster_triangles(spark, sf_dir):
    # Chain-vs-clique cluster QA: per near-dup cluster, triangle count and
    # transitivity (3T/wedges) over the exact Jaccard edge set. 0.0 flags
    # closure chains held together by bridging edges (the over-merge shape
    # cluster_repair re-clusters); 1.0 is a clique. Degree-ordered triangle
    # orientation on the Spark side (hub-safe); the id-ordered SQL replay
    # is a valid oracle because the count is orientation-invariant.
    from ala_name_matching_spark.operators.dedup import (
        jaccard_edges,
        neardup_clusters,
    )
    from ala_name_matching_spark.operators.er_metrics import cluster_triangles

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    # the shingle self-join runs once: both the CC labeling and the
    # triangle routing consume the materialized skinny edge table
    edges = jaccard_edges(docs, shingle_n=3, threshold=0.5).localCheckpoint(
        eager=True
    )
    labels = neardup_clusters(docs, shingle_n=3, threshold=0.5, edges=edges)
    return cluster_triangles(
        labels,
        edges,
        id_col="doc_id",
        cluster_col="cluster_rep",
        edge_cols=("doc_id_l", "doc_id_r"),
    )


def _q_edge_support_bridges(spark, sf_dir):
    # Edge-grained repair signal (k-truss support): per in-cluster edge,
    # the number of triangles through it; support-0 edges are the
    # uncorroborated bridges whose removal splits chain-merged clusters
    # (one deterministic 2-truss step). Same edge set / clusters as
    # cluster_triangles.
    from ala_name_matching_spark.operators.dedup import (
        jaccard_edges,
        neardup_clusters,
    )
    from ala_name_matching_spark.operators.er_metrics import edge_support

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    edges = jaccard_edges(docs, shingle_n=3, threshold=0.5).localCheckpoint(
        eager=True
    )
    labels = neardup_clusters(docs, shingle_n=3, threshold=0.5, edges=edges)
    return edge_support(
        labels,
        edges,
        id_col="doc_id",
        cluster_col="cluster_rep",
        edge_cols=("doc_id_l", "doc_id_r"),
    )


def _q_incremental_cc(spark, sf_dir):
    # Incremental ER maintenance: clusters committed at Jaccard >= 0.6,
    # then a batch of NEW evidence edges (0.5 <= J < 0.6) arrives and
    # merges them via the contracted rep graph -- the per-batch operation
    # of a continuously-ingesting deployment. The oracle is the FULL
    # closure at 0.5: the strongest possible check, because it proves the
    # incremental result IDENTICAL to a from-scratch recompute.
    from ala_name_matching_spark.operators.clustering import (
        incremental_cc_update,
    )
    from ala_name_matching_spark.operators.dedup import (
        jaccard_edges,
        neardup_clusters,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    all_edges = jaccard_edges(
        docs, shingle_n=3, threshold=0.5
    ).localCheckpoint(eager=True)
    old_edges = all_edges.where(F.col("jaccard") >= 0.6)
    new_edges = all_edges.where(F.col("jaccard") < 0.6)
    labels = neardup_clusters(
        docs, shingle_n=3, threshold=0.6, edges=old_edges
    )
    return incremental_cc_update(
        labels,
        new_edges,
        id_col="doc_id",
        cluster_col="cluster_rep",
        edge_cols=("doc_id_l", "doc_id_r"),
    )


def _q_split_leakage(spark, sf_dir):
    # Train/holdout contamination check -- the audit every training run
    # needs before trusting its eval: near-dup pairs (exact Jaccard >=
    # 0.5, the proven edge lane) that CROSS the deterministic split, i.e.
    # holdout docs whose near-twin leaked into train. Composes two
    # oracle-proven operators; output is the leaked pair list.
    from ala_name_matching_spark.operators.dedup import jaccard_edges
    from ala_name_matching_spark.operators.sampling import (
        deterministic_split,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    edges = jaccard_edges(docs, shingle_n=3, threshold=0.5)
    sp = deterministic_split(docs, "doc_id").select("doc_id", "split")
    return (
        edges.join(
            sp.select(
                F.col("doc_id").alias("doc_id_l"),
                F.col("split").alias("split_l"),
            ),
            "doc_id_l",
        )
        .join(
            sp.select(
                F.col("doc_id").alias("doc_id_r"),
                F.col("split").alias("split_r"),
            ),
            "doc_id_r",
        )
        .where(F.col("split_l") != F.col("split_r"))
        # 4-dp round on the emitted score (the minhash lane's convention;
        # the >= 0.5 filter upstream ran on the unrounded value)
        .select(
            "doc_id_l",
            "doc_id_r",
            F.round("jaccard", 4).alias("jaccard"),
            "split_l",
            "split_r",
        )
    )


def _q_kcore_membership(spark, sf_dir):
    # 2-core peeling over the near-dup graph: the third cluster-QA leg
    # (triangles -> chain clusters, edge_support -> bridge edges, k-core
    # -> which records survive once weak tails peel away). Pinned 8
    # synchronous rounds; the operator early-stops at the fixpoint, the
    # oracle unrolls all 8 (post-fixpoint rounds are no-ops).
    from ala_name_matching_spark.operators.dedup import (
        jaccard_edges,
        neardup_clusters,
    )
    from ala_name_matching_spark.operators.er_metrics import k_core

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    edges = jaccard_edges(docs, shingle_n=3, threshold=0.5).localCheckpoint(
        eager=True
    )
    labels = neardup_clusters(docs, shingle_n=3, threshold=0.5, edges=edges)
    return k_core(
        labels,
        edges,
        k=2,
        rounds=8,
        id_col="doc_id",
        cluster_col="cluster_rep",
        edge_cols=("doc_id_l", "doc_id_r"),
    )


def _kcore_oracle_sql(rounds: int = 8, k: int = 2) -> str:
    """Unrolled DuckDB replay of k_core's synchronous peeling: per round,
    degrees over surviving NODES (left join, coalesce 0), simultaneous
    deletion of everything below k."""
    head = f"""
        WITH RECURSIVE t AS (
          SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 2, 1)),
                   i -> array_to_string(toks[i:i+2], ' ')
                 )) AS sh
          FROM t
        ), eg AS (
          SELECT a.doc_id AS l, b.doc_id AS r
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.sh, b.sh))::double
                / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
        ), symg AS (
          SELECT l AS a, r AS b FROM eg UNION ALL SELECT r AS a, l AS b FROM eg
        ), reach AS (
          SELECT doc_id AS id, doc_id AS r FROM documents
          UNION
          SELECT symg.b, reach.r FROM reach JOIN symg ON symg.a = reach.id
        ), lab AS (
          SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id
        ), e0 AS MATERIALIZED (
          SELECT lab.cluster_rep AS c, eg.l AS a, eg.r AS b
          FROM eg JOIN lab ON lab.doc_id = eg.l
        ), nodes0 AS MATERIALIZED (
          SELECT DISTINCT c, n FROM (
            SELECT c, a AS n FROM e0 UNION ALL SELECT c, b AS n FROM e0))"""
    parts = []
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""d{r} AS MATERIALIZED (
          SELECT nd.c, nd.n, coalesce(dd.d, 0) AS d
          FROM nodes{p} nd LEFT JOIN (
            SELECT c, n, count(*) AS d FROM (
              SELECT c, a AS n FROM e{p}
              UNION ALL SELECT c, b AS n FROM e{p}) GROUP BY 1, 2) dd
            ON dd.c = nd.c AND dd.n = nd.n)""")
        parts.append(f"""drop{r} AS MATERIALIZED (
          SELECT c, n, {r} AS rr FROM d{r} WHERE d < {k})""")
        parts.append(f"""nodes{r} AS MATERIALIZED (
          SELECT nd.c, nd.n FROM nodes{p} nd
          WHERE NOT EXISTS (SELECT 1 FROM drop{r} x
                            WHERE x.c = nd.c AND x.n = nd.n))""")
        parts.append(f"""e{r} AS MATERIALIZED (
          SELECT e.c, e.a, e.b FROM e{p} e
          WHERE NOT EXISTS (SELECT 1 FROM drop{r} x
                            WHERE x.c = e.c AND x.n = e.a)
            AND NOT EXISTS (SELECT 1 FROM drop{r} x
                            WHERE x.c = e.c AND x.n = e.b))""")
    rem = " UNION ALL ".join(
        f"SELECT c, n, rr FROM drop{r}" for r in range(1, rounds + 1)
    )
    return f"""{head},
        {", ".join(parts)},
        removed AS ({rem})
        SELECT nodes0.c AS cluster_rep, nodes0.n AS doc_id,
               removed.rr IS NULL AS in_core,
               CAST(removed.rr AS INTEGER) AS round_removed
        FROM nodes0 LEFT JOIN removed
          ON removed.c = nodes0.c AND removed.n = nodes0.n"""


def _q_cross_doc_dup_ngrams(spark, sf_dir):
    # Corpus-level duplicated-text accounting (exact-substring dedup signal,
    # Lee et al. 2022): per doc, distinct word-4-grams shared with >= 2 docs
    # and the duplicated fraction. Word 4-grams, not 3 -- the fixture's
    # 3-gram space is saturated (nearly every 3-gram repeats), 4-grams
    # discriminate (same reason benchmark_contamination keys on 4-grams).
    from ala_name_matching_spark.operators.dedup import cross_doc_dup_ngrams

    return cross_doc_dup_ngrams(_docs(spark, sf_dir), shingle_n=4, min_df=2)


def _q_dedup_keep_best(spark, sf_dir):
    # Quality-aware dedup policy: per transitive near-dup cluster, keep the
    # highest-quality member (ties -> min doc_id). Skew-immune agg+join
    # election, same shape as the ER representative election.
    from ala_name_matching_spark.operators.dedup import dedup_keep_best

    return dedup_keep_best(_docs(spark, sf_dir), shingle_n=3, threshold=0.5)


def _q_mixture_weights(spark, sf_dir):
    # Data-mixing layer: per-source token shares + alpha-temperature
    # sampling weights (the standard multi-source corpus rebalance rule).
    from ala_name_matching_spark.operators.sampling import mixture_weights

    return mixture_weights(_docs(spark, sf_dir), alpha=0.7)


def _ann_planted_corpus_and_queries(spark, sf_dir):
    """Shared planted-top-k fixture for the ANN oracles: each query vector
    (vec_id < 20) gets FIVE scaled copies (vec_id + j*1000000, v * (1 +
    j/1000), j=1..5). Colinear copies have cosine exactly 1.0 (rounds to
    1.0 at 6 dp; the organic uniform-random vectors never exceed ~0.95), so
    the true top-5 per query is analytically known: the copies, ranked by
    vec_id (= by j) under the rounded-cosine tie-break. Both ANN structures
    provably return them -- hyperplane signs are scale-invariant (same
    buckets in every LSH table) and the IVF kernel L2-normalizes before
    assignment (same home list as the query, which probes its own home
    first) -- so the approximate engines' output equals the exact SQL truth
    set and the two rows are fully value-checked, not rows-only."""
    emb = _read(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    copies = (
        emb.filter(F.col("vec_id") < 20)
        .select(
            "vec_id",
            "embedding",
            F.explode(F.array([F.lit(j) for j in range(1, 6)])).alias("j"),
        )
        .select(
            (F.col("vec_id") + F.col("j") * 1000000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x.cast("double") * (F.lit(1.0) + F.col("j") / F.lit(1000.0)),
            ).alias("embedding"),
        )
    )
    return base.unionByName(copies), base.filter(F.col("vec_id") < 20)


def _q_ann_lsh_topk(spark, sf_dir):
    from ala_name_matching_spark.operators.similarity_search import lsh_topk

    corpus, queries = _ann_planted_corpus_and_queries(spark, sf_dir)
    # multi-table + 1-probe config: recall@5 = 0.82 vs cosine_topk on the
    # ORGANIC fixture (uniform random vectors, ANN's worst case; floor
    # asserted in tests/test_similarity_search.py); the planted copies make
    # the driver row value-checked (see _ann_planted_corpus_and_queries)
    return lsh_topk(
        corpus, queries, dim=64, k=5, n_planes=8, n_tables=16, multiprobe=1,
        rank_rounded=True,
    )


def _q_pq_adc_topk(spark, sf_dir):
    # Product Quantization ADC search (Jegou et al. 2011): 4 subspaces x
    # 8-centroid codebooks trained by one grouped Lloyd loop, corpus stored
    # as 4 codes/vector, queries answered from the M x k lookup grid --
    # the FAISS-style compression layer composing with the IVF coarse
    # quantizer. Full train+encode+ADC replayed by unrolled DuckDB CTEs.
    from ala_name_matching_spark.operators.pq import pq_adc_topk

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_adc_topk(q, emb, m_subs=4, k=8, iters=2, topk=10)


def _q_sq_rerank_topk(spark, sf_dir):
    # Scalar quantization (FAISS SQ8) + exact rerank: per-dimension 8-bit
    # linear codes from corpus min/max (the dim-row bounded 'model'),
    # approximate scan against reconstructions, top-30 re-scored with
    # true vectors. The simplest compression lane of the ANN family --
    # no codebooks -- and fully value-checked because quantize /
    # dequantize / distance all replay symbolically in DuckDB.
    from ala_name_matching_spark.operators.sq import sq_topk

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sq_topk(q, emb, dim=64, rerank=30, topk=10)


def _q_ann_ivf_topk(spark, sf_dir):
    from ala_name_matching_spark.operators.similarity_search import ivf_topk

    corpus, queries = _ann_planted_corpus_and_queries(spark, sf_dir)
    # IVF-flat scale path: 16-list coarse quantizer trained on a bounded
    # deterministic sample, queries probe the 6 nearest lists. recall@5 =
    # 0.79 vs cosine_topk on the ORGANIC fixture; nprobe=16 reproduces
    # brute force exactly (tests/test_similarity_search.py); the planted
    # copies make the driver row value-checked
    return ivf_topk(
        corpus, queries, k=5, n_centroids=16, nprobe=6, rank_rounded=True
    )


# Double-Metaphone fuzzy-lookup fixture (VERDICT r02 #7). Literal surname
# index + misspelled queries; the oracle carries each string's (primary,
# alternate) DM keys as a precomputed VALUES table -- the keys are pinned by
# the golden-vector tests (tests/test_double_metaphone.py: Philips's classic
# vectors + the frozen corpus), so the oracle independently re-runs the
# union-of-keys blocking join + JW rerank machinery on top of them.
_DM_INDEX = [
    "SMITH", "SMYTH", "SMYTHE", "SCHMIDT", "SCHMITT", "SCHNEIDER", "SNYDER",
    "JOHNSON", "JONSON", "JANSEN", "MEYER", "MAYER", "MAIER", "MUELLER",
    "MILLER", "PETERSON", "PEDERSEN", "THOMPSON", "THOMSON", "WRIGHT",
    "WHITE", "WITT", "KATHERINE", "CATHERINE", "KATHRYN", "FISCHER",
    "FISHER", "WALSH", "WELCH", "BAUER", "BOWER", "COHEN", "KOHN",
    "GARCIA", "GARZA",
]
_DM_QUERIES = [
    "SMITTH", "MILLAR", "PETTERSON", "JOHNSEN", "BAUR", "FISCHAR",
    "CATHARINE", "MUELER", "SHNEIDER", "WRYGHT",  # WRYGHT: GH hardens to K
    # -> no shared bucket with WRIGHT -> provably zero candidates (miss lane)
]
# (string -> (primary, alternate)) for every fixture string, from the
# golden-tested kernel; spot-checkable against Philips (2000) by hand.
_DM_KEYS = {
    "SMITH": ("SM0", "XMT"), "SMYTH": ("SM0", "XMT"), "SMYTHE": ("SM0", "XMT"),
    "SCHMIDT": ("XMT", "SMT"), "SCHMITT": ("XMT", "SMT"),
    "SCHNEIDER": ("XNTR", "SNTR"), "SNYDER": ("SNTR", "XNTR"),
    "JOHNSON": ("JNSN", "ANSN"), "JONSON": ("JNSN", "ANSN"),
    "JANSEN": ("JNSN", "ANSN"), "MEYER": ("MR", "MR"), "MAYER": ("MR", "MR"),
    "MAIER": ("MR", "MR"), "MUELLER": ("MLR", "MLR"), "MILLER": ("MLR", "MLR"),
    "PETERSON": ("PTRS", "PTRS"), "PEDERSEN": ("PTRS", "PTRS"),
    "THOMPSON": ("TMPS", "TMPS"), "THOMSON": ("TMSN", "TMSN"),
    "WRIGHT": ("RT", "RT"), "WHITE": ("AT", "AT"), "WITT": ("AT", "FT"),
    "KATHERINE": ("K0RN", "KTRN"), "CATHERINE": ("K0RN", "KTRN"),
    "KATHRYN": ("K0RN", "KTRN"), "FISCHER": ("FXR", "FSKR"),
    "FISHER": ("FXR", "FXR"), "WALSH": ("ALX", "FLX"), "WELCH": ("ALX", "FLK"),
    "BAUER": ("PR", "PR"), "BOWER": ("PR", "PR"), "COHEN": ("KHN", "KHN"),
    "KOHN": ("KN", "KN"), "GARCIA": ("KRS", "KRX"), "GARZA": ("KRS", "KRS"),
    "SMITTH": ("SM0", "XMT"), "MILLAR": ("MLR", "MLR"),
    "PETTERSON": ("PTRS", "PTRS"), "JOHNSEN": ("JNSN", "ANSN"),
    "BAUR": ("PR", "PR"), "FISCHAR": ("FXR", "FXR"),
    "CATHARINE": ("K0RN", "KTRN"), "MUELER": ("MLR", "MLR"),
    "SHNEIDER": ("XNTR", "XNTR"), "WRYGHT": ("RKT", "RKT"),
}


def _q_dm_fuzzy_lookup(spark, sf_dir):
    # Double-Metaphone fuzzy lookup (union-of-keys blocking + JW rerank) --
    # the lane the north-star names explicitly; fixture above, oracle joins
    # on the golden-pinned precomputed keys
    from ala_name_matching_spark.operators.validation import dm_fuzzy_lookup

    idx = spark.createDataFrame([(n,) for n in _DM_INDEX], "name string")
    qs = spark.createDataFrame([(q,) for q in _DM_QUERIES], "name string")
    return dm_fuzzy_lookup(idx, qs, k=3)


def _dm_fuzzy_oracle() -> str:
    def vals(names):
        return ", ".join(
            f"('{n}', '{_DM_KEYS[n][0]}', '{_DM_KEYS[n][1]}')" for n in names
        )

    return f"""
        WITH idx(name, p, a) AS (VALUES {vals(_DM_INDEX)}),
        qry(query, p, a) AS (VALUES {vals(_DM_QUERIES)}),
        ikeys AS (
          SELECT name, u.k AS dm_key
          FROM idx, unnest(list_distinct([p, a])) AS u(k) WHERE u.k <> ''),
        qkeys AS (
          SELECT query, u.k AS dm_key
          FROM qry, unnest(list_distinct([p, a])) AS u(k) WHERE u.k <> ''),
        cand AS (SELECT DISTINCT query, name FROM qkeys JOIN ikeys USING (dm_key)),
        scored AS (
          SELECT query, name,
                 round(jaro_winkler_similarity(query, name), 6) AS jw
          FROM cand)
        SELECT query, name, jw, rank FROM (
          SELECT query, name, jw,
                 row_number() OVER (PARTITION BY query
                                    ORDER BY jw DESC, name ASC) AS rank
          FROM scored) WHERE rank <= 3"""


def _q_spelling_collision_qa(spark, sf_dir):
    # B9 -- per-parent spelling-collision QA keyed on the F6 full-name
    # soundEx (alphabetize-after-first-letter, TaxonNameSoundEx.java:168-238
    # via Taxonomy.validateSpeciesSpelling)
    from ala_name_matching_spark.operators.blocking import (
        with_blocking_columns,
        with_record_id,
    )
    from ala_name_matching_spark.operators.validation import spelling_collision_qa
    from ala_name_matching_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, sf_dir)
    feats = with_blocking_columns(with_record_id(t))
    return spelling_collision_qa(feats, group_col="role").select(
        "role", "soundex_key", "n_variants"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "normalize_text": _q_normalize_text,
        "concat_key": _q_concat_key,
        "canon_text": _q_canon_text,
        "exact_dup_groups": _q_exact_dup_groups,
        "canon_groups": _q_canon_groups,
        "block_pair_counts": _q_block_pair_counts,
        "pair_scores_lev": _q_pair_scores_lev,
        "pair_scores_jw": _q_pair_scores_jw,
        "token_jaccard_pairs": _q_token_jaccard_pairs,
        "minhash_unigram_sig": _q_minhash_unigram_sig,
        "fingerprint": _q_fingerprint,
        "token_counts": _q_token_counts,
        "lang_id": _q_lang_id,
        "quality_score": _q_quality_score,
        "gopher_flags": _q_gopher_flags,
        "repetition_signals": _q_repetition_signals,
        "tfidf_topk": _q_tfidf_topk,
        "unigram_logprob": _q_unigram_logprob,
        "profile_documents": _q_profile_documents,
        "heavy_hitter_tokens": _q_heavy_hitter_tokens,
        "length_stats_by_lang": _q_length_stats_by_lang,
        "neardup_cluster_sizes": _q_neardup_cluster_sizes,
        "benchmark_contamination": _q_benchmark_contamination,
        "pii_scrub": _q_pii_scrub,
        "cosine_topk": _q_cosine_topk,
        "topk_orders_per_customer": _q_topk_orders_per_customer,
        "homonym_counts": _q_homonym_counts,
        "broadcast_lookup_join": _q_broadcast_lookup_join,
        "anti_join_ladder": _q_anti_join_ladder,
        "range_filter": _q_range_filter,
        "distinct_accepted": _q_distinct_accepted,
        "collect_set_names": _q_collect_set_names,
        "priority_election": _q_priority_election,
        "range_join": _q_range_join,
        "sessionization": _q_sessionization,
        "asof_attribution": _q_asof_attribution,
        "windowed_counts": _q_windowed_counts,
        "rollup_cascade": _q_rollup_cascade,
        "scd2_user_versions": _q_scd2_user_versions,
        "soundex_normalize": _q_soundex_normalize,
        "name_complete": _q_name_complete,
        "homonym_probe": _q_homonym_probe,
        "autocomplete": _q_autocomplete,
        "interval_containment": _q_interval_containment,
        "nested_set_intervals": _q_nested_set_intervals,
        "species_split_containment": _q_species_split_containment,
        "json_extract": _q_json_extract,
        "train_holdout_split": _q_train_holdout_split,
        "stratified_sample": _q_stratified_sample,
        "weighted_sample": _q_weighted_sample,
        "pack_sequences": _q_pack_sequences,
        "cosine_neardups_exact": _q_cosine_neardups_exact,
        "embedding_neardups_lsh": _q_embedding_neardups_lsh,
        "semdedup_prune": _q_semdedup_prune,
        "jl_projection": _q_jl_projection,
        "render_conversations": _q_render_conversations,
        "sft_pairs": _q_sft_pairs,
        "weighted_sample_per_lang": _q_weighted_sample_per_lang,
        "pagerank_supply_graph": _q_pagerank_supply_graph,
        "hits_supply_graph": _q_hits_supply_graph,
        "streaming_neardup_match": _q_streaming_neardup_match,
        "streaming_index_update": _q_streaming_index_update,
        "streaming_semdedup_match": _q_streaming_semdedup_match,
        "streaming_drift_monitor": _q_streaming_drift_monitor,
        "compaction_checksum": _q_compaction_checksum,
        "ann_ivf_persisted_topk": _q_ann_ivf_persisted_topk,
        "ivfpq_full_probe_topk": _q_ivfpq_full_probe_topk,
        "streaming_exact_dedup": _q_streaming_exact_dedup,
        "streaming_incremental_er": _q_streaming_incremental_er,
        "clean_pipeline": _q_clean_pipeline,
        "bucketed_join_parity": _q_bucketed_join_parity,
        "jaccard_verify_cross": _q_jaccard_verify_cross,
        "prefix_containment": _q_prefix_containment,
        "bm25_topk": _q_bm25_topk,
        "fuzzy_bm25_topk": _q_fuzzy_bm25_topk,
        "hard_negatives": _q_hard_negatives,
        "ngram_containment": _q_ngram_containment,
        "phrase_match": _q_phrase_match,
        "order_cube": _q_order_cube,
        "event_pivot": _q_event_pivot,
        "skew_salted_join": _q_skew_salted_join,
        "hll_distinct_tokens": _q_hll_distinct_tokens,
        "kmv_overlap": _q_kmv_overlap,
        "cosine_join_pairs": _q_cosine_join_pairs,
        "kmv_containment": _q_kmv_containment,
        "icws_weighted_jaccard": _q_icws_weighted_jaccard,
        "icws_lsh_candidates": _q_icws_lsh_candidates,
        "shipping_priority": _q_shipping_priority,
        "pricing_summary": _q_pricing_summary,
        "mad_outliers": _q_mad_outliers,
        "lca_pairs": _q_lca_pairs,
        "benford_profile": _q_benford_profile,
        "local_supplier_volume": _q_local_supplier_volume,
        "perplexity_buckets": _q_perplexity_buckets,
        "drift_psi_bins": _q_drift_psi_bins,
        "bloom_prefilter_join": _q_bloom_prefilter_join,
        "quantile_profile_chars": _q_quantile_profile_chars,
        "setsim_join_pairs": _q_setsim_join,
        "ed_join_pairs": _q_ed_join_pairs,
        "pprl_dice_pairs": _q_pprl_dice_pairs,
        "dsir_selection": _q_dsir_selection,
        "quality_lr_weights": _q_quality_lr_weights,
        "blocklist_filter": _q_blocklist_filter,
        "hdr_quantile_chars": _q_hdr_quantile_chars,
        "symspell_lookup": _q_symspell_lookup,
        "zorder_key_orders": _q_zorder_key_orders,
        "bigram_logprob": _q_bigram_logprob,
        "bpe_pair_counts": _q_bpe_pair_counts,
        "bpe_merges": _q_bpe_merges,
        "bpe_tokenize": _q_bpe_tokenize,
        "fs_match_weights": _q_fs_match_weights,
        "fs_multilevel_weights": _q_fs_multilevel_weights,
        "fs_level_weights": _q_fs_level_weights,
        "uncertain_pairs": _q_uncertain_pairs,
        "tf_adjusted_weights": _q_tf_adjusted_weights,
        "snm_pairs": _q_snm_pairs,
        "monge_elkan_pairs": _q_monge_elkan_pairs,
        "tfidf_cosine_pairs": _q_tfidf_cosine_pairs,
        "soft_tfidf_pairs": _q_soft_tfidf_pairs,
        "golden_record": _q_golden_record,
        "meta_blocking_prune": _q_meta_blocking_prune,
        "bcubed_scorecard": _q_bcubed_scorecard,
        "adjusted_rand": _q_adjusted_rand,
        "nmi_scorecard": _q_nmi_scorecard,
        "cluster_cohesion": _q_cluster_cohesion,
        "cluster_repair": _q_cluster_repair,
        "two_source_linkage": _q_two_source_linkage,
        "threshold_sweep": _q_threshold_sweep,
        "block_size_histogram": _q_block_size_histogram,
        "cm_token_counts": _q_cm_token_counts,
        "conv_neardup_pairs": _q_conv_neardup_pairs,
        "conv_prefix_rescrape": _q_conv_prefix_rescrape,
        "conv_dup_profile": _q_conv_dup_profile,
        "er_pair_quality": _q_er_pair_quality,
        "er_blocking_quality": _q_er_blocking_quality,
        "winnowing_pairs": _q_winnowing_pairs,
        "strip_dup_spans": _q_strip_dup_spans,
        "line_dedup": _q_line_dedup,
        "gap_fill_minutes": _q_gap_fill,
        "funnel_stages": _q_funnel_stages,
        "cohort_retention": _q_cohort_retention,
        "event_transitions": _q_event_transitions,
        "rfm_segments": _q_rfm_segments,
        "chunk_documents": _q_chunk_documents,
        "frame_schedule": _q_frame_schedule,
        "table_checksum": _q_table_checksum,
        "char_entropy": _q_char_entropy,
        "issue_flags": _q_issue_flags,
        "phrase_parse": _q_phrase_parse,
        "phrase_join": _q_phrase_join,
        "alias_lookup": _q_alias_lookup,
        "rematch_stragglers": _q_rematch_stragglers,
        "misapplied_resolution": _q_misapplied_resolution,
        "synonym_enrich": _q_synonym_enrich,
        # oracle-checked since round 2 (exact-Jaccard oracle; independent
        # DuckDB treat_word re-implementation for the blocking key):
        "minhash_lsh_neardups": _q_minhash_lsh_neardups,
        "phonetic_keys": _q_phonetic_keys,
        # oracle-checked CC lane: recursive-CTE closure oracle
        "neardup_doc_clusters": _q_neardup_doc_clusters,
        "cluster_triangles": _q_cluster_triangles,
        "edge_support_bridges": _q_edge_support_bridges,
        "kcore_membership": _q_kcore_membership,
        "split_leakage": _q_split_leakage,
        "incremental_cc": _q_incremental_cc,
        "cross_doc_dup_ngrams": _q_cross_doc_dup_ngrams,
        "dedup_keep_best": _q_dedup_keep_best,
        "mixture_weights": _q_mixture_weights,
        # rows-only (no oracle_sql entry):
        "er_clusters": _q_er_clusters,
        "simhash_neardups": _q_simhash_neardups,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "pq_adc_topk": _q_pq_adc_topk,
        "sq_rerank_topk": _q_sq_rerank_topk,
        "dm_fuzzy_lookup": _q_dm_fuzzy_lookup,
        "spelling_collision_qa": _q_spelling_collision_qa,
        "double_metaphone_keys": _q_double_metaphone_keys,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB SQL over the pre-registered views)
# --------------------------------------------------------------------------

_NORM = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
def _unesc_sql(expr: str) -> str:
    # F11 entity pass, mirroring normalize.HTML_ENTITIES (amp last)
    for src, dst in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "''"), ("&nbsp;", " "), ("&amp;", "&"),
    ]:
        expr = f"replace({expr}, '{src}', '{dst}')"
    return expr


_CANON = (
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace("
    + _unesc_sql("lower(" + _NORM + ")")
    + ", '\\b(?:re|fwd|fw|aka|sic|etc)[.:]\\s*|\\[(?:sic|edited)\\]', ' ', 'g'),"
    " '\\[[^\\]]*\\]|\\{[^}]*\\}', ' ', 'g'),"  # F11 bracket pass
    " '\\band\\b', ' ', 'g'),"  # F11 author-and fold
    " '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))"
)
_BK = "lower(split_part(text, ' ', 1)) || '|' || lower(split_part(text, ' ', 2))"
_TOKS = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"

# the planted conversation construction (_conv_turns) + turn fingerprints,
# shared by the three conv_* oracles
_CONV_FP_SQL = """WITH base AS (
              SELECT doc_id // 10 AS k, doc_id % 10 AS t, text
              FROM documents),
            turns AS (
              SELECT 'd' || CAST(k AS VARCHAR) AS conv_id, t AS turn_idx,
                     text
              FROM base
              UNION ALL
              SELECT 'v' || CAST(k AS VARCHAR), t,
                     CASE WHEN t >= 7 THEN text || ' [edited]'
                          ELSE text END
              FROM base WHERE k % 5 = 0
              UNION ALL
              SELECT 'r' || CAST(k AS VARCHAR), t, text
              FROM base WHERE k % 7 = 0 AND t < 5),
            fp AS (
              SELECT conv_id, turn_idx,
                     md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                       AS fp
              FROM turns)"""

# HLL estimator numerator alpha_m * m^2 * 2^RMAX for p=10 -- imported from
# the operator so the oracle inlines the bit-identical double literal
def _hll_c() -> float:
    from ala_name_matching_spark.operators.sketches import _hll_alpha

    return _hll_alpha(1024) * 1024 * 1024 * float(1 << 51)


_HLL_C = _hll_c()


def _semdedup_oracle() -> str:
    # the same planted-copy union as _q_semdedup_prune, replayed through the
    # generated 2-iteration unrolled-Lloyd SQL
    from ala_name_matching_spark.operators.semdedup import semdedup_oracle_sql

    aug = (
        "(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings"
        " UNION ALL SELECT vec_id + 1000000,"
        " list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.001)"
        " FROM embeddings)"
    )
    return semdedup_oracle_sql(
        n_clusters=8,
        iters=2,
        threshold=0.95,
        dim=64,
        table=aug,
        # the same corpus-scaled k as _q_semdedup_prune (max(8, n/125))
        k_sql="greatest(8, (SELECT count(*) FROM nv_t) // 125)",
    )


def _streaming_semdedup_oracle() -> str:
    # corpus Lloyd + query assignment + within-cluster cosine, via the
    # same CTE generator as the batch semdedup oracle (parameters mirror
    # _q_streaming_semdedup_match: corpus-scaled k = max(8, n//125)
    # derived from count(nv_t), 2 iterations, threshold 0.95)
    from ala_name_matching_spark.operators.semdedup import (
        semdedup_match_oracle_sql,
    )

    qt = (
        "(SELECT vec_id + 1000000 AS vec_id,"
        " list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.001) AS sv"
        " FROM embeddings)"
    )
    return semdedup_match_oracle_sql(
        iters=2,
        threshold=0.95,
        dim=64,
        corpus_table="embeddings",
        query_table=qt,
        # the same corpus-scaled k rule as the batch semdedup oracle
        k_sql="greatest(8, (SELECT count(*) FROM nv_t) // 125)",
    )


def _jl_oracle() -> str:
    from ala_name_matching_spark.operators.random_projection import (
        random_projection_oracle_sql,
    )

    return random_projection_oracle_sql(dim=64, k=16)


def _hits_oracle() -> str:
    from ala_name_matching_spark.operators.pagerank import hits_oracle_sql

    return hits_oracle_sql(
        "SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,"
        " CAST(l_partkey AS BIGINT) + 1000000 AS dst FROM lineitem",
        iters=3,
    )


def _pagerank_oracle() -> str:
    # parameters mirror _q_pagerank_supply_graph (damping 0.85, 3 iters)
    from ala_name_matching_spark.operators.pagerank import pagerank_oracle_sql

    return pagerank_oracle_sql(
        "SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,"
        " CAST(l_partkey AS BIGINT) + 1000000 AS dst FROM lineitem",
        damping=0.85,
        iters=3,
    )


def _pq_oracle() -> str:
    # parameters mirror _q_pq_adc_topk exactly
    from ala_name_matching_spark.operators.pq import pq_oracle_sql

    return pq_oracle_sql(m_subs=4, k=8, iters=2, topk=10, dim=64, n_queries=5)


def _fuzzy_bm25_oracle() -> str:
    # corpus + corrupted-query sides both pass through the independent
    # DuckDB treat_word chain (prefixes c/q), then the standard BM25 SQL
    qsrc = (
        "(SELECT doc_id, array_to_string(list_transform("
        + _TOKS
        + "[1:3], w -> w[1] || translate(w[2:], 'eo', 'ia')), ' ') AS text"
        " FROM documents WHERE doc_id % 25 = 0)"
    )
    return f"""
        WITH {_treated_tokens_ctes("documents", "c")},
        {_treated_tokens_ctes(qsrc, "q")},
        posts AS (
          SELECT doc_id, u.term, count(*) AS tf
          FROM cs4, unnest(treated) AS u(term) GROUP BY doc_id, u.term),
        dl AS (SELECT doc_id, len(treated) AS dl FROM cs4),
        ncnt AS (SELECT count(*) AS n FROM cs4),
        stats AS (SELECT avg(dl) AS avgdl FROM dl),
        dft AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
        qterms AS (
          SELECT doc_id AS query_id, u.term
          FROM qs4, unnest(list_distinct(treated)) AS u(term)),
        scored AS (
          SELECT q.query_id, p.doc_id,
                 round(sum(
                   ln(1 + (n.n - d.df + 0.5) / (d.df + 0.5)) *
                   p.tf * (1.2 + 1) /
                   (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
                 ), 6) AS score
          FROM posts p
          JOIN qterms q USING (term)
          JOIN dft d USING (term)
          JOIN dl l ON p.doc_id = l.doc_id
          CROSS JOIN ncnt n CROSS JOIN stats s
          GROUP BY q.query_id, p.doc_id)
        SELECT query_id, doc_id, score, rank FROM (
          SELECT query_id, doc_id, score,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS rank
          FROM scored) WHERE rank <= 5"""


def _bpe_vocab_cte() -> str:
    # word vocabulary: same tokenization macro as every token oracle,
    # same alphabet guard + hapax prune as operators/bpe.word_counts
    return f"""
        toks AS (SELECT unnest({_TOKS}) AS w FROM documents),
        vocab AS (
          SELECT w, count(*) AS n FROM toks
          WHERE regexp_full_match(w, '^[a-z0-9]+$')
          GROUP BY w HAVING count(*) >= 2),
        v0 AS (
          SELECT w, n,
                 '~' || array_to_string(
                   list_transform(generate_series(1, length(w)),
                                  i -> substr(w, i, 1)), '~~') || '~' AS enc
          FROM vocab)"""


def _bpe_pair_cte(src: str, p: str) -> str:
    # weighted adjacent-pair histogram over the current segmentation:
    # strip end delimiters, split on the double inner one, lateral-unnest
    # the adjacency index (empty for 1-symbol words)
    return f"""
        {p} AS (
          SELECT s[i] AS l_sym, s[i + 1] AS r_sym, sum(n) AS cnt
          FROM (SELECT n,
                       string_split(substr(enc, 2, length(enc) - 2), '~~')
                         AS s
                FROM {src}),
               unnest(generate_series(1, len(s) - 1)) AS u(i)
          GROUP BY 1, 2)"""


def _bpe_chain_ctes(n_merges: int) -> str:
    # unrolled BPE trajectory: per iteration one histogram CTE, one
    # argmax CTE (cnt DESC, pair ASC -- binary collation both engines),
    # one literal-replace rewrite (exact left-to-right non-overlapping
    # semantics under the double-delimiter encoding; operators/bpe.py)
    parts = ["WITH" + _bpe_vocab_cte()]
    for k in range(1, n_merges + 1):
        parts.append("," + _bpe_pair_cte(f"v{k - 1}", f"p{k}"))
        parts.append(f"""
        , m{k} AS (SELECT l_sym, r_sym, cnt FROM p{k}
                   ORDER BY cnt DESC, l_sym, r_sym LIMIT 1)""")
        if k < n_merges:
            parts.append(f"""
        , v{k} AS (
            SELECT w, n,
                   replace(enc,
                           '~' || m{k}.l_sym || '~~' || m{k}.r_sym || '~',
                           '~' || m{k}.l_sym || m{k}.r_sym || '~') AS enc
            FROM v{k - 1} CROSS JOIN m{k})""")
    return "".join(parts)


def _bpe_merges_oracle(n_merges: int = 3) -> str:
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS step, l_sym AS left_sym, "
        f"r_sym AS right_sym, CAST(cnt AS BIGINT) AS pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return _bpe_chain_ctes(n_merges) + "\n" + sel


def _bpe_tokenize_oracle(n_merges: int = 3) -> str:
    # segment EVERY corpus word under the learned merge chain: encode,
    # apply the same n literal replaces, count symbols from the
    # inner-delimiter count; out-of-alphabet words count 1 (engine
    # parity). Merge patterns enter as SCALAR subqueries coalesced to a
    # never-matching sentinel, so a vocabulary that dries up before
    # n_merges (empty m{k}) degrades to a no-op replace -- matching
    # learn_merges' early break -- instead of CROSS JOIN zeroing the
    # whole corpus.
    enc = (
        "'~' || array_to_string(list_transform("
        "generate_series(1, length(w)), i -> substr(w, i, 1)), '~~') || '~'"
    )
    for k in range(1, n_merges + 1):
        pat = (
            f"coalesce((SELECT '~' || l_sym || '~~' || r_sym || '~' "
            f"FROM m{k}), chr(1))"
        )
        rep = (
            f"coalesce((SELECT '~' || l_sym || r_sym || '~' "
            f"FROM m{k}), chr(1))"
        )
        enc = f"replace({enc}, {pat}, {rep})"
    return (
        _bpe_chain_ctes(n_merges)
        + f"""
        , corpus_words AS (
            SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
        seg AS (
            SELECT doc_id,
                   CASE WHEN NOT regexp_full_match(w, '^[a-z0-9]+$')
                        THEN CAST(1 AS BIGINT)
                        ELSE CAST((length({enc}) -
                              length(replace({enc}, '~~', ''))) / 2 + 1
                             AS BIGINT)
                   END AS nt
            FROM corpus_words
            WHERE w <> '')
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(nt) AS BIGINT) AS n_bpe_tokens
        FROM seg GROUP BY doc_id"""
    )


_ICWS_SIG_CTES = f"""WITH docs AS (SELECT doc_id, text FROM documents
                          WHERE doc_id % 50 = 0),
            toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM docs),
            tf AS (SELECT doc_id, term, count(*) AS w FROM toks
                   WHERE length(term) > 0 GROUP BY 1, 2),
            spine AS (SELECT unnest(generate_series(0, 31)) AS slot),
            draws AS (
              SELECT tf.doc_id, spine.slot, tf.term, tf.w,
                     (CAST(('0x' || substr(md5('icws-r1|' || spine.slot
                        || '|' || tf.term), 1, 15)) AS BIGINT) + 1.0)
                       / {float((1 << 60) + 1)!r} AS u1,
                     (CAST(('0x' || substr(md5('icws-r2|' || spine.slot
                        || '|' || tf.term), 1, 15)) AS BIGINT) + 1.0)
                       / {float((1 << 60) + 1)!r} AS u2,
                     (CAST(('0x' || substr(md5('icws-c1|' || spine.slot
                        || '|' || tf.term), 1, 15)) AS BIGINT) + 1.0)
                       / {float((1 << 60) + 1)!r} AS u3,
                     (CAST(('0x' || substr(md5('icws-c2|' || spine.slot
                        || '|' || tf.term), 1, 15)) AS BIGINT) + 1.0)
                       / {float((1 << 60) + 1)!r} AS u4,
                     (CAST(('0x' || substr(md5('icws-b|' || spine.slot
                        || '|' || tf.term), 1, 15)) AS BIGINT) + 1.0)
                       / {float((1 << 60) + 1)!r} AS ub
              FROM tf CROSS JOIN spine),
            vals AS (
              SELECT doc_id, slot, term,
                     floor(ln(CAST(w AS DOUBLE)) / (-ln(u1 * u2)) + ub)
                       AS ti,
                     (-ln(u3 * u4))
                     / (exp((-ln(u1 * u2))
                            * (floor(ln(CAST(w AS DOUBLE))
                                     / (-ln(u1 * u2)) + ub) - ub))
                        * exp(-ln(u1 * u2))) AS a
              FROM draws),
            sigs AS (
              SELECT doc_id, slot, term AS sig_term,
                     CAST(ti AS BIGINT) AS sig_t
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id, slot
                      ORDER BY a, term, ti) AS rk FROM vals)
              WHERE rk = 1)"""


def oracle_sql() -> dict[str, str]:
    lang_scores = ", ".join(
        f"""(SELECT count(*) FROM unnest({_TOKS}) AS u(t)
             WHERE t IN ({", ".join("'" + w + "'" for w in _LANG[lg])}))
            * 1.0 / greatest(len({_TOKS}), 1) AS s_{lg}"""
        for lg in sorted(_LANG)
    )
    lang_unpivot = " UNION ALL ".join(
        f"SELECT doc_id, '{lg}' AS lang, s_{lg} AS score FROM scores" for lg in sorted(_LANG)
    )
    return {
        "normalize_text": f"SELECT doc_id, lower({_NORM}) AS norm_text FROM documents",
        "concat_key": "SELECT doc_id, lower(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS concat_key FROM documents",
        "canon_text": f"SELECT doc_id, {_CANON} AS canon_text FROM documents",
        "exact_dup_groups": f"""
            SELECT md5(lower({_NORM})) AS text_hash, count(*) AS n_dups,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY 1 HAVING count(*) >= 2""",
        "canon_groups": f"""
            SELECT {_CANON} AS canon_text, count(*) AS group_size,
                   min(doc_id) AS group_rep
            FROM documents GROUP BY 1""",
        "block_pair_counts": f"""
            SELECT {_BK} AS block_key, count(*) AS block_size,
                   CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs
            FROM documents GROUP BY 1""",
        "pair_scores_lev": f"""
            WITH d AS (SELECT {_BK} AS bk, doc_id, text FROM documents)
            SELECT l.doc_id AS doc_id_l, r.doc_id AS doc_id_r,
                   levenshtein(l.text, r.text) AS lev_dist
            FROM d l JOIN d r ON l.bk = r.bk AND l.doc_id < r.doc_id""",
        # JW: DuckDB's independent jaro_winkler_similarity -- exact
        # agreement with the vectorized kernel (strcmp95 transposition
        # flooring, 0.7 boost threshold, 4-char prefix, 64-char cap)
        "pair_scores_jw": f"""
            WITH d AS (SELECT {_BK} AS bk, doc_id, text FROM documents)
            SELECT l.doc_id AS doc_id_l, r.doc_id AS doc_id_r,
                   round(CASE WHEN l.text = r.text THEN 1.0
                         ELSE jaro_winkler_similarity(l.text[1:64],
                                                      r.text[1:64]) END,
                         6) AS jw_sim
            FROM d l JOIN d r ON l.bk = r.bk AND l.doc_id < r.doc_id
        """,
        "token_jaccard_pairs": f"""
            WITH d AS (
              SELECT {_BK} AS bk, doc_id,
                     list_distinct(string_split(lower(text), ' ')) AS toks
              FROM documents)
            SELECT l.doc_id AS doc_id_l, r.doc_id AS doc_id_r,
                   round(len(list_intersect(l.toks, r.toks)) * 1.0 /
                         len(list_distinct(list_concat(l.toks, r.toks))), 4) AS jaccard
            FROM d l JOIN d r ON l.bk = r.bk AND l.doc_id < r.doc_id""",
        "minhash_unigram_sig": f"""
            SELECT doc_id,
                   list_min(list_transform(list_distinct({_TOKS}), s -> md5('seed0|' || s))) AS mh0,
                   list_min(list_transform(list_distinct({_TOKS}), s -> md5('seed1|' || s))) AS mh1
            FROM documents""",
        "fingerprint": f"""
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fingerprint
            FROM documents""",
        "token_counts": f"""
            SELECT doc_id, len({_TOKS}) AS ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
            FROM documents""",
        "lang_id": f"""
            WITH scores AS (SELECT doc_id, {lang_scores} FROM documents),
            unp AS ({lang_unpivot}),
            best AS (
              SELECT doc_id, lang, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, lang DESC) AS rn
              FROM unp)
            SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred
            FROM best WHERE rn = 1""",
        "gopher_flags": """
            WITH m AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\\s+') AS words,
                     length(regexp_replace(text, '\\s+', '', 'g')) AS n_word_chars,
                     len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_sym
              FROM documents),
            g AS (
              SELECT doc_id, len(words) AS n_words,
                     round(CASE WHEN len(words) > 0
                           THEN n_word_chars * 1.0 / len(words) ELSE 0.0 END, 4)
                       AS mean_word_len,
                     round(CASE WHEN len(words) > 0
                           THEN n_sym * 1.0 / len(words) ELSE 0.0 END, 4)
                       AS symbol_word_ratio,
                     round(CASE WHEN len(words) > 0
                           THEN len(list_filter(words,
                                    w -> regexp_matches(w, '[A-Za-z]')))
                                * 1.0 / len(words) ELSE 0.0 END, 4)
                       AS alpha_word_frac,
                     len(list_intersect(
                         list_distinct(list_transform(words, w -> lower(w))),
                         ['the','be','to','of','and','that','have','with']))
                       AS stop_hits
              FROM m)
            SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
                   alpha_word_frac, stop_hits,
                   (n_words < 10 OR n_words > 100000 OR mean_word_len < 3
                    OR mean_word_len > 10 OR symbol_word_ratio > 0.1
                    OR alpha_word_frac < 0.8 OR stop_hits < 2) AS flagged
            FROM g""",
        "tfidf_topk": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS term
              FROM documents),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dfq AS (
              SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                     tf.tf * ln(n.n_docs * 1.0 / dfq.df) AS tfidf
              FROM tf JOIN dfq USING (term) CROSS JOIN n),
            ranked AS (
              SELECT doc_id, term, tf, df, tfidf,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY tfidf DESC, term ASC) AS rank
              FROM scored)
            SELECT doc_id, term, tf, df, round(tfidf, 4) AS tfidf, rank
            FROM ranked WHERE rank <= 3""",
        "unigram_logprob": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
            vocab AS (
              SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
            n AS (SELECT sum(cnt) AS total FROM vocab)
            SELECT toks.doc_id, count(*) AS n_tokens,
                   round(avg(ln(vocab.cnt * 1.0 / n.total)), 6) AS mean_logprob
            FROM toks JOIN vocab USING (tok) CROSS JOIN n
            GROUP BY toks.doc_id""",
        # drift replay: identical integer binning, smoothing and per-bin
        # log terms; totals are intentionally NOT in the frame (driver
        # fold) so no cross-bin float sum order matters
        "drift_psi_bins": """
            WITH vals AS (
              SELECT CAST(n_chars AS BIGINT) AS v, lang = 'en' AS is_ref
              FROM documents WHERE n_chars IS NOT NULL),
            mm AS (SELECT min(v) AS lo, max(v) AS hi FROM vals),
            binned AS (
              SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin,
                     count(*) FILTER (is_ref) AS n_ref,
                     count(*) FILTER (NOT is_ref) AS n_cur
              FROM vals, mm GROUP BY 1),
            spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
            hist AS (
              SELECT s.bin,
                     CAST(coalesce(b.n_ref, 0) AS BIGINT) AS n_ref,
                     CAST(coalesce(b.n_cur, 0) AS BIGINT) AS n_cur
              FROM spine s LEFT JOIN binned b ON b.bin = s.bin),
            tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
                           CAST(sum(n_cur) AS BIGINT) AS tc FROM hist),
            p AS (
              SELECT bin, n_ref, n_cur,
                     (CAST(n_ref AS DOUBLE) + 0.5)
                       / (CAST(tr AS DOUBLE) + 5.0) AS pr,
                     (CAST(n_cur AS DOUBLE) + 0.5)
                       / (CAST(tc AS DOUBLE) + 5.0) AS pc
              FROM hist, tot)
            SELECT bin, n_ref, n_cur,
                   round(pr, 6) AS p_ref, round(pc, 6) AS p_cur,
                   round((pc - pr) * ln(pc / pr), 6) AS psi_term,
                   round(0.5 * (pr * ln(pr / ((pr + pc) / 2.0))
                         + pc * ln(pc / ((pr + pc) / 2.0))), 6) AS jsd_term
            FROM p""",
        # CCNet bucket replay: the unigram_logprob chain, then a
        # per-language rank on the 6-dp ROUNDED score (+ doc_id
        # tie-break) and integer-arithmetic tertile boundaries
        "perplexity_buckets": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
            vocab AS (
              SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
            n AS (SELECT sum(cnt) AS total FROM vocab),
            scored AS (
              SELECT toks.doc_id,
                     round(avg(ln(vocab.cnt * 1.0 / n.total)), 6)
                       AS mean_logprob
              FROM toks JOIN vocab USING (tok) CROSS JOIN n
              GROUP BY toks.doc_id),
            ranked AS (
              SELECT s.doc_id, d.lang, s.mean_logprob,
                     row_number() OVER (
                       PARTITION BY d.lang
                       ORDER BY s.mean_logprob DESC, s.doc_id ASC) AS rk,
                     count(*) OVER (PARTITION BY d.lang) AS nn
              FROM scored s JOIN documents d USING (doc_id))
            SELECT doc_id, lang, mean_logprob,
                   CAST(((rk - 1) * 3) // nn + 1 AS BIGINT) AS bucket,
                   CASE ((rk - 1) * 3) // nn + 1
                     WHEN 1 THEN 'head'
                     WHEN 3 THEN 'tail'
                     ELSE 'middle' END AS bucket_label
            FROM ranked""",
        "length_stats_by_lang": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 4) AS mean_chars,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
                   round(quantile_cont(n_chars, 0.9), 4) AS p90_chars
            FROM documents GROUP BY lang""",
        # same recursive-CTE closure as neardup_doc_clusters, rolled up to
        # the cluster-size histogram
        "neardup_cluster_sizes": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            ), e AS (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::double
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
            ), sym AS (
              SELECT l AS a, r AS b FROM e UNION ALL SELECT r AS a, l AS b FROM e
            ), reach AS (
              SELECT doc_id AS id, doc_id AS r FROM documents
              UNION
              SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.id
            ), cl AS (
              SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id
            ), sizes AS (
              SELECT cluster_rep, count(*) AS cluster_size FROM cl GROUP BY cluster_rep
            )
            SELECT cluster_size, count(*) AS n_clusters
            FROM sizes GROUP BY cluster_size""",
        "profile_documents": " UNION ALL ".join(
            f"""
            SELECT '{c}' AS col_name, count(*) AS n,
                   CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_null,
                   count(DISTINCT {c}) AS n_distinct,
                   CAST(min({c}) AS VARCHAR) AS min_str,
                   CAST(max({c}) AS VARCHAR) AS max_str
            FROM documents"""
            for c in ["doc_id", "text", "lang", "source", "n_chars"]
        ),
        "repetition_signals": """
            WITH m AS (
              SELECT doc_id,
                     string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
              FROM documents),
            base AS (
              SELECT doc_id, len(t) AS n_tokens,
                     round(CASE WHEN len(t) > 0
                           THEN 1.0 - len(list_distinct(t)) * 1.0 / len(t)
                           ELSE 0.0 END, 6) AS dup_token_frac,
                     list_transform(generate_series(1, greatest(len(t) - 1, 1)),
                                    i -> array_to_string(t[i:i+1], ' ')) AS bigrams
              FROM m),
            bg AS (
              SELECT doc_id, unnest(bigrams) AS bg FROM base),
            counts AS (
              SELECT doc_id, max(c) AS top_bigram_count,
                     CAST(sum(c) AS BIGINT) AS n_bigrams
              FROM (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2)
              GROUP BY 1)
            SELECT b.doc_id, b.n_tokens, b.dup_token_frac,
                   c.n_bigrams, c.top_bigram_count,
                   round(c.top_bigram_count * 1.0 / c.n_bigrams, 6) AS top_bigram_frac
            FROM base b JOIN counts c USING (doc_id)""",
        "benchmark_contamination": """
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t,
                     substr(md5(cast(doc_id AS varchar)), 1, 1) = '0' AS is_bench
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, is_bench,
                     unnest(list_transform(generate_series(1, greatest(len(t) - 3, 1)),
                                           i -> array_to_string(t[i:i+3], ' '))) AS g
              FROM toks),
            bench AS (SELECT DISTINCT g FROM grams WHERE is_bench),
            totals AS (
              SELECT doc_id, count(*) AS doc_ngrams FROM grams
              WHERE NOT is_bench GROUP BY 1),
            hits AS (
              SELECT gr.doc_id, count(*) AS n_hits
              FROM grams gr JOIN bench USING (g)
              WHERE NOT gr.is_bench GROUP BY 1)
            SELECT t.doc_id, t.doc_ngrams, h.n_hits,
                   round(h.n_hits * 1.0 / t.doc_ngrams, 6) AS contamination_frac
            FROM totals t JOIN hits h USING (doc_id)""",
        "pii_scrub": """
            WITH lines AS (
              SELECT c_custkey,
                     concat_ws(' ', c_name, 'at',
                       lower(regexp_replace(c_name, '[^A-Za-z0-9]+', '.', 'g')) || '@example.com',
                       'or call',
                       printf('%03d-%03d-%04d', c_custkey % 1000, (c_custkey * 7) % 1000, (c_custkey * 13) % 10000),
                       'ssn',
                       printf('%03d-%02d-%04d', (c_custkey * 3) % 900 + 100, c_custkey % 100, (c_custkey * 11) % 10000),
                       'from ip',
                       printf('%d.%d.%d.%d', c_custkey % 256, (c_custkey * 3) % 256, (c_custkey * 5) % 256, 1)) AS line
              FROM customer)
            SELECT c_custkey,
                   len(regexp_extract_all(line, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
                   len(regexp_extract_all(line, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ipv4,
                   len(regexp_extract_all(line, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS n_ssn,
                   len(regexp_extract_all(line, '(?:\\+[0-9]{1,3}|\\b[0-9]{1,3})(-[0-9]{3,4}){2,3}\\b')) AS n_phone,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(line,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                         '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g'),
                       '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '[SSN]', 'g'),
                     '(?:\\+[0-9]{1,3}|\\b[0-9]{1,3})(-[0-9]{3,4}){2,3}\\b', '[PHONE]', 'g') AS redacted
            FROM lines""",
        "quality_score": f"""
            WITH m AS (
              SELECT doc_id, length(text) AS n_chars,
                     len({_TOKS}) AS n_toks,
                     CASE WHEN length(text) > 0
                          THEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) * 1.0 / length(text)
                          ELSE 0.0 END AS alpha_ratio,
                     (SELECT count(*) FROM unnest({_TOKS}) AS u(t)
                      WHERE t IN ('the','and','of','to','a','in','is','was','for','with'))
                       * 1.0 / greatest(len({_TOKS}), 1) AS stop_ratio
              FROM documents)
            SELECT doc_id,
                   round(0.3 * (CASE WHEN n_chars BETWEEN 20 AND 5000 THEN 1.0 ELSE 0.3 END)
                       + 0.3 * alpha_ratio
                       + 0.2 * least(stop_ratio * 4, 1.0)
                       + 0.2 * (CASE WHEN n_toks > 0 AND n_chars * 1.0 / n_toks BETWEEN 3 AND 12
                                     THEN 1.0 ELSE 0.5 END), 6) AS quality
            FROM m""",
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 20),
            scored AS (
              SELECT q.query_id, c.vec_id,
                     list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])) AS cos
              FROM embeddings c CROSS JOIN q
              WHERE q.query_id <> c.vec_id),
            ranked AS (
              SELECT query_id, vec_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, vec_id ASC) AS rank
              FROM scored)
            SELECT query_id, vec_id, round(cos, 6) AS cosine, rank
            FROM ranked WHERE rank <= 5""",
        "topk_orders_per_customer": """
            WITH r AS (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders)
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
            FROM r WHERE rk <= 3""",
        "homonym_counts": """
            SELECT p_type, count(*) AS n, count(DISTINCT p_brand) AS n_brands
            FROM part GROUP BY p_type HAVING count(*) > 1""",
        "broadcast_lookup_join": """
            SELECT p_brand,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand""",
        "anti_join_ladder": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
        "range_filter": """
            SELECT l_returnflag, count(*) AS n,
                   round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem
            WHERE l_quantity BETWEEN 10 AND 20
              AND l_shipdate >= TIMESTAMP '1995-01-01'
            GROUP BY l_returnflag""",
        "distinct_accepted": """
            SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers
            FROM orders GROUP BY o_orderstatus""",
        "collect_set_names": """
            SELECT c_nationkey,
                   array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
                   count(*) AS n
            FROM customer GROUP BY c_nationkey""",
        "priority_election": """
            WITH r AS (
              SELECT c_nationkey, c_custkey, c_acctbal,
                     row_number() OVER (PARTITION BY c_nationkey
                                        ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
              FROM customer)
            SELECT c_nationkey, c_custkey AS principal_id,
                   round(c_acctbal, 2) AS acctbal
            FROM r WHERE rn = 1""",
        "range_join": """
            SELECT o_orderpriority, count(*) AS n_shipped_90d
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= o_orderdate
              AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
            GROUP BY o_orderpriority""",
        "scd2_user_versions": """
            SELECT user_id, event_id, event_type,
                   ts AS effective_from,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS effective_to,
                   (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL) AS is_current
            FROM events""",
        "heavy_hitter_tokens": f"""
            WITH toks AS (
              SELECT unnest({_TOKS}) AS item FROM documents),
            n AS (SELECT count(*) AS total FROM toks)
            SELECT item, count(*) AS exact_count
            FROM toks, n GROUP BY item, n.total
            HAVING count(*) > 0.005 * n.total""",
        "rollup_cascade": " UNION ALL ".join(
            f"""
            SELECT '{res}' AS resolution,
                   date_trunc('{res}', ts) AS bucket_start, event_type,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2, 3"""
            for res in ["minute", "hour", "day"]
        ),
        "asof_attribution": """
            WITH clicks AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
            ), views AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
            )
            SELECT c.event_id AS click_id, c.user_id,
                   v.event_id AS view_id,
                   CASE WHEN v.ts IS NOT NULL
                        THEN floor((epoch_us(c.ts) - epoch_us(v.ts)) / 1000000.0)::bigint
                   END AS lag_sec
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND v.ts <= c.ts""",
        "sessionization": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id,
                     sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
              FROM g),
            per AS (
              SELECT user_id, session_id, count(*) AS n_events
              FROM s GROUP BY user_id, session_id)
            SELECT user_id, count(*) AS n_sessions,
                   CAST(sum(n_events) AS BIGINT) AS n_events
            FROM per GROUP BY user_id""",
        "windowed_counts": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2""",
        "soundex_normalize": """
            SELECT doc_id,
                   nullif(trim(regexp_replace(regexp_replace(upper(text),
                       '<.+?>', '', 'g'), '[^a-zA-Z .]', '', 'g')), '') AS sx_norm
            FROM documents""",
        "name_complete": """
            SELECT doc_id,
                   CASE WHEN contains(lower(text), lower(source)) THEN text
                        ELSE text || ' [' || source || ']' END AS name_complete
            FROM documents""",
        "homonym_probe": """
            WITH c AS (
              SELECT p_partkey,
                     count(DISTINCT p_partkey) OVER (PARTITION BY p_brand) AS n1,
                     count(DISTINCT p_partkey) OVER (PARTITION BY p_brand, p_type) AS n2,
                     count(DISTINCT p_partkey) OVER (PARTITION BY p_brand, p_type, p_size) AS n3
              FROM part)
            SELECT p_partkey,
                   CASE WHEN n1 = 1 THEN 1 WHEN n2 = 1 THEN 2
                        WHEN n3 = 1 THEN 3 ELSE 0 END AS resolve_level
            FROM c""",
        "autocomplete": """
            WITH cand AS (
              SELECT c_custkey, lower(c_name) AS nm,
                     CASE WHEN lower(c_name) = 'customer#00000001' THEN 12.0
                          WHEN lower(c_name) LIKE 'customer#00000001%' THEN 2.0
                          WHEN contains(lower(c_name), ' customer#00000001')
                            THEN 1.5
                          ELSE 1.0 END AS boost
              FROM customer
              WHERE contains(lower(c_name), 'customer#00000001')),
            scored AS (
              SELECT c_custkey, nm,
                     round((1.0 - levenshtein(nm, 'customer#00000001') * 1.0 /
                            greatest(length(nm), 17)) * boost, 6) AS ac_score
              FROM cand),
            ranked AS (
              SELECT c_custkey, ac_score,
                     row_number() OVER (ORDER BY ac_score DESC, nm ASC,
                                        c_custkey ASC) AS rank
              FROM scored)
            SELECT c_custkey, ac_score, rank FROM ranked WHERE rank <= 10""",
        "interval_containment": """
            SELECT a.o_custkey AS ck, count(*) AS n_contained
            FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
            WHERE a.o_orderkey <> b.o_orderkey
              AND b.o_orderdate >= a.o_orderdate
              AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
            GROUP BY 1""",
        "json_extract": """
            SELECT event_id, CAST(props->>'k' AS INT) AS k FROM events""",
        # md5 is bit-identical across engines and fixed-width lowercase hex
        # compares lexicographically == numerically, so the oracle reproduces
        # the split EXACTLY: cutoff 0.1*65536 = 6553 = 0x1999
        "train_holdout_split": """
            SELECT doc_id,
                   CASE WHEN substr(md5('split-v1' || doc_id), 1, 4) < '1999'
                        THEN 'holdout' ELSE 'train' END AS split
            FROM documents""",
        # en 0.25 -> 0x4000, zh 0.9 -> 0xe666, default 0.5 -> 0x8000
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE substr(md5('sample-v1' || doc_id), 1, 4) <
                  CASE lang WHEN 'en' THEN '4000'
                            WHEN 'zh' THEN 'e666'
                            ELSE '8000' END""",
        # A-ES weighted sample: identical 52-bit md5 uniform ((h+0.5)/2^52,
        # exactly representable), es_key = ln(u)/w rounded to 9 dp BEFORE
        # ranking (absorbs libm ln ulp), id tie-break; row_number replays
        # the distributed global_rank
        "weighted_sample_per_lang": """
            WITH k AS (
              SELECT doc_id, lang, n_chars,
                     round(ln((CAST(('0x' || substr(md5('aes-v1' ||
                                CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
                               + 0.5) / 4503599627370496.0)
                           / CAST(n_chars AS DOUBLE), 9) AS es_key
              FROM documents WHERE n_chars > 0),
            rk AS (
              SELECT doc_id, lang, n_chars, es_key,
                     CAST(row_number() OVER (PARTITION BY lang
                                             ORDER BY es_key DESC, doc_id)
                          - 1 AS BIGINT) AS es_rank
              FROM k)
            SELECT doc_id, lang, n_chars, es_key, es_rank FROM rk
            WHERE es_rank < 20""",
        "weighted_sample": """
            WITH k AS (
              SELECT doc_id, n_chars,
                     round(ln((CAST(('0x' || substr(md5('aes-v1' ||
                                CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
                               + 0.5) / 4503599627370496.0)
                           / CAST(n_chars AS DOUBLE), 9) AS es_key
              FROM documents WHERE n_chars > 0),
            rk AS (
              SELECT doc_id, n_chars, es_key,
                     CAST(row_number() OVER (ORDER BY es_key DESC, doc_id)
                          - 1 AS BIGINT) AS es_rank
              FROM k)
            SELECT doc_id, n_chars, es_key, es_rank FROM rk
            WHERE es_rank < 100""",
        "pack_sequences": """
            WITH m AS (
              SELECT doc_id,
                     len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tokens,
                     substr(md5('shard-v1' || CAST(doc_id AS VARCHAR)), 1, 2) AS shard
              FROM documents),
            c AS (
              SELECT doc_id, shard, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM m)
            SELECT doc_id, shard, n_tokens,
                   CAST(cum - n_tokens AS BIGINT) AS start_offset,
                   CAST(floor((cum - n_tokens) / 64) AS BIGINT) AS seq_start,
                   CAST(floor((cum - 1) / 64) AS BIGINT) AS seq_end,
                   floor((cum - n_tokens) / 64) != floor((cum - 1) / 64) AS spans_boundary
            FROM c""",
        "semdedup_prune": _semdedup_oracle(),
        # streaming lanes: the oracle is the batch-equivalent semantics --
        # stream rows are processed exactly once against a static index,
        # so the epoch-union equals the one-shot batch result
        "streaming_neardup_match": f"""
            WITH t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            )
            SELECT q.doc_id + 3000000 AS doc_id_l, c.doc_id AS doc_id_r,
                   round(len(list_intersect(q.sh, c.sh))::double
                     / len(list_distinct(list_concat(q.sh, c.sh))), 4)
                     AS jaccard
            FROM s q JOIN s c ON q.doc_id % 20 = 0
            WHERE len(list_intersect(q.sh, c.sh))::double
                  / len(list_distinct(list_concat(q.sh, c.sh))) >= 0.4""",
        "streaming_index_update": f"""
            WITH t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), e AS (
              SELECT doc_id, unnest(toks) AS term FROM t
            ), p AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM e WHERE term IS NOT NULL AND term <> ''
              GROUP BY doc_id, term
            ), dl AS (
              SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t
            )
            SELECT p.doc_id, p.term, p.tf, dl.dl
            FROM p JOIN dl ON p.doc_id = dl.doc_id""",
        "streaming_semdedup_match": _streaming_semdedup_oracle(),
        # single-batch staging makes the streaming drift rows equal the
        # batch drift of the whole slice; binning range pinned by the
        # REFERENCE slice min/max, out-of-range stream values clamp into
        # the edge bins (Spark's trunc-div vs DuckDB's floor-div diverge
        # only at negative raw bins, which the clamp maps to 0 either way)
        "streaming_drift_monitor": """
            WITH ref AS (
              SELECT CAST(n_chars AS BIGINT) AS v FROM documents
              WHERE lang = 'en' AND n_chars IS NOT NULL),
            mm AS (SELECT min(v) AS lo, max(v) AS hi FROM ref),
            cur AS (
              SELECT CAST(n_chars AS BIGINT) AS v FROM documents
              WHERE lang <> 'en' AND n_chars IS NOT NULL),
            rb AS (
              SELECT least(greatest(((v - lo) * 10) // (hi - lo + 1), 0), 9)
                       AS bin
              FROM ref, mm),
            cb AS (
              SELECT least(greatest(((v - lo) * 10) // (hi - lo + 1), 0), 9)
                       AS bin
              FROM cur, mm),
            spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
            hist AS (
              SELECT s.bin,
                     CAST(coalesce(r.n, 0) AS BIGINT) AS n_ref,
                     CAST(coalesce(c.n, 0) AS BIGINT) AS n_cur
              FROM spine s
              LEFT JOIN (SELECT bin, count(*) AS n FROM rb GROUP BY bin) r
                ON r.bin = s.bin
              LEFT JOIN (SELECT bin, count(*) AS n FROM cb GROUP BY bin) c
                ON c.bin = s.bin),
            tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
                           CAST(sum(n_cur) AS BIGINT) AS tc FROM hist),
            p AS (
              SELECT bin, n_ref, n_cur,
                     (CAST(n_ref AS DOUBLE) + 0.5)
                       / (CAST(tr AS DOUBLE) + 5.0) AS pr,
                     (CAST(n_cur AS DOUBLE) + 0.5)
                       / (CAST(tc AS DOUBLE) + 5.0) AS pc
              FROM hist, tot)
            SELECT bin, n_ref, n_cur,
                   round(pr, 6) AS p_ref, round(pc, 6) AS p_cur,
                   round((pc - pr) * ln(pc / pr), 6) AS psi_term,
                   round(0.5 * (pr * ln(pr / ((pr + pc) / 2.0))
                         + pc * ln(pc / ((pr + pc) / 2.0))), 6) AS jsd_term
            FROM p""",
        # the compaction roundtrip must be content-transparent: the oracle
        # checksums the SOURCE table; TRUE pins that the bin-pack ran
        "compaction_checksum": """
            SELECT lang, count(*) AS n_rows,
                   CAST(sum(CAST(('0x' || substr(md5(
                         doc_id || '|' || lang || '|' || text), 1, 8))
                       AS BIGINT)) AS BIGINT) AS checksum,
                   TRUE AS compacted
            FROM documents GROUP BY lang""",
        # identical truth set to ann_ivf_topk (same fixture + config; the
        # only difference is the disk roundtrip through build_ivf_index)
        "ann_ivf_persisted_topk": """
            SELECT e.vec_id AS query_id,
                   e.vec_id + g.j * 1000000 AS vec_id,
                   CAST(1.0 AS DOUBLE) AS cosine,
                   CAST(g.j AS INT) AS rank
            FROM embeddings e, generate_series(1, 5) AS g(j)
            WHERE e.vec_id < 20""",
        # full probe prunes nothing -> bit-for-bit pq_adc_topk, so the
        # unrolled PQ train+encode+ADC replay is shared verbatim
        "ivfpq_full_probe_topk": _pq_oracle(),
        # the four cleaning stages' existing green fragments, re-scoped so
        # each runs over the PREVIOUS stage's survivors exactly as
        # plans/clean_pipeline.py threads them: gopher+entropy gate ->
        # exact keep-min dedup -> shingle-CC keep-best election ->
        # cross-doc duplicated-span strip
        "clean_pipeline": f"""
            WITH RECURSIVE
            ft AS MATERIALIZED (
              SELECT doc_id,
                     text || '{_CLEAN_TAIL}' ||
                     CASE WHEN doc_id % 10 = 0 THEN '{_CLEAN_BOILER}'
                          ELSE '' END AS text
              FROM documents),
            aug AS MATERIALIZED (
              SELECT doc_id, text FROM ft
              UNION ALL
              SELECT doc_id + 7000000, text FROM ft WHERE doc_id % 20 = 0
              UNION ALL
              SELECT doc_id + 8000000,
                     'zzz ' || substring(text, instr(text, ' ') + 1)
              FROM ft WHERE doc_id % 25 = 0
              UNION ALL
              SELECT 9000000, 'a b c'),
            gm AS MATERIALIZED (
              SELECT doc_id,
                     string_split_regex(trim(text), '\\s+') AS words,
                     length(regexp_replace(text, '\\s+', '', 'g')) AS n_word_chars,
                     len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_sym
              FROM aug),
            gg AS MATERIALIZED (
              SELECT doc_id,
                     (n_words < 10 OR n_words > 100000 OR mean_word_len < 3
                      OR mean_word_len > 10 OR symbol_word_ratio > 0.1
                      OR alpha_word_frac < 0.8 OR stop_hits < 2) AS flagged
              FROM (
                SELECT doc_id, len(words) AS n_words,
                       round(CASE WHEN len(words) > 0
                             THEN n_word_chars * 1.0 / len(words) ELSE 0.0 END, 4)
                         AS mean_word_len,
                       round(CASE WHEN len(words) > 0
                             THEN n_sym * 1.0 / len(words) ELSE 0.0 END, 4)
                         AS symbol_word_ratio,
                       round(CASE WHEN len(words) > 0
                             THEN len(list_filter(words,
                                      w -> regexp_matches(w, '[A-Za-z]')))
                                  * 1.0 / len(words) ELSE 0.0 END, 4)
                         AS alpha_word_frac,
                       len(list_intersect(
                           list_distinct(list_transform(words, w -> lower(w))),
                           ['the','be','to','of','and','that','have','with']))
                         AS stop_hits
                FROM gm)),
            ce AS MATERIALIZED (
              SELECT doc_id, round(-sum((c / n) * ln(c / n)), 6) AS char_entropy
              FROM (
                SELECT doc_id, n, ch, count(*) AS c
                FROM (
                  SELECT doc_id, length(text) AS n, substr(text, i.i, 1) AS ch
                  FROM aug,
                       unnest(generate_series(1, length(text))) AS i(i)
                  WHERE length(text) > 0)
                GROUP BY doc_id, n, ch)
              GROUP BY doc_id, n),
            c1 AS MATERIALIZED (
              SELECT d.doc_id, d.text
              FROM aug d JOIN gg USING (doc_id) JOIN ce USING (doc_id)
              WHERE NOT gg.flagged AND ce.char_entropy >= 2.0),
            c2 AS MATERIALIZED (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       row_number() OVER (PARTITION BY md5(lower({_NORM}))
                                          ORDER BY doc_id) AS rn
                FROM c1)
              WHERE rn = 1),
            s3 AS MATERIALIZED (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
              FROM (SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
                    FROM c2)),
            e3 AS MATERIALIZED (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM s3 a JOIN s3 b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::double
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
            sym3 AS (
              SELECT l AS a, r AS b FROM e3
              UNION ALL SELECT r AS a, l AS b FROM e3),
            reach3 AS (
              SELECT doc_id AS id, doc_id AS r FROM c2
              UNION
              SELECT sym3.b, reach3.r FROM reach3 JOIN sym3 ON sym3.a = reach3.id),
            cl3 AS MATERIALIZED (
              SELECT id AS doc_id, min(r) AS cluster_rep FROM reach3 GROUP BY id),
            q3 AS MATERIALIZED (
              SELECT doc_id,
                     round(0.3 * (CASE WHEN n_chars BETWEEN 20 AND 5000
                                       THEN 1.0 ELSE 0.3 END)
                         + 0.3 * alpha_ratio
                         + 0.2 * least(stop_ratio * 4, 1.0)
                         + 0.2 * (CASE WHEN n_toks > 0
                                        AND n_chars * 1.0 / n_toks BETWEEN 3 AND 12
                                       THEN 1.0 ELSE 0.5 END), 6) AS quality
              FROM (
                SELECT doc_id, length(text) AS n_chars,
                       len({_TOKS}) AS n_toks,
                       CASE WHEN length(text) > 0
                            THEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                                 * 1.0 / length(text)
                            ELSE 0.0 END AS alpha_ratio,
                       (SELECT count(*) FROM unnest({_TOKS}) AS u(t)
                        WHERE t IN ('the','and','of','to','a','in','is','was','for','with'))
                         * 1.0 / greatest(len({_TOKS}), 1) AS stop_ratio
                FROM c2)),
            c3 AS MATERIALIZED (
              SELECT c2.doc_id, c2.text FROM c2
              JOIN (SELECT cl3.doc_id,
                           row_number() OVER (PARTITION BY cl3.cluster_rep
                                              ORDER BY q3.quality DESC,
                                                       cl3.doc_id) AS rn
                    FROM cl3 JOIN q3 USING (doc_id)) k
                ON k.doc_id = c2.doc_id AND k.rn = 1),
            toks4 AS MATERIALIZED (SELECT doc_id, {_TOKS} AS t FROM c3),
            pos4 AS MATERIALIZED (
              SELECT doc_id, i.i AS pos, t[i.i] AS tok
              FROM toks4, unnest(generate_series(1, len(t))) AS i(i)),
            grams4 AS MATERIALIZED (
              SELECT doc_id, i.i AS pos,
                     array_to_string(t[i.i:i.i+3], ' ') AS gram
              FROM toks4,
                   unnest(generate_series(1, greatest(len(t) - 3, 1))) AS i(i)),
            dup4 AS MATERIALIZED (
              SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS nd FROM grams4 GROUP BY 1)
              WHERE nd >= 2),
            covered4 AS MATERIALIZED (
              SELECT DISTINCT g.doc_id, g.pos + o.o AS pos
              FROM grams4 g JOIN dup4 USING (gram),
                   unnest(generate_series(0, 3)) AS o(o)),
            kept4 AS MATERIALIZED (
              SELECT p.doc_id, p.pos, p.tok
              FROM pos4 p ANTI JOIN covered4 c
                ON p.doc_id = c.doc_id AND p.pos = c.pos),
            rebuilt4 AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                     count(*) AS kept
              FROM kept4 GROUP BY 1),
            base4 AS (SELECT doc_id, count(*) AS n_tokens FROM pos4 GROUP BY 1)
            SELECT b.doc_id, coalesce(r.clean_text, '') AS clean_text,
                   b.n_tokens, b.n_tokens - coalesce(r.kept, 0) AS n_removed
            FROM base4 b LEFT JOIN rebuilt4 r USING (doc_id)""",
        # planted-truth ladder expectation, one UNION branch per lane:
        # verbatim copies -> EXACT 1.0 no codes; '?'-suffixed copies ->
        # CANONICAL 1.0 + QUESTION (canon strips the punctuation, the
        # marker flag survives); nonsense -> NO_MATCH + code. Analytic
        # like the planted ANN oracles -- the engine must reproduce the
        # known truth set exactly.
        "streaming_incremental_er": f"""
            WITH cu AS (
              SELECT doc_id FROM (
                SELECT doc_id, {_CANON} AS c FROM documents)
              QUALIFY count(*) OVER (PARTITION BY c) = 1)
            SELECT 'q' || CAST(doc_id AS VARCHAR) AS query_id,
                   'i' || CAST(doc_id AS VARCHAR) AS index_id,
                   CAST(1.0 AS DOUBLE) AS score,
                   'EXACT' AS match_type, '' AS error_codes
            FROM cu
            UNION ALL
            SELECT 'm' || CAST(doc_id AS VARCHAR),
                   'i' || CAST(doc_id AS VARCHAR),
                   CAST(1.0 AS DOUBLE), 'CANONICAL', 'QUESTION'
            FROM cu WHERE doc_id % 5 = 0
            UNION ALL
            SELECT 'x' || CAST(doc_id AS VARCHAR),
                   CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
                   'NO_MATCH', 'NO_MATCH'
            FROM cu WHERE doc_id % 25 = 0""",
        # every collision-free row staged twice, byte-identical -> the
        # dedup must emit exactly that subset once (the HAVING filter
        # mirrors the query's unique-hash staging, so the lane stays
        # deterministic at any SF -- organic collision groups would make
        # the survivor doc_id processing-order)
        "streaming_exact_dedup": f"""
            WITH h AS (
              SELECT doc_id, md5(lower({_NORM})) AS text_hash
              FROM documents),
            u AS (
              SELECT text_hash FROM h
              GROUP BY text_hash HAVING count(*) = 1)
            SELECT h.doc_id, h.text_hash
            FROM h JOIN u USING (text_hash)""",
        # the bucketed write/read roundtrip must be content-transparent:
        # plain join over the SOURCE tables, cents-quantized money sums
        "bucketed_join_parity": """
            SELECT o.o_orderkey, o.o_custkey,
                   count(*) AS n_items,
                   CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
                     AS sum_qty,
                   CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT))
                       AS DOUBLE) / 100.0 AS revenue
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey % 10 = 0
            GROUP BY o.o_orderkey, o.o_custkey""",
        # planted candidate pairs (self re-ingest at jaccard 1.0 +
        # successor re-ingest at organic similarity), exact shingle
        # jaccard replayed by the same SQL as the all-pairs dedup oracles
        "jaccard_verify_cross": f"""
            WITH t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            ), cands AS (
              SELECT a.doc_id AS doc_id_l, a.doc_id + 3000000 AS doc_id_r
              FROM documents a WHERE a.doc_id % 10 = 0
              UNION ALL
              SELECT a.doc_id, b.doc_id + 3000000
              FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
              WHERE a.doc_id % 10 = 0
            )
            SELECT c.doc_id_l, c.doc_id_r,
                   round(len(list_intersect(l.sh, r.sh))::double
                     / len(list_distinct(list_concat(l.sh, r.sh))), 4)
                     AS jaccard
            FROM cands c
            JOIN s l ON l.doc_id = c.doc_id_l
            JOIN s r ON r.doc_id = c.doc_id_r - 3000000""",
        "pagerank_supply_graph": _pagerank_oracle(),
        "hits_supply_graph": _hits_oracle(),
        "jl_projection": _jl_oracle(),
        "render_conversations": _CONV_FP_SQL + """,
            lines AS (
              SELECT conv_id, turn_idx,
                     -- coalesce mirrors the Spark operator's null-text
                     -- handling (null turn -> 'role: ' line, still counted)
                     (CASE WHEN turn_idx % 2 = 0 THEN 'user'
                           ELSE 'assistant' END) || ': '
                       || coalesce(text, '') AS line
              FROM turns),
            agg AS (
              SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                     string_agg(line, chr(10) ORDER BY turn_idx) AS text
              FROM lines GROUP BY conv_id)
            SELECT conv_id, n_turns,
                   CAST(length(text) AS BIGINT) AS n_chars, text
            FROM agg""",
        "sft_pairs": _CONV_FP_SQL + """,
            rt AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN turn_idx % 2 = 0 THEN 'user'
                          ELSE 'assistant' END AS role, text
              FROM turns),
            lagged AS (
              SELECT conv_id, turn_idx, role, text,
                     lag(role) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev_role,
                     lag(text) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev_text
              FROM rt)
            SELECT conv_id, turn_idx, prev_text AS prompt,
                   text AS response
            FROM lagged
            WHERE role = 'assistant' AND prev_role = 'user'""",
        "fuzzy_bm25_topk": _fuzzy_bm25_oracle(),
        "frame_schedule": """
            WITH media AS (
              SELECT doc_id AS media_id,
                     ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)]
                       AS kind,
                     CAST(n_chars * 7 % 4000 AS INT) AS duration_ms
              FROM documents)
            SELECT media_id, kind,
                   CAST(g.g / 200 AS INT) AS frame_idx,
                   CAST(g.g AS INT) AS frame_ts_ms
            FROM media, unnest(generate_series(0, duration_ms - 1, 200)) AS g(g)
            WHERE kind <> 'image' AND duration_ms > 0""",
        "chunk_documents": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            st AS (
              SELECT doc_id, t,
                     greatest(CAST(ceil((len(t) - 32) / 24) * 24 + 1 AS INT), 1)
                       AS last_start
              FROM toks)
            SELECT doc_id,
                   CAST((s.s - 1) / 24 AS INT) AS chunk_idx,
                   array_to_string(t[s.s:s.s+31], ' ') AS chunk_text,
                   len(t[s.s:s.s+31]) AS n_tokens
            FROM st, unnest(generate_series(1, last_start, 24)) AS s(s)""",
        "event_transitions": """
            WITH p AS (
              SELECT event_type AS from_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS to_type
              FROM events),
            c AS (SELECT from_type, to_type, count(*) AS n
                  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
            t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t
                  FROM c GROUP BY 1)
            SELECT c.from_type, c.to_type, CAST(n AS BIGINT) AS n,
                   round(CAST(n AS DOUBLE) / t, 6) AS prob
            FROM c JOIN t USING (from_type)""",
        # RFM replay: identical rank keys (rounded monetary) and integer
        # quintile boundaries
        "rfm_segments": """
            WITH p AS (SELECT * FROM events
                       WHERE event_type = 'purchase'),
            mx AS (SELECT max(ts) AS mx FROM p),
            pu AS (SELECT user_id, max(ts) AS last,
                          count(*) AS frequency,
                          CAST(sum(CAST(round(value * 1000000.0) AS BIGINT))
                               AS DOUBLE) / 1000000.0 AS monetary
                   FROM p GROUP BY 1),
            base AS (
              -- mirror the Spark side's null-metric exclusion (possible
              -- only when every event for a user has null ts/value):
              -- engines disagree on null sort order, and a null metric
              -- has no defensible quantile
              SELECT user_id,
                     date_diff('day', CAST(last AS DATE),
                               CAST(mx AS DATE)) AS recency_days,
                     frequency, monetary
              FROM pu, mx
              WHERE last IS NOT NULL AND monetary IS NOT NULL
                AND date_diff('day', CAST(last AS DATE),
                              CAST(mx AS DATE)) IS NOT NULL),
            rk AS (
              SELECT *,
                     row_number() OVER (ORDER BY recency_days ASC, user_id)
                       AS r_rk,
                     row_number() OVER (ORDER BY frequency DESC, user_id)
                       AS f_rk,
                     row_number() OVER (ORDER BY monetary DESC, user_id)
                       AS m_rk,
                     count(*) OVER () AS n
              FROM base)
            SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
                   CAST(frequency AS BIGINT) AS frequency, monetary,
                   CAST((r_rk - 1) * 5 // n + 1 AS INTEGER) AS r_q,
                   CAST((f_rk - 1) * 5 // n + 1 AS INTEGER) AS f_q,
                   CAST((m_rk - 1) * 5 // n + 1 AS INTEGER) AS m_q,
                   CAST(((r_rk - 1) * 5 // n + 1) * 100
                        + ((f_rk - 1) * 5 // n + 1) * 10
                        + ((m_rk - 1) * 5 // n + 1) AS INTEGER) AS rfm_code
            FROM rk""",
        # first-touch funnel replay: conditional-min per stage, strict >
        "funnel_stages": """
            WITH ev AS (
              SELECT user_id AS u, ts, event_type AS ty FROM events
              WHERE event_type IN ('view', 'click', 'purchase')),
            s0 AS (
              SELECT u, min(CASE WHEN ty = 'view' THEN ts END) AS t0
              FROM ev GROUP BY u
              HAVING min(CASE WHEN ty = 'view' THEN ts END) IS NOT NULL),
            s1 AS (
              SELECT ev.u, min(ev.ts) AS t1
              FROM ev JOIN s0 USING (u)
              WHERE ev.ty = 'click' AND ev.ts > s0.t0 GROUP BY ev.u),
            s2 AS (
              SELECT ev.u, min(ev.ts) AS t2
              FROM ev JOIN s1 USING (u)
              WHERE ev.ty = 'purchase' AND ev.ts > s1.t1 GROUP BY ev.u),
            c AS (
              SELECT 0 AS stage_idx, 'view' AS stage,
                     (SELECT count(*) FROM s0) AS n_users
              UNION ALL
              SELECT 1, 'click', (SELECT count(*) FROM s1)
              UNION ALL
              SELECT 2, 'purchase', (SELECT count(*) FROM s2))
            SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
                   CAST(n_users AS BIGINT) AS n_users,
                   round(CAST(n_users AS DOUBLE)
                         / (SELECT count(*) FROM s0), 6) AS conversion
            FROM c""",
        # cohort triangle replay: ISO-week truncation (Monday start in
        # both engines), day-diff // 7 offsets
        "cohort_retention": """
            WITH act AS (
              SELECT DISTINCT user_id AS u,
                     CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
              FROM events),
            first AS (SELECT u, min(w) AS cw FROM act GROUP BY u),
            j AS (
              SELECT first.cw,
                     date_diff('day', first.cw, act.w) // 7 AS week_offset
              FROM act JOIN first USING (u))
            SELECT cw AS cohort_week,
                   CAST(week_offset AS BIGINT) AS week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM j WHERE week_offset <= 12
            GROUP BY 1, 2""",
        "gap_fill_minutes": """
            WITH b AS (
              SELECT user_id AS k, date_trunc('minute', ts) AS bt,
                     round(avg(value), 6) AS v
              FROM events WHERE user_id % 200 = 0 GROUP BY 1, 2),
            bounds AS (SELECT k, min(bt) AS lo, max(bt) AS hi FROM b GROUP BY 1),
            grid AS (
              SELECT k, g.g AS bt
              FROM bounds,
                   unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS g(g)),
            joined AS (
              SELECT grid.k, grid.bt, b.v FROM grid LEFT JOIN b USING (k, bt))
            SELECT k AS user_id, bt AS bucket_ts,
                   last_value(v IGNORE NULLS) OVER (
                     PARTITION BY k ORDER BY bt
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
                   (v IS NULL) AS filled
            FROM joined""",
        # CCNet line dedup replay: 10-token chunk lines via i//10 grouping
        # (content-identical to Spark's slice()-built lines), md5 line
        # keys, argmin keeper = (min doc, its first line index)
        "line_dedup": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS tok,
                     generate_subscripts({_TOKS}, 1) - 1 AS i
              FROM documents),
            lines AS (
              SELECT doc_id, i // 10 AS line_idx,
                     string_agg(tok, ' ' ORDER BY i) AS line
              FROM toks GROUP BY doc_id, i // 10),
            h AS (SELECT doc_id, line_idx, line, md5(line) AS hsh
                  FROM lines),
            pd AS (SELECT hsh, doc_id, min(line_idx) AS fi
                   FROM h GROUP BY 1, 2),
            st AS (SELECT hsh, count(*) AS n_docs FROM pd GROUP BY 1),
            keeper AS (
              SELECT pd.hsh, pd.doc_id AS kd, pd.fi AS kfi
              FROM pd JOIN (SELECT hsh, min(doc_id) AS kd FROM pd
                            GROUP BY 1) m
                ON pd.hsh = m.hsh AND pd.doc_id = m.kd),
            kept AS (
              SELECT h.doc_id, h.line_idx, h.line
              FROM h JOIN st USING (hsh) JOIN keeper USING (hsh)
              WHERE st.n_docs < 2
                 OR (h.doc_id = keeper.kd AND h.line_idx = keeper.kfi)),
            reb AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(line, ' ' ORDER BY line_idx) AS text_kept
              FROM kept GROUP BY doc_id),
            tot AS (SELECT doc_id, count(*) AS n_lines FROM lines
                    GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(tot.n_lines, 0) AS BIGINT) AS n_lines,
                   CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
                   coalesce(reb.text_kept, '') AS text_kept
            FROM documents d
            LEFT JOIN tot USING (doc_id) LEFT JOIN reb USING (doc_id)""",
        "strip_dup_spans": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            pos_tok AS (
              SELECT doc_id, i.i AS pos, t[i.i] AS tok
              FROM toks, unnest(generate_series(1, len(t))) AS i(i)),
            grams AS (
              SELECT doc_id, i.i AS pos,
                     array_to_string(t[i.i:i.i+3], ' ') AS gram
              FROM toks,
                   unnest(generate_series(1, greatest(len(t) - 3, 1))) AS i(i)),
            dup AS (
              SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS nd FROM grams GROUP BY 1)
              WHERE nd >= 2),
            covered AS (
              SELECT DISTINCT g.doc_id, g.pos + o.o AS pos
              FROM grams g JOIN dup USING (gram),
                   unnest(generate_series(0, 3)) AS o(o)),
            kept AS (
              SELECT p.doc_id, p.pos, p.tok
              FROM pos_tok p ANTI JOIN covered c
                ON p.doc_id = c.doc_id AND p.pos = c.pos),
            rebuilt AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                     count(*) AS kept
              FROM kept GROUP BY 1),
            base AS (SELECT doc_id, count(*) AS n_tokens FROM pos_tok GROUP BY 1)
            SELECT b.doc_id, coalesce(r.clean_text, '') AS clean_text,
                   b.n_tokens,
                   b.n_tokens - coalesce(r.kept, 0) AS n_removed
            FROM base b LEFT JOIN rebuilt r USING (doc_id)""",
        "winnowing_pairs": f"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 4000000, array_to_string({_TOKS}[5:29], ' ')
              FROM documents WHERE doc_id % 10 = 0),
            toks AS (
              SELECT doc_id,
                     string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
              FROM aug),
            grams AS (
              SELECT doc_id, greatest(len(t) - 3, 1) AS m, i.i AS pos,
                     array_to_string(t[i.i:i.i+3], ' ') AS gram
              FROM toks,
                   unnest(generate_series(1, greatest(len(t) - 3, 1))) AS i(i)),
            comb AS (
              SELECT doc_id, m, pos,
                     CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) * 2097152
                     + (1048576 - pos) AS comb
              FROM grams),
            selraw AS (
              SELECT doc_id, pos, m,
                     min(comb) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING)
                       AS w_min
              FROM comb),
            sel AS (
              SELECT DISTINCT doc_id, w_min FROM selraw
              WHERE pos <= greatest(m - 4, 1)),
            fp AS (
              SELECT DISTINCT doc_id,
                     CAST(floor(w_min / 2097152) AS BIGINT) AS fp_hash
              FROM sel),
            kept AS (
              SELECT fp_hash FROM (SELECT fp_hash, count(*) AS c FROM fp GROUP BY 1)
              WHERE c <= 50),
            fk AS (SELECT doc_id, fp_hash FROM fp JOIN kept USING (fp_hash))
            SELECT a.doc_id AS doc_id_l, b.doc_id AS doc_id_r,
                   count(*) AS shared_fps
            FROM fk a JOIN fk b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 3""",
        "event_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click') AS click,
                   count(*) FILTER (event_type = 'error') AS error,
                   count(*) FILTER (event_type = 'purchase') AS purchase,
                   count(*) FILTER (event_type = 'signup') AS signup,
                   count(*) FILTER (event_type = 'view') AS view
            FROM events GROUP BY user_id""",
        "skew_salted_join": """
            WITH ev AS (
              SELECT event_id, value,
                     CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS k
              FROM events),
            dim AS (SELECT DISTINCT k, 'grp-' || k AS attr FROM ev)
            SELECT ev.k, dim.attr, count(*) AS n,
                   round(sum(ev.value), 4) AS total
            FROM ev JOIN dim USING (k)
            GROUP BY ev.k, dim.attr""",
        "order_cube": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
        # full SQL replay of the deterministic HLL sketch (p=10, m=1024,
        # RMAX=51): md5-prefix 60-bit hash, bin()-length rank (no float
        # log2), INTEGER-summed 2^-M series, published estimator constant
        # inlined as the identical double literal on both sides
        # unrolled-CTE replay of the Fellegi-Sunter EM fit (same init,
        # factor order, and pid-ordered M-step sums as fs_em)
        "fs_match_weights": _fs_oracle_sql(_BK, _FS_ITERS),
        "fs_multilevel_weights": _fs_ml_oracle_sql(_BK, _FS_ITERS),
        "fs_level_weights": _fs_ml_levels_oracle_sql(_BK, _FS_ITERS),
        "uncertain_pairs": _fs_uncertain_oracle_sql(_BK, _FS_ITERS),
        # TF adjustment: exact BIGINT frequency statistics (n_v, N, sum
        # n_v^2); only the final log2s are libm, absorbed by the 6-dp
        # round (Spark computes log(2, x) = ln x / ln 2)
        "tf_adjusted_weights": """
            WITH v AS (
              SELECT string_split(lower(text), ' ')[1] AS value
              FROM documents
              WHERE string_split(lower(text), ' ')[1] IS NOT NULL),
            f AS (
              SELECT value, CAST(count(*) AS BIGINT) AS n_v
              FROM v GROUP BY 1),
            t AS (
              SELECT CAST(sum(n_v) AS BIGINT) AS n,
                     CAST(sum(n_v * n_v) AS BIGINT) AS sq
              FROM f)
            SELECT value, n_v,
                   round(CAST(n_v AS DOUBLE) / CAST(n AS DOUBLE), 6)
                     AS u_value,
                   round(CAST(sq AS DOUBLE) /
                         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                     AS u_field,
                   round(ln((CAST(sq AS DOUBLE) /
                             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
                            (CAST(n_v AS DOUBLE) / CAST(n AS DOUBLE)))
                         / ln(2.0), 6) AS tf_adjustment,
                   round(ln(0.9 / (CAST(n_v AS DOUBLE) / CAST(n AS DOUBLE)))
                         / ln(2.0), 6) AS adjusted_weight
            FROM f, t""",
        "snm_pairs": """
            WITH r AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY lower(trim(text)), doc_id) - 1 AS rk
              FROM documents)
            SELECT l.doc_id AS id_l, r2.doc_id AS id_r,
                   CAST(l.rk AS BIGINT) AS rank_l, CAST(r2.rk AS BIGINT) AS rank_r
            FROM r l JOIN r r2 ON r2.rk > l.rk AND r2.rk - l.rk < 5
        """,
        # Meta-blocking: CBS weights + node-centric prune, all-integer
        # (the keep test is cross-multiplied, no float mean)
        "meta_blocking_prune": """
            WITH a AS (
              SELECT doc_id AS rid, b.block_id
              FROM documents,
                   unnest([
                     'w|' || lower(split_part(text, ' ', 1)) || '|' ||
                             lower(split_part(text, ' ', 2)),
                     'c|' || substr(lower(regexp_replace(text, '[^a-zA-Z]', '', 'g')), 1, 12),
                     'p|' || substr(lower(split_part(text, ' ', 1)), 1, 4)
                   ]) AS b(block_id)),
            m AS (SELECT DISTINCT block_id, rid FROM a),
            e AS (
              SELECT l.rid AS id_a, r.rid AS id_b,
                     CAST(count(*) AS BIGINT) AS weight
              FROM m l JOIN m r ON l.block_id = r.block_id AND l.rid < r.rid
              GROUP BY 1, 2),
            inc AS (
              SELECT id_a AS node, weight FROM e
              UNION ALL SELECT id_b AS node, weight FROM e),
            st AS (
              SELECT node, CAST(count(*) AS BIGINT) AS deg,
                     CAST(sum(weight) AS BIGINT) AS sum_w
              FROM inc GROUP BY 1)
            SELECT e.id_a AS doc_id_l, e.id_b AS doc_id_r, e.weight
            FROM e
            JOIN st sa ON e.id_a = sa.node
            JOIN st sb ON e.id_b = sb.node
            WHERE e.weight * sa.deg >= sa.sum_w
               OR e.weight * sb.deg >= sb.sum_w
        """,
        # Cluster-cohesion QA: chain vs clique density, all-integer counts
        "cluster_cohesion": """
            WITH d AS (SELECT doc_id FROM documents),
            labels AS (
              SELECT doc_id AS rid, 'g' || CAST(doc_id // 10 AS VARCHAR) AS c
              FROM d),
            chain AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
                AND a.doc_id // 10 = b.doc_id // 10),
            g0 AS (SELECT doc_id // 10 AS g, doc_id FROM d
                   WHERE (doc_id // 10) % 3 = 0),
            clique AS (
              SELECT l.doc_id AS id_a, r.doc_id AS id_b
              FROM g0 l JOIN g0 r ON l.g = r.g AND l.doc_id < r.doc_id),
            e AS (
              SELECT DISTINCT id_a, id_b FROM
                (SELECT * FROM chain UNION ALL SELECT * FROM clique)
              WHERE id_a != id_b),
            internal AS (
              SELECT la.c AS cluster_id, CAST(count(*) AS BIGINT) AS n_internal_edges
              FROM e
              JOIN labels la ON e.id_a = la.rid
              JOIN labels lb ON e.id_b = lb.rid
              WHERE la.c = lb.c GROUP BY 1),
            sizes AS (
              SELECT c AS cluster_id, CAST(count(*) AS BIGINT) AS n_members
              FROM labels GROUP BY 1 HAVING count(*) >= 2)
            SELECT s.cluster_id, s.n_members,
                   COALESCE(i.n_internal_edges, 0) AS n_internal_edges,
                   round(CAST(COALESCE(i.n_internal_edges, 0) AS DOUBLE) /
                         (s.n_members * (s.n_members - 1) // 2), 6) AS density,
                   CAST(COALESCE(i.n_internal_edges, 0) AS DOUBLE) /
                     (s.n_members * (s.n_members - 1) // 2) < 0.5 AS low_cohesion
            FROM sizes s LEFT JOIN internal i ON s.cluster_id = i.cluster_id
        """,
        # Threshold sweep: band histogram + window cumsum, all-integer
        "threshold_sweep": f"""
            WITH d AS (SELECT {_BK} AS bk, doc_id, text FROM documents),
            scored AS (
              SELECT l.doc_id AS a, r.doc_id AS b,
                     1.0 - CAST(levenshtein(l.text, r.text) AS DOUBLE) /
                           greatest(length(l.text), length(r.text)) AS s
              FROM d l JOIN d r ON l.bk = r.bk AND l.doc_id < r.doc_id),
            p AS (SELECT a, b, max(s) AS s FROM scored GROUP BY 1, 2),
            gold AS (
              SELECT x.doc_id AS a, y.doc_id AS b
              FROM documents x JOIN documents y
                ON x.doc_id < y.doc_id
               AND x.doc_id // 10 = y.doc_id // 10),
            labeled AS (
              SELECT p.s, CASE WHEN g.a IS NULL THEN 0 ELSE 1 END AS ig
              FROM p LEFT JOIN gold g ON p.a = g.a AND p.b = g.b),
            ng AS (SELECT CAST(count(*) AS BIGINT) AS n_gold FROM gold),
            hist AS (
              SELECT round(s, 2) AS threshold,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(ig) AS BIGINT) AS tp
              FROM labeled GROUP BY 1),
            cum AS (
              SELECT threshold,
                     CAST(sum(n) OVER (ORDER BY threshold DESC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_pred,
                     CAST(sum(tp) OVER (ORDER BY threshold DESC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_tp
              FROM hist)
            SELECT threshold, n_pred, n_tp,
                   round(CAST(n_tp AS DOUBLE) / n_pred, 6) AS precision,
                   round(CASE WHEN ng.n_gold > 0
                     THEN CAST(n_tp AS DOUBLE) / ng.n_gold ELSE 0.0 END, 6)
                     AS recall,
                   round(CASE WHEN (CAST(n_tp AS DOUBLE) / n_pred +
                       CASE WHEN ng.n_gold > 0
                         THEN CAST(n_tp AS DOUBLE) / ng.n_gold
                         ELSE 0.0 END) > 0
                     THEN 2 * (CAST(n_tp AS DOUBLE) / n_pred) *
                       (CAST(n_tp AS DOUBLE) / ng.n_gold) /
                       (CAST(n_tp AS DOUBLE) / n_pred +
                        CAST(n_tp AS DOUBLE) / ng.n_gold)
                     ELSE 0.0 END, 6) AS f1
            FROM cum CROSS JOIN ng
        """,
        # Block-size histogram: integer counts; floor(log2) is exact at
        # the only boundary (powers of two)
        "block_size_histogram": """
            WITH a AS (
              SELECT doc_id AS rid, b.block_id
              FROM documents,
                   unnest([
                     'w|' || lower(split_part(text, ' ', 1)) || '|' ||
                             lower(split_part(text, ' ', 2)),
                     'c|' || substr(lower(regexp_replace(text, '[^a-zA-Z]', '', 'g')), 1, 12),
                     'p|' || substr(lower(split_part(text, ' ', 1)), 1, 4)
                   ]) AS b(block_id)),
            sizes AS (SELECT block_id, count(*) AS s FROM a GROUP BY 1)
            SELECT CAST(floor(log2(s)) AS INTEGER) AS log2_size,
                   CAST(count(*) AS BIGINT) AS n_blocks,
                   CAST(sum(s) AS BIGINT) AS n_records,
                   CAST(sum(s * (s - 1) // 2) AS BIGINT) AS n_pairs
            FROM sizes GROUP BY 1
        """,
        # Reciprocal best match: window replay of the min(struct) winners
        "two_source_linkage": f"""
            WITH d AS (SELECT {_BK} AS bk, doc_id, text FROM documents),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
                           greatest(length(a.text), length(b.text)) AS score
              FROM d a JOIN d b ON a.bk = b.bk
              WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
            ra AS (
              SELECT id_a, id_b, score,
                     row_number() OVER (PARTITION BY id_a
                       ORDER BY score DESC, id_b ASC) AS rn_a
              FROM p),
            rb AS (
              SELECT id_a, id_b,
                     row_number() OVER (PARTITION BY id_b
                       ORDER BY score DESC, id_a ASC) AS rn_b
              FROM p)
            SELECT ra.id_a, ra.id_b, round(ra.score, 6) AS score
            FROM ra JOIN rb ON ra.id_a = rb.id_a AND ra.id_b = rb.id_b
            WHERE ra.rn_a = 1 AND rb.rn_b = 1
        """,
        # Cluster repair: cohesion flags -> strict-subgraph recursive
        # closure, min-member labels ('r|' prefix), singleton fallback
        "cluster_repair": """
            WITH RECURSIVE d AS (SELECT doc_id FROM documents),
            labels AS (
              SELECT doc_id AS rid, 'g' || CAST(doc_id // 10 AS VARCHAR) AS c
              FROM d),
            chain AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CASE WHEN a.doc_id % 10 = 0 THEN 0.9 ELSE 0.55 END AS score
              FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
                AND a.doc_id // 10 = b.doc_id // 10),
            g0 AS (SELECT doc_id // 10 AS g, doc_id FROM d
                   WHERE (doc_id // 10) % 3 = 0),
            clique AS (
              SELECT l.doc_id AS id_a, r.doc_id AS id_b, 0.9 AS score
              FROM g0 l JOIN g0 r ON l.g = r.g AND l.doc_id < r.doc_id),
            e AS (SELECT * FROM chain UNION ALL SELECT * FROM clique),
            edist AS (SELECT DISTINCT id_a, id_b FROM e),
            sizes AS (
              SELECT c, count(*) AS n FROM labels GROUP BY 1
              HAVING count(*) >= 2),
            icount AS (
              SELECT la.c AS c, count(*) AS ne
              FROM edist ed
              JOIN labels la ON ed.id_a = la.rid
              JOIN labels lb ON ed.id_b = lb.rid
              WHERE la.c = lb.c GROUP BY 1),
            flagged AS (
              SELECT s.c FROM sizes s LEFT JOIN icount i ON s.c = i.c
              WHERE CAST(COALESCE(i.ne, 0) AS DOUBLE) /
                    (s.n * (s.n - 1) // 2) < 0.5),
            fm AS (SELECT rid, c FROM labels
                   WHERE c IN (SELECT c FROM flagged)),
            strict AS (
              SELECT DISTINCT ed.id_a, ed.id_b FROM e ed
              JOIN fm a ON ed.id_a = a.rid
              JOIN fm b ON ed.id_b = b.rid
              WHERE a.c = b.c AND ed.score >= 0.8),
            sym AS (
              SELECT id_a AS x, id_b AS y FROM strict
              UNION ALL SELECT id_b, id_a FROM strict),
            reach AS (
              SELECT rid AS id, rid AS r FROM fm
              UNION
              SELECT sym.y, reach.r FROM reach JOIN sym ON sym.x = reach.id),
            cc AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
            SELECT rid AS record_id, c AS cluster_id, false AS repaired
            FROM labels WHERE c NOT IN (SELECT c FROM flagged)
            UNION ALL
            SELECT fm.rid AS record_id,
                   'r|' || CAST(cc.root AS VARCHAR) AS cluster_id,
                   true AS repaired
            FROM fm JOIN cc ON fm.rid = cc.id
        """,
        # B-cubed: exact BIGINT cell sums; final folds replayed in
        # cluster-id-sorted order
        "bcubed_scorecard": """
            WITH l AS (
              SELECT CASE WHEN doc_id % 10 >= 8
                       THEN 'm' || CAST(doc_id // 20 AS VARCHAR)
                       ELSE 'c' || CAST(doc_id // 10 AS VARCHAR) END AS p,
                     'g' || CAST(doc_id // 10 AS VARCHAR) AS g
              FROM documents),
            cells AS (SELECT p, g, count(*) AS n FROM l GROUP BY 1, 2),
            pp AS (
              SELECT p AS k,
                     CAST(CAST(sum(n * n) AS BIGINT) AS DOUBLE) /
                       CAST(sum(n) AS BIGINT) AS term,
                     CAST(sum(n) AS BIGINT) AS sz
              FROM cells GROUP BY 1),
            gg AS (
              SELECT g AS k,
                     CAST(CAST(sum(n * n) AS BIGINT) AS DOUBLE) /
                       CAST(sum(n) AS BIGINT) AS term,
                     CAST(sum(n) AS BIGINT) AS sz
              FROM cells GROUP BY 1),
            sp AS (
              SELECT list_sum(list_transform(
                       list_sort(list(struct_pack(k := k, term := term))),
                       x -> x.term)) AS sum_p,
                     CAST(sum(sz) AS BIGINT) AS n_p
              FROM pp),
            sg AS (
              SELECT list_sum(list_transform(
                       list_sort(list(struct_pack(k := k, term := term))),
                       x -> x.term)) AS sum_g,
                     CAST(sum(sz) AS BIGINT) AS n_g
              FROM gg)
            SELECT n_p AS n_records,
                   round(sum_p / n_p, 6) AS bcubed_precision,
                   round(sum_g / n_g, 6) AS bcubed_recall,
                   round(CASE WHEN (sum_p / n_p + sum_g / n_g) > 0 THEN
                     2 * (sum_p / n_p) * (sum_g / n_g) /
                       (sum_p / n_p + sum_g / n_g) ELSE 0.0 END, 6) AS bcubed_f1
            FROM sp, sg
        """,
        # ARI: integer C(n,2) sufficient statistics, four double ops
        "adjusted_rand": """
            WITH l AS (
              SELECT CASE WHEN doc_id % 10 >= 8
                       THEN 'm' || CAST(doc_id // 20 AS VARCHAR)
                       ELSE 'c' || CAST(doc_id // 10 AS VARCHAR) END AS p,
                     'g' || CAST(doc_id // 10 AS VARCHAR) AS g
              FROM documents),
            cells AS (SELECT p, g, count(*) AS n FROM l GROUP BY 1, 2),
            cs AS (
              SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS sum_cells_c2,
                     CAST(sum(n) AS BIGINT) AS n_records
              FROM cells),
            ps AS (
              SELECT CAST(sum(np * (np - 1) // 2) AS BIGINT) AS sum_pred_c2
              FROM (SELECT sum(n) AS np FROM cells GROUP BY p)),
            gs AS (
              SELECT CAST(sum(ng * (ng - 1) // 2) AS BIGINT) AS sum_gold_c2
              FROM (SELECT sum(n) AS ng FROM cells GROUP BY g))
            SELECT n_records, sum_cells_c2, sum_pred_c2, sum_gold_c2,
                   round(CASE WHEN
                     (sum_pred_c2 + sum_gold_c2) / 2.0 -
                       sum_pred_c2 * sum_gold_c2 /
                         CAST(n_records * (n_records - 1) / 2 AS DOUBLE) != 0.0
                     THEN (sum_cells_c2 - sum_pred_c2 * sum_gold_c2 /
                             CAST(n_records * (n_records - 1) / 2 AS DOUBLE)) /
                          ((sum_pred_c2 + sum_gold_c2) / 2.0 -
                             sum_pred_c2 * sum_gold_c2 /
                               CAST(n_records * (n_records - 1) / 2 AS DOUBLE))
                     ELSE 1.0 END, 6) AS ari
            FROM cs, ps, gs
        """,
        # NMI/V-measure: BIGINT contingency statistics; MI + entropy terms
        # are doubles folded in key-sorted order (the bcubed contract);
        # 6-dp round absorbs libm ln ulp; v computed from ROUNDED h/c on
        # both engines
        "nmi_scorecard": """
            WITH l AS (
              SELECT CASE WHEN doc_id % 10 >= 8
                       THEN 'm' || CAST(doc_id // 20 AS VARCHAR)
                       ELSE 'c' || CAST(doc_id // 10 AS VARCHAR) END AS p,
                     'g' || CAST(doc_id // 10 AS VARCHAR) AS g
              FROM documents),
            cells AS (
              SELECT p, g, CAST(count(*) AS BIGINT) AS n_pg
              FROM l GROUP BY 1, 2),
            mp AS (
              SELECT p, CAST(sum(n_pg) AS BIGINT) AS n_p
              FROM cells GROUP BY 1),
            mg AS (
              SELECT g, CAST(sum(n_pg) AS BIGINT) AS n_g
              FROM cells GROUP BY 1),
            nt AS (SELECT CAST(sum(n_pg) AS BIGINT) AS n FROM cells),
            mi AS (
              SELECT list_sum(list_transform(
                       list_sort(list(struct_pack(kp := kp, kg := kg,
                                                  term := term))),
                       x -> x.term)) AS mi
              FROM (
                SELECT cells.p AS kp, cells.g AS kg,
                       (CAST(n_pg AS DOUBLE) / CAST(n AS DOUBLE)) *
                         ln((CAST(n_pg AS DOUBLE) * CAST(n AS DOUBLE)) /
                            (CAST(n_p AS DOUBLE) * CAST(n_g AS DOUBLE)))
                         AS term
                FROM cells JOIN mp USING (p) JOIN mg USING (g)
                CROSS JOIN nt)),
            hp AS (
              SELECT list_sum(list_transform(
                       list_sort(list(struct_pack(k := p, term :=
                         -(CAST(n_p AS DOUBLE) / CAST(n AS DOUBLE)) *
                           ln(CAST(n_p AS DOUBLE) / CAST(n AS DOUBLE))))),
                       x -> x.term)) AS h_pred
              FROM mp CROSS JOIN nt),
            hg AS (
              SELECT list_sum(list_transform(
                       list_sort(list(struct_pack(k := g, term :=
                         -(CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE)) *
                           ln(CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE))))),
                       x -> x.term)) AS h_gold
              FROM mg CROSS JOIN nt),
            hc AS (
              -- raw (unrounded) mi/h feed the h/c ratios; only outputs
              -- are rounded. Aliases renamed so DuckDB's lateral-alias
              -- resolution cannot shadow the raw columns.
              SELECT n AS n_records, round(mi.mi, 6) AS mi_r,
                     round(hp.h_pred, 6) AS hp_r, round(hg.h_gold, 6) AS hg_r,
                     round(CASE WHEN hg.h_gold > 0.0 THEN mi.mi / hg.h_gold
                           ELSE 1.0 END, 6) AS homogeneity,
                     round(CASE WHEN hp.h_pred > 0.0 THEN mi.mi / hp.h_pred
                           ELSE 1.0 END, 6) AS completeness
              FROM nt, mi, hp, hg)
            SELECT n_records, mi_r AS mi, hp_r AS h_pred, hg_r AS h_gold,
                   homogeneity, completeness,
                   round(CASE WHEN (homogeneity + completeness) > 0.0 THEN
                     2.0 * homogeneity * completeness /
                       (homogeneity + completeness)
                     ELSE 0.0 END, 6) AS v_measure
            FROM hc
        """,
        # Monge-Elkan: identical sorted-distinct token prep, identical
        # left-associated fold order, bit-identical levenshtein ratio --
        # 6-dp round is belt-and-braces only
        "monge_elkan_pairs": f"""
            WITH d AS (
              SELECT {_BK} AS bk, doc_id,
                     list_sort(list_distinct(string_split(lower(text), ' ')))[1:10] AS toks
              FROM documents),
            p AS (
              SELECT l.doc_id AS doc_id_l, r.doc_id AS doc_id_r,
                     CASE WHEN len(l.toks) > 0 AND len(r.toks) > 0 THEN
                       list_sum(list_transform(l.toks, a ->
                         list_max(list_transform(r.toks, b ->
                           1.0 - CAST(levenshtein(a, b) AS DOUBLE) /
                                 greatest(length(a), length(b)))))) / len(l.toks)
                     END AS lr,
                     CASE WHEN len(l.toks) > 0 AND len(r.toks) > 0 THEN
                       list_sum(list_transform(r.toks, a ->
                         list_max(list_transform(l.toks, b ->
                           1.0 - CAST(levenshtein(a, b) AS DOUBLE) /
                                 greatest(length(a), length(b)))))) / len(r.toks)
                     END AS rl
              FROM d l JOIN d r ON l.bk = r.bk AND l.doc_id < r.doc_id)
            SELECT doc_id_l, doc_id_r, round(lr, 6) AS me_lr,
                   round(rl, 6) AS me_rl,
                   round((lr + rl) / 2.0, 6) AS me_sym
            FROM p
        """,
        # TF-IDF cosine: folds replayed in the same token-sorted order;
        # the one libm call (ln in idf) is absorbed by the 6-dp round,
        # same contract as fs_match_weights' log2
        # Soft-TF-IDF: identical sliced-sorted-distinct token prep and idf,
        # doc-L2-normalized weights, CLOSE(0.9) via exact-rational nlev
        # (double equality safe cross-engine), argmax = first token-sorted
        # attainer, left folds in token order; ln absorbed by 6-dp round
        "soft_tfidf_pairs": f"""
            WITH d AS (
              SELECT {_BK} AS bk, doc_id,
                     list_filter(
                       list_sort(list_distinct(
                         string_split(lower(text), ' ')))[1:10],
                       t -> t <> '') AS toks
              FROM documents),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
            tok AS (SELECT bk, doc_id, unnest(toks) AS token FROM d),
            dft AS (SELECT token, count(*) AS df FROM tok GROUP BY 1),
            w AS (
              SELECT bk, doc_id, token,
                     ln((n_docs + 1.0) / (df + 1.0)) + 1.0 AS idf
              FROM tok JOIN dft USING (token) CROSS JOIN n),
            tw AS (
              SELECT bk, doc_id,
                     list(struct_pack(t := token, idf := idf)
                          ORDER BY token) AS tw
              FROM w GROUP BY 1, 2),
            wt AS (
              SELECT bk, doc_id,
                     list_transform(tw, x -> struct_pack(t := x.t,
                       w := x.idf / sqrt(list_sum(
                         list_transform(tw, y -> y.idf * y.idf))))) AS wt
              FROM tw),
            p AS (
              SELECT l.doc_id AS doc_id_l, r.doc_id AS doc_id_r,
                     CASE WHEN len(l.wt) > 0 AND len(r.wt) > 0 THEN
                       list_sum(list_transform(l.wt, a ->
                         CASE WHEN list_max(list_transform(r.wt, bb ->
                                1.0 - CAST(levenshtein(a.t, bb.t) AS DOUBLE)
                                      / greatest(length(a.t), length(bb.t))))
                              > 0.9 THEN
                           a.w
                           * list_filter(r.wt, b ->
                               (1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
                                      / greatest(length(a.t), length(b.t)))
                               = list_max(list_transform(r.wt, bb ->
                                   1.0 - CAST(levenshtein(a.t, bb.t)
                                              AS DOUBLE)
                                         / greatest(length(a.t),
                                                    length(bb.t)))))[1].w
                           * list_max(list_transform(r.wt, bb ->
                               1.0 - CAST(levenshtein(a.t, bb.t) AS DOUBLE)
                                     / greatest(length(a.t), length(bb.t))))
                         ELSE 0.0 END))
                     END AS lr,
                     CASE WHEN len(l.wt) > 0 AND len(r.wt) > 0 THEN
                       list_sum(list_transform(r.wt, a ->
                         CASE WHEN list_max(list_transform(l.wt, bb ->
                                1.0 - CAST(levenshtein(a.t, bb.t) AS DOUBLE)
                                      / greatest(length(a.t), length(bb.t))))
                              > 0.9 THEN
                           a.w
                           * list_filter(l.wt, b ->
                               (1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
                                      / greatest(length(a.t), length(b.t)))
                               = list_max(list_transform(l.wt, bb ->
                                   1.0 - CAST(levenshtein(a.t, bb.t)
                                              AS DOUBLE)
                                         / greatest(length(a.t),
                                                    length(bb.t)))))[1].w
                           * list_max(list_transform(l.wt, bb ->
                               1.0 - CAST(levenshtein(a.t, bb.t) AS DOUBLE)
                                     / greatest(length(a.t), length(bb.t))))
                         ELSE 0.0 END))
                     END AS rl
              FROM wt l JOIN wt r ON l.bk = r.bk AND l.doc_id < r.doc_id)
            SELECT doc_id_l, doc_id_r, round(lr, 6) AS soft_lr,
                   round(rl, 6) AS soft_rl,
                   round((lr + rl) / 2.0, 6) AS soft_sym
            FROM p
        """,
        "tfidf_cosine_pairs": f"""
            WITH base AS (SELECT {_BK} AS bk, doc_id, text FROM documents),
            n AS (SELECT count(*) AS n FROM base),
            tok AS (
              SELECT bk, doc_id,
                     unnest(list_distinct(string_split(lower(text), ' '))) AS token
              FROM base),
            tok2 AS (SELECT * FROM tok WHERE token <> ''),
            dft AS (SELECT token, count(*) AS df FROM tok2 GROUP BY 1),
            w AS (
              SELECT t.bk, t.doc_id, t.token,
                     ln((n.n + 1.0) / (dft.df + 1.0)) + 1.0 AS idf
              FROM tok2 t JOIN dft ON t.token = dft.token CROSS JOIN n),
            norms AS (
              SELECT doc_id,
                     sqrt(list_sum(list_transform(
                       list_sort(list(struct_pack(token := token, idf := idf))),
                       x -> x.idf * x.idf))) AS nrm
              FROM w GROUP BY doc_id),
            dots AS (
              SELECT l.doc_id AS doc_id_l, r.doc_id AS doc_id_r,
                     list_sum(list_transform(
                       list_sort(list(struct_pack(token := l.token,
                                                  p := l.idf * r.idf))),
                       x -> x.p)) AS dot
              FROM w l JOIN w r
                ON l.bk = r.bk AND l.token = r.token AND l.doc_id < r.doc_id
              GROUP BY 1, 2)
            SELECT d.doc_id_l, d.doc_id_r,
                   round(d.dot / (nl.nrm * nr.nrm), 6) AS cosine
            FROM dots d
            JOIN norms nl ON d.doc_id_l = nl.doc_id
            JOIN norms nr ON d.doc_id_r = nr.doc_id
        """,
        "golden_record": f"""
            WITH d AS (
              SELECT {_CANON} AS canon_text, doc_id, text, lang, source
              FROM documents),
            base AS (
              SELECT canon_text, CAST(count(*) AS BIGINT) AS n_members
              FROM d GROUP BY 1),
            rep AS (
              SELECT canon_text, doc_id AS rep_id,
                     row_number() OVER (PARTITION BY canon_text
                       ORDER BY length(text) DESC, doc_id ASC) AS rn
              FROM d),
            lv AS (
              SELECT canon_text, lang, count(*) AS nv FROM d
              WHERE lang IS NOT NULL GROUP BY 1, 2),
            lw AS (
              SELECT canon_text, lang AS lang_gold,
                     CAST(nv AS BIGINT) AS lang_support,
                     row_number() OVER (PARTITION BY canon_text
                       ORDER BY nv DESC, lang ASC) AS rn
              FROM lv),
            sv AS (
              SELECT canon_text, source, count(*) AS nv FROM d
              WHERE source IS NOT NULL GROUP BY 1, 2),
            sw AS (
              SELECT canon_text, source AS source_gold,
                     CAST(nv AS BIGINT) AS source_support,
                     row_number() OVER (PARTITION BY canon_text
                       ORDER BY nv DESC, source ASC) AS rn
              FROM sv)
            SELECT b.canon_text, b.n_members, r.rep_id,
                   lw.lang_gold, lw.lang_support,
                   sw.source_gold, sw.source_support
            FROM base b
            JOIN rep r ON b.canon_text = r.canon_text AND r.rn = 1
            LEFT JOIN lw ON b.canon_text = lw.canon_text AND lw.rn = 1
            LEFT JOIN sw ON b.canon_text = sw.canon_text AND sw.rn = 1
        """,
        # brute-force all-pairs truth set: the engine's prefix filter is
        # lossless, so sub-quadratic output == this exact join
        "setsim_join_pairs": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            grams AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                           i -> array_to_string(t[i:i+2], ' '))) AS g
              FROM toks),
            cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_id_l, b.doc_id AS doc_id_r,
                     count(*) AS o
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.doc_id_l, i.doc_id_r, CAST(i.o AS BIGINT) AS overlap,
                   round(i.o / (cl.n + cr.n - i.o), 4) AS jaccard
            FROM inter i
            JOIN cnt cl ON i.doc_id_l = cl.doc_id
            JOIN cnt cr ON i.doc_id_r = cr.doc_id
            WHERE i.o / (cl.n + cr.n - i.o) >= 0.6
        """,
        # interpolated-bigram LM replay: same three corpus statistics
        # (bigram, context, unigram counts), same mixing, ln absorbed by
        # the 6-dp round; < 2-token docs kept with null mean via left join
        "bigram_logprob": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
            pairs AS (
              SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
              FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)
              WHERE len(w) >= 2),
            toks AS (SELECT unnest(w) AS tok FROM t),
            uni AS (SELECT tok, count(*) AS c_uni FROM toks GROUP BY 1),
            tot AS (SELECT sum(c_uni) AS n_total FROM uni),
            bi AS (SELECT w1, w2, count(*) AS c_bi FROM pairs GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c_bi) AS c_ctx FROM bi GROUP BY 1),
            scored AS (
              SELECT p.doc_id, count(*) AS n_pairs,
                     round(avg(ln(0.7 * (b.c_bi / CAST(c.c_ctx AS DOUBLE))
                                  + 0.3 * (u.c_uni / CAST(tot.n_total
                                                          AS DOUBLE)))), 6)
                       AS mean_bigram_logprob
              FROM pairs p
              JOIN bi b USING (w1, w2)
              JOIN ctx c USING (w1)
              JOIN uni u ON u.tok = p.w2
              CROSS JOIN tot
              GROUP BY p.doc_id)
            SELECT t.doc_id,
                   CAST(coalesce(s.n_pairs, 0) AS BIGINT) AS n_pairs,
                   s.mean_bigram_logprob
            FROM t LEFT JOIN scored s USING (doc_id)
        """,
        # Morton-key replay: same integer grid cells (floor of an IEEE
        # double division -- deterministic cross-engine), same interleave
        "zorder_key_orders": (
            lambda _bits=8, _n=2: """
            WITH b AS (
              SELECT min(o_custkey) AS lo0, max(o_custkey) AS hi0,
                     min(o_orderkey) AS lo1, max(o_orderkey) AS hi1
              FROM orders),
            cells AS (
              SELECT o_orderkey,
                     CAST(floor((o_custkey - lo0) * 255 /
                          greatest(hi0 - lo0, 1)) AS BIGINT) AS c0,
                     CAST(floor((o_orderkey - lo1) * 255 /
                          greatest(hi1 - lo1, 1)) AS BIGINT) AS c1
              FROM orders CROSS JOIN b)
            SELECT o_orderkey, CAST(("""
            + " | ".join(
                f"(((c{i} >> {bb}) & 1) << {bb * _n + i})"
                for bb in range(_bits)
                for i in range(_n)
            )
            + """) AS BIGINT) AS zkey FROM cells"""
        )(),
        # SymSpell truth set: the engine's delete-variant equi-join +
        # banded verify is exact, so brute-force levenshtein over
        # vocabulary x sampled-queries is the oracle
        "symspell_lookup": f"""
            WITH toks AS (SELECT unnest({_TOKS}) AS w FROM documents),
            vocab AS (
              SELECT w FROM toks
              WHERE regexp_full_match(w, '^[a-z0-9]+$')
              GROUP BY w),
            q AS (SELECT w FROM vocab WHERE substr(md5(w), 1, 1) = '0')
            SELECT q.w AS query_term, v.w AS dict_term,
                   CAST(levenshtein(q.w, v.w) AS BIGINT) AS dist
            FROM q CROSS JOIN vocab v
            WHERE levenshtein(q.w, v.w) <= 2
        """,
        # HDR sketch replay: same integer bucketing (bit-length exponent,
        # 5-bit sub-buckets), same window cumsum and inverse-CDF pick
        "hdr_quantile_chars": """
            WITH v AS (
              SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
              WHERE n_chars >= 1),
            b AS (
              SELECT lang,
                     (v >> greatest(length(bin(v)) - 1 - 5, 0))
                       << greatest(length(bin(v)) - 1 - 5, 0) AS bucket_lo,
                     count(*) AS cnt
              FROM v GROUP BY 1, 2),
            c AS (
              SELECT lang, bucket_lo,
                     sum(cnt) OVER (PARTITION BY lang ORDER BY bucket_lo)
                       AS cum,
                     sum(cnt) OVER (PARTITION BY lang) AS n
              FROM b),
            q(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                            (CAST(0.99 AS DOUBLE)))
            SELECT lang, q, CAST(min(bucket_lo) AS BIGINT) AS est,
                   CAST(n AS BIGINT) AS n
            FROM c CROSS JOIN q
            WHERE cum >= ceil(q * n)
            GROUP BY lang, q, n
        """,
        # blocklist replay: same normalized word 1- and 2-grams, same
        # phrase list, zero-hit docs via left join
        "blocklist_filter": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKS} AS t FROM documents),
            grams AS (
              SELECT doc_id, unnest(t) AS gram FROM toks
              UNION ALL
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i + 1])) AS gram
              FROM toks WHERE len(t) >= 2),
            p(gram) AS (VALUES ('slow'), ('hash join'), ('broken pipeline')),
            h AS (
              SELECT doc_id, count(*) AS n_hits
              FROM grams JOIN p USING (gram) GROUP BY 1)
            SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   coalesce(h.n_hits, 0) > 0 AS flagged
            FROM documents d LEFT JOIN h USING (doc_id)
        """,
        # hashed-TF logistic regression replay: 3 unrolled GD iterations.
        # w starts at zero (iteration 1's p is exactly 0.5 by
        # construction); weights round to 6 dp per update, so exp() and
        # summation-order noise cannot compound across iterations
        "quality_lr_weights": f"""
            WITH toks AS (
              SELECT doc_id, lang, unnest({_TOKS}) AS t FROM documents),
            cnt AS (
              SELECT doc_id, lang,
                     CAST(CAST(('0x' || substr(md5('lrq|' || t), 1, 15))
                          AS BIGINT) % 256 AS INT) AS bucket,
                     count(*) AS c
              FROM toks WHERE t <> '' GROUP BY 1, 2, 3),
            tot AS (SELECT doc_id, sum(c) AS len FROM cnt GROUP BY 1),
            f AS (
              SELECT c.doc_id AS id, c.bucket,
                     CAST(c.c AS DOUBLE) / t.len AS x,
                     CASE WHEN c.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
              FROM cnt c JOIN tot t USING (doc_id)),
            n AS (SELECT count(DISTINCT id) AS n FROM f),
            g1 AS (SELECT bucket, sum((0.5 - y) * x) AS g FROM f GROUP BY 1),
            w1 AS (SELECT bucket, round(-0.5 * g / n.n, 6) AS w
                   FROM g1 CROSS JOIN n),
            m2 AS (SELECT f.id, f.y, sum(f.x * w1.w) AS m
                   FROM f JOIN w1 USING (bucket) GROUP BY 1, 2),
            p2 AS (SELECT id, y, 1.0 / (1.0 + exp(-m)) AS p FROM m2),
            g2 AS (SELECT f.bucket, sum((p2.p - f.y) * f.x) AS g
                   FROM f JOIN p2 USING (id) GROUP BY 1),
            w2 AS (SELECT g2.bucket, round(w1.w - 0.5 * g2.g / n.n, 6) AS w
                   FROM g2 JOIN w1 USING (bucket) CROSS JOIN n),
            m3 AS (SELECT f.id, f.y, sum(f.x * w2.w) AS m
                   FROM f JOIN w2 USING (bucket) GROUP BY 1, 2),
            p3 AS (SELECT id, y, 1.0 / (1.0 + exp(-m)) AS p FROM m3),
            g3 AS (SELECT f.bucket, sum((p3.p - f.y) * f.x) AS g
                   FROM f JOIN p3 USING (id) GROUP BY 1),
            w3 AS (SELECT g3.bucket, round(w2.w - 0.5 * g3.g / n.n, 6) AS w
                   FROM g3 JOIN w2 USING (bucket) CROSS JOIN n)
            SELECT bucket, w AS weight FROM w3
        """,
        # DSIR replay: same md5('dsir|'||token) % 1024 bucket addressing,
        # same add-1 models with unseen-bucket floors via full-outer join,
        # same 6-dp rounded per-doc sum and (weight DESC, md5 id) rank
        "dsir_selection": f"""
            WITH toks AS (
              SELECT doc_id, lang, unnest({_TOKS}) AS t FROM documents),
            b AS (
              SELECT doc_id, lang,
                     CAST(CAST(('0x' || substr(md5('dsir|' || t), 1, 15))
                          AS BIGINT) % 1024 AS INT) AS bucket,
                     count(*) AS n_tok
              FROM toks WHERE t <> '' GROUP BY 1, 2, 3),
            src AS (SELECT bucket, sum(n_tok) AS c FROM b GROUP BY 1),
            tgt AS (SELECT bucket, sum(n_tok) AS c FROM b
                    WHERE lang = 'en' GROUP BY 1),
            ns AS (SELECT sum(c) AS n FROM src),
            nt AS (SELECT sum(c) AS n FROM tgt),
            model AS (
              SELECT coalesce(t.bucket, s.bucket) AS bucket,
                     coalesce(ln((t.c + 1.0) / (nt.n + 1024.0)),
                              ln(1.0 / (nt.n + 1024.0)))
                   - coalesce(ln((s.c + 1.0) / (ns.n + 1024.0)),
                              ln(1.0 / (ns.n + 1024.0))) AS log_ratio
              FROM tgt t FULL OUTER JOIN src s ON t.bucket = s.bucket
              CROSS JOIN ns CROSS JOIN nt),
            perdoc AS (
              SELECT doc_id, bucket, sum(n_tok) AS n_tok FROM b
              GROUP BY 1, 2),
            w AS (
              SELECT p.doc_id,
                     round(sum(p.n_tok * m.log_ratio), 6) AS log_weight
              FROM perdoc p JOIN model m USING (bucket)
              GROUP BY 1),
            rk AS (
              SELECT doc_id, log_weight,
                     row_number() OVER (
                       ORDER BY log_weight DESC,
                                md5(CAST(doc_id AS VARCHAR))) AS r
              FROM w)
            SELECT doc_id, log_weight, r <= 100 AS selected FROM rk
        """,
        # PPRL Bloom encodings replayed as DuckDB lists: same md5('pprl{j}|'
        # || bigram) % m positions, same sorted distinct position set, so
        # (inter, dice) are bit-identical set statistics
        "pprl_dice_pairs": """
            WITH d AS (
              SELECT doc_id,
                     lower(split_part(text, ' ', 1)) || '|' ||
                     lower(split_part(text, ' ', 2)) AS bk,
                     '_' || lower(text) || '_' AS p
              FROM documents
              -- mirror bloom_encode's guard: empty/null fields have no
              -- bigrams and are dropped, not encoded as the pad pair
              WHERE text IS NOT NULL AND length(text) >= 1),
            enc AS (
              SELECT doc_id, bk,
                     list_sort(list_distinct(flatten(list_transform(
                       list_distinct(list_transform(
                         generate_series(1, length(p) - 1),
                         i -> substr(p, i, 2))),
                       g -> [
                         CAST(CAST(('0x' || substr(md5('pprl0|' || g), 1, 15))
                              AS BIGINT) % 4096 AS INT),
                         CAST(CAST(('0x' || substr(md5('pprl1|' || g), 1, 15))
                              AS BIGINT) % 4096 AS INT)
                       ])))) AS bf
              FROM d),
            pairs AS (
              SELECT a.doc_id AS doc_id_l, b.doc_id AS doc_id_r,
                     len(list_intersect(a.bf, b.bf)) AS inter,
                     round(2.0 * len(list_intersect(a.bf, b.bf)) /
                           (len(a.bf) + len(b.bf)), 6) AS dice
              FROM enc a JOIN enc b
                ON a.bk = b.bk AND a.doc_id < b.doc_id)
            SELECT doc_id_l, doc_id_r, CAST(inter AS BIGINT) AS inter, dice
            FROM pairs WHERE dice >= 0.9
        """,
        # BPE iteration-1 pair histogram: char pairs weighted by word count
        "bpe_pair_counts": (
            "WITH"
            + _bpe_vocab_cte()
            + ","
            + _bpe_pair_cte("v0", "p1")
            + """
            SELECT l_sym AS left_sym, r_sym AS right_sym,
                   CAST(cnt AS BIGINT) AS pair_count
            FROM p1
        """
        ),
        "bpe_merges": _bpe_merges_oracle(3),
        "bpe_tokenize": _bpe_tokenize_oracle(3),
        # brute-force truth set for the Ed-Join engine: length filter
        # (lossless: ||x|-|y|| <= d is implied by ed <= d) + exact
        # levenshtein. The engine's q-gram prefix/position filters are
        # lossless too, so sub-quadratic output == this exact join.
        "ed_join_pairs": """
            WITH d AS (
              SELECT doc_id, text AS s, length(text) AS L FROM documents
              WHERE text IS NOT NULL AND length(text) >= 1),
            p AS (
              SELECT a.doc_id AS doc_id_l, b.doc_id AS doc_id_r,
                     levenshtein(a.s, b.s) AS dist
              FROM d a JOIN d b
                ON a.doc_id < b.doc_id AND abs(a.L - b.L) <= 4)
            SELECT doc_id_l, doc_id_r, CAST(dist AS BIGINT) AS dist
            FROM p WHERE dist <= 4
        """,
        "hll_distinct_tokens": f"""
            WITH toks AS (SELECT lang, unnest({_TOKS}) AS tok FROM documents),
            h AS (
              SELECT lang, tok,
                     CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
              FROM toks WHERE tok IS NOT NULL),
            regs AS (
              SELECT lang, h & 1023 AS bucket,
                     max(CASE WHEN (h >> 10) = 0 THEN 51
                          ELSE 51 - length(bin(h >> 10)) END) AS reg
              FROM h GROUP BY 1, 2),
            agg AS (
              SELECT lang, count(*) AS nz,
                     CAST(sum(CAST(1 AS BIGINT) << (51 - reg)) AS BIGINT)
                       AS s_nz
              FROM regs GROUP BY lang),
            est AS (
              SELECT lang, nz,
                     {_HLL_C!r} / CAST(s_nz + (1024 - nz) *
                       (CAST(1 AS BIGINT) << 51) AS DOUBLE) AS e_raw
              FROM agg),
            fin AS (
              SELECT lang,
                     CASE WHEN e_raw <= 2560.0 AND nz < 1024
                          THEN 1024.0 * ln(1024.0 / CAST(1024 - nz AS DOUBLE))
                          ELSE e_raw END AS e
              FROM est),
            ex AS (SELECT lang, count(DISTINCT tok) AS n_exact FROM h
                   GROUP BY lang)
            SELECT f.lang, round(e, 6) AS hll_estimate,
                   CAST(n_exact AS BIGINT) AS n_exact
            FROM fin f JOIN ex USING (lang)""",
        # Count-Min grid replay: same md5('cm{{j}}|'||item) cell addressing
        # as the Spark kernel, so every counter -- and therefore every
        # min-over-rows estimate -- is bit-identical across engines
        # Hampel replay: same two-pass quantile_cont medians, same 0.6745
        # consistency constant; degenerate-MAD convention mirrored
        "mad_outliers": """
            WITH o AS (SELECT o_orderkey, o_orderpriority, o_totalprice
                       FROM orders WHERE o_orderkey % 10 = 0),
            med AS (SELECT o_orderpriority,
                           quantile_cont(o_totalprice, 0.5) AS med
                    FROM o GROUP BY 1),
            j AS (SELECT o.*, med.med FROM o JOIN med USING (o_orderpriority)),
            mad AS (SELECT o_orderpriority,
                           quantile_cont(abs(o_totalprice - med), 0.5) AS mad
                    FROM j GROUP BY 1),
            f AS (SELECT j.*, mad.mad FROM j JOIN mad USING (o_orderpriority))
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   round(med, 6) AS median, round(mad, 6) AS mad,
                   round(CASE WHEN mad > 0
                         THEN 0.6745 * abs(o_totalprice - med) / mad END, 6)
                     AS robust_z,
                   CASE WHEN mad > 0
                        THEN 0.6745 * abs(o_totalprice - med) / mad > 3.0
                        ELSE o_totalprice <> med END AS is_outlier
            FROM f""",
        "benford_profile": """
            WITH d AS (
              -- lead mantissa digit of %.17e: rounding at the 18th
              -- significant digit can never carry into the first (see
              -- benford_profile docstring), so Spark and DuckDB agree on
              -- every double, not just 2-dp money
              SELECT TRY_CAST(substr(printf('%.17e', abs(o_totalprice)),
                              1, 1) AS INTEGER) AS digit
              FROM orders
              WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) > 0),
            c AS (SELECT digit, count(*) AS n FROM d
                  WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
            spine AS (SELECT unnest(generate_series(1, 9)) AS digit),
            hist AS (SELECT s.digit,
                            CAST(coalesce(c.n, 0) AS BIGINT) AS n
                     FROM spine s LEFT JOIN c ON c.digit = s.digit),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM hist)
            SELECT digit, n,
                   round(CAST(n AS DOUBLE) / t, 6) AS observed,
                   round(log10(1.0 + 1.0 / digit), 6) AS expected,
                   round(CAST(n AS DOUBLE) / t
                         - log10(1.0 + 1.0 / digit), 6) AS deviation
            FROM hist, t""",
        "pricing_summary": """
            WITH li AS (SELECT * FROM lineitem
                        WHERE l_shipdate <= TIMESTAMP '2001-09-01'),
            a AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS sum_qty,
                     CAST(sum(CAST(round(l_extendedprice * 100.0)
                                   AS BIGINT)) AS DOUBLE) / 100.0
                       AS sum_base_price,
                     CAST(sum(CAST(round(l_extendedprice
                                         * (1.0 - l_discount) * 100.0)
                                   AS BIGINT)) AS DOUBLE) / 100.0
                       AS sum_disc_price,
                     CAST(sum(CAST(round(l_extendedprice
                                         * (1.0 - l_discount)
                                         * (1.0 + l_tax) * 100.0)
                                   AS BIGINT)) AS DOUBLE) / 100.0
                       AS sum_charge,
                     count(*) AS count_order
              FROM li GROUP BY 1, 2)
            SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
                   sum_disc_price, sum_charge,
                   round(CAST(sum_qty AS DOUBLE) / count_order, 6)
                     AS avg_qty,
                   round(sum_base_price / count_order, 6) AS avg_price,
                   CAST(count_order AS BIGINT) AS count_order
            FROM a""",
        "local_supplier_volume": """
            SELECT n.n_name,
                   CAST(sum(CAST(round(l.l_extendedprice
                                       * (1.0 - l.l_discount) * 100.0)
                                 AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND c.c_nationkey = s.s_nationkey
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1""",
        "shipping_priority": """
            WITH j AS (
              SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                     CAST(sum(CAST(round(l.l_extendedprice
                                         * (1.0 - l.l_discount) * 100.0)
                                   AS BIGINT)) AS DOUBLE) / 100.0
                       AS revenue
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < TIMESTAMP '1998-06-01'
                AND l.l_shipdate > TIMESTAMP '1998-06-01'
              GROUP BY 1, 2, 3)
            SELECT l_orderkey, o_orderdate, o_orderpriority, revenue,
                   CAST(rk AS INTEGER) AS rk
            FROM (SELECT *, row_number() OVER (
                    ORDER BY revenue DESC, l_orderkey ASC) AS rk
                  FROM j) WHERE rk <= 10""",
        # ICWS replay: identical salted-md5 uniforms, identical gamma/
        # floor/exp chain, min(struct) argmin == argmin over (a, term)
        "icws_weighted_jaccard": f"""
            {_ICWS_SIG_CTES},
            est AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(sum(CASE WHEN a.sig_term = b.sig_term
                                    AND a.sig_t = b.sig_t
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_match
              FROM sigs a JOIN sigs b
                ON a.slot = b.slot AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(sum(least(a.w, b.w)) AS BIGINT) AS smin
              FROM tf a JOIN tf b
                ON a.term = b.term AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            tot AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS t
                    FROM tf GROUP BY 1)
            SELECT e.id_a, e.id_b, e.n_match,
                   round(CAST(e.n_match AS DOUBLE) / 32.0, 6)
                     AS est_wjaccard,
                   round(CAST(coalesce(i.smin, 0) AS DOUBLE)
                         / CAST(ta.t + tb.t - coalesce(i.smin, 0)
                                AS DOUBLE), 6) AS exact_wjaccard
            FROM est e
            LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
            JOIN tot ta ON ta.doc_id = e.id_a
            JOIN tot tb ON tb.doc_id = e.id_b""",
        # weighted-LSH replay: same signature CTEs, banded with the
        # pinned zero-padded serialization
        "icws_lsh_candidates": f"""
            {_ICWS_SIG_CTES},
            bs AS (
              SELECT doc_id, slot // 4 AS band,
                     lpad(CAST(slot AS VARCHAR), 3, '0') || ':'
                       || sig_term || ':' || sig_t AS s
              FROM sigs),
            bands AS (
              SELECT doc_id, band,
                     md5(string_agg(s, '|' ORDER BY s)) AS bkey
              FROM bs GROUP BY 1, 2)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared_bands
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bkey = b.bkey
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2""",
        # containment replay: the kmv_overlap chain plus per-group own
        # estimates; divides the ROUNDED est columns exactly as the
        # operator composition does
        "kmv_containment": f"""
            WITH toks AS (SELECT lang, unnest({_TOKS}) AS tok
                          FROM documents),
            d AS (SELECT DISTINCT lang, tok FROM toks
                  WHERE tok IS NOT NULL),
            hs AS (SELECT DISTINCT lang,
                     CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
                   FROM d),
            sk AS (SELECT lang, h FROM (
                     SELECT lang, h,
                            row_number() OVER (PARTITION BY lang
                                               ORDER BY h) AS rn
                     FROM hs) WHERE rn <= 64),
            pairs AS (
              SELECT a.lang AS g_a, b.lang AS g_b
              FROM (SELECT DISTINCT lang FROM sk) a
              JOIN (SELECT DISTINCT lang FROM sk) b ON a.lang < b.lang),
            m AS (
              SELECT g_a, g_b, h, count(*) > 1 AS in_both
              FROM (SELECT p.g_a, p.g_b, s.h FROM pairs p
                    JOIN sk s ON s.lang = p.g_a
                    UNION ALL
                    SELECT p.g_a, p.g_b, s.h FROM pairs p
                    JOIN sk s ON s.lang = p.g_b)
              GROUP BY 1, 2, 3),
            kept AS (SELECT * FROM (
                       SELECT g_a, g_b, h, in_both,
                              row_number() OVER (PARTITION BY g_a, g_b
                                                 ORDER BY h) AS rn
                       FROM m) WHERE rn <= 64),
            agg AS (
              SELECT g_a, g_b, count(*) AS n, max(h) AS hk,
                     CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END)
                          AS BIGINT) AS nboth
              FROM kept GROUP BY 1, 2),
            est AS (
              SELECT g_a, g_b,
                     round((CAST(nboth AS DOUBLE) / CAST(n AS DOUBLE))
                           * CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                                  ELSE {63 * float(1 << 60)!r}
                                       / CAST(hk AS DOUBLE) END, 6)
                       AS est_inter
              FROM agg),
            own AS (SELECT lang, count(*) AS n, max(h) AS hk
                    FROM sk GROUP BY 1),
            oe AS (
              SELECT lang,
                     round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                           ELSE {63 * float(1 << 60)!r}
                                / CAST(hk AS DOUBLE) END, 6) AS e
              FROM own),
            na AS (SELECT lang, count(*) AS n FROM d GROUP BY 1),
            xi AS (
              SELECT a.lang AS g_a, b.lang AS g_b,
                     count(*) AS xi
              FROM d a JOIN d b
                ON a.tok = b.tok AND a.lang < b.lang
              GROUP BY 1, 2)
            SELECT e.g_a, e.g_b,
                   round(least(greatest(e.est_inter / oa.e, 0.0), 1.0), 6)
                     AS est_containment_a,
                   round(least(greatest(e.est_inter / ob.e, 0.0), 1.0), 6)
                     AS est_containment_b,
                   round(CAST(coalesce(xi.xi, 0) AS DOUBLE)
                         / CAST(pa.n AS DOUBLE), 6) AS exact_containment_a,
                   round(CAST(coalesce(xi.xi, 0) AS DOUBLE)
                         / CAST(pb.n AS DOUBLE), 6) AS exact_containment_b
            FROM est e
            JOIN oe oa ON oa.lang = e.g_a
            JOIN oe ob ON ob.lang = e.g_b
            JOIN na pa ON pa.lang = e.g_a
            JOIN na pb ON pb.lang = e.g_b
            LEFT JOIN xi ON xi.g_a = e.g_a AND xi.g_b = e.g_b""",
        # TF-IDF cosine replay: identical smooth-idf weights; norm and dot
        # accumulate integer-quantized terms (round(x*1e9 / x*1e12) as
        # BIGINT -- order-free addition), threshold compares quantized
        # integers, so the pair set matches across engines
        "cosine_join_pairs": f"""
            WITH sub AS (SELECT doc_id, text FROM documents
                         WHERE doc_id % 4 = 0),
            toks AS (
              SELECT doc_id, unnest({_TOKS}) AS term FROM sub),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                   WHERE length(term) > 0 GROUP BY 1, 2),
            dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(DISTINCT doc_id) AS n FROM sub),
            w AS (
              SELECT tf.doc_id, tf.term,
                     CAST(tf.tf AS DOUBLE)
                     * (ln(CAST(n.n + 1 AS DOUBLE)
                           / CAST(dft.df + 1 AS DOUBLE)) + 1.0) AS w
              FROM tf JOIN dft USING (term) CROSS JOIN n),
            nrm AS (
              SELECT doc_id,
                     CAST(sum(CAST(round(w * w * 1000000000) AS BIGINT))
                          AS BIGINT) AS nq
              FROM w GROUP BY 1),
            u AS (
              SELECT w.doc_id, w.term,
                     w.w / sqrt(CAST(nq AS DOUBLE) / 1000000000.0) AS wh
              FROM w JOIN nrm USING (doc_id)),
            d AS (
              SELECT a.doc_id AS id_l, b.doc_id AS id_r,
                     CAST(sum(CAST(round(a.wh * b.wh * 1000000000000)
                                   AS BIGINT)) AS BIGINT) AS dq
              FROM u a JOIN u b
                ON a.term = b.term AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_l, id_r,
                   round(CAST(dq AS DOUBLE) / 1000000000000.0, 6) AS cosine
            FROM d WHERE dq >= 850000000000""",
        # KMV/theta replay: same 60-bit md5-prefix hashes, same bottom-64
        # windows, so union/intersection/jaccard ESTIMATES (one float
        # division on identical integer operands) match bit-for-bit
        "kmv_overlap": f"""
            WITH toks AS (SELECT lang, unnest({_TOKS}) AS tok
                          FROM documents),
            d AS (SELECT DISTINCT lang, tok FROM toks
                  WHERE tok IS NOT NULL),
            hs AS (SELECT DISTINCT lang,
                     CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
                   FROM d),
            sk AS (SELECT lang, h FROM (
                     SELECT lang, h,
                            row_number() OVER (PARTITION BY lang
                                               ORDER BY h) AS rn
                     FROM hs) WHERE rn <= 64),
            pairs AS (
              SELECT a.lang AS g_a, b.lang AS g_b
              FROM (SELECT DISTINCT lang FROM sk) a
              JOIN (SELECT DISTINCT lang FROM sk) b ON a.lang < b.lang),
            m AS (
              SELECT g_a, g_b, h, count(*) > 1 AS in_both
              FROM (SELECT p.g_a, p.g_b, s.h FROM pairs p
                    JOIN sk s ON s.lang = p.g_a
                    UNION ALL
                    SELECT p.g_a, p.g_b, s.h FROM pairs p
                    JOIN sk s ON s.lang = p.g_b)
              GROUP BY 1, 2, 3),
            kept AS (SELECT * FROM (
                       SELECT g_a, g_b, h, in_both,
                              row_number() OVER (PARTITION BY g_a, g_b
                                                 ORDER BY h) AS rn
                       FROM m) WHERE rn <= 64),
            agg AS (
              SELECT g_a, g_b, count(*) AS n, max(h) AS hk,
                     CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END)
                          AS BIGINT) AS nboth
              FROM kept GROUP BY 1, 2),
            est AS (
              SELECT g_a, g_b,
                     CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                          ELSE {63 * float(1 << 60)!r}
                               / CAST(hk AS DOUBLE) END AS eu,
                     CAST(nboth AS DOUBLE) / CAST(n AS DOUBLE) AS rho
              FROM agg),
            na AS (SELECT lang, count(*) AS n FROM d GROUP BY 1),
            xi AS (
              SELECT a.lang AS g_a, b.lang AS g_b,
                     count(*) AS exact_inter
              FROM d a JOIN d b
                ON a.tok = b.tok AND a.lang < b.lang
              GROUP BY 1, 2)
            SELECT e.g_a, e.g_b,
                   round(eu, 6) AS est_union,
                   round(rho * eu, 6) AS est_inter,
                   round(rho, 6) AS est_jaccard,
                   CAST(pa.n + pb.n - coalesce(xi.exact_inter, 0)
                        AS BIGINT) AS exact_union,
                   CAST(coalesce(xi.exact_inter, 0) AS BIGINT)
                     AS exact_inter
            FROM est e
            JOIN na pa ON pa.lang = e.g_a
            JOIN na pb ON pb.lang = e.g_b
            LEFT JOIN xi ON xi.g_a = e.g_a AND xi.g_b = e.g_b""",
        "cm_token_counts": f"""
            WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok
                          FROM documents),
            j(j) AS (VALUES (0), (1), (2)),
            grid AS (
              SELECT j.j AS row_j,
                     CAST(('0x' || substr(md5('cm' || j.j || '|' || tok),
                                          1, 15)) AS BIGINT) % 1024
                       AS bucket,
                     count(*) AS cnt
              FROM toks CROSS JOIN j
              WHERE tok IS NOT NULL
              GROUP BY 1, 2),
            probes AS (SELECT DISTINCT tok AS item FROM toks
                       WHERE doc_id % 97 = 0),
            pp AS (
              SELECT p.item, j.j AS row_j,
                     CAST(('0x' || substr(md5('cm' || j.j || '|' || p.item),
                                          1, 15)) AS BIGINT) % 1024
                       AS bucket
              FROM probes p CROSS JOIN j),
            est AS (
              SELECT item, min(coalesce(cnt, 0)) AS cm_estimate
              FROM pp LEFT JOIN grid USING (row_j, bucket)
              GROUP BY item),
            ex AS (SELECT tok AS item, count(*) AS n_exact FROM toks
                   GROUP BY tok)
            SELECT e.item, CAST(e.cm_estimate AS BIGINT) AS cm_estimate,
                   CAST(coalesce(x.n_exact, 0) AS BIGINT) AS n_exact
            FROM est e LEFT JOIN ex x USING (item)""",
        # conversation-grain dedup: the planted d/v/r construction is
        # replayed verbatim (see _conv_turns), then each operator's exact
        # relational semantics
        "conv_neardup_pairs": f"""
            {_CONV_FP_SQL},
            fps AS (SELECT DISTINCT conv_id, fp FROM fp),
            sz AS (SELECT conv_id, count(*) AS n FROM fps GROUP BY conv_id),
            inter AS (
              SELECT a.conv_id AS l, b.conv_id AS r, count(*) AS o
              FROM fps a JOIN fps b
                ON a.fp = b.fp AND a.conv_id < b.conv_id
              GROUP BY 1, 2)
            SELECT l AS conv_l, r AS conv_r, CAST(o AS BIGINT) AS overlap,
                   round(o / (sl.n + sr.n - o), 4) AS jaccard
            FROM inter
            JOIN sz sl ON l = sl.conv_id
            JOIN sz sr ON r = sr.conv_id
            WHERE o / (sl.n + sr.n - o) >= 0.5""",
        "conv_prefix_rescrape": f"""
            {_CONV_FP_SQL},
            seqs AS (SELECT conv_id, list(fp ORDER BY turn_idx) AS fps
                     FROM fp GROUP BY conv_id),
            pref AS (SELECT conv_id, len(fps) AS n,
                            unnest(generate_series(1, len(fps))) AS kk, fps
                     FROM seqs),
            ph AS (SELECT conv_id, n, kk,
                          md5(array_to_string(fps[1:kk], '|')) AS h
                   FROM pref),
            fl AS (SELECT conv_id AS conv_prefix, n AS prefix_len, h
                   FROM ph WHERE kk = n)
            SELECT f.conv_prefix, p.conv_id AS conv_full,
                   CAST(f.prefix_len AS BIGINT) AS prefix_len,
                   CAST(p.n AS BIGINT) AS full_len
            FROM fl f JOIN ph p ON f.h = p.h AND f.prefix_len = p.kk
            WHERE f.conv_prefix != p.conv_id
              AND (f.prefix_len < p.n
                   OR (f.prefix_len = p.n AND f.conv_prefix < p.conv_id))""",
        "conv_dup_profile": f"""
            {_CONV_FP_SQL},
            fps AS (SELECT DISTINCT conv_id, fp FROM fp),
            dfreq AS (SELECT fp, count(*) AS n_convs FROM fps GROUP BY fp)
            SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(CASE WHEN n_convs > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_shared_turns,
                   round(sum(CASE WHEN n_convs > 1 THEN 1 ELSE 0 END)
                         / count(*), 4) AS dup_frac
            FROM fps JOIN dfreq USING (fp)
            GROUP BY conv_id""",
        "er_pair_quality": f"""
            {_CONV_FP_SQL},
            fps AS (SELECT DISTINCT conv_id, fp FROM fp),
            sz AS (SELECT conv_id, count(*) AS n FROM fps GROUP BY conv_id),
            inter AS (
              SELECT a.conv_id AS l, b.conv_id AS r, count(*) AS o
              FROM fps a JOIN fps b
                ON a.fp = b.fp AND a.conv_id < b.conv_id
              GROUP BY 1, 2),
            pred AS (
              SELECT l AS a, r AS b
              FROM inter
              JOIN sz sl ON l = sl.conv_id
              JOIN sz sr ON r = sr.conv_id
              WHERE o / (sl.n + sr.n - o) >= 0.52),
            ks AS (SELECT DISTINCT doc_id // 10 AS k FROM documents),
            gold AS (
              SELECT 'd' || CAST(k AS VARCHAR) AS a,
                     'v' || CAST(k AS VARCHAR) AS b
              FROM ks WHERE k % 5 = 0
              UNION ALL
              SELECT 'd' || CAST(k AS VARCHAR), 'r' || CAST(k AS VARCHAR)
              FROM ks WHERE k % 7 = 0
              UNION ALL
              SELECT 'r' || CAST(k AS VARCHAR), 'v' || CAST(k AS VARCHAR)
              FROM ks WHERE k % 35 = 0),
            c AS (
              SELECT (SELECT count(*) FROM pred) AS n_pred,
                     (SELECT count(*) FROM gold) AS n_gold,
                     (SELECT count(*) FROM pred p
                      JOIN gold g ON p.a = g.a AND p.b = g.b) AS n_tp),
            m AS (
              SELECT n_pred, n_gold, n_tp,
                     CASE WHEN n_pred > 0 THEN n_tp / n_pred
                          ELSE 0.0 END AS p,
                     CASE WHEN n_gold > 0 THEN n_tp / n_gold
                          ELSE 0.0 END AS r
              FROM c)
            SELECT CAST(n_pred AS BIGINT) AS n_pred,
                   CAST(n_gold AS BIGINT) AS n_gold,
                   CAST(n_tp AS BIGINT) AS n_tp,
                   round(p, 6) AS precision,
                   round(r, 6) AS recall,
                   CASE WHEN round(p, 6) + round(r, 6) > 0
                        THEN round(2 * round(p, 6) * round(r, 6)
                                   / (round(p, 6) + round(r, 6)), 6)
                        ELSE 0.0 END AS f1
            FROM m""",
        "er_blocking_quality": f"""
            {_CONV_FP_SQL},
            fps AS (SELECT DISTINCT conv_id, fp FROM fp),
            sizes AS (SELECT fp, count(*) AS s FROM fps GROUP BY fp),
            cand AS (SELECT CAST(coalesce(sum(s * (s - 1) / 2), 0) AS BIGINT)
                       AS n_candidates
                     FROM sizes),
            nrec AS (SELECT count(DISTINCT conv_id) AS n_records FROM fps),
            ks AS (SELECT DISTINCT doc_id // 10 AS k FROM documents),
            gold AS (
              SELECT 'd' || CAST(k AS VARCHAR) AS a,
                     'v' || CAST(k AS VARCHAR) AS b
              FROM ks WHERE k % 5 = 0
              UNION ALL
              SELECT 'd' || CAST(k AS VARCHAR), 'r' || CAST(k AS VARCHAR)
              FROM ks WHERE k % 7 = 0
              UNION ALL
              SELECT 'r' || CAST(k AS VARCHAR), 'v' || CAST(k AS VARCHAR)
              FROM ks WHERE k % 35 = 0),
            cov AS (
              SELECT DISTINCT g.a, g.b
              FROM gold g
              JOIN fps fa ON fa.conv_id = g.a
              JOIN fps fb ON fb.conv_id = g.b AND fb.fp = fa.fp)
            SELECT CAST(n_records AS BIGINT) AS n_records,
                   n_candidates,
                   CAST((SELECT count(*) FROM gold) AS BIGINT) AS n_gold,
                   CAST((SELECT count(*) FROM cov) AS BIGINT)
                     AS n_gold_covered,
                   round(greatest(0.0, 1.0 - n_candidates
                         / (n_records * (n_records - 1) / 2.0)), 6)
                     AS reduction_ratio,
                   round(CASE WHEN (SELECT count(*) FROM gold) > 0
                         THEN (SELECT count(*) FROM cov)
                              / (SELECT count(*) FROM gold)
                         ELSE 0.0 END, 6) AS pairs_completeness
            FROM cand, nrec""",
        # bitmap-as-position-set replay: a fact key passes the Bloom filter
        # iff ALL k of its md5 positions land in the dim position set --
        # identical semantics to the literal-bitmap bit test Spark runs
        "bloom_prefilter_join": """
            WITH dim AS (
              SELECT DISTINCT c_custkey AS key FROM customer
              WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000),
            i(i) AS (VALUES (0), (1), (2)),
            dpos AS (
              SELECT DISTINCT
                CAST(('0x' || substr(md5(i || ':' || key), 1, 15))
                     AS BIGINT) % 65536 AS p
              FROM dim, i),
            fpos AS (
              SELECT o_orderkey, o_custkey,
                CAST(('0x' || substr(md5(i || ':' || o_custkey), 1, 15))
                     AS BIGINT) % 65536 AS p
              FROM orders, i WHERE o_custkey IS NOT NULL),
            pass AS (
              SELECT o_orderkey, o_custkey
              FROM (SELECT o_orderkey, o_custkey,
                           (p IN (SELECT p FROM dpos)) AS hit FROM fpos) t
              GROUP BY 1, 2 HAVING bool_and(hit))
            SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_fact,
                   CAST(count(*) AS BIGINT) AS n_pass,
                   CAST(count(*) FILTER (o_custkey IN (SELECT key FROM dim))
                        AS BIGINT) AS n_match,
                   CAST(count(*) FILTER (o_custkey NOT IN (SELECT key FROM dim))
                        AS BIGINT) AS n_false_pos
            FROM pass""",
        "quantile_profile_chars": """
            WITH g AS (
              SELECT lang,
                     CAST([0.25, 0.5, 0.75, 0.9, 0.99] AS DOUBLE[]) AS qs,
                     quantile_cont(CAST(n_chars AS DOUBLE),
                                   [0.25, 0.5, 0.75, 0.9, 0.99]) AS vals
              FROM documents GROUP BY lang)
            SELECT lang, q, round(value, 6) AS value FROM (
              SELECT lang, unnest(qs) AS q, unnest(vals) AS value FROM g) t""",
        "table_checksum": """
            SELECT l_returnflag, count(*) AS n_rows,
                   CAST(sum(CAST(('0x' || substr(md5(
                         l_orderkey || '|' || l_partkey || '|' || l_suppkey
                         || '|' || l_linenumber || '|' || l_shipdate), 1, 8))
                       AS BIGINT)) AS BIGINT) AS checksum
            FROM lineitem GROUP BY l_returnflag""",
        "phrase_match": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            posts AS (
              SELECT doc_id, t[i.i] AS term, i.i AS pos
              FROM toks, unnest(generate_series(1, len(t))) AS i(i)),
            q AS (
              SELECT doc_id AS query_id, t[4:8] AS qt
              FROM toks WHERE doc_id % 25 = 0),
            qt AS (
              SELECT query_id, qt[j.j] AS term, j.j AS j, len(qt) AS nq
              FROM q, unnest(generate_series(1, len(qt))) AS j(j)),
            votes AS (
              SELECT qt.query_id, p.doc_id, p.pos - qt.j AS start, qt.nq
              FROM posts p JOIN qt USING (term)),
            full_starts AS (
              SELECT query_id, doc_id, start, nq, count(*) AS c
              FROM votes GROUP BY 1, 2, 3, 4)
            SELECT query_id, doc_id, count(*) AS n_hits
            FROM full_starts WHERE c = nq GROUP BY 1, 2""",
        "hard_negatives": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            posts AS (
              SELECT doc_id, u.term, count(*) AS tf
              FROM toks, unnest(t) AS u(term)
              WHERE u.term <> '' GROUP BY doc_id, u.term),
            dl AS (SELECT doc_id, len(t) AS dl FROM toks),
            ncnt AS (SELECT count(*) AS n FROM documents),
            stats AS (SELECT avg(dl) AS avgdl FROM dl),
            dft AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
            qterms AS (
              SELECT doc_id AS query_id, u.term
              FROM toks, unnest(list_distinct(t[1:3])) AS u(term)
              WHERE doc_id % 25 = 0 AND u.term <> ''),
            scored AS (
              SELECT q.query_id, p.doc_id,
                     round(sum(
                       ln(1 + (n.n - d.df + 0.5) / (d.df + 0.5)) *
                       p.tf * (1.2 + 1) /
                       (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
                     ), 6) AS score
              FROM posts p
              JOIN qterms q USING (term)
              JOIN dft d USING (term)
              JOIN dl l ON p.doc_id = l.doc_id
              CROSS JOIN ncnt n CROSS JOIN stats s
              GROUP BY q.query_id, p.doc_id),
            top6 AS (
              SELECT query_id, doc_id, score FROM (
                SELECT query_id, doc_id, score,
                       row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY score DESC, doc_id) AS rank
                FROM scored) WHERE rank <= 6)
            SELECT query_id, doc_id, score, neg_rank FROM (
              SELECT query_id, doc_id, score,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, doc_id) AS neg_rank
              FROM top6 WHERE doc_id <> query_id) WHERE neg_rank <= 5""",
        "ngram_containment": f"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 3000000, array_to_string({_TOKS}[5:24], ' ')
              FROM documents WHERE doc_id % 10 = 0),
            toks AS (
              SELECT doc_id,
                     string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
              FROM aug),
            grams AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(generate_series(1, greatest(len(t) - 3, 1)),
                                           i -> array_to_string(t[i:i+3], ' '))) AS g
              FROM toks),
            kept AS (
              SELECT g FROM (SELECT g, count(*) AS c FROM grams GROUP BY g)
              WHERE c <= 100),
            gk AS (SELECT doc_id, g FROM grams JOIN kept USING (g)),
            cnt AS (SELECT doc_id, count(*) AS n_sh FROM gk GROUP BY doc_id),
            shared AS (
              SELECT a.doc_id AS doc_id_l, b.doc_id AS doc_id_r,
                     count(*) AS shared
              FROM gk a JOIN gk b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT s.doc_id_l, s.doc_id_r, s.shared,
                   round(s.shared / cl.n_sh, 6) AS containment_l,
                   round(s.shared / cr.n_sh, 6) AS containment_r
            FROM shared s
            JOIN cnt cl ON s.doc_id_l = cl.doc_id
            JOIN cnt cr ON s.doc_id_r = cr.doc_id
            WHERE greatest(round(s.shared / cl.n_sh, 6),
                           round(s.shared / cr.n_sh, 6)) >= 0.9""",
        "char_entropy": """
            WITH chars AS (
              SELECT doc_id, length(text) AS n, substr(text, i.i, 1) AS ch
              FROM documents, unnest(generate_series(1, length(text))) AS i(i)
              WHERE length(text) > 0),
            counts AS (
              SELECT doc_id, n, ch, count(*) AS c
              FROM chars GROUP BY doc_id, n, ch)
            SELECT doc_id, round(-sum((c / n) * ln(c / n)), 6) AS char_entropy
            FROM counts GROUP BY doc_id, n""",
        "bm25_topk": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            posts AS (
              SELECT doc_id, u.term, count(*) AS tf
              FROM toks, unnest(t) AS u(term)
              WHERE u.term <> '' GROUP BY doc_id, u.term),
            dl AS (SELECT doc_id, len(t) AS dl FROM toks),
            ncnt AS (SELECT count(*) AS n FROM documents),
            stats AS (SELECT avg(dl) AS avgdl FROM dl),
            dft AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
            qterms AS (
              SELECT doc_id AS query_id, u.term
              FROM toks, unnest(list_distinct(t[1:3])) AS u(term)
              WHERE doc_id % 25 = 0 AND u.term <> ''),
            scored AS (
              SELECT q.query_id, p.doc_id,
                     round(sum(
                       ln(1 + (n.n - d.df + 0.5) / (d.df + 0.5)) *
                       p.tf * (1.2 + 1) /
                       (p.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
                     ), 6) AS score
              FROM posts p
              JOIN qterms q USING (term)
              JOIN dft d USING (term)
              JOIN dl l ON p.doc_id = l.doc_id
              CROSS JOIN ncnt n CROSS JOIN stats s
              GROUP BY q.query_id, p.doc_id)
            SELECT query_id, doc_id, score, rank FROM (
              SELECT query_id, doc_id, score,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, doc_id) AS rank
              FROM scored) WHERE rank <= 5""",
        "prefix_containment": """
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 2000000,
                     substr(text, 1, CAST(floor(length(text) / 2) AS INT))
              FROM documents),
            t AS (SELECT DISTINCT text AS _t FROM aug),
            s AS (SELECT _t, lead(_t) OVER (ORDER BY _t) AS nxt FROM t),
            c AS (SELECT _t FROM s
                  WHERE nxt IS NOT NULL AND starts_with(nxt, _t))
            SELECT a.doc_id, (c._t IS NOT NULL) AS contained
            FROM aug a LEFT JOIN c ON a.text = c._t""",
        "embedding_neardups_lsh": """
            WITH aug AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000,
                     list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.001)
              FROM embeddings)
            SELECT a.vec_id AS vec_id_l, b.vec_id AS vec_id_r,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.95""",
        # ANN planted-top-k truth sets (VERDICT r02 #3): the engine output
        # over the copy-augmented corpus provably equals this analytic set
        # -- 5 colinear copies per query at cosine exactly 1.0, ranked by
        # vec_id under the rounded-cosine tie-break; no organic vector
        # rounds to 1.0 (uniform 64-d, max organic cosine << 0.95). See
        # _ann_planted_corpus_and_queries for the recall-1.0 argument.
        "ann_lsh_topk": """
            SELECT e.vec_id AS query_id,
                   e.vec_id + g.j * 1000000 AS vec_id,
                   CAST(1.0 AS DOUBLE) AS cosine,
                   CAST(g.j AS INT) AS rank
            FROM embeddings e, generate_series(1, 5) AS g(j)
            WHERE e.vec_id < 20""",
        # PQ/ADC: the whole train+encode+query path unrolled (grouped
        # Lloyd CTEs, reduced-score argmin, sub-sorted ADC fold)
        "pq_adc_topk": _pq_oracle(),
        # SQ8 replay: identical quantize/dequantize operand order, dists
        # via list_dot_product (the established unrolled-dot agreement)
        "sq_rerank_topk": """
            WITH x AS (
              SELECT vec_id, j.j - 1 AS j,
                     CAST(embedding[j.j] AS DOUBLE) AS x
              FROM embeddings,
                   unnest(generate_series(1, 64)) AS j(j)),
            st AS (SELECT j, min(x) AS lo, max(x) AS hi FROM x GROUP BY j),
            enc AS (
              SELECT vec_id, x.j, st.lo, st.hi,
                     CASE WHEN st.hi > st.lo
                          THEN CAST(least(greatest(
                                 round((x.x - st.lo) * 255.0
                                       / (st.hi - st.lo)), 0.0), 255.0)
                               AS INT)
                          ELSE 0 END AS c
              FROM x JOIN st USING (j)),
            rec AS (
              SELECT vec_id,
                     list(lo + c * ((hi - lo) / 255.0) ORDER BY j) AS rv
              FROM enc GROUP BY vec_id),
            qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
            q AS (SELECT e.vec_id AS query_id,
                         CAST(e.embedding AS DOUBLE[]) AS qv
                  FROM embeddings e JOIN qids USING (vec_id)),
            approx AS (
              SELECT q.query_id, r.vec_id,
                     round(list_dot_product(q.qv, q.qv)
                           - 2 * list_dot_product(q.qv, r.rv)
                           + list_dot_product(r.rv, r.rv), 6) AS adist
              FROM rec r CROSS JOIN q),
            cands AS (
              SELECT * FROM (
                SELECT query_id, vec_id, adist,
                       row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY adist, vec_id) AS r1
                FROM approx) WHERE r1 <= 30),
            tv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS tv
                   FROM embeddings),
            exact AS (
              SELECT c.query_id, c.vec_id, c.adist,
                     round(list_dot_product(q.qv, q.qv)
                           - 2 * list_dot_product(q.qv, t.tv)
                           + list_dot_product(t.tv, t.tv), 6) AS dist
              FROM cands c
              JOIN tv t ON t.vec_id = c.vec_id
              JOIN q ON q.query_id = c.query_id)
            SELECT query_id, vec_id, adist, dist,
                   CAST(rank AS INTEGER) AS rank
            FROM (
              SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY dist, vec_id) AS rank
              FROM exact) WHERE rank <= 10""",
        "ann_ivf_topk": """
            SELECT e.vec_id AS query_id,
                   e.vec_id + g.j * 1000000 AS vec_id,
                   CAST(1.0 AS DOUBLE) AS cosine,
                   CAST(g.j AS INT) AS rank
            FROM embeddings e, generate_series(1, 5) AS g(j)
            WHERE e.vec_id < 20""",
        "cosine_neardups_exact": """
            SELECT a.vec_id AS vec_id_l, b.vec_id AS vec_id_r,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4""",
        "issue_flags": """
            WITH m AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 1 THEN 'Re: ' || text
                          WHEN doc_id % 4 = 2 THEN text || ' ...'
                          WHEN doc_id % 4 = 3 THEN upper(text)
                          ELSE text || ' ?' END AS t
              FROM documents)
            SELECT doc_id, concat_ws(',',
                     CASE WHEN regexp_matches(trim(t), '(?i)^(re|fwd|fw):') THEN 'FORWARDED' END,
                     CASE WHEN contains(trim(t), '?') THEN 'QUESTION' END,
                     CASE WHEN trim(t) = upper(trim(t))
                               AND regexp_matches(trim(t), '[A-Za-z]') THEN 'SHOUT' END,
                     CASE WHEN regexp_matches(trim(t), '\\.\\.\\.\\s*$') THEN 'TRUNCATED' END
                   ) AS flags
            FROM m""",
        "phrase_parse": """
            WITH m AS (
              SELECT p_partkey,
                     p_type || ' ''' || p_brand || '''' ||
                     CASE WHEN p_partkey % 3 = 0
                          THEN ' ref ' || CAST(p_partkey AS VARCHAR)
                          ELSE '' END AS t
              FROM part)
            SELECT p_partkey,
                   nullif(lower(regexp_extract(t, '^\\W*(\\w+)', 1)), '') AS head,
                   nullif(lower(regexp_replace(
                       regexp_extract(t, '''([^'']+)''|"([^"]+)"', 0),
                       '["'']', '', 'g')), '') AS phrase,
                   nullif(regexp_extract(lower(t),
                       '\\b(?:request|ticket|order|case|ref)\\s+#?(\\d+)', 1), '') AS voucher
            FROM m""",
        "phrase_join": """
            WITH base AS (
              SELECT p_partkey,
                     lower(split_part(p_type, ' ', 1)) AS head,
                     lower(p_brand) AS phrase,
                     CASE WHEN p_partkey % 3 = 0
                          THEN CAST(p_size % 10 AS VARCHAR) END AS voucher
              FROM part),
            q AS (SELECT p_partkey AS query_id, head, phrase, voucher
                  FROM base WHERE p_partkey % 2 = 1),
            i AS (SELECT p_partkey AS index_id, head, phrase, voucher
                  FROM base WHERE p_partkey % 2 = 0)
            SELECT q.head, q.phrase, count(*) AS n_matches,
                   min(q.query_id) AS first_query
            FROM q JOIN i ON q.head = i.head AND q.phrase = i.phrase
              AND (coalesce(q.voucher, '<null>') = coalesce(i.voucher, '<null>')
                   OR q.voucher IS NULL OR i.voucher IS NULL)
            GROUP BY 1, 2""",
        "alias_lookup": """
            WITH aliases AS (
              SELECT upper(regexp_replace(p_type, '[^a-zA-Z0-9]', '', 'g')) AS alias_key,
                     p_partkey AS target_id, p_brand
              FROM part),
            per AS (
              SELECT alias_key, count(DISTINCT target_id) AS nt,
                     min(target_id) AS mt, count(DISTINCT p_brand) AS nb
              FROM aliases GROUP BY 1)
            SELECT alias_key,
                   CASE WHEN nt = 1 OR nb <= 1 THEN mt END AS target_id,
                   NOT (nt = 1 OR nb <= 1) AS ambiguous
            FROM per""",
        "misapplied_resolution": """
            WITH cand AS (
              SELECT o_custkey, o_orderkey AS index_id,
                     CASE WHEN o_orderstatus = 'F' THEN 'MISAPPLIED' END AS syn_type,
                     CASE WHEN o_orderstatus = 'F' THEN o_orderkey % 1000 END AS accepted_id
              FROM orders),
            per AS (
              SELECT o_custkey,
                     sum(CASE WHEN syn_type = 'MISAPPLIED' THEN 1 ELSE 0 END) AS n_mis,
                     count(*) AS n,
                     min(CASE WHEN syn_type IS NULL THEN index_id END) AS first_accepted,
                     count(DISTINCT CASE WHEN syn_type = 'MISAPPLIED'
                                         THEN accepted_id END) AS n_targets,
                     min(CASE WHEN syn_type = 'MISAPPLIED' THEN accepted_id END)
                       AS common_target
              FROM cand GROUP BY 1)
            SELECT o_custkey,
                   CASE WHEN n_mis = 0 THEN first_accepted
                        WHEN first_accepted IS NOT NULL THEN first_accepted
                        WHEN n_mis = n AND n_targets = 1 THEN common_target
                   END AS resolved_id,
                   CASE WHEN n_mis = 0 THEN NULL
                        WHEN first_accepted IS NOT NULL THEN 'MISAPPLIED_PARTIAL'
                        WHEN n_mis = n AND n_targets = 1 THEN 'MISAPPLIED_RESOLVED'
                        ELSE 'MISAPPLIED' END AS misapplied_flag
            FROM per""",
        "synonym_enrich": """
            WITH base AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 3 = 0 THEN c_custkey - 1 END AS accepted_id,
                     CASE WHEN c_custkey % 3 <> 0 THEN c_mktsegment END AS segment
              FROM customer)
            SELECT b.c_custkey, b.accepted_id,
                   CASE WHEN b.accepted_id IS NOT NULL AND b.segment IS NULL
                        THEN t.segment ELSE b.segment END AS segment
            FROM base b LEFT JOIN base t ON b.accepted_id = t.c_custkey""",
        "phonetic_keys": _phonetic_key_sql(),
        "species_split_containment": """
            WITH iv AS (SELECT * FROM (
            WITH c AS (SELECT 'c' || c_custkey AS id, 'n' || c_nationkey AS pid
                       FROM customer),
            n AS (SELECT 'n' || n_nationkey AS id, 'r' || n_regionkey AS pid
                  FROM nation),
            r AS (SELECT 'r' || r_regionkey AS id FROM region),
            nsz AS (
              SELECT n.id, n.pid, 1 + coalesce(cc.n_child, 0) AS size
              FROM n LEFT JOIN (SELECT pid, count(*) AS n_child FROM c GROUP BY 1) cc
                ON n.id = cc.pid),
            rsz AS (
              SELECT r.id, 1 + coalesce(sum(nsz.size), 0) AS size
              FROM r LEFT JOIN nsz ON nsz.pid = r.id GROUP BY r.id),
            rpos AS (
              SELECT id, size,
                     1 + 2 * coalesce(sum(size) OVER (ORDER BY id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS lft
              FROM rsz),
            npos AS (
              SELECT nsz.id, nsz.size, rpos.lft + 1
                     + 2 * coalesce(sum(nsz.size) OVER (PARTITION BY nsz.pid
                         ORDER BY nsz.id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS lft
              FROM nsz JOIN rpos ON nsz.pid = rpos.id),
            cpos AS (
              SELECT c.id, 1 AS size, npos.lft
                     + 2 * row_number() OVER (PARTITION BY c.pid ORDER BY c.id)
                     - 1 AS lft
              FROM c JOIN npos ON c.pid = npos.id)
            SELECT id AS node_id, lft, lft + 2 * size - 1 AS rgt FROM rpos
            UNION ALL SELECT id, lft, lft + 2 * size - 1 FROM npos
            UNION ALL SELECT id, lft, lft + 1 FROM cpos)),
            syn AS (
              SELECT 'c' || c_custkey AS child_id,
                     'c' || (c_custkey + 1) AS accepted_id,
                     'n' || c_nationkey AS parent_id
              FROM customer WHERE c_custkey % 7 = 0)
            SELECT syn.child_id, syn.accepted_id, syn.parent_id,
                   p.lft < a.lft AND a.rgt < p.rgt AS contained
            FROM syn
            JOIN iv a ON a.node_id = syn.accepted_id
            JOIN iv p ON p.node_id = syn.parent_id""",
        # closed-form nested-set intervals for the fixed 3-level hierarchy:
        # size(c)=1, size(n)=1+#customers, size(r)=1+sum(nation sizes);
        # lft = parent lft + 1 + 2*sum(earlier-sibling sizes), siblings
        # ordered by the STRING node id (matching the DFS child order);
        # rgt = lft + 2*size - 1
        # LCA replay: the same closed-form interval construction, then the
        # containment join + per-pair argmax depth (the ancestor chain
        # makes it unique)
        "lca_pairs": """
            WITH c AS (SELECT 'c' || c_custkey AS id, 'n' || c_nationkey AS pid
                       FROM customer),
            n AS (SELECT 'n' || n_nationkey AS id, 'r' || n_regionkey AS pid
                  FROM nation),
            r AS (SELECT 'r' || r_regionkey AS id FROM region),
            nsz AS (
              SELECT n.id, n.pid,
                     1 + coalesce(cc.n_child, 0) AS size
              FROM n LEFT JOIN (SELECT pid, count(*) AS n_child FROM c GROUP BY 1) cc
                ON n.id = cc.pid),
            rsz AS (
              SELECT r.id, 1 + coalesce(sum(nsz.size), 0) AS size
              FROM r LEFT JOIN nsz ON nsz.pid = r.id GROUP BY r.id),
            rpos AS (
              SELECT id, size,
                     1 + 2 * coalesce(sum(size) OVER (ORDER BY id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS lft
              FROM rsz),
            npos AS (
              SELECT nsz.id, nsz.size, rpos.lft + 1
                     + 2 * coalesce(sum(nsz.size) OVER (PARTITION BY nsz.pid
                         ORDER BY nsz.id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS lft
              FROM nsz JOIN rpos ON nsz.pid = rpos.id),
            cpos AS (
              SELECT c.id, 1 AS size, npos.lft
                     + 2 * row_number() OVER (PARTITION BY c.pid ORDER BY c.id)
                     - 1 AS lft
              FROM c JOIN npos ON c.pid = npos.id),
            ns AS (
              SELECT id AS node_id, CAST(lft AS BIGINT) AS lft,
                     CAST(lft + 2 * size - 1 AS BIGINT) AS rgt, 0 AS depth
              FROM rpos
              UNION ALL
              SELECT id, CAST(lft AS BIGINT),
                     CAST(lft + 2 * size - 1 AS BIGINT), 1 FROM npos
              UNION ALL
              SELECT id, CAST(lft AS BIGINT), CAST(lft + 1 AS BIGINT), 2
              FROM cpos),
            sample AS (SELECT 'c' || c_custkey AS node_id FROM customer
                       WHERE c_custkey % 100 = 0),
            leaves AS (SELECT ns.node_id AS nn, ns.lft AS l
                       FROM ns JOIN sample ON ns.node_id = sample.node_id),
            pairs AS (
              SELECT a.nn AS node_a, a.l AS la, b.nn AS node_b, b.l AS lb
              FROM leaves a JOIN leaves b ON a.nn < b.nn),
            anc AS (
              SELECT p.node_a, p.node_b, ns.node_id AS lca, ns.depth
              FROM pairs p JOIN ns
                ON ns.depth < 2
               AND ns.lft <= p.la AND p.la <= ns.rgt
               AND ns.lft <= p.lb AND p.lb <= ns.rgt)
            SELECT node_a, node_b, lca,
                   CAST(depth AS INTEGER) AS lca_depth
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY node_a, node_b
                    ORDER BY depth DESC) AS rk FROM anc)
            WHERE rk = 1""",
        "nested_set_intervals": """
            WITH c AS (SELECT 'c' || c_custkey AS id, 'n' || c_nationkey AS pid
                       FROM customer),
            n AS (SELECT 'n' || n_nationkey AS id, 'r' || n_regionkey AS pid
                  FROM nation),
            r AS (SELECT 'r' || r_regionkey AS id FROM region),
            nsz AS (
              SELECT n.id, n.pid,
                     1 + 2 * coalesce(cc.n_child, 0) AS twice_free,
                     1 + coalesce(cc.n_child, 0) AS size
              FROM n LEFT JOIN (SELECT pid, count(*) AS n_child FROM c GROUP BY 1) cc
                ON n.id = cc.pid),
            rsz AS (
              SELECT r.id, 1 + coalesce(sum(nsz.size), 0) AS size
              FROM r LEFT JOIN nsz ON nsz.pid = r.id GROUP BY r.id),
            rpos AS (
              SELECT id, size,
                     1 + 2 * coalesce(sum(size) OVER (ORDER BY id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS lft
              FROM rsz),
            npos AS (
              SELECT nsz.id, nsz.size, rpos.lft + 1
                     + 2 * coalesce(sum(nsz.size) OVER (PARTITION BY nsz.pid
                         ORDER BY nsz.id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS lft
              FROM nsz JOIN rpos ON nsz.pid = rpos.id),
            cpos AS (
              SELECT c.id, 1 AS size, npos.lft
                     + 2 * row_number() OVER (PARTITION BY c.pid ORDER BY c.id)
                     - 1 AS lft
              FROM c JOIN npos ON c.pid = npos.id)
            SELECT id AS node_id, CAST(lft AS BIGINT) AS lft,
                   CAST(lft + 2 * size - 1 AS BIGINT) AS rgt, 0 AS depth
            FROM rpos
            UNION ALL
            SELECT id, CAST(lft AS BIGINT), CAST(lft + 2 * size - 1 AS BIGINT), 1
            FROM npos
            UNION ALL
            SELECT id, CAST(lft AS BIGINT), CAST(lft + 1 AS BIGINT), 2 FROM cpos""",
        # exact token-3-gram Jaccard over ALL pairs >= 0.4: valid as the LSH
        # query's oracle because at 16 hashes / 8 bands the planted near-dup
        # pairs (J > 0.9) have candidate probability ~1 -- verified
        # empirically equal at the driver's sf0.01 gate (deterministic data +
        # hashes, so equal once = equal always)
        "minhash_lsh_neardups": f"""
            WITH t AS (
              SELECT doc_id,
                     string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            )
            SELECT a.doc_id AS doc_id_l, b.doc_id AS doc_id_r,
                   round(len(list_intersect(a.sh, b.sh))::double
                     / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh))::double
                  / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.4""",
        # CC engine oracle: identical exact-Jaccard edges (all-pairs form),
        # transitively closed by a recursive CTE; min reachable id over the
        # symmetric closure == component min == Spark's cluster_id
        "neardup_doc_clusters": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            ), e AS (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::double
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
            ), sym AS (
              SELECT l AS a, r AS b FROM e UNION ALL SELECT r AS a, l AS b FROM e
            ), reach AS (
              SELECT doc_id AS id, doc_id AS r FROM documents
              UNION
              SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.id
            )
            SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id""",
        # triangle/transitivity replay: same edge rule + recursive-CTE
        # closure as neardup_doc_clusters, then the classic id-ordered
        # 3-way self-join (orientation-invariant, so it matches the Spark
        # side's degree-ordered count); wedge sum cast out of HUGEINT
        "cluster_triangles": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            ), e AS (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::double
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
            ), sym AS (
              SELECT l AS a, r AS b FROM e UNION ALL SELECT r AS a, l AS b FROM e
            ), reach AS (
              SELECT doc_id AS id, doc_id AS r FROM documents
              UNION
              SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.id
            ), lab AS (
              SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id
            ), ec AS (
              SELECT lab.cluster_rep AS c, e.l AS a, e.r AS b
              FROM e JOIN lab ON lab.doc_id = e.l
            ), deg AS (
              SELECT c, n, count(*) AS d
              FROM (SELECT c, a AS n FROM ec
                    UNION ALL SELECT c, b AS n FROM ec)
              GROUP BY 1, 2
            ), w AS (
              SELECT c, CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
              FROM deg GROUP BY c
            ), ne AS (
              SELECT c, count(*) AS n_edges FROM ec GROUP BY c
            ), tri AS (
              SELECT e1.c, count(*) AS n_triangles
              FROM ec e1
              JOIN ec e2 ON e1.c = e2.c AND e1.a = e2.a AND e1.b < e2.b
              JOIN ec e3 ON e3.c = e1.c AND e3.a = e1.b AND e3.b = e2.b
              GROUP BY e1.c
            ), sz AS (
              SELECT cluster_rep AS c, count(*) AS n_members
              FROM lab GROUP BY 1 HAVING count(*) >= 2
            )
            SELECT sz.c AS cluster_rep,
                   CAST(n_members AS BIGINT) AS n_members,
                   CAST(coalesce(ne.n_edges, 0) AS BIGINT) AS n_edges,
                   CAST(coalesce(w.n_wedges, 0) AS BIGINT) AS n_wedges,
                   CAST(coalesce(tri.n_triangles, 0) AS BIGINT)
                     AS n_triangles,
                   round(CASE WHEN coalesce(w.n_wedges, 0) > 0
                         THEN 3.0 * coalesce(tri.n_triangles, 0)
                              / w.n_wedges
                         ELSE 0.0 END, 6) AS transitivity
            FROM sz
            LEFT JOIN ne ON ne.c = sz.c
            LEFT JOIN w ON w.c = sz.c
            LEFT JOIN tri ON tri.c = sz.c""",
        "kcore_membership": _kcore_oracle_sql(rounds=8, k=2),
        # incremental-CC parity oracle: the FULL closure at 0.5 -- the
        # incremental merge must equal a from-scratch recompute
        "incremental_cc": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            ), e AS (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::double
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
            ), sym AS (
              SELECT l AS a, r AS b FROM e UNION ALL SELECT r AS a, l AS b FROM e
            ), reach AS (
              SELECT doc_id AS id, doc_id AS r FROM documents
              UNION
              SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.id
            )
            SELECT id AS doc_id, min(r) AS cluster_rep
            FROM reach GROUP BY id""",
        # leakage replay: the proven jaccard-edge rule x the proven
        # md5-bucket split rule, cross-split pairs only
        "split_leakage": f"""
            WITH t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            ), e AS (
              SELECT a.doc_id AS doc_id_l, b.doc_id AS doc_id_r,
                     len(list_intersect(a.sh, b.sh))::double
                     / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
              FROM s a JOIN s b ON a.doc_id < b.doc_id
            ), sp AS (
              SELECT doc_id,
                     CASE WHEN substr(md5('split-v1' || doc_id), 1, 4)
                               < '1999'
                          THEN 'holdout' ELSE 'train' END AS split
              FROM documents)
            SELECT e.doc_id_l, e.doc_id_r,
                   round(e.jaccard, 4) AS jaccard,
                   sl.split AS split_l, sr.split AS split_r
            FROM e
            JOIN sp sl ON sl.doc_id = e.doc_id_l
            JOIN sp sr ON sr.doc_id = e.doc_id_r
            WHERE e.jaccard >= 0.5 AND sl.split <> sr.split""",
        # edge-support replay: same edge rule + closure as
        # cluster_triangles; support = common neighbors via two sym joins
        "edge_support_bridges": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            ), e AS (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::double
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
            ), sym AS (
              SELECT l AS a, r AS b FROM e UNION ALL SELECT r AS a, l AS b FROM e
            ), reach AS (
              SELECT doc_id AS id, doc_id AS r FROM documents
              UNION
              SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.id
            ), lab AS (
              SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id
            ), supp AS (
              SELECT e.l, e.r, count(*) AS s
              FROM e
              JOIN sym s1 ON s1.a = e.l
              JOIN sym s2 ON s2.a = e.r AND s2.b = s1.b
              WHERE s1.b <> e.r
              GROUP BY 1, 2)
            SELECT lab.cluster_rep, e.l AS id_a, e.r AS id_b,
                   CAST(coalesce(supp.s, 0) AS BIGINT) AS support,
                   coalesce(supp.s, 0) = 0 AS is_bridge
            FROM e
            JOIN lab ON lab.doc_id = e.l
            LEFT JOIN supp ON supp.l = e.l AND supp.r = e.r""",
        "cross_doc_dup_ngrams": f"""
            WITH t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 3, 1)),
                       i -> array_to_string(toks[i:i+3], ' ')
                     ))) AS g
              FROM t
            ), df AS (
              SELECT g, count(*) AS df FROM s GROUP BY g
            ), dup AS (
              SELECT s.doc_id, count(*) AS n_dup_ngrams
              FROM s JOIN df USING (g) WHERE df.df >= 2 GROUP BY s.doc_id
            ), tot AS (
              SELECT doc_id, count(*) AS n_ngrams FROM s GROUP BY doc_id
            )
            SELECT tot.doc_id, tot.n_ngrams,
                   coalesce(dup.n_dup_ngrams, 0) AS n_dup_ngrams,
                   round(coalesce(dup.n_dup_ngrams, 0)::double / tot.n_ngrams, 6)
                     AS dup_frac
            FROM tot LEFT JOIN dup USING (doc_id)""",
        # same recursive-CTE cluster closure as neardup_doc_clusters, then
        # per-cluster argmax-quality election (quality expression identical
        # to the quality_score oracle)
        "dedup_keep_best": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id, string_split(lower({_NORM}), ' ') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(toks) - 2, 1)),
                       i -> array_to_string(toks[i:i+2], ' ')
                     )) AS sh
              FROM t
            ), e AS (
              SELECT a.doc_id AS l, b.doc_id AS r
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::double
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
            ), sym AS (
              SELECT l AS a, r AS b FROM e UNION ALL SELECT r AS a, l AS b FROM e
            ), reach AS (
              SELECT doc_id AS id, doc_id AS r FROM documents
              UNION
              SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.id
            ), cl AS (
              SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id
            ), m AS (
              SELECT doc_id, length(text) AS n_chars,
                     len({_TOKS}) AS n_toks,
                     CASE WHEN length(text) > 0
                          THEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) * 1.0 / length(text)
                          ELSE 0.0 END AS alpha_ratio,
                     (SELECT count(*) FROM unnest({_TOKS}) AS u(t)
                      WHERE t IN ('the','and','of','to','a','in','is','was','for','with'))
                       * 1.0 / greatest(len({_TOKS}), 1) AS stop_ratio
              FROM documents
            ), q AS (
              SELECT doc_id,
                     round(0.3 * (CASE WHEN n_chars BETWEEN 20 AND 5000 THEN 1.0 ELSE 0.3 END)
                         + 0.3 * alpha_ratio
                         + 0.2 * least(stop_ratio * 4, 1.0)
                         + 0.2 * (CASE WHEN n_toks > 0 AND n_chars * 1.0 / n_toks BETWEEN 3 AND 12
                                       THEN 1.0 ELSE 0.5 END), 6) AS quality
              FROM m)
            SELECT cl.doc_id, cl.cluster_rep, q.quality,
                   (row_number() OVER (PARTITION BY cl.cluster_rep
                                       ORDER BY q.quality DESC, cl.doc_id) = 1) AS keep
            FROM cl JOIN q USING (doc_id)""",
        "mixture_weights": f"""
            WITH agg AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(len(string_split({_NORM}, ' '))) AS BIGINT) AS n_tokens
              FROM documents GROUP BY source
            ), shares AS (
              SELECT source, n_docs, n_tokens,
                     n_tokens * 1.0 / sum(n_tokens) OVER () AS p
              FROM agg
            )
            SELECT source, n_docs, n_tokens,
                   round(p, 6) AS raw_share,
                   round(pow(p, 0.7) / sum(pow(p, 0.7)) OVER (), 6) AS weight
            FROM shares""",
        "er_clusters": _er_clusters_oracle(),
        # SimHash replayed bit-for-bit: md5-prefix token hashes, +-1 votes
        # per bit, sign fingerprint with int64 two's complement (bit 63 =
        # -2^63), exact all-pairs hamming -- valid as the banded engine
        # query's oracle because max_hamming=3 = n_bands-1 is the pigeonhole
        # regime (recall provably 1.0)
        "simhash_neardups": f"""
            WITH toks AS (
              SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS t
              FROM documents),
            th AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(u.t), 1, 16)) AS UBIGINT) AS h
              FROM toks, unnest(t) AS u(t)),
            votes AS (
              SELECT doc_id, b.b AS b,
                     sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM th, generate_series(0, 63) AS b(b) GROUP BY 1, 2),
            fps AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN v > 0 THEN
                          CASE WHEN b = 63 THEN -9223372036854775808
                               ELSE (CAST(1 AS BIGINT) << b) END
                          ELSE 0 END) AS BIGINT) AS fp
              FROM votes GROUP BY doc_id),
            allfp AS (
              SELECT d.doc_id, coalesce(f.fp, 0) AS fp
              FROM documents d LEFT JOIN fps f USING (doc_id))
            SELECT a.doc_id AS doc_id_l, b.doc_id AS doc_id_r,
                   CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
            FROM allfp a JOIN allfp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3""",
        "dm_fuzzy_lookup": _dm_fuzzy_oracle(),
        "spelling_collision_qa": _spelling_collision_oracle(),
        # hand-derived pins (see _DM_GOLDEN) -- an independent derivation of
        # the published cascade, not an engine snapshot
        "double_metaphone_keys": (
            'SELECT word, p AS "primary", a AS "alternate" FROM (VALUES '
            + ", ".join(
                f"('{w}', '{p}', '{a}')"
                for w, (p, a) in sorted(_DM_GOLDEN.items())
            )
            + ") t(word, p, a)"
        ),
        "rematch_stragglers": f"""
            WITH d AS (SELECT doc_id AS record_id, {_CANON} AS canon_text FROM documents),
            cl AS (SELECT record_id, canon_text,
                          min(record_id) OVER (PARTITION BY substr(canon_text, 1, 20))
                            AS cluster_id
                   FROM d),
            sz AS (SELECT cluster_id, count(*) AS csize FROM cl GROUP BY 1),
            k AS (SELECT cl.*, sz.csize, substr(cl.canon_text, 1, 8) AS ck
                  FROM cl JOIN sz USING (cluster_id)),
            reps AS (SELECT ck, min(cluster_id) AS tgt
                     FROM k WHERE csize > 1 GROUP BY 1)
            SELECT k.record_id, k.cluster_id,
                   CASE WHEN k.csize = 1 THEN reps.tgt END AS rematch_cluster_id
            FROM k LEFT JOIN reps USING (ck)""",
    }


# --- DuckDB re-implementation of the F5 phonetic compound key --------------
# An INDEPENDENT second implementation of treat_word + key assembly
# (functions/phonetic.py), built from DuckDB list lambdas -- verified
# byte-identical to the Arrow kernel on the full sf0.01 corpus. This turns
# the engine's fuzzy BLOCKING KEY itself into an oracle-checked artifact.


def _treated_tokens_ctes(src: str = "documents", p: str = "") -> str:
    """CTE chain `{p}t .. {p}s4` producing (doc_id, text, treated) -- the
    per-token treat_word pipeline, reusable by any oracle that needs the
    phonetic term stream (compound key s5, fuzzy BM25 postings). `src` may
    be a table name or a parenthesized subquery with (doc_id, text)."""
    acc_from = "ÁÉÍÓÚÀÈÌÒÙÂÊÎÔÛÄËÏÖÜÃÑÕÅÇØ"
    acc_to = "AEIOUAEIOUAEIOUAEIOUANOACO"
    # TaxonNameSoundEx.normalize (phonetic.soundex_normalize)
    norm = (
        "nullif(trim(regexp_replace("
        "replace(translate(regexp_replace(replace(upper(w), ' &AMP; ', ' & '),"
        " '<.+?>', '', 'g'),"
        f" '{acc_from}', '{acc_to}'), 'Æ', 'AE'),"
        " '[^a-zA-Z .]', '', 'g')), '')"
    )
    leading = [
        ("AE", "E"), ("CN", "N"), ("CT", "T"), ("CZ", "C"), ("DJ", "J"),
        ("EA", "E"), ("EU", "U"), ("GN", "N"), ("KN", "N"), ("MC", "MAC"),
        ("MN", "N"), ("OE", "E"), ("QU", "Q"), ("PS", "S"), ("PT", "T"),
        ("TS", "S"), ("X", "Z"),
    ]
    lead = "(CASE " + " ".join(
        f"WHEN n LIKE '{s}%' THEN '{d}' || n[{len(s) + 1}:]" for s, d in leading
    ) + " ELSE n END)"
    folds = [
        ("AE", "I"), ("IA", "A"), ("OE", "I"), ("OI", "A"), ("SC", "S"),
        ("E", "I"), ("O", "A"), ("U", "I"), ("Y", "I"), ("K", "C"),
        ("Z", "C"), ("H", ""),
    ]
    tail = "ld[2:]"
    for s, d in folds:  # sequential, order-sensitive (TaxonNameSoundEx:130-145)
        tail = f"replace({tail}, '{s}', '{d}')"
    temp = f"(ld[1] || {tail})"
    # squeeze '(\\w)\\1+' -> '\\1' without backrefs (RE2): char-fold
    squeeze = (
        "list_reduce(string_split(tmp, ''), "
        "(acc, c) -> CASE WHEN right(acc, 1) = c AND c BETWEEN 'A' AND 'Z' "
        "THEN acc ELSE acc || c END)"
    )
    return f"""
        {p}t AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(replace(text, '.', ' '), '\\s+'),
                             x -> x <> '')[1:64] AS raw
          FROM {src}
        ), {p}s1 AS (
          SELECT doc_id, text,
                 list_filter(list_transform(raw, w -> {norm}),
                             n -> n IS NOT NULL) AS norms
          FROM {p}t
        ), {p}s2 AS (
          SELECT doc_id, text, list_transform(norms, n -> {lead}) AS led
          FROM {p}s1
        ), {p}s3 AS (
          SELECT doc_id, text, list_transform(led, ld -> {temp}) AS tmps
          FROM {p}s2
        ), {p}s4 AS (
          SELECT doc_id, text,
                 list_filter(list_transform(tmps, tmp -> {squeeze}),
                             k -> k <> '') AS treated
          FROM {p}s3
        )"""


def _er_clusters_oracle() -> str:
    """The FLAGSHIP oracle: the entire ER pipeline replayed in DuckDB.

    Mirrors plans/pipeline.run_pipeline + cluster_summary stage by stage:
    transcript projection (sources/transcripts.transcripts_from_documents),
    canonical grouping on (canon_key, role, tool) with placeholder salting
    (operators/blocking), the phonetic compound blocking key over group-rep
    canon_text (the independently-verified treat_word CTE chain), candidate
    pairs within blocks, the full A1 score (JW on 64-char-capped canon text
    -- DuckDB's jaro_winkler_similarity agrees EXACTLY with the vectorized
    kernel on every sf0.01 pair; Levenshtein; Jaccard over treated tokens;
    role/tool context sims with skipped-null renormalization), the V5/A4
    homonym gate with the JW >= 0.8 author waiver, threshold 0.855 (closest
    real pair sits 0.024 away -- no boundary risk on the fixed fixture),
    recursive-CTE transitive closure over canonical + fuzzy edges
    (cluster_id = min member record_id, the engine's label semantics), and
    the B7 deterministic election (priority = canon length, placeholders
    demoted to -(2^40), ties to min record_id). Salting is a provable no-op
    at this scale (max block 3 << cap 200)."""
    reps_src = (
        "(SELECT record_id AS doc_id, canon_text AS text FROM reps0 "
        "WHERE canon_text IS NOT NULL)"
    )
    jw = "jaro_winkler_similarity({l}[1:64], {r}[1:64])"
    prep = "regexp_replace({t}, '[\\p{{P}}\\s]', '', 'g')"
    return f"""
        WITH RECURSIVE feat AS (
          SELECT 'd' || CAST(doc_id // 10 AS VARCHAR) || '#'
                     || CAST(doc_id % 10 AS VARCHAR) AS record_id,
                 coalesce(lang, 'und') AS role,
                 source AS tool,
                 {_CANON} AS canon_text
          FROM documents
        ), keyed AS (
          SELECT *,
                 CASE WHEN canon_text IS NULL OR length(canon_text) < 2
                      THEN '__ph__' || record_id ELSE canon_text END AS canon_key,
                 coalesce(tool, '<null>') AS tool_c
          FROM feat
        ), grp AS (
          SELECT canon_key, role, tool_c, min(record_id) AS group_rep
          FROM keyed GROUP BY 1, 2, 3
        ), members AS (
          SELECT k.record_id, g.group_rep
          FROM keyed k JOIN grp g USING (canon_key, role, tool_c)
        ), reps0 AS (
          SELECT group_rep AS record_id, role,
                 CASE WHEN starts_with(canon_key, '__ph__') THEN NULL
                      ELSE canon_key END AS canon_text,
                 CASE WHEN tool_c = '<null>' THEN NULL ELSE tool_c END AS tool
          FROM grp
        ), {_treated_tokens_ctes(reps_src, "er")},
        r5 AS (
          SELECT doc_id, text, treated,
                 CASE WHEN len(treated) = 0 THEN NULL ELSE
                   [treated[1]] ||
                   list_transform(treated[2:6],
                     k -> CASE WHEN k LIKE '%IS' OR k LIKE '%IM' OR k LIKE '%AS'
                               THEN k[1:len(k)-2] || 'A' ELSE k END)
                 END AS parts
          FROM ers4
        ), rkey AS (
          SELECT doc_id AS record_id, list_distinct(treated) AS ptoks,
                 CASE WHEN parts IS NULL THEN NULL ELSE
                   array_to_string(
                     parts || ['<null>' for _ in range(6 - len(parts))], '|')
                   || '|' ||
                   coalesce(nullif(regexp_replace(text, '[^0-9]', '', 'g')[1:16],
                                   ''), '<nodigits>')
                 END AS phonetic_key
          FROM r5
        ), rfull AS (
          SELECT r.record_id, r.role, r.tool, r.canon_text,
                 k.ptoks, k.phonetic_key
          FROM reps0 r JOIN rkey k USING (record_id)
          WHERE k.phonetic_key IS NOT NULL AND length(k.phonetic_key) > 0
        ), scored AS (
          SELECT l.record_id AS rid_l, r.record_id AS rid_r,
                 {jw.format(l="l.canon_text", r="r.canon_text")} AS jw,
                 1.0 - levenshtein(l.canon_text, r.canon_text) * 1.0
                     / greatest(length(l.canon_text), length(r.canon_text)) AS lev,
                 CASE WHEN len(list_distinct(list_concat(l.ptoks, r.ptoks))) = 0
                      THEN 1.0
                      ELSE len(list_intersect(l.ptoks, r.ptoks)) * 1.0
                           / len(list_distinct(list_concat(l.ptoks, r.ptoks)))
                 END AS tok,
                 CASE WHEN l.role IS NULL AND r.role IS NULL THEN NULL
                      WHEN l.role IS NULL OR r.role IS NULL THEN 0.5
                      WHEN l.role = r.role THEN 1.0 ELSE 0.0 END AS role_sim,
                 CASE WHEN l.tool IS NULL AND r.tool IS NULL THEN NULL
                      WHEN l.tool IS NULL OR r.tool IS NULL THEN 0.5
                      WHEN l.tool = r.tool THEN 1.0 ELSE 0.0 END AS tool_sim,
                 ((l.role IS NOT NULL AND r.role IS NOT NULL
                   AND l.role <> r.role)
                  OR (l.tool IS NOT NULL AND r.tool IS NOT NULL
                      AND l.tool <> r.tool
                      AND NOT coalesce(
                        {jw.format(l=prep.format(t="l.tool"),
                                   r=prep.format(t="r.tool"))} >= 0.8,
                        false))) AS conflict
          FROM rfull l JOIN rfull r
            ON l.phonetic_key = r.phonetic_key AND l.record_id < r.record_id
        ), fuzzy AS (
          SELECT rid_l AS src, rid_r AS dst
          FROM scored
          WHERE NOT conflict
            AND (8.0 * (0.4 * jw + 0.3 * lev + 0.3 * tok)
                 + coalesce(role_sim, 0) + coalesce(tool_sim, 0))
                / (8.0 + CASE WHEN role_sim IS NOT NULL THEN 1.0 ELSE 0.0 END
                       + CASE WHEN tool_sim IS NOT NULL THEN 1.0 ELSE 0.0 END)
                >= 0.855
        ), alledges AS (
          SELECT record_id AS src, group_rep AS dst FROM members
          UNION ALL SELECT src, dst FROM fuzzy
        ), sym AS (
          SELECT src AS a, dst AS b FROM alledges
          UNION ALL SELECT dst AS a, src AS b FROM alledges
        ), reach AS (
          SELECT record_id AS id, record_id AS r FROM keyed
          UNION
          SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.id
        ), lab AS (
          SELECT id AS record_id, min(r) AS cluster_id FROM reach GROUP BY id
        ), prio AS (
          SELECT k.record_id, l.cluster_id, k.canon_text,
                 CASE WHEN starts_with(k.canon_key, '__ph__')
                      THEN -1099511627776
                      ELSE length(k.canon_text) END AS p
          FROM keyed k JOIN lab l USING (record_id)
        ), win AS (
          SELECT cluster_id, canon_text AS representative_text,
                 row_number() OVER (PARTITION BY cluster_id
                                    ORDER BY p DESC, record_id ASC) AS rn
          FROM prio
        )
        SELECT p.cluster_id,
               count(*) AS cluster_size,
               min(p.record_id) AS first_record,
               min(w.representative_text) AS representative_text
        FROM prio p
        JOIN (SELECT cluster_id, representative_text FROM win WHERE rn = 1) w
          USING (cluster_id)
        GROUP BY p.cluster_id"""


def _spelling_collision_oracle() -> str:
    """B9 replayed in SQL: the F6 full-name soundEx
    (functions/phonetic.full_soundex -- upper, first-match leading digraph
    rewrite, sequential tail folds on the string past the first char,
    any-char consecutive-repeat squeeze, per-word first-letter +
    alphabetized remainder) over the first-4-token canonical prefix, then
    the per-role collision count. An independent second implementation of
    the F6 kernel, like the treat_word CTE chain is for F5."""
    leading = [
        ("AE", "E"), ("CN", "N"), ("CT", "T"), ("CZ", "C"), ("DJ", "J"),
        ("EA", "E"), ("EU", "U"), ("GN", "N"), ("KN", "N"), ("MN", "N"),
        ("OE", "E"), ("QU", "Q"), ("PS", "S"), ("PT", "T"), ("TS", "S"),
        ("X", "Z"),
    ]  # the Æ entry is unreachable from canon_text ([a-z0-9 ] only)
    lead = "(CASE " + " ".join(
        f"WHEN starts_with(u0, '{s}') THEN '{d}' || u0[{len(s) + 1}:]"
        for s, d in leading
    ) + " ELSE u0 END)"
    tail = "u1[2:]"
    for s, d in [("AE", "I"), ("IA", "A"), ("OE", "I"), ("OI", "A"),
                 ("MC", "MAC"), ("SC", "S")]:  # _F6_TAIL, sequential
        tail = f"replace({tail}, '{s}', '{d}')"
    squeeze = (
        "list_reduce(string_split(u2, ''), "
        "(acc, c) -> CASE WHEN right(acc, 1) = c THEN acc ELSE acc || c END)"
    )
    word = (
        "CASE WHEN length(w) <= 1 THEN w ELSE "
        "w[1] || array_to_string(list_sort(string_split(w[2:], '')), '') END"
    )
    return f"""
        WITH sc0 AS (
          SELECT coalesce(lang, 'und') AS role, {_CANON} AS canon_text
          FROM documents
        ), sc1 AS (
          SELECT role, canon_text,
                 upper(array_to_string(
                   (string_split(canon_text, ' '))[1:4], ' ')) AS u0
          FROM sc0 WHERE canon_text IS NOT NULL
        ), sc2 AS (
          SELECT role, canon_text, {lead} AS u1 FROM sc1
        ), sc3 AS (
          SELECT role, canon_text,
                 CASE WHEN length(u1) > 1 THEN u1[1] || {tail} ELSE u1 END AS u2
          FROM sc2
        ), sc4 AS (
          SELECT role, canon_text,
                 CASE WHEN length(u2) = 0 THEN '' ELSE {squeeze} END AS u3
          FROM sc3
        ), sc5 AS (
          SELECT role, canon_text,
                 array_to_string(list_transform(
                   string_split(u3, ' '), w -> {word}), ' ') AS soundex_key
          FROM sc4
        )
        SELECT role, soundex_key, count(DISTINCT canon_text) AS n_variants
        FROM sc5 WHERE soundex_key <> ''
        GROUP BY role, soundex_key HAVING count(DISTINCT canon_text) > 1"""


def _phonetic_key_sql() -> str:
    return f"""
        WITH {_treated_tokens_ctes()}, s5 AS (
          SELECT doc_id, text, treated,
                 CASE WHEN len(treated) = 0 THEN NULL ELSE
                   [treated[1]] ||
                   list_transform(treated[2:6],
                     k -> CASE WHEN k LIKE '%IS' OR k LIKE '%IM' OR k LIKE '%AS'
                               THEN k[1:len(k)-2] || 'A' ELSE k END)
                 END AS parts
          FROM s4
        )
        SELECT doc_id,
               CASE WHEN parts IS NULL THEN NULL ELSE
                 array_to_string(
                   parts || [ '<null>' for _ in range(6 - len(parts)) ], '|')
                 || '|' ||
                 coalesce(nullif(regexp_replace(text, '[^0-9]', '', 'g')[1:16],
                                 ''), '<nodigits>')
               END AS phonetic_key
        FROM s5"""


_LANG = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "was", "for", "with"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "mit", "für", "von"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "en", "para"],
    "it": ["il", "la", "di", "e", "un", "una", "che", "per", "con", "del"],
}
