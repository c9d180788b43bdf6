"""Candidate-pair generation + vectorized pair scoring (J4 join + A1 score).

The reference retrieves candidates per query with a Lucene boolean query and
scores them one by one (ALANameSearcher.performSearch, ALANameSearcher.java:
1152-1271; MatchMetrics.computeMatch, MatchMetrics.java:114-166). Here the
same computation is a block self-join followed by expression-based scoring:

  1. self-join the salted block table on block_id with record_id_l <
     record_id_r (each unordered pair once),
  2. distinct (tier union can propose the same pair under several keys --
     dedupe BEFORE paying for payload join + scoring),
  3. join the two payload sides, score with pair_score_cols (only the
     Jaro-Winkler kernel leaves the JVM, via Arrow),
  4. hard homonym gate (V5 analog): identical-text pairs whose secondary
     context (role/tool) conflicts are rejected with an error code rather
     than merged (ALANameSearcher homonym path :1253-1265,1418-1491).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ala_name_matching_spark.functions.similarity import (
    DEFAULT_MATCH_THRESHOLD,
    jaro_winkler_udf,
    pair_score_cols,
)

# Payload columns carried into scoring.
PAYLOAD_COLS = ["record_id", "canon_text", "role", "tool", "phonetic_tokens"]

# A4 analog: validateHomonymByAuthor accepts a homonym candidate when
# SWG(author, author) >= 0.8 (ALANameSearcher.java:1377-1391); same
# threshold, JW kernel over the prepared tool field.
AUTHOR_SIM_THRESHOLD = 0.8


def candidate_pairs(salted_blocks: DataFrame, dedupe: bool = True) -> DataFrame:
    """Unordered candidate pairs from the salted block table.

    Shuffle profile: one hash-partitioned self-join on block_id (bounded per
    block by the salting cap -> no quadratic straggler), then -- only when
    several tiers can propose the same pair -- one distinct on
    (record_id_l, record_id_r). With a single blocking tier the salted
    sub-blocks are disjoint, duplicates are impossible, and `dedupe=False`
    skips a full pair-table shuffle.
    """
    left = salted_blocks.select(
        F.col("block_id"), F.col("record_id").alias("record_id_l")
    )
    right = salted_blocks.select(
        F.col("block_id"), F.col("record_id").alias("record_id_r")
    )
    pairs = left.join(right, "block_id").filter(
        F.col("record_id_l") < F.col("record_id_r")
    )
    pairs = pairs.select("record_id_l", "record_id_r")
    return pairs.distinct() if dedupe else pairs


def payload_pairs(
    salted_blocks: DataFrame,
    records: DataFrame,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs with both payloads attached in ONE shuffle join.

    Joins the payload onto the block table first (|blocks| rows ~= |records|
    x tiers -- small), then self-joins on block_id, so both sides' payloads
    ride the block shuffle. Versus candidate_pairs + two id-joins this
    removes two shuffles of the (much larger) pair table -- at 1.2M turns /
    11M pairs that was the dominant non-scaling cost of the pipeline.

    Requires a single-tier (or otherwise pair-disjoint) block table: no
    pair-level distinct is applied.
    """
    payload_cols = payload_cols or PAYLOAD_COLS
    keyed = salted_blocks.select("block_id", "record_id").join(
        records.select(*payload_cols), "record_id"
    )
    l = keyed.select(
        F.col("block_id"), *[F.col(c).alias(f"{c}_l") for c in payload_cols]
    )
    r = keyed.select(
        F.col("block_id"), *[F.col(c).alias(f"{c}_r") for c in payload_cols]
    )
    # block_id stays on the pair: with a single tier every record lives in
    # exactly ONE salted sub-block, so accepted-edge components are
    # block-local and the clustering phase can run a partition-local
    # union-find after one repartition("block_id") instead of iterated
    # global star rounds (clustering.block_local_labels).
    return l.join(r, "block_id").filter(
        F.col("record_id_l") < F.col("record_id_r")
    )


def score_pairs(
    pairs: DataFrame,
    records: DataFrame,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Join payloads onto the pair list and compute the A1 score vector.

    `records` must carry PAYLOAD_COLS. Two hash joins on record_id (string);
    at production scale `records` would be bucketed on record_id so both
    sides co-locate. The score itself is one projection -- JVM expressions
    plus the Arrow JW kernel -- no extra shuffle.
    """
    payload_cols = payload_cols or PAYLOAD_COLS
    payload = records.select(*payload_cols)
    l = payload.select([F.col(c).alias(f"{c}_l") for c in payload_cols])
    r = payload.select([F.col(c).alias(f"{c}_r") for c in payload_cols])
    joined = pairs.join(l, "record_id_l").join(r, "record_id_r")
    return apply_pair_scores(joined, has_tokens="phonetic_tokens" in payload_cols)


def apply_pair_scores(
    joined: DataFrame,
    has_tokens: bool = True,
    min_partitions: int | None = None,
    author_metric: str = "jw",
) -> DataFrame:
    """A1 scoring + V5 gate over a pair frame that already carries payloads.

    The scoring projection is CPU-bound (Arrow JW kernel), not byte-bound.
    When AQE coalesces the upstream join output by shuffle BYTES it can
    starve the UDF stage of tasks (observed: 8 tasks on 32 cores at 11M
    pairs). Pass `min_partitions` to force a pre-scoring repartition in that
    regime; with well-bounded pair volumes (narrow blocking keys) the extra
    shuffle of the payload-heavy pair rows costs more than it saves, so the
    default is no repartition.

    author_metric: "jw" (default; the fast vectorized kernel) or "swg"
    (Smith-Waterman-Gotoh -- the metric the reference actually calls at
    ALANameSearcher.java:1381-1391; ~30x more DP work per pair, so opt-in
    for author-shaped short fields, parity-tested in tests/test_swg.py).
    """
    if author_metric not in ("jw", "swg"):
        raise ValueError(f"author_metric must be 'jw' or 'swg', got {author_metric!r}")
    if min_partitions:
        joined = joined.repartition(min_partitions)
    cols = pair_score_cols(
        F.col("canon_text_l"),
        F.col("canon_text_r"),
        F.col("role_l"),
        F.col("role_r"),
        F.col("tool_l"),
        F.col("tool_r"),
        F.col("phonetic_tokens_l") if has_tokens else None,
        F.col("phonetic_tokens_r") if has_tokens else None,
    )
    out = joined
    for name, col in cols.items():
        out = out.withColumn(name, col)
    # V5 analog -- homonym hard gate: same canonical text but conflicting
    # secondary context must not merge (FIXTURES.md §1 adversarial homonyms;
    # reference resolves homonyms via author/classification agreement and
    # errors out otherwise, ALANameSearcher.java:1418-1491).
    role_conflict = (
        F.col("role_l").isNotNull()
        & F.col("role_r").isNotNull()
        & (F.col("role_l") != F.col("role_r"))
    )
    # A4 analog -- soft author gate: a tool-field disagreement is WAIVED when
    # the prepared strings (punctuation/whitespace stripped, the
    # prepareAuthor analog) are >= 0.8 similar by the JW kernel -- mirroring
    # validateHomonymByAuthor's SWG(author, author) >= 0.8 acceptance
    # (ALANameSearcher.java:1377-1391). Near-equal variants ("sql" vs
    # "sql2") merge; genuinely different tools ("sql" vs "browser") stay a
    # hard conflict. role remains hard: it is the structural homonym axis.
    prep_l = F.regexp_replace(F.col("tool_l"), r"[\p{P}\s]", "")
    prep_r = F.regexp_replace(F.col("tool_r"), r"[\p{P}\s]", "")
    if author_metric == "swg":
        from ala_name_matching_spark.functions.swg import swg_udf

        author_sim_col = swg_udf()(prep_l, prep_r)
    else:
        author_sim_col = jaro_winkler_udf(prep_l, prep_r)
    author_similar = author_sim_col >= AUTHOR_SIM_THRESHOLD
    tool_conflict = (
        F.col("tool_l").isNotNull()
        & F.col("tool_r").isNotNull()
        & (F.col("tool_l") != F.col("tool_r"))
        & ~F.coalesce(author_similar, F.lit(False))
    )
    out = out.withColumn("homonym_conflict", role_conflict | tool_conflict)
    # V7 analog: error codes accumulate instead of aborting
    out = out.withColumn(
        "error_codes",
        F.when(F.col("homonym_conflict"), F.array(F.lit("HOMONYM"))).otherwise(
            F.array().cast("array<string>")
        ),
    )
    return out


def match_edges(
    scored: DataFrame,
    threshold: float = DEFAULT_MATCH_THRESHOLD,
) -> DataFrame:
    """Accepted edges for clustering: score >= threshold and no hard gate.

    Threshold is the MATCH_LIMIT analog (0.5 in the reference,
    ALANameSearcher.java:67), recalibrated for the JW+Lev+token blend.

    Edges carry each endpoint's election priority (canon_text length, the
    A6/B7 score analog) so the small-graph clustering path can elect cluster
    representatives driver-side without a distributed groupBy -- every member
    group of a multi-group cluster is an edge endpoint, so endpoint prios
    cover exactly the groups that need election.
    """
    cols = [
        F.col("record_id_l").alias("src"),
        F.col("record_id_r").alias("dst"),
        F.col("score"),
        F.length("canon_text_l").alias("src_prio"),
        F.length("canon_text_r").alias("dst_prio"),
    ]
    if "block_id" in scored.columns:
        # carried through so clustering can exploit block-locality (see
        # payload_pairs) -- 8 bytes/row on an already-narrow table
        cols.append(F.col("block_id"))
    return scored.filter(
        (F.col("score") >= threshold) & ~F.col("homonym_conflict")
    ).select(*cols)
