"""Sort-based strict-prefix containment: dedup.prefix_containment_flags.

The Spark-vs-DuckDB replay (global-window oracle vs bucketed windows) runs
under tools/check_oracles.py as `prefix_containment`; these tests pin the
edge semantics the fixture can't plant.
"""

from ala_name_matching_spark.operators.dedup import prefix_containment_flags


def _flags(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = prefix_containment_flags(df, **kw)
    return {r["doc_id"]: r["contained"] for r in out.collect()}


def test_prefix_chain_and_non_prefix(spark):
    # chain: each proper prefix is contained, the longest is not; an
    # unrelated doc sharing the 16-char bucket but diverging later is not
    base = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, base),
        (2, base[: len(base) // 2]),
        (3, base[:20]),
        (4, base[:20] + " XXXX"),  # same bucket, diverges -> not a prefix
    ]
    got = _flags(spark, rows)
    assert got == {1: False, 2: True, 3: True, 4: False}


def test_equal_texts_are_not_strict_prefixes(spark):
    rows = [(1, "same text either way"), (2, "same text either way")]
    got = _flags(spark, rows)
    assert got == {1: False, 2: False}


def test_short_text_lane_below_bucket_len(spark):
    # "alpha beta" is 10 chars < bucket_len=16 -> broadcast-probe lane;
    # it prefixes doc 1. "zz" prefixes nothing.
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta"),
        (3, "zz"),
    ]
    got = _flags(spark, rows)
    assert got == {1: False, 2: True, 3: False}


def test_prefix_pair_split_across_global_sort_neighbors(spark):
    # a < s < b with s NOT a superstring of a is impossible (the identity
    # the operator rests on); what CAN happen is several superstrings --
    # the immediate successor must carry the flag for a.
    rows = [
        (1, "prefix shared among many docs"),
        (2, "prefix shared among many docs and one"),
        (3, "prefix shared among many docs and two"),
    ]
    got = _flags(spark, rows)
    assert got == {1: True, 2: False, 3: False}
