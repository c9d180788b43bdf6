"""PPRL Bloom encodings: python-reference position replay, typo tolerance
vs unrelated separation, CLK union composition, map-only encode plan."""

import hashlib

import pyspark.sql.functions as F

from ala_name_matching_spark.operators.pprl import bloom_encode, dice_pairs


def _py_bf(text, m_bits=4096, k=2):
    p = "_" + text.lower() + "_"
    grams = {p[i : i + 2] for i in range(len(p) - 1)}
    pos = set()
    for g in grams:
        for j in range(k):
            h = int(hashlib.md5(f"pprl{j}|{g}".encode()).hexdigest()[:15], 16)
            pos.add(h % m_bits)
    return sorted(pos)


def _dice(a, b):
    inter = len(set(a) & set(b))
    return round(2.0 * inter / (len(a) + len(b)), 6)


def test_encoding_matches_python_reference(spark):
    rows = [(1, "Jonathan Smith"), (2, "jonathon smith"), (3, "Maria Garcia-Lopez")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: (list(r.bf), r.nbits) for r in bloom_encode(df).collect()}
    for i, t in rows:
        want = _py_bf(t)
        assert got[i] == (want, len(want)), t


def test_typo_tolerant_unrelated_separated(spark):
    rows = [
        (1, "jonathan smith"),
        (2, "jonathon smith"),   # one substitution
        (3, "completely unrelated value"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    enc = bloom_encode(df).withColumn("bk", F.lit("all"))
    pairs = {
        (r.id_l, r.id_r): r.dice
        for r in dice_pairs(enc, "bk", threshold=0.0).collect()
    }
    assert pairs[(1, 2)] >= 0.85
    assert pairs[(1, 3)] < 0.5
    # exact set semantics vs the python reference
    assert pairs[(1, 2)] == _dice(_py_bf("jonathan smith"), _py_bf("jonathon smith"))


def test_clk_union_composition(spark):
    # CLK (Schnell 2011): multi-field filter == union of per-field position
    # sets; encoding the concatenated fields with a separator that maps to
    # the pad char keeps bigram inventories comparable -- assert the
    # cheap invariant instead: a two-field record's filter contains every
    # position of each field encoded alone minus the pad-boundary grams
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "alpha_bravo")],
        "doc_id long, text string",
    )
    got = {r.id: set(r.bf) for r in bloom_encode(df).collect()}
    # interior bigrams of each field survive in the concatenation
    interior = lambda t: {t[i : i + 2] for i in range(len(t) - 1)}
    for field in ("alpha", "bravo"):
        pos = set()
        for g in interior(field):
            for j in range(2):
                h = int(
                    hashlib.md5(f"pprl{j}|{g}".encode()).hexdigest()[:15], 16
                )
                pos.add(h % 4096)
        assert pos <= got[3], field


def test_encode_plan_shape(spark):
    # two Exchanges only -- the vocabulary distinct (partially aggregated
    # to <= alphabet^2 rows per task before it ships) and the collect_set
    # groupBy rebuilding per-record sets; the gram->positions lookup must
    # be a broadcast join, never a shuffle join
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = bloom_encode(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
