"""SymSpell: brute-force truth-set parity (incl. the empty-variant corner),
randomized typo dictionary, variant-count shape."""

import random

import pyspark.sql.functions as F

from ala_name_matching_spark.operators.symspell import (
    delete_variants,
    symspell_lookup,
)


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _check(spark, dict_terms, queries, d):
    ddf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(dict_terms)], "dict_id long, term string"
    )
    qdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(queries)], "query_id long, term string"
    )
    got = {
        (r.query_id, r.dict_id, r.dist)
        for r in symspell_lookup(ddf, qdf, d=d).collect()
    }
    want = {
        (qi, di, _lev(q, t))
        for qi, q in enumerate(queries)
        for di, t in enumerate(dict_terms)
        if _lev(q, t) <= d
    }
    assert got == want


def test_truth_set_parity_with_short_string_corner(spark):
    dict_terms = [
        "smith", "smyth", "schmidt", "jonathan", "jonathon", "banana",
        "bananas", "a", "ab", "abcd", "xyzzy", "plain", "plane", "plan",
    ]
    # 'x' vs 'a' (ed 1) meet ONLY at the empty variant -- the corner that
    # breaks implementations which drop zero-length variants
    queries = ["smith", "jonathon", "banan", "abc", "plane", "zzz", "x"]
    for d in (1, 2):
        _check(spark, dict_terms, queries, d)


def test_randomized_typo_dictionary(spark):
    rng = random.Random(23)
    alphabet = "abcdef"
    base = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
        for _ in range(25)
    ]
    typos = []
    for t in base[:12]:
        s = list(t)
        p = rng.randrange(len(s))
        op = rng.choice("sid")
        if op == "s":
            s[p] = rng.choice(alphabet)
        elif op == "i":
            s.insert(p, rng.choice(alphabet))
        else:
            del s[p]
        if s:
            typos.append("".join(s))
    _check(spark, sorted(set(base)), sorted(set(typos)), 2)


def test_variant_count_shape(spark):
    # |variants| for a length-L term at d=1 is L+1 (term + L deletes),
    # minus duplicate deletes from repeated chars
    df = spark.createDataFrame([(1, "abcde"), (2, "aaaa")], "id long, term string")
    v = delete_variants(df, "id", "term", d=1)
    counts = {r["id"]: r["c"] for r in v.groupBy("id").agg(F.count("*").alias("c")).collect()}
    assert counts[1] == 6      # abcde + 5 distinct deletes
    assert counts[2] == 2      # aaaa + aaa (all deletes identical)
