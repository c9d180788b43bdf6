"""Monge-Elkan / TF-IDF-cosine comparators and golden-record fusion:
hand-computed values, boundary behavior, vote tie-breaks."""

import math

import pyspark.sql.functions as F
import pytest

from ala_name_matching_spark.operators.comparators import (
    monge_elkan_pairs,
    tfidf_cosine_pairs,
)
from ala_name_matching_spark.operators.fusion import golden_record


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "block_key string, doc_id long, text string")


# ---------------------------------------------------------------- monge-elkan


def test_monge_elkan_hand_computed(spark):
    # tokens sorted-distinct: A = [apple, pear], B = [appple, pearl]
    # lev(apple,appple)=1 -> 1-1/6 ; lev(apple,pearl)=4 -> 1-4/5
    # lev(pear,appple)=5 -> 1-5/6 ; lev(pear,pearl)=1 -> 1-1/5
    df = _pairs_df(
        spark, [("b", 1, "pear apple"), ("b", 2, "pearl appple")]
    )
    row = monge_elkan_pairs(df).collect()[0]
    lr = ((1 - 1 / 6) + (1 - 1 / 5)) / 2
    assert row["me_lr"] == pytest.approx(round(lr, 6), abs=1e-9)
    assert row["me_rl"] == pytest.approx(round(lr, 6), abs=1e-9)  # symmetric here
    assert row["me_sym"] == pytest.approx(round(lr, 6), abs=1e-9)


def test_monge_elkan_identical_texts_score_one(spark):
    df = _pairs_df(spark, [("b", 1, "x y z"), ("b", 2, "z y x")])
    row = monge_elkan_pairs(df).collect()[0]
    # token reorder is free for ME (the point of the comparator)
    assert row["me_lr"] == 1.0 and row["me_rl"] == 1.0 and row["me_sym"] == 1.0


def test_monge_elkan_asymmetric_directions(spark):
    # A subset of B: every A token has a perfect match -> me_lr = 1,
    # but B has an extra token with no perfect match -> me_rl < 1.
    df = _pairs_df(spark, [("b", 1, "alpha beta"), ("b", 2, "alpha beta qqqq")])
    row = monge_elkan_pairs(df).collect()[0]
    assert row["me_lr"] == 1.0
    assert row["me_rl"] < 1.0
    assert row["me_sym"] == pytest.approx((1.0 + row["me_rl"]) / 2, abs=1e-6)


def test_monge_elkan_blocks_limit_pairs(spark):
    df = _pairs_df(
        spark,
        [("b1", 1, "a"), ("b1", 2, "a"), ("b2", 3, "a")],
    )
    got = {(r["id_l"], r["id_r"]) for r in monge_elkan_pairs(df).collect()}
    assert got == {(1, 2)}


def test_monge_elkan_max_tokens_caps_cost(spark):
    long_a = " ".join(f"t{i:02d}" for i in range(50))
    df = _pairs_df(spark, [("b", 1, long_a), ("b", 2, long_a)])
    row = monge_elkan_pairs(df, max_tokens=10).collect()[0]
    assert row["me_sym"] == 1.0  # capped slice is identical on both sides


# ---------------------------------------------------------------- tfidf cosine


def test_tfidf_cosine_identical_docs_one(spark):
    df = _pairs_df(
        spark,
        [("b", 1, "red fish blue"), ("b", 2, "blue fish red"), ("b", 3, "zzz")],
    )
    rows = {(r["id_l"], r["id_r"]): r["cosine"] for r in tfidf_cosine_pairs(df).collect()}
    # (1,2) share all tokens -> cosine exactly 1; zzz shares nothing -> no row
    assert rows == {(1, 2): 1.0}


def test_tfidf_cosine_rare_token_outweighs_common(spark):
    # 'common' appears in all docs (low idf); 'rare*' in two docs each.
    df = _pairs_df(
        spark,
        [
            ("b", 1, "common rarex"),
            ("b", 2, "common rarex"),
            ("b", 3, "common othertok"),
        ],
    )
    rows = {(r["id_l"], r["id_r"]): r["cosine"] for r in tfidf_cosine_pairs(df).collect()}
    assert rows[(1, 2)] == 1.0
    assert rows[(1, 3)] < rows[(1, 2)]
    assert rows[(1, 3)] == rows[(2, 3)]


def test_tfidf_cosine_matches_numpy(spark):
    texts = {1: "a b c", 2: "a b d", 3: "a e"}
    df = _pairs_df(spark, [("b", k, v) for k, v in texts.items()])
    got = {(r["id_l"], r["id_r"]): r["cosine"] for r in tfidf_cosine_pairs(df).collect()}
    n = len(texts)
    toks = {k: set(v.split()) for k, v in texts.items()}
    dfreq = {}
    for ts in toks.values():
        for t in ts:
            dfreq[t] = dfreq.get(t, 0) + 1
    idf = {t: math.log((n + 1) / (d + 1)) + 1 for t, d in dfreq.items()}
    for (a, b), got_cos in got.items():
        shared = toks[a] & toks[b]
        dot = sum(idf[t] ** 2 for t in sorted(shared))
        na = math.sqrt(sum(idf[t] ** 2 for t in sorted(toks[a])))
        nb = math.sqrt(sum(idf[t] ** 2 for t in sorted(toks[b])))
        assert got_cos == pytest.approx(round(dot / (na * nb), 6), abs=1e-6)


# ---------------------------------------------------------------- golden record


def _clustered(spark, rows):
    return spark.createDataFrame(
        rows, "cluster string, doc_id long, text string, lang string, source string"
    )


def test_golden_record_majority_vote_and_tiebreak(spark):
    df = _clustered(
        spark,
        [
            ("c1", 1, "short", "en", "web"),
            ("c1", 2, "longer text", "en", "book"),
            ("c1", 3, "mid txt", "de", "book"),
            # c2: lang vote tied 1-1 -> lexicographically smallest wins
            ("c2", 4, "aaaa", "fr", "web"),
            ("c2", 5, "bb", "en", "web"),
        ],
    )
    out = {
        r["cluster"]: r
        for r in golden_record(
            df, "cluster", ["lang", "source"], "doc_id", text_col="text"
        ).collect()
    }
    c1, c2 = out["c1"], out["c2"]
    assert c1["n_members"] == 3
    assert c1["lang_gold"] == "en" and c1["lang_support"] == 2
    assert c1["source_gold"] == "book" and c1["source_support"] == 2
    assert c1["rep_id"] == 2  # longest text
    assert c2["lang_gold"] == "en" and c2["lang_support"] == 1  # tie -> lexi min
    assert c2["rep_id"] == 4


def test_golden_record_nulls_never_vote(spark):
    df = _clustered(
        spark,
        [
            ("c", 1, "t", None, "s1"),
            ("c", 2, "tt", None, "s1"),
            ("c", 3, "ttt", "xx", None),
        ],
    )
    r = golden_record(df, "cluster", ["lang", "source"], "doc_id", text_col="text").collect()[0]
    assert r["lang_gold"] == "xx" and r["lang_support"] == 1
    assert r["source_gold"] == "s1" and r["source_support"] == 2
    assert r["n_members"] == 3


def test_golden_record_all_null_attr_stays_null(spark):
    df = _clustered(spark, [("c", 1, "t", None, None), ("c", 2, "u", None, None)])
    r = golden_record(df, "cluster", ["lang"], "doc_id").collect()[0]
    assert r["lang_gold"] is None and r["lang_support"] is None
    assert r["n_members"] == 2


def test_golden_record_rep_tie_breaks_to_min_id(spark):
    df = _clustered(
        spark, [("c", 9, "same", "en", "w"), ("c", 4, "same", "en", "w")]
    )
    r = golden_record(df, "cluster", ["lang"], "doc_id", text_col="text").collect()[0]
    assert r["rep_id"] == 4


# ---------------------------------------------------------------- soft-tf-idf


def test_soft_tfidf_identical_docs_score_one(spark):
    """Identical docs: every token self-matches at sim 1, weights are
    L2-normalized, so the score is exactly sum w^2 = 1."""
    from ala_name_matching_spark.operators.comparators import soft_tfidf_pairs

    d = _pairs_df(
        spark,
        [("b", 1, "alpha beta gamma"), ("b", 2, "alpha beta gamma")],
    )
    r = soft_tfidf_pairs(d).collect()[0]
    assert r["soft_lr"] == r["soft_rl"] == r["soft_sym"] == 1.0


def test_soft_tfidf_typos_score_where_cosine_is_zero(spark):
    """'jon smyth' vs 'john smith' shares NO exact token (tfidf cosine 0)
    but every token has a close partner: nlev(jon,john)=0.75,
    nlev(smyth,smith)=0.8 -> positive at theta=0.7, zero at theta=0.9."""
    from ala_name_matching_spark.operators.comparators import (
        soft_tfidf_pairs,
        tfidf_cosine_pairs,
    )

    d = _pairs_df(spark, [("b", 1, "jon smyth"), ("b", 2, "john smith")])
    assert tfidf_cosine_pairs(d).count() == 0  # no shared token at all
    soft = soft_tfidf_pairs(d, theta=0.7).collect()[0]
    assert soft["soft_sym"] > 0.5
    strict = soft_tfidf_pairs(d, theta=0.9).collect()[0]
    assert strict["soft_sym"] == 0.0


def test_soft_tfidf_rare_token_outweighs_common(spark):
    """The match on a corpus-rare token contributes more than the match on
    a token present in every doc."""
    from ala_name_matching_spark.operators.comparators import soft_tfidf_pairs

    d = _pairs_df(
        spark,
        [
            ("b", 1, "common zyzzyx"),
            ("b", 2, "common zyzzyx"),
            ("x", 3, "common filler"),
            ("x", 4, "common words"),
            ("x", 5, "common stuff"),
        ],
    )
    r = soft_tfidf_pairs(d).where("id_l = 1").collect()[0]
    # decompose: contribution of each token = w_l * w_r * 1; rare token
    # has higher idf hence higher normalized weight share
    assert r["soft_sym"] == 1.0  # identical docs still total 1 (L2 norm)
    # drop the rare token from one side: score falls below the rare
    # token's weight share (> half the mass)
    d2 = _pairs_df(
        spark,
        [
            ("b", 1, "common zyzzyx"),
            ("b", 2, "common other"),
            ("x", 3, "common filler"),
            ("x", 4, "common words"),
            ("x", 5, "common stuff"),
        ],
    )
    r2 = soft_tfidf_pairs(d2).where("id_l = 1").collect()[0]
    assert r2["soft_sym"] < 0.5


def test_soft_tfidf_argmax_is_first_sorted_attainer(spark):
    """Two right tokens tie at sim: the token-sorted first one's weight is
    used (deterministic argmax)."""
    from ala_name_matching_spark.operators.comparators import soft_tfidf_pairs

    # left 'aa' vs right 'ab','ba' -- nlev both 0.5; sorted order picks 'ab'
    d = _pairs_df(spark, [("b", 1, "aa"), ("b", 2, "ab ba")])
    r = soft_tfidf_pairs(d, theta=0.4).collect()[0]
    # both right tokens have equal idf and equal weight, so the tie is
    # invisible in the score -- this asserts it EVALUATES (no shadowing
    # error) and is > 0 under the tie
    assert r["soft_lr"] > 0.0
