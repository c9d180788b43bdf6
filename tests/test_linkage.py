"""Fellegi-Sunter EM linkage: separability on planted data, pattern
encoding, determinism, and edge cases."""

import math

import pyspark.sql.functions as F
import pytest

from ala_name_matching_spark.operators.linkage import (
    agreement_pattern_counts,
    fellegi_sunter_weights,
    fs_em,
)


def _pairs(spark):
    # 100 planted matches (mostly all-agree) + 900 non-matches (mostly
    # all-disagree), with deterministic noise flips
    rows = []
    for i in range(100):
        g = [1, 1, 1]
        if i % 10 == 0:
            g[i % 3] = 0  # 10% single-field disagreement among matches
        rows.append(tuple(g))
    for i in range(900):
        g = [0, 0, 0]
        if i % 9 == 0:
            g[i % 3] = 1  # ~11% single-field chance agreement
        rows.append(tuple(g))
    return spark.createDataFrame(rows, "g1 int, g2 int, g3 int")


def test_em_separates_m_from_u(spark):
    hist = agreement_pattern_counts(_pairs(spark), ["g1", "g2", "g3"])
    pats = sorted(
        ((r["pattern_id"], [r["g1"], r["g2"], r["g3"]], r["n_pairs"]) for r in hist.collect()),
        key=lambda t: t[0],
    )
    p, m, u = fs_em(pats, 3, iters=10)
    # ~10% of pairs are matches; every field far likelier under M than U
    assert 0.05 < p < 0.2
    for i in range(3):
        assert m[i] > 0.8 and u[i] < 0.2 and m[i] > u[i]


def test_weights_monotone_in_agreement(spark):
    out = {
        r["pattern_id"]: r
        for r in fellegi_sunter_weights(_pairs(spark), ["g1", "g2", "g3"]).collect()
    }
    full, none = out[7], out[0]
    assert full["match_weight"] > 0 > none["match_weight"]
    assert full["posterior"] > 0.95 and none["posterior"] < 0.05
    # every single-agreement pattern sits strictly between the extremes
    for pid in (1, 2, 4):
        if pid in out:
            assert none["match_weight"] < out[pid]["match_weight"] < full["match_weight"]


def test_pattern_id_encoding(spark):
    df = spark.createDataFrame([(1, 0, 1)], "a int, b int, c int")
    row = agreement_pattern_counts(df, ["a", "b", "c"]).collect()[0]
    assert row["pattern_id"] == 1 + 0 * 2 + 1 * 4
    assert row["n_pairs"] == 1


def test_posterior_is_bayes_consistent(spark):
    # posterior must equal p*P(g|M) / (p*P(g|M) + (1-p)*P(g|U)) under the
    # fitted params -- recompute independently from fs_em's output
    pairs = _pairs(spark)
    hist = agreement_pattern_counts(pairs, ["g1", "g2", "g3"])
    pats = sorted(
        ((r["pattern_id"], [r["g1"], r["g2"], r["g3"]], r["n_pairs"]) for r in hist.collect()),
        key=lambda t: t[0],
    )
    p, m, u = fs_em(pats, 3, iters=4)
    out = {r["pattern_id"]: r for r in fellegi_sunter_weights(pairs, ["g1", "g2", "g3"], iters=4).collect()}
    for pid, g, _c in pats:
        pm = 1.0
        pu = 1.0
        for i in range(3):
            pm *= m[i] if g[i] else 1.0 - m[i]
            pu *= u[i] if g[i] else 1.0 - u[i]
        assert out[pid]["posterior"] == pytest.approx(p * pm / (p * pm + (1 - p) * pu), abs=1e-6)
        assert out[pid]["match_weight"] == pytest.approx(math.log2(pm / pu), abs=1e-6)


def test_empty_pairs_yields_empty_frame(spark):
    empty = spark.createDataFrame([], "g1 int, g2 int")
    out = fellegi_sunter_weights(empty, ["g1", "g2"])
    assert out.count() == 0
    assert set(out.columns) == {"pattern_id", "g1", "g2", "n_pairs", "match_weight", "posterior"}


def test_fs_em_deterministic(spark):
    pats = [(0, [0, 0], 500), (1, [1, 0], 30), (3, [1, 1], 70)]
    a = fs_em(pats, 2, 6)
    b = fs_em(list(pats), 2, 6)
    assert a == b


# ---------------------------------------------------------- reciprocal best


def _rbm(spark, rows):
    from ala_name_matching_spark.operators.linkage import reciprocal_best_match

    df = spark.createDataFrame(rows, "id_a long, id_b long, score double")
    return {
        (r["id_a"], r["id_b"]): r["score"]
        for r in reciprocal_best_match(df).collect()
    }


def test_rbm_keeps_only_mutual_best(spark):
    # a1's best is b1 (0.9) and b1's best is a1 -> kept.
    # a2's best is b1 (0.8) but b1 prefers a1 -> dropped; a2-b2 (0.7) is
    # mutual among what remains of NEITHER side's computation -- reciprocal
    # best is non-iterative, so a2-b2 kept only if 0.7 is a2's best AND
    # b2's best: it is (a2: 0.8>0.7 -> a2's best is b1) -> dropped too.
    rows = [(1, 11, 0.9), (2, 11, 0.8), (2, 12, 0.7)]
    out = _rbm(spark, rows)
    assert out == {(1, 11): 0.9}


def test_rbm_one_to_one_property(spark):
    rows = [
        (1, 11, 0.9), (1, 12, 0.8),
        (2, 12, 0.85), (2, 11, 0.2),
        (3, 12, 0.3),
    ]
    out = _rbm(spark, rows)
    assert out == {(1, 11): 0.9, (2, 12): 0.85}
    a_side = [a for a, _ in out]
    b_side = [b for _, b in out]
    assert len(set(a_side)) == len(a_side) and len(set(b_side)) == len(b_side)


def test_rbm_ties_break_to_smallest_partner(spark):
    rows = [(1, 12, 0.5), (1, 11, 0.5), (2, 11, 0.5)]
    out = _rbm(spark, rows)
    # a1 ties 11/12 -> picks 11; b11 ties a1/a2 -> picks a1 -> (1,11) kept;
    # (1,12): a1's best is 11 -> dropped even though b12 prefers a1.
    assert out == {(1, 11): 0.5}


def test_tf_adjusted_weights_hand_example(spark):
    """values a,a,a,b: u_a=.75, u_b=.25, u_field=10/16; rare value gets a
    positive adjustment, common negative; adjusted = log2(m/u_v)."""
    import math

    import pandas as pd

    from ala_name_matching_spark.operators.linkage import tf_adjusted_weights

    df = spark.createDataFrame(pd.DataFrame({"v": ["a", "a", "a", "b", None]}))
    rows = {r["value"]: r for r in tf_adjusted_weights(df, "v").collect()}
    assert set(rows) == {"a", "b"}  # null excluded
    a, b = rows["a"], rows["b"]
    assert (a["n_v"], b["n_v"]) == (3, 1)
    assert a["u_value"] == 0.75 and b["u_value"] == 0.25
    assert a["u_field"] == b["u_field"] == round(10 / 16, 6)
    assert a["tf_adjustment"] == round(math.log2((10 / 16) / 0.75), 6) < 0
    assert b["tf_adjustment"] == round(math.log2((10 / 16) / 0.25), 6) > 0
    assert a["adjusted_weight"] == round(math.log2(0.9 / 0.75), 6)
    assert b["adjusted_weight"] == round(math.log2(0.9 / 0.25), 6)
    # identity: adjusted = field-level weight + tf_adjustment (up to 1 ulp
    # of the 6-dp rounds)
    base = math.log2(0.9 / (10 / 16))
    assert abs(a["adjusted_weight"] - (base + a["tf_adjustment"])) < 2e-6


def test_multilevel_reduces_to_binary_fs_em():
    from ala_name_matching_spark.operators.linkage import (
        fs_em,
        fs_em_multilevel,
    )

    # binary histogram over 2 fields; with L=2 and the binary init,
    # the multilevel model IS fs_em (level-1 prob = m, level-0 = 1-m)
    patterns = [
        (0, [0, 0], 400),
        (1, [1, 0], 50),
        (2, [0, 1], 30),
        (3, [1, 1], 120),
    ]
    p_b, m_b, u_b = fs_em(patterns, 2, 4)
    p_m, m_m, u_m = fs_em_multilevel(
        patterns,
        [2, 2],
        4,
        m_init=[[0.1, 0.9], [0.1, 0.9]],
        u_init=[[0.9, 0.1], [0.9, 0.1]],
    )
    assert p_m == pytest.approx(p_b, abs=1e-12)
    for i in range(2):
        assert m_m[i][1] == pytest.approx(m_b[i], abs=1e-12)
        assert m_m[i][0] == pytest.approx(1.0 - m_b[i], abs=1e-10)
        assert u_m[i][1] == pytest.approx(u_b[i], abs=1e-12)


def test_multilevel_em_separates_graded_populations():
    from ala_name_matching_spark.operators.linkage import fs_em_multilevel

    # two correlated graded fields (one field alone is unidentifiable):
    # matches agree high on BOTH (with a "close" level-1 tail), unmatches
    # sit at 0 -- the fitted m puts its mass high, u low
    patterns = [
        (0, [0, 0], 900),
        (4, [1, 1], 80),
        (8, [2, 2], 120),
        (2, [2, 0], 10),
        (6, [0, 2], 10),
    ]
    p, m, u = fs_em_multilevel(patterns, [3, 3], 8)
    for i in range(2):
        assert m[i][2] > 0.5 and m[i][2] > m[i][0]
        assert u[i][0] > 0.8
    assert 0.05 < p < 0.35


def test_multilevel_weights_frame(spark):
    import pandas as pd

    from ala_name_matching_spark.operators.linkage import (
        fellegi_sunter_multilevel_weights,
    )

    rows = [(2, 2), (2, 2), (2, 1), (0, 0), (0, 0), (0, 0), (1, 0)]
    pairs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g_a", "g_b"])
    )
    out = fellegi_sunter_multilevel_weights(
        pairs, ["g_a", "g_b"], levels=[3, 3], iters=3
    ).collect()
    by_pid = {r["pattern_id"]: r for r in out}
    # mixed-radix encoding: (g_a, g_b) -> g_a + 3*g_b
    assert set(by_pid) == {0, 1, 2 + 3 * 1, 2 + 3 * 2}
    assert sum(r["n_pairs"] for r in out) == 7
    # all-agree-high outweighs all-disagree
    assert by_pid[8]["match_weight"] > by_pid[0]["match_weight"]
    assert by_pid[8]["posterior"] > by_pid[0]["posterior"]


def test_level_weights_model_table(spark):
    import pandas as pd

    from ala_name_matching_spark.operators.linkage import (
        fellegi_sunter_level_weights,
    )

    rows = (
        [(2, 2)] * 100 + [(1, 1)] * 30 + [(0, 0)] * 800 + [(2, 0)] * 5
    )
    pairs = spark.createDataFrame(pd.DataFrame(rows, columns=["g_a", "g_b"]))
    out = {
        (r["field"], r["level"]): r
        for r in fellegi_sunter_level_weights(
            pairs, ["g_a", "g_b"], levels=[3, 3], iters=6
        ).collect()
    }
    assert len(out) == 6
    # high agreement levels carry positive evidence, level 0 negative
    assert out[("g_a", 2)]["level_weight"] > 0
    assert out[("g_a", 0)]["level_weight"] < 0
    # m and u are per-field distributions over levels
    for f in ("g_a", "g_b"):
        assert sum(out[(f, l)]["m"] for l in range(3)) == pytest.approx(
            1.0, abs=1e-4
        )
        assert sum(out[(f, l)]["u"] for l in range(3)) == pytest.approx(
            1.0, abs=1e-4
        )
