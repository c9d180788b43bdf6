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
