"""Smith-Waterman-Gotoh kernel: hand goldens, brute-force DP cross-check,
properties, and the opt-in author-gate wiring."""

import random

import numpy as np
import pandas as pd
import pytest

from ala_name_matching_spark.functions.swg import swg_batch, swg_scalar


def _swg_ref(a, b, match=5.0, mis=-3.0, op=5.0, ext=1.0):
    """Unvectorized textbook Gotoh local alignment (the spec)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    H = [[0.0] * (lb + 1) for _ in range(la + 1)]
    E = [[float("-inf")] * (lb + 1) for _ in range(la + 1)]
    Fv = [[float("-inf")] * (lb + 1) for _ in range(la + 1)]
    best = 0.0
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            E[i][j] = max(H[i][j - 1] - op, E[i][j - 1] - ext)
            Fv[i][j] = max(H[i - 1][j] - op, Fv[i - 1][j] - ext)
            s = match if a[i - 1] == b[j - 1] else mis
            H[i][j] = max(0.0, H[i - 1][j - 1] + s, E[i][j], Fv[i][j])
            best = max(best, H[i][j])
    return min(1.0, best / (min(la, lb) * match))


def test_hand_goldens():
    assert swg_scalar("ABC", "ABC") == 1.0
    assert swg_scalar("ABC", "ABD") == pytest.approx(10 / 15)
    assert swg_scalar("AXC", "ABC") == pytest.approx(7 / 15)
    # one gap: open cost 5 eats one match
    assert swg_scalar("AC", "ABC") == pytest.approx(0.5)
    # local alignment: perfect substring scores 1 regardless of context
    assert swg_scalar("ABCDEF", "CDE") == 1.0
    assert swg_scalar("SMITH", "SMYTH") == pytest.approx(0.68)


def test_empty_and_null_conventions():
    assert swg_scalar("", "") == 1.0
    assert swg_scalar("", "A") == 0.0
    assert swg_scalar("A", "") == 0.0
    assert swg_scalar(None, "A") is None
    out = swg_batch(pd.Series([None, "X"]), pd.Series(["Y", None]))
    assert np.isnan(out).all()


def test_matches_reference_dp_on_random_inputs():
    random.seed(11)
    alph = "ABCD "
    a_list, b_list = [], []
    for _ in range(400):
        a_list.append("".join(random.choice(alph) for _ in range(random.randint(0, 14))))
        b_list.append("".join(random.choice(alph) for _ in range(random.randint(0, 14))))
    got = swg_batch(pd.Series(a_list), pd.Series(b_list))
    for a, b, g in zip(a_list, b_list, got):
        assert g == pytest.approx(_swg_ref(a, b), abs=1e-12), (a, b)


def test_symmetry_and_bounds():
    random.seed(13)
    pairs = [
        (
            "".join(random.choice("XYZW") for _ in range(random.randint(1, 10))),
            "".join(random.choice("XYZW") for _ in range(random.randint(1, 10))),
        )
        for _ in range(200)
    ]
    f = swg_batch(pd.Series([p[0] for p in pairs]), pd.Series([p[1] for p in pairs]))
    r = swg_batch(pd.Series([p[1] for p in pairs]), pd.Series([p[0] for p in pairs]))
    assert np.allclose(f, r)
    assert ((f >= 0.0) & (f <= 1.0)).all()


def test_cap_truncates_consistently():
    long = "A" * 100
    assert swg_scalar(long, long) == 1.0
    # cap means only the first 32 chars are compared
    assert swg_scalar(long, "A" * 32 + "B" * 68) == 1.0


def test_author_gate_swg_waives_near_equal_tools(spark):
    from ala_name_matching_spark.operators.pairs import apply_pair_scores

    rows = [
        # same text, tools near-equal under SWG -> waived (no conflict)
        ("a", "b", "hello world", "hello world", "u", "u", "SQLRUNNER", "SQLRUNNERX"),
        # same text, tools disjoint -> conflict stands
        ("c", "d", "hello world", "hello world", "u", "u", "SQL", "BROWSER"),
    ]
    df = spark.createDataFrame(
        rows,
        "record_id_l string, record_id_r string, canon_text_l string, "
        "canon_text_r string, role_l string, role_r string, "
        "tool_l string, tool_r string",
    )
    out = {
        r["record_id_l"]: r["homonym_conflict"]
        for r in apply_pair_scores(df, has_tokens=False, author_metric="swg").collect()
    }
    assert out == {"a": False, "c": True}


def test_author_metric_validation():
    from ala_name_matching_spark.operators.pairs import apply_pair_scores

    with pytest.raises(ValueError):
        apply_pair_scores(None, author_metric="nope")
