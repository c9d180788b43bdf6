"""Winnowing fingerprints (Schleimer et al. 2003): operators/dedup.py.

Pins the paper's two properties on real Spark runs: the guarantee (any
shared token run of length >= w + k - 1 yields a shared fingerprint hash,
regardless of where the run sits in either doc) and the density bound
(far fewer fingerprints than grams)."""

import numpy as np

from ala_name_matching_spark.operators.dedup import (
    winnow_fingerprints,
    winnowing_candidate_pairs,
)

K, W = 4, 5


def _words(rng, n):
    return " ".join(f"t{rng.randint(100000)}" for _ in range(n))


def test_shared_run_guarantee_under_shifting(spark):
    rng = np.random.RandomState(3)
    shared = _words(rng, W + K - 1)  # exactly the guarantee threshold
    rows = [
        (0, f"{_words(rng, 17)} {shared} {_words(rng, 9)}"),
        (1, f"{_words(rng, 2)} {shared} {_words(rng, 23)}"),  # shifted offset
        (2, _words(rng, 40)),  # no shared run
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = winnow_fingerprints(docs, k=K, w=W)
    by_doc = {
        d: {r["fp_hash"] for r in rows_}
        for d, rows_ in (
            (d, [r for r in fps.collect() if r["doc_id"] == d]) for d in (0, 1, 2)
        )
    }
    assert by_doc[0] & by_doc[1], "guarantee violated: no shared fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_density_well_below_gram_count(spark):
    rng = np.random.RandomState(4)
    docs = spark.createDataFrame(
        [(0, _words(rng, 500))], "doc_id bigint, text string"
    )
    n_fps = winnow_fingerprints(docs, k=K, w=W).count()
    n_grams = 500 - K + 1
    # expected density 2/(w+1) = 1/3; allow slack but demand real winnowing
    assert n_fps < 0.6 * n_grams
    assert n_fps >= n_grams // (W + K)  # and at least the window floor


def test_candidate_pairs_require_min_shared(spark):
    rng = np.random.RandomState(5)
    shared = _words(rng, 30)
    docs = spark.createDataFrame(
        [
            (0, f"{shared} {_words(rng, 10)}"),
            (1, f"{_words(rng, 5)} {shared}"),
            (2, _words(rng, 40)),
        ],
        "doc_id bigint, text string",
    )
    got = winnowing_candidate_pairs(docs, k=K, w=W, min_shared=3).collect()
    assert len(got) == 1
    assert (got[0]["doc_id_l"], got[0]["doc_id_r"]) == (0, 1)
    assert got[0]["shared_fps"] >= 3


def test_short_doc_single_window(spark):
    # doc shorter than one window still fingerprints (min over all grams)
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], "doc_id bigint, text string"
    )
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    assert len(fps) == 1  # 2 grams, one window -> one fingerprint
