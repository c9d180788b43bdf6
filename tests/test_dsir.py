"""DSIR importance weights: direction (target-like scores higher), unseen-
bucket floors, bounded model support, deterministic quota selection."""

import pyspark.sql.functions as F

from ala_name_matching_spark.operators.dsir import (
    hashed_buckets,
    importance_weights,
    select_top_quota,
)


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the rain in spain stays mainly on the plain", "en"),
        (3, "der schnelle braune fuchs springt ueber den hund", "de"),
        (4, "el rapido zorro marron salta sobre el perro", "es"),
        (5, "the quick brown dog sleeps on the plain", "en"),
        (6, "zzz qqq xxx vvv www unseen tokens only", "xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_target_like_docs_score_higher(spark):
    d = _corpus(spark)
    w = importance_weights(d, d.where(F.col("lang") == "en"))
    got = {r.id: r.log_weight for r in w.collect()}
    en_min = min(got[i] for i in (1, 2, 5))
    other_max = max(got[i] for i in (3, 4, 6))
    assert en_min > other_max


def test_unseen_buckets_hit_target_floor_not_null(spark):
    d = _corpus(spark)
    w = importance_weights(d, d.where(F.col("lang") == "en"))
    got = {r.id: r.log_weight for r in w.collect()}
    assert got[6] is not None and got[6] < 0  # floor-dominated, defined


def test_model_support_is_bounded(spark):
    d = _corpus(spark)
    b = hashed_buckets(d, n_buckets=64)
    assert b.select("bucket").distinct().count() <= 64
    assert b.agg(F.max("bucket")).collect()[0][0] < 64
    assert b.agg(F.min("bucket")).collect()[0][0] >= 0


def test_quota_selection_deterministic(spark):
    d = _corpus(spark)
    w = importance_weights(d, d.where(F.col("lang") == "en"))
    s1 = {(r.id, r.selected) for r in select_top_quota(w, quota=3).collect()}
    s2 = {(r.id, r.selected) for r in select_top_quota(w, quota=3).collect()}
    assert s1 == s2
    assert sum(1 for _, sel in s1 if sel) == 3
    # the english docs are the ones selected
    assert {i for i, sel in s1 if sel} == {1, 2, 5}
