"""Tests for ANN / similarity search over embeddings."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.similarity_search import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.standard_normal((10, DIM))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], None))
    # 100+i = tiny perturbation of i (guaranteed near-dup)
    for i, v in enumerate(base[:3]):
        rows.append((100 + i, [float(x) for x in v + 0.001 * rng.standard_normal(DIM)], None))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    return spark.createDataFrame(pdf)


def test_brute_force_topk(vectors):
    out = brute_force_topk(vectors, vectors.filter(F.col("vec_id") < 3), k=1)
    got = {r["query_id"]: r["vec_id"] for r in out.collect()}
    # nearest neighbor of each base vector is its perturbed clone
    assert got == {0: 100, 1: 101, 2: 102}


def test_lsh_topk_recall_on_clones(vectors):
    out = lsh_topk(vectors, vectors.filter(F.col("vec_id") < 3), dim=DIM, k=1, n_planes=6)
    got = {r["query_id"]: r["vec_id"] for r in out.collect()}
    # perturbed clones share every hyperplane side w.h.p. -> found
    assert got.get(0) == 100 and got.get(1) == 101 and got.get(2) == 102


def test_embedding_near_duplicates(vectors):
    pairs = {
        (r["vec_id_l"], r["vec_id_r"]) for r in embedding_near_duplicates(vectors, 0.999).collect()
    }
    assert {(0, 100), (1, 101), (2, 102)} <= pairs
    assert all(l % 100 == r % 100 for l, r in pairs)
