"""Meta-blocking CBS+WNP pruning and cluster-level metrics (B-cubed, ARI):
hand-computed truths, degenerate cases, integer-exactness properties."""

import pytest

from ala_name_matching_spark.operators.er_metrics import (
    adjusted_rand,
    bcubed_quality,
)
from ala_name_matching_spark.operators.meta_blocking import (
    cbs_edges,
    meta_blocking_prune,
    weighted_node_prune,
)


def _assign(spark, rows):
    return spark.createDataFrame(rows, "record_id long, block_id string")


# ---------------------------------------------------------------- meta-blocking


def test_cbs_weights_count_shared_blocks(spark):
    df = _assign(
        spark,
        [(1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"), (2, "z"), (3, "z")],
    )
    got = {(r["id_a"], r["id_b"]): r["weight"] for r in cbs_edges(df).collect()}
    assert got == {(1, 2): 3, (1, 3): 1, (2, 3): 1}


def test_cbs_dedupes_repeated_assignments(spark):
    df = _assign(spark, [(1, "x"), (1, "x"), (2, "x")])
    got = {(r["id_a"], r["id_b"]): r["weight"] for r in cbs_edges(df).collect()}
    assert got == {(1, 2): 1}


def test_wnp_drops_edge_weak_at_both_ends(spark):
    # A-B:3, B-C:3, A-C:1 -> means: A=(3+1)/2=2, B=3, C=(3+1)/2=2.
    # A-C fails at A (1<2) and at C (1<2) -> pruned; the strong edges stay.
    df = _assign(
        spark,
        [(1, f"ab{i}") for i in range(3)]
        + [(2, f"ab{i}") for i in range(3)]
        + [(2, f"bc{i}") for i in range(3)]
        + [(3, f"bc{i}") for i in range(3)]
        + [(1, "ac"), (3, "ac")],
    )
    kept = {
        (r["id_a"], r["id_b"]): r["weight"]
        for r in meta_blocking_prune(df).collect()
    }
    assert kept == {(1, 2): 3, (2, 3): 3}


def test_wnp_keeps_edge_strong_at_one_end(spark):
    # A-B:3, A-C:1, C isolated otherwise -> C's mean is 1 so A-C survives
    # via the C endpoint (the union WNP recall-preserving property).
    df = _assign(
        spark,
        [(1, f"ab{i}") for i in range(3)]
        + [(2, f"ab{i}") for i in range(3)]
        + [(1, "ac"), (3, "ac")],
    )
    kept = {(r["id_a"], r["id_b"]) for r in meta_blocking_prune(df).collect()}
    assert kept == {(1, 2), (1, 3)}


def test_wnp_uniform_weights_keep_everything(spark):
    df = _assign(spark, [(i, "blk") for i in range(4)])
    edges = cbs_edges(df)
    assert weighted_node_prune(edges).count() == edges.count() == 6


# ---------------------------------------------------------------- b-cubed


def _labels(spark, rows):
    return spark.createDataFrame(
        rows, "record_id long, pred_cluster string, gold_cluster string"
    )


def test_bcubed_perfect(spark):
    df = _labels(spark, [(1, "a", "x"), (2, "a", "x"), (3, "b", "y")])
    r = bcubed_quality(df).collect()[0]
    assert (r["bcubed_precision"], r["bcubed_recall"], r["bcubed_f1"]) == (
        1.0,
        1.0,
        1.0,
    )


def test_bcubed_overmerge_hurts_precision_only(spark):
    # gold {1,2},{3,4}; pred: one big cluster
    df = _labels(
        spark,
        [(1, "p", "x"), (2, "p", "x"), (3, "p", "y"), (4, "p", "y")],
    )
    r = bcubed_quality(df).collect()[0]
    assert r["bcubed_precision"] == 0.5  # every record: overlap 2 / pred 4
    assert r["bcubed_recall"] == 1.0
    assert r["bcubed_f1"] == pytest.approx(2 / 3, abs=1e-6)


def test_bcubed_oversplit_hurts_recall_only(spark):
    df = _labels(
        spark,
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y"), (4, "d", "y")],
    )
    r = bcubed_quality(df).collect()[0]
    assert r["bcubed_precision"] == 1.0
    assert r["bcubed_recall"] == 0.5


def test_bcubed_weights_records_not_clusters(spark):
    # One 3-record gold cluster predicted perfectly + one singleton split
    # from a pair: recall = (3*1 + 1*0.5 + 0.5) / 5, records equally
    # weighted (the property pairwise F1 lacks).
    df = _labels(
        spark,
        [
            (1, "a", "x"),
            (2, "a", "x"),
            (3, "a", "x"),
            (4, "b", "y"),
            (5, "c", "y"),
        ],
    )
    r = bcubed_quality(df).collect()[0]
    assert r["bcubed_precision"] == 1.0
    assert r["bcubed_recall"] == pytest.approx((3 + 0.5 + 0.5) / 5, abs=1e-6)


# ---------------------------------------------------------------- ARI


def test_ari_perfect_is_one(spark):
    df = _labels(spark, [(1, "a", "x"), (2, "a", "x"), (3, "b", "y")])
    assert adjusted_rand(df).collect()[0]["ari"] == 1.0


def test_ari_trivial_agreement_denominator_zero(spark):
    # all singletons on both sides: max_index == expected == 0 -> 1.0
    df = _labels(spark, [(i, f"p{i}", f"g{i}") for i in range(4)])
    r = adjusted_rand(df).collect()[0]
    assert r["ari"] == 1.0 and r["sum_cells_c2"] == 0


def test_ari_hand_computed(spark):
    # classic 6-point example: gold = {1,2,3},{4,5,6};
    # pred = {1,2},{3,4,5},{6}
    df = _labels(
        spark,
        [
            (1, "a", "x"),
            (2, "a", "x"),
            (3, "b", "x"),
            (4, "b", "y"),
            (5, "b", "y"),
            (6, "c", "y"),
        ],
    )
    r = adjusted_rand(df).collect()[0]
    # cells: (a,x)=2,(b,x)=1,(b,y)=2,(c,y)=1 -> sum_cells_c2 = 1+0+1+0 = 2
    # pred marginals 2,3,1 -> 1+3+0 = 4 ; gold marginals 3,3 -> 3+3 = 6
    # total_c2 = 15; expected = 4*6/15 = 1.6; max = 5
    want = (2 - 1.6) / (5 - 1.6)
    assert r["sum_cells_c2"] == 2
    assert r["sum_pred_c2"] == 4 and r["sum_gold_c2"] == 6
    assert r["ari"] == pytest.approx(round(want, 6), abs=1e-9)


def test_ari_random_vs_structure_is_near_zero(spark):
    # pred assigns by parity, gold by halves, n=8: a fully crossed table
    # -> ARI exactly at its independence point
    df = _labels(
        spark,
        [(i, f"p{i % 2}", f"g{i // 4}") for i in range(8)],
    )
    r = adjusted_rand(df).collect()[0]
    # cells all = 2 -> sum_cells_c2 = 4; marginals all 4 -> 6+6=12 each side
    # expected = 12*12/28 ; max = 12 -> ari = (4 - 36/7)/(12 - 36/7) < 0
    want = (4 - 144 / 28) / (12 - 144 / 28)
    assert r["ari"] == pytest.approx(round(want, 6), abs=1e-9)


# ---------------------------------------------------------------- cohesion


def _cohesion_frames(spark, label_rows, edge_rows):
    from ala_name_matching_spark.operators.er_metrics import cluster_cohesion

    labels = spark.createDataFrame(label_rows, "record_id long, cluster_id string")
    edges = spark.createDataFrame(edge_rows, "id_a long, id_b long")
    return cluster_cohesion(labels, edges)


def test_cohesion_chain_vs_clique(spark):
    labels = [(i, "chain") for i in range(4)] + [(i, "clique") for i in range(10, 14)]
    edges = [(0, 1), (1, 2), (2, 3)] + [
        (a, b) for a in range(10, 14) for b in range(10, 14) if a < b
    ]
    out = {r["cluster_id"]: r for r in _cohesion_frames(spark, labels, edges).collect()}
    assert out["chain"]["n_internal_edges"] == 3
    assert out["chain"]["density"] == 0.5
    assert out["chain"]["low_cohesion"] is False  # strict <
    assert out["clique"]["density"] == 1.0 and out["clique"]["low_cohesion"] is False


def test_cohesion_reversed_duplicate_edges_count_once(spark):
    labels = [(1, "c"), (2, "c"), (3, "c")]
    edges = [(1, 2), (2, 1), (1, 2)]
    r = _cohesion_frames(spark, labels, edges).collect()[0]
    assert r["n_internal_edges"] == 1
    assert r["density"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["low_cohesion"] is True


def test_cohesion_external_edges_ignored_singletons_excluded(spark):
    labels = [(1, "a"), (2, "a"), (3, "b")]
    edges = [(1, 3), (2, 3)]  # all cross-cluster
    rows = {r["cluster_id"]: r for r in _cohesion_frames(spark, labels, edges).collect()}
    assert set(rows) == {"a"}  # singleton 'b' excluded
    assert rows["a"]["n_internal_edges"] == 0 and rows["a"]["density"] == 0.0


# ---------------------------------------------------------------- repair


def _repair(spark, label_rows, edge_rows, strict=0.8):
    from ala_name_matching_spark.operators.clustering import repair_low_cohesion

    labels = spark.createDataFrame(label_rows, "record_id long, cluster_id string")
    edges = spark.createDataFrame(edge_rows, "id_a long, id_b long, score double")
    return {
        r["record_id"]: (r["cluster_id"], r["repaired"])
        for r in repair_low_cohesion(labels, edges, strict_threshold=strict).collect()
    }


def test_repair_splits_chain_keeps_strict_pair(spark):
    # chain 1-2-3-4 (density 0.5 -> not flagged at min_density 0.5? No:
    # 3 edges / 6 pairs = 0.5, strict < keeps it). Use a 5-chain: 4/10 = 0.4
    labels = [(i, "c") for i in range(1, 6)]
    edges = [(1, 2, 0.9), (2, 3, 0.55), (3, 4, 0.55), (4, 5, 0.55)]
    out = _repair(spark, labels, edges)
    assert out[1] == ("r|1", True) and out[2] == ("r|1", True)
    assert out[3] == ("r|3", True) and out[4] == ("r|4", True) and out[5] == ("r|5", True)


def test_repair_leaves_dense_clusters_alone(spark):
    labels = [(1, "k"), (2, "k"), (3, "k")]
    edges = [(1, 2, 0.55), (2, 3, 0.55), (1, 3, 0.55)]  # density 1.0
    out = _repair(spark, labels, edges)
    assert out == {1: ("k", False), 2: ("k", False), 3: ("k", False)}


def test_repair_cross_cluster_strict_edges_never_merge(spark):
    # two flagged chains; a strict edge BETWEEN them must not rejoin them
    labels = [(i, "a") for i in range(1, 6)] + [(i, "b") for i in range(11, 16)]
    edges = (
        [(i, i + 1, 0.55) for i in range(1, 5)]
        + [(i, i + 1, 0.55) for i in range(11, 15)]
        + [(5, 11, 0.95)]  # cross-cluster, must be ignored
    )
    out = _repair(spark, labels, edges)
    assert all(v[1] for v in out.values())  # both clusters repaired
    assert out[5] == ("r|5", True) and out[11] == ("r|11", True)


def test_repair_labels_never_collide_with_originals(spark):
    labels = [(1, "1"), (2, "1"), (3, "1")]  # original label "1" = a record id
    edges = [(1, 2, 0.9)]  # density 1/3 -> flagged
    out = _repair(spark, labels, edges)
    assert out[1] == ("r|1", True) and out[2] == ("r|1", True)
    assert out[3] == ("r|3", True)
