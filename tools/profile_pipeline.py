"""Per-phase wall-clock profile of the ER pipeline (tuning aid for bench_scaling)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F  # noqa: E402

from ala_name_matching_spark.operators.blocking import (  # noqa: E402
    block_table,
    canon_group_map,
    canon_group_representatives,
    salt_and_cap_blocks,
    with_blocking_columns,
    with_record_id,
)
from ala_name_matching_spark.operators.clustering import assign_clusters_contracted  # noqa: E402
from ala_name_matching_spark.operators.pairs import candidate_pairs, match_edges, score_pairs  # noqa: E402
from ala_name_matching_spark.operators.representative import elect_representatives  # noqa: E402
from ala_name_matching_spark.session import get_spark  # noqa: E402
from ala_name_matching_spark.sources.transcripts import synthesize_transcripts  # noqa: E402


def mark(label, t0):
    t = time.time()
    print(f"  {label:30s} {t - t0:8.2f}s", flush=True)
    return t


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("profile", master=f"local[{cores}]", shuffle_partitions=cores)
    t = synthesize_transcripts(spark, n_turns, partitions=cores * 2).cache()
    t.count()
    transcripts = t.drop("entity_id")

    t0 = time.time()
    start = t0
    features = with_blocking_columns(with_record_id(transcripts)).localCheckpoint(eager=True)
    t0 = mark("p1 features", t0)
    group_map = canon_group_map(features).localCheckpoint(eager=True)
    t0 = mark("p2 group_map", t0)
    reps = canon_group_representatives(features).localCheckpoint(eager=True)
    print("  reps:", reps.count())
    t0 = mark("p2 reps", t0)
    blocks = block_table(reps, tiers=(3,))
    salted, stats = salt_and_cap_blocks(blocks)
    salted = salted.localCheckpoint(eager=True)
    t0 = mark("p3 blocks+salt", t0)
    pairs = candidate_pairs(salted)
    print("  pairs:", pairs.count())
    t0 = mark("p4 pairs gen", t0)
    scored = score_pairs(pairs, reps).localCheckpoint(eager=True)
    t0 = mark("p4 scoring", t0)
    edges = match_edges(scored).select("src", "dst").localCheckpoint(eager=True)
    print("  edges:", edges.count())
    t0 = mark("p4 edges", t0)
    clustered = assign_clusters_contracted(features, group_map, edges)
    clustered = elect_representatives(clustered)
    n = clustered.count()
    t0 = mark("p5+p6 cc+elect", t0)
    print(f"TOTAL {time.time() - start:.2f}s rows={n} turns/s={n_turns / (time.time() - start):.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
