"""Tests for search-mode tier ladder (J11) and streaming incremental match."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ).assign(ts=pd.Timestamp("2026-01-01")),
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


@pytest.fixture(scope="module")
def index(spark):
    return _df(
        spark,
        [
            ("i", 0, "user", "The deploy restarted the cluster", None, None),
            ("i", 1, "user", "Customer invoice was reconciled fully", None, None),
            ("i", 2, "user", "the pipeline migrated the usage dashboard", None, None),
            ("i", 3, "tool", "The deploy restarted the cluster", None, None),
        ],
    )


def test_ladder_tiers(spark, index):
    from ala_name_matching_spark.operators.ladder import search_ladder

    queries = _df(
        spark,
        [
            # exact (case-only difference)
            ("q", 0, "user", "the deploy restarted the cluster", None, None),
            # canonical (marker prefix stripped)
            ("q", 1, "user", "Re: Customer invoice was reconciled fully", None, None),
            # phonetic (vowel-class + doubled-letter misspellings)
            ("q", 2, "user", "the pipelinne migrated the usage dashbaord", None, None),
            # no match
            ("q", 3, "user", "totally unrelated text about gardening tips", None, None),
        ],
    )
    out = {r["query_id"]: r for r in search_ladder(queries, index).collect()}
    assert out["q#0"]["match_type"] == "EXACT" and out["q#0"]["index_id"] == "i#0"
    assert out["q#1"]["match_type"] == "CANONICAL" and out["q#1"]["index_id"] == "i#1"
    assert out["q#2"]["match_type"] == "PHONETIC" and out["q#2"]["index_id"] == "i#2"
    assert out["q#3"]["match_type"] == "NO_MATCH" and out["q#3"]["index_id"] is None


def test_ladder_homonym_gate(spark, index):
    # identical text but conflicting role -> must not match the 'user' row;
    # resolves to the role-compatible homonym (i#3) instead (V5 analog)
    from ala_name_matching_spark.operators.ladder import search_ladder

    queries = _df(
        spark, [("q", 0, "tool", "the deploy restarted the cluster", None, None)]
    )
    out = search_ladder(queries, index).collect()[0]
    assert out["index_id"] == "i#3"


def test_streaming_incremental_match(spark, index, tmp_path):
    from ala_name_matching_spark.streaming.incremental import (
        incremental_match,
        read_transcript_stream,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = _df(
        spark,
        [
            ("s", 0, "user", "THE DEPLOY RESTARTED THE CLUSTER", None, None),
            ("s", 1, "user", "nothing like anything indexed here", None, None),
        ],
    )
    batch.write.parquet(src)
    stream = read_transcript_stream(spark, src)
    q = incremental_match(stream, index, out, ckpt)
    q.awaitTermination(120)
    res = {r["query_id"]: r["match_type"] for r in spark.read.parquet(out).collect()}
    assert res == {"s#0": "EXACT", "s#1": "NO_MATCH"}


def test_streaming_windowed_counts(spark, tmp_path):
    from ala_name_matching_spark.streaming.incremental import (
        read_transcript_stream,
        windowed_turn_counts,
    )

    src = str(tmp_path / "in2")
    rows = [("c", i, "user" if i % 2 else "assistant", f"text {i}", None, None) for i in range(8)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["ts"] = pd.Timestamp("2026-01-01") + pd.to_timedelta(pdf["turn_idx"] * 60, unit="s")
    spark.createDataFrame(
        pdf,
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).write.parquet(src)
    agg = windowed_turn_counts(read_transcript_stream(spark, src), "5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wcounts")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    got = spark.sql("SELECT sum(n_turns) AS n FROM wcounts").collect()[0]["n"]
    q.stop()
    assert got == 8


def test_ladder_error_codes(spark, index):
    """Round-2 verdict item 10: error codes threaded through the ladder
    (performErrorCheckSearch analog, ALANameSearcher.java:660-682)."""
    from pyspark.sql import functions as F

    from ala_name_matching_spark.operators.ladder import search_ladder

    queries = _df(
        spark,
        [
            # clean exact match -> empty codes (ErrorType.NONE)
            ("q", 0, "user", "the deploy restarted the cluster", None, None),
            # unresolvable homonym: identical text, role with NO compatible
            # index row -> NO_MATCH + HOMONYM
            ("q", 1, "assistant", "The deploy restarted the cluster", None, None),
            # plain miss -> NO_MATCH only
            ("q", 2, "user", "totally unrelated text about gardening tips", None, None),
            # marker codes from the raw text ride along
            ("q", 3, "user", "Re: Customer invoice was reconciled fully", None, None),
        ],
    )
    out = {r["query_id"]: r for r in search_ladder(queries, index).collect()}
    assert out["q#0"]["error_codes"] == []
    assert set(out["q#1"]["error_codes"]) == {"HOMONYM", "NO_MATCH"}
    assert out["q#2"]["error_codes"] == ["NO_MATCH"]
    assert out["q#3"]["match_type"] == "CANONICAL"
    assert "FORWARDED" in out["q#3"]["error_codes"]

    # excluded-name handling when the index carries is_excluded (V1/A4):
    # best-match excluded -> EXCLUDED; non-excluded sibling wins when both
    # qualify -> ASSOCIATED_EXCLUDED on the kept match
    idx2 = index.withColumn(
        "is_excluded", F.col("turn_idx") == 0  # i#0 excluded, i#3 not
    )
    q2 = _df(
        spark,
        [
            # matches BOTH i#0 (user, excluded) per role and text; i#3 is
            # 'tool' role -> conflicts. Only i#0 qualifies -> EXCLUDED.
            ("q", 0, "user", "the deploy restarted the cluster", None, None),
        ],
    )
    out2 = search_ladder(q2, idx2).collect()[0]
    assert out2["index_id"] == "i#0"
    assert "EXCLUDED" in out2["error_codes"]

    # role-null query qualifies against both the excluded i#0 and the
    # non-excluded i#3 -> non-excluded preferred, ASSOCIATED_EXCLUDED code
    q3 = _df(spark, [("q", 0, None, "the deploy restarted the cluster", None, None)])
    out3 = search_ladder(q3, idx2).collect()[0]
    assert out3["index_id"] == "i#3"
    assert "ASSOCIATED_EXCLUDED" in out3["error_codes"]


def test_stateful_conversation_sessions(spark, tmp_path):
    """applyInPandasWithState gap-sessionization: in-batch gaps close
    sessions immediately; the trailing open session stays in state."""
    import pandas as pd

    from ala_name_matching_spark.streaming.incremental import (
        read_transcript_stream,
        stateful_conversation_sessions,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    # conv A: two sessions split by a 2h gap; conv B: one open session
    for i in range(3):
        rows.append(("A", i, "user", f"t{i}", None, base + pd.Timedelta(minutes=i)))
    for i in range(3, 5):
        rows.append(("A", i, "user", f"t{i}", None, base + pd.Timedelta(hours=2, minutes=i)))
    rows.append(("B", 0, "user", "hi", None, base))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    spark.createDataFrame(
        pdf,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    ).coalesce(1).write.parquet(src)

    stream = read_transcript_stream(spark, src)
    q = (
        stateful_conversation_sessions(stream, gap_seconds=1800)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["conv_id"]: r for r in spark.read.parquet(out).collect()}
    # conv A's FIRST session closes on the in-batch gap; conv B's lone
    # session closes via the EVENT-TIME TIMEOUT (watermark = max event time
    # - 10 min = 01:54 passes B's last_ts + 30 min = 00:30). A's second
    # session (last 02:04, timeout 02:34 > watermark) stays open in state.
    assert set(got) == {"A", "B"}
    assert got["A"]["n_turns"] == 3
    assert got["A"]["session_start"] == base.to_pydatetime()
    assert got["B"]["n_turns"] == 1


def test_streaming_exact_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark-based exact dedup: only the first
    arrival of each normalized text survives; distinct texts all pass."""
    import pandas as pd

    from ala_name_matching_spark.streaming.incremental import (
        read_transcript_stream,
        streaming_exact_dedup,
    )

    src = str(tmp_path / "in_dedup")
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = [
        ("A", 0, "user", "The deploy restarted the cluster", None, base),
        # same text modulo case/space normalization -> duplicate
        ("B", 0, "user", "the  deploy restarted the cluster", None, base + pd.Timedelta(minutes=1)),
        ("C", 0, "user", "a genuinely different message", None, base + pd.Timedelta(minutes=2)),
        # byte-identical repeat much later but inside the horizon -> duplicate
        ("D", 0, "user", "The deploy restarted the cluster", None, base + pd.Timedelta(minutes=30)),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    spark.createDataFrame(
        pdf,
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).write.parquet(src)
    dd = streaming_exact_dedup(read_transcript_stream(spark, src))
    q = dd.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    q.processAllAvailable()
    out = spark.sql("SELECT conv_id, text_hash FROM dedup_out").collect()
    q.stop()
    # exactly one survivor per distinct normalized text; within a single
    # micro-batch the survivor among equal hashes is arbitrary (processing
    # order), so assert the contract, not a specific conv_id
    assert len(out) == 2
    assert len({r["text_hash"] for r in out}) == 2
    survivors = {r["conv_id"] for r in out}
    assert "C" in survivors and survivors & {"A", "B"} and "D" not in survivors


def test_streaming_neardup_match(spark, tmp_path):
    """Micro-batched docs are near-dup-matched against a static corpus via
    the SAME minhash_band_table the batch lane uses: the near-copy pairs
    with its corpus twin above the Jaccard bar, the novel doc matches
    nothing."""
    import pandas as pd

    from ala_name_matching_spark.streaming.incremental import streaming_neardup_match

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [100, 101],
                "text": [base, "an entirely unrelated corpus document about invoices due"],
            }
        )
    )
    src = str(tmp_path / "in_nd")
    spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    base.replace("river", "stream"),  # near-dup of corpus 100
                    "completely novel text mentioning spark shuffle partitions today ok",
                ],
            }
        )
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_path = str(tmp_path / "out_nd")
    q = streaming_neardup_match(
        stream, corpus, out_path, str(tmp_path / "ckpt_nd"), threshold=0.5
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id_l"], r["doc_id_r"]): r["jaccard"]
        for r in spark.read.parquet(out_path).collect()
    }
    assert set(got) == {(1, 100)}
    assert got[(1, 100)] >= 0.5


def test_streaming_index_update_bm25_parity(spark, tmp_path):
    """Appending streamed docs to the persisted retrieval index must leave
    bm25_topk_from_index EXACTLY equal to bm25_topk over the union corpus
    (the derived-stats argument), and a term unique to a streamed doc must
    retrieve it."""
    import pandas as pd

    from ala_name_matching_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_from_index,
        build_index,
    )
    from ala_name_matching_spark.streaming.incremental import streaming_index_update

    base_docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["alpha beta gamma", "beta gamma delta"],
            }
        )
    )
    idx = str(tmp_path / "bm25_index")
    build_index(base_docs, idx)

    new_rows = pd.DataFrame(
        {"doc_id": [2, 3], "text": ["zeta eta theta", "alpha zeta beta"]}
    )
    src = str(tmp_path / "in_idx")
    spark.createDataFrame(new_rows).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_index_update(stream, idx, str(tmp_path / "ckpt_idx"))
    q.awaitTermination(120)

    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [10, 11], "qtext": ["zeta", "beta gamma"]})
    )
    from_index = bm25_topk_from_index(spark, idx, queries, k=4).collect()
    # "zeta" exists only in streamed docs -> they must surface
    zeta_docs = {r["doc_id"] for r in from_index if r["query_id"] == 10}
    assert zeta_docs == {2, 3}
    # exact score parity with the one-shot batch engine on the union corpus
    union = base_docs.unionByName(spark.createDataFrame(new_rows))
    direct = bm25_topk(union, queries, k=4).collect()
    key = lambda r: (r["query_id"], r["doc_id"], r["score"], r["rank"])
    assert sorted(map(key, from_index)) == sorted(map(key, direct))


def test_streamed_index_compaction_preserves_scores(spark, tmp_path):
    """Close the segment-merge loop: micro-batch appends accrete small
    postings files; compact_table bin-packs them and BM25 scores are
    byte-identical before/after (compaction is pure layout)."""
    import glob

    import pandas as pd

    from ala_name_matching_spark.operators.retrieval import (
        bm25_topk_from_index,
        build_index,
    )
    from ala_name_matching_spark.sources.readers import compact_table
    from ala_name_matching_spark.streaming.incremental import streaming_index_update

    idx = str(tmp_path / "cidx")
    build_index(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "text": ["alpha beta gamma"]})
        ),
        idx,
    )
    src = str(tmp_path / "cin")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["beta delta x", "alpha y z", "delta q r"]})
    ).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # 3 micro-batches -> many small files
        .parquet(src)
    )
    streaming_index_update(stream, idx, str(tmp_path / "cckpt")).awaitTermination(120)

    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [1, 2], "qtext": ["delta", "alpha beta"]})
    )
    key = lambda r: (r["query_id"], r["doc_id"], r["score"], r["rank"])
    before = sorted(map(key, bm25_topk_from_index(spark, idx, queries).collect()))
    n_before = len(glob.glob(f"{idx}/postings/**/*.parquet", recursive=True))
    stats = compact_table(
        spark, f"{idx}/postings", collapse_partitions={"epoch": -1}
    )
    n_after = len(glob.glob(f"{idx}/postings/**/*.parquet", recursive=True))
    after = sorted(map(key, bm25_topk_from_index(spark, idx, queries).collect()))
    assert after == before
    assert n_after < n_before, (n_before, n_after, stats)


def test_streaming_semdedup_match(spark, tmp_path):
    """Arriving vectors match persisted corpus near-dups WITHIN their
    k-means cluster: a colinear copy of a corpus vector matches it; an
    orthogonal novel vector matches nothing."""
    import numpy as np
    import pandas as pd

    from ala_name_matching_spark.streaming.incremental import streaming_semdedup_match

    rng = np.random.RandomState(21)
    base = rng.standard_normal((30, 16))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(30)],
        "vec_id bigint, embedding array<double>",
    )
    src = str(tmp_path / "sd_in")
    stream_rows = [
        (100, [float(x) for x in base[7] * 3.0]),  # colinear with corpus 7
        (101, [float(x) for x in rng.standard_normal(16)]),  # novel
    ]
    spark.createDataFrame(
        stream_rows, "vec_id bigint, embedding array<double>"
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "sd_out")
    q = streaming_semdedup_match(
        stream, corpus, out, str(tmp_path / "sd_ckpt"), n_clusters=4, threshold=0.95
    )
    q.awaitTermination(120)
    got = {
        (r["vec_id"], r["corpus_vec_id"]): r["cosine"]
        for r in spark.read.parquet(out).collect()
    }
    assert (100, 7) in got and got[(100, 7)] >= 0.999999
    assert not any(v == 101 for v, _ in got)


def test_streaming_index_replay_is_idempotent(spark, tmp_path):
    """ADVICE r02 (medium): foreachBatch is at-least-once -- a replayed
    micro-batch must not double-append postings (which would double-count
    tf/df/N and corrupt every BM25 score). Simulate a full replay by
    re-running the SAME source through streaming_index_update with a FRESH
    checkpoint: identical files, identical epoch ids. The epoch-partitioned
    dynamic-overwrite sink must leave the index byte-equal, scores exact."""
    import pandas as pd

    from ala_name_matching_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_from_index,
        build_index,
    )
    from ala_name_matching_spark.streaming.incremental import streaming_index_update

    base_docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["alpha beta gamma"]})
    )
    idx = str(tmp_path / "ridx")
    build_index(base_docs, idx)
    new_rows = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["beta delta delta", "alpha epsilon"]}
    )
    src = str(tmp_path / "rin")
    spark.createDataFrame(new_rows).repartition(2).write.parquet(src)

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        streaming_index_update(stream, idx, str(tmp_path / ckpt)).awaitTermination(120)

    run("rckpt1")
    posts_once = sorted(
        map(tuple, spark.read.parquet(f"{idx}/postings").collect())
    )
    run("rckpt2")  # fresh checkpoint = every batch replays with same epochs
    posts_twice = sorted(
        map(tuple, spark.read.parquet(f"{idx}/postings").collect())
    )
    assert posts_twice == posts_once  # no duplicate postings rows

    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [1, 2], "qtext": ["delta", "alpha"]})
    )
    union = base_docs.unionByName(spark.createDataFrame(new_rows))
    key = lambda r: (r["query_id"], r["doc_id"], r["score"], r["rank"])
    assert sorted(map(key, bm25_topk_from_index(spark, idx, queries).collect())) == \
        sorted(map(key, bm25_topk(union, queries).collect()))


def test_streaming_drift_monitor_parity_and_shift(spark, tmp_path):
    """Per-batch drift rows under pinned reference bins: a batch drawn
    from the reference distribution scores ~0 PSI; a shifted batch scores
    high. Batch values outside the reference range clamp to edge bins."""
    import pandas as pd

    from ala_name_matching_spark.streaming.incremental import (
        streaming_drift_monitor,
    )

    ref = spark.createDataFrame(
        pd.DataFrame({"val": list(range(0, 100))})
    )
    src = str(tmp_path / "in_drift")
    # batch: same uniform spread, plus one value beyond the range (120)
    spark.createDataFrame(
        pd.DataFrame({"val": list(range(0, 100, 2)) + [120]})
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_path = str(tmp_path / "out_drift")
    q = streaming_drift_monitor(
        stream, ref, "val", out_path, str(tmp_path / "ckpt_drift"), n_bins=10
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out_path).collect()
    assert len(rows) == 10
    by_bin = {r["bin"]: r for r in rows}
    assert sum(r["n_ref"] for r in rows) == 100
    # 51 batch values: 50 uniform + the clamped 120 -> edge bin 9
    assert sum(r["n_cur"] for r in rows) == 51
    assert by_bin[9]["n_cur"] == 6  # 5 uniform + 1 clamped
    psi = sum(r["psi_term"] for r in rows)
    assert abs(psi) < 0.05  # near-identical distribution
    assert "epoch" in spark.read.parquet(out_path).columns


def test_stream_setup_failure_cleans_scratch_dirs(spark, tmp_path):
    """ADVICE r04: a failure during the streaming WIRING phase (staging
    write, index build, .start()) must remove the already-created /tmp
    scratch dirs -- previously only the await/read-back phase was covered
    by _finish_stream's finally, so a wiring error leaked the dirs."""
    import glob
    import os
    import tempfile

    import __spark_entry__ as entry

    # _stream_wired: dirs are removed when the wiring thunk raises
    d = str(tmp_path / "scratch")
    os.makedirs(d)

    def boom():
        raise RuntimeError("wiring failed")

    with pytest.raises(RuntimeError, match="wiring failed"):
        entry._stream_wired(boom, d)
    assert not os.path.exists(d)

    # _stream_stage: its own mkdtemp is removed when staging fails
    # (raise_error fires during the staging parquet write)
    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "stream_fail_*")))
    bad = spark.range(1).select(
        F.raise_error(F.lit("staging boom")).cast("string").alias("x")
    )
    with pytest.raises(Exception):
        entry._stream_stage(bad, spark, "stream_fail_")
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "stream_fail_*")))
    assert after == before
