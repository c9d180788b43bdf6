"""End-to-end corpus-cleaning pipeline: plans/clean_pipeline.py.

The fixture plants one victim per stage: a Gopher-flagged junk doc, a
zero-entropy doc, an exact duplicate, a near-duplicate (worse quality
than its twin), and a cross-doc duplicated span -- each must fall at its
own stage and the stats table must account for every drop. Also covers
checkpointed resume (phases skip on the second run).
"""

import pytest

from ala_name_matching_spark.plans.clean_pipeline import run_clean_pipeline

# english-ish docs that PASS the Gopher gates (stopwords present,
# alpha words, sane lengths)
GOOD_A = (
    "the quick brown fox jumps over the lazy dog and then runs to the river "
    "bank where it rests for a while under the old willow tree with friends"
)
GOOD_B = (
    "a completely different story about ships and harbors where the sailors "
    "unload crates of fruit and the market opens early in the morning light"
)
SHARED_TAIL = "this exact footer sentence is appended to both documents here"


@pytest.fixture(scope="module")
def fixture_docs(spark):
    rows = [
        (0, GOOD_A),
        (1, GOOD_A),  # exact dup of 0 -> dropped at c2
        (2, GOOD_A.replace("river", "stream")),  # near dup of 0 -> c3 election
        (3, GOOD_B + " " + SHARED_TAIL),
        (4, "the unrelated report discusses annual budgets and the numbers "
            "were reviewed by the committee before the final meeting today "
            + SHARED_TAIL),  # shares the footer span with 3 -> c4 strips it
        (5, "zzzz " * 30),  # zero-ish entropy + no stopwords -> c1
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_stagewise_drops_and_stats(spark, fixture_docs):
    out = run_clean_pipeline(fixture_docs, jaccard_threshold=0.5)
    clean = {r["doc_id"]: r for r in out["clean"].collect()}
    stats = {r["stage"]: (r["docs_in"], r["docs_out"]) for r in out["stats"].collect()}

    assert stats["c1_quality"] == (6, 5)  # junk doc 5 gone
    assert stats["c2_exact"] == (5, 4)  # exact dup gone (one of 0/1)
    assert stats["c3_neardup"] == (4, 3)  # near-dup cluster elects one of 0/2
    assert stats["c4_strip"][1] == 3  # strip rewrites, never drops docs

    # exact dup: lowest id kept
    assert 0 in clean and 1 not in clean
    # near-dup election kept exactly one of {0, 2}
    assert (0 in clean) ^ (2 in clean) or (0 in clean and 2 not in clean)
    # the shared footer span is excised from BOTH survivors that carried it
    assert 3 in clean and 4 in clean
    for d in (3, 4):
        assert SHARED_TAIL not in clean[d]["clean_text"]
        assert clean[d]["n_removed"] > 0
    # junk doc never resurfaces
    assert 5 not in clean


def test_resume_skips_committed_phases(spark, fixture_docs, tmp_path):
    from ala_name_matching_spark.sources.checkpoints import CheckpointManager

    root = str(tmp_path / "clean_ck")
    ck1 = CheckpointManager(spark, root, enabled=True)
    first = run_clean_pipeline(fixture_docs, checkpoints=ck1)
    n_first = first["clean"].count()

    # second run resumes: phases exist, outputs identical
    ck2 = CheckpointManager(spark, root, enabled=True)
    assert ck2.exists("c1_quality") and ck2.exists("c4_strip")
    second = run_clean_pipeline(fixture_docs, checkpoints=ck2)
    a = sorted(map(tuple, first["clean"].collect()))
    b = sorted(map(tuple, second["clean"].collect()))
    assert a == b and n_first == len(a)
