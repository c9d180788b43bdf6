"""Blocklist filtering: word-boundary semantics, multi-word anchoring,
zero-hit coverage, short-doc guard."""

from ala_name_matching_spark.operators.text_analysis import blocklist_hits


def _run(spark, rows, phrases):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.id: (r.n_hits, r.flagged)
        for r in blocklist_hits(df, phrases).collect()
    }


def test_word_boundary_no_substring_false_positive(spark):
    got = _run(
        spark,
        [
            (1, "the classic assassin lurks"),   # 'ass' inside words only
            (2, "kick ass move"),                # the word itself
        ],
        ["ass"],
    )
    assert got[1] == (0, False)
    assert got[2] == (1, True)


def test_multiword_phrase_anchors_exactly(spark):
    got = _run(
        spark,
        [
            (1, "we use a hash join here"),
            (2, "hash first then join later"),   # words present, phrase absent
            (3, "hash join hash join"),          # two occurrences
        ],
        ["hash join"],
    )
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (2, True)


def test_zero_hit_docs_covered_and_short_docs_safe(spark):
    got = _run(
        spark,
        [(1, "clean text"), (2, "x")],           # doc 2 shorter than phrase
        ["some long banned phrase"],
    )
    assert got == {1: (0, False), 2: (0, False)}


def test_empty_blocklist_covers_all_rows(spark):
    got = _run(spark, [(1, "anything"), (2, "at all")], [])
    assert got == {1: (0, False), 2: (0, False)}
    got = _run(spark, [(1, "anything")], ["  "])  # normalizes to empty
    assert got == {1: (0, False)}


def test_case_and_whitespace_normalized(spark):
    got = _run(spark, [(1, "  Hash   JOIN  now")], ["hash join"])
    assert got[1] == (1, True)
