"""Unit tests for the normalization layer (SURVEY.md §2.2 F1-F3/F7/F12).

Golden semantics from CleanedScientificName.java:42-218 and
ALANameSearcher.concatName (:2074-2088); Spark expressions checked against
the pure-python ports on the same inputs.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ala_name_matching_spark.functions.normalize import (
    basic_py,
    canon_key_col,
    canon_text_col,
    concat_name_col,
    norm_text_col,
    normalised_py,
    soundex_normalize_col,
)

CASES = [
    "Hemigenia  brachyphylla",
    "naïve — “quoted” text",
    "curly ’quote‘ and–dash",
    "x y z",
    "Re: The deploy restarted",
    "",
    "  spaced   out  ",
]


def test_normalised_py_goldens():
    # punctuation table entries (CleanedScientificName.java:42-68)
    assert normalised_py("a–b") == "a-b"  # en-dash
    assert normalised_py("a b") == "a b"  # nbsp
    assert normalised_py("‘q’") == "'q'"  # curly single quotes
    assert normalised_py("a‭b") == "ab"  # directional override deleted
    assert normalised_py("a  \t b") == "a b"  # F1 space collapse
    assert normalised_py(None) is None


def test_basic_py_goldens():
    # spell-out table entries (CleanedScientificName.java:71-161)
    assert basic_py("café") == "cafe"  # NFD accent strip
    assert basic_py("straße") == "strasse"  # sharp s
    assert basic_py("α test") == "alpha test"  # greek spelled out
    assert basic_py("A×B") == "A x B"  # multiplication sign
    assert basic_py("naïve") == "naive"


def test_spark_exprs_match_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": CASES}))
    out = df.select(
        "text",
        norm_text_col(F.col("text")).alias("norm"),
        concat_name_col(F.col("text")).alias("concat"),
        soundex_normalize_col(F.col("text")).alias("sx"),
        canon_text_col(F.col("text")).alias("canon"),
    ).collect()
    for row in out:
        # norm_text expression == python normalised (ASCII-ish inputs; the
        # UDF additionally applies NFKC which is identity on these cases)
        assert row["norm"] == normalised_py(row["text"]), row["text"]
        assert row["concat"] == "".join(c for c in row["text"] if c.isascii() and c.isalpha()).lower()


def test_canon_strips_markers(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "Re: the deploy restarted",
                    "FWD: the deploy restarted",
                    "the deploy restarted",
                    "the deploy restarted [sic]",
                ],
                "rid": ["a", "b", "c", "d"],
            }
        )
    )
    vals = {
        r["canon"]
        for r in df.select(canon_text_col(F.col("text")).alias("canon")).collect()
    }
    assert vals == {"the deploy restarted"}


def test_placeholder_salting(spark):
    # ALANameAnalyser.java:281-294 analog: empty-ish text never blocks together
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["?", "", "  ", "...", "real text"], "rid": list("abcde")})
    )
    out = df.select(
        canon_key_col(F.col("text"), F.col("rid")).alias("key")
    ).collect()
    keys = [r["key"] for r in out]
    assert keys[:4] == ["__ph__a", "__ph__b", "__ph__c", "__ph__d"]
    assert keys[4] == "real text"
    assert len(set(keys)) == 5


@pytest.mark.parametrize(
    "a,b",
    [
        ("The Deploy", "the deploy"),
        ("curly ’quote’", "curly 'quote'"),
        ("a–b", "a-b"),
    ],
)
def test_norm_equivalences(spark, a, b):
    df = spark.createDataFrame(pd.DataFrame({"x": [a], "y": [b]}))
    row = df.select(
        F.lower(norm_text_col(F.col("x"))).alias("nx"),
        F.lower(norm_text_col(F.col("y"))).alias("ny"),
    ).collect()[0]
    assert row["nx"] == row["ny"]


def test_f11_builder_passes(spark):
    """F11 completion (round-2): bracketed annotations removed wholesale and
    the author conjunction folded (ALANameAnalyser.normalise, :652-665) --
    'A and B' / 'A & B' now share one canonical form."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ala_name_matching_spark.functions.normalize import canon_text_col

    rows = [
        ("smith and jones reviewed it",),
        ("Smith & Jones reviewed it",),
        ("smith jones reviewed it",),
        ("deploy done [flagged by bot] today",),
        ("deploy done {auto} today",),
        ("deploy done today",),
        ("andover sandy land",),  # 'and' inside words untouched
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["text"]))
    out = [r[0] for r in df.select(canon_text_col(F.col("text"))).collect()]
    assert out[0] == out[1] == out[2] == "smith jones reviewed it"
    assert out[3] == out[4] == out[5] == "deploy done today"
    assert out[6] == "andover sandy land"


def test_canon_html_unescape_pass(spark):
    """F11 entity pass: encoded and decoded forms share one canon form;
    double-encoded &amp;lt; resolves in the same single sweep as the
    reference's one unescapeHtml4 call."""
    from pyspark.sql import functions as F

    from ala_name_matching_spark.functions.normalize import canon_text_col

    df = spark.createDataFrame(
        [
            (1, "Tom &amp; Jerry"),
            (2, "Tom & Jerry"),
            (3, "a &lt;b&gt; c"),
            (4, 'say &quot;hi&quot; &apos;now&apos;'),
            (5, "x&nbsp;y"),
            (6, "&amp;lt;tag&amp;gt;"),
        ],
        "id bigint, text string",
    )
    got = {r["id"]: r["c"] for r in df.select("id", canon_text_col(F.col("text")).alias("c")).collect()}
    assert got[1] == got[2] == "tom jerry"
    assert got[3] == "a b c"
    assert got[4] == "say hi now"
    assert got[5] == "x y"
    assert got[6] == "lt tag gt"  # naive single sweep, documented
