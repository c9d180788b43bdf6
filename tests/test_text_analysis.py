"""Tests for text-analysis operators (lang-ID, quality, tokens, fingerprint)."""

import pandas as pd
from pyspark.sql import functions as F

from ala_name_matching_spark.operators.text_analysis import (
    bpe_token_count_col,
    fingerprint_col,
    language_id_col,
    quality_score_col,
    whitespace_token_count_col,
)


def test_language_id(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "the cat sat on the mat and it was happy with the sun",
                    "le chat est dans la maison et il est content pour toujours",
                    "der hund ist ein gutes tier und die katze auch mit ihm",
                    "el perro es un animal bueno y la casa es grande para todos",
                    "zzz qqq xxx www",  # no stopwords -> und
                ]
            }
        )
    )
    out = [r["lang"] for r in df.select(language_id_col(F.col("text")).alias("lang")).collect()]
    assert out == ["en", "fr", "de", "es", "und"]


def test_token_counts(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["Hello, world! 42 times."]}))
    row = df.select(
        whitespace_token_count_col(F.col("text")).alias("ws"),
        bpe_token_count_col(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert row["ws"] == 4
    # Hello , world ! 42 times . -> 7 BPE-ish pretokens
    assert row["bpe"] == 7


def test_quality_and_fingerprint(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "the quick brown fox jumps over the lazy dog with great skill",
                    "!!!! #### $$$$ %%%%",
                    "b a c",
                    "a b c",
                ]
            }
        )
    )
    rows = df.select(
        quality_score_col(F.col("text")).alias("q"),
        fingerprint_col(F.col("text")).alias("fp"),
    ).collect()
    assert rows[0]["q"] > 0.8  # clean english sentence
    assert rows[1]["q"] < 0.5  # symbol soup
    # fingerprint is token-order-insensitive
    assert rows[2]["fp"] == rows[3]["fp"]
    assert rows[0]["fp"] != rows[1]["fp"]


def test_gopher_quality_flags(spark):
    import pandas as pd
    from ala_name_matching_spark.operators.text_analysis import (
        gopher_quality_columns,
    )

    rows = [
        (0, "the deploy failed and we have to roll back with the previous build of that service"),
        (1, "### ### ### ### ### ### ### ### ### ###"),  # symbol soup
        (2, "ok"),  # too short
        (3, ""),  # empty
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    cols = gopher_quality_columns(F.col("text"))
    out = {r["doc_id"]: r for r in df.select("doc_id", *[c.alias(n) for n, c in cols.items()]).collect()}
    assert not out[0]["flagged"] and out[0]["stop_hits"] >= 2
    assert out[1]["flagged"] and out[1]["symbol_word_ratio"] > 0.1
    assert out[2]["flagged"] and out[2]["n_words"] < 10
    assert out[3]["flagged"]


def test_benchmark_contamination(spark):
    import pandas as pd
    from ala_name_matching_spark.operators.text_analysis import (
        benchmark_contamination,
    )

    bench = spark.createDataFrame(
        pd.DataFrame(
            [(100, "what is the capital of france and why")],
            columns=["doc_id", "text"],
        )
    )
    corpus = spark.createDataFrame(
        pd.DataFrame(
            [
                # shares the 4-gram "what is the capital" (and 3 more)
                (0, "please tell me what is the capital of france right now"),
                # shares words but no 4-token run
                (1, "the capital is what france of and why is"),
                (2, "completely unrelated text about spark shuffles"),
            ],
            columns=["doc_id", "text"],
        )
    )
    out = {r["doc_id"]: r for r in benchmark_contamination(corpus, bench, n=4).collect()}
    assert set(out) == {0}
    # doc 0: 11 tokens -> 8 distinct 4-grams; 3 of them appear in the benchmark
    # ("what is the capital", "is the capital of", "the capital of france")
    assert out[0]["doc_ngrams"] == 8
    assert out[0]["n_hits"] == 3
    assert abs(out[0]["contamination_frac"] - 0.375) < 1e-9


def test_pii_scrub(spark):
    import pandas as pd
    from ala_name_matching_spark.operators.text_analysis import pii_scrub_cols

    rows = [
        (0, "mail me at jane.doe+spam@example.co.uk thanks"),
        (1, "server 192.168.0.1 rebooted, callback 555-123-4567"),
        (2, "ssn on file 123-45-6789"),
        (3, "no pii here, just 42 and a date 2024-01-01"),
        # leading '+' after whitespace: no \b exists before '+', the pattern
        # must match via its explicit '+' branch
        (4, "call +1-555-123-4567 now"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    cols = pii_scrub_cols(F.col("text"))
    out = {r["doc_id"]: r for r in df.select("doc_id", *[c.alias(n) for n, c in cols.items()]).collect()}
    assert out[0]["n_email"] == 1 and "[EMAIL]" in out[0]["redacted"]
    assert "jane" not in out[0]["redacted"]
    assert out[1]["n_ipv4"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["redacted"] == "server [IP] rebooted, callback [PHONE]"
    assert out[2]["n_ssn"] == 1 and out[2]["redacted"] == "ssn on file [SSN]"
    # a date is not a phone number (groups need 3-4 digits) and 42 survives
    assert out[3]["n_phone"] == 0 and out[3]["redacted"] == rows[3][1]
    assert out[4]["n_phone"] == 1 and out[4]["redacted"] == "call [PHONE] now"


def test_repetition_signals(spark):
    import pandas as pd
    from ala_name_matching_spark.operators.text_analysis import (
        repetition_signals,
    )

    rows = [
        (0, "buy now buy now buy now"),                 # looping boilerplate
        (1, "a perfectly ordinary sentence with variety"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    # 6 tokens, 2 distinct -> dup fraction 2/3; bigrams: 'buy now' x3 of 5
    assert abs(out[0]["dup_token_frac"] - (1 - 2 / 6)) < 1e-6
    assert out[0]["n_bigrams"] == 5 and out[0]["top_bigram_count"] == 3
    assert abs(out[0]["top_bigram_frac"] - 0.6) < 1e-6
    assert out[1]["dup_token_frac"] == 0.0
    assert out[1]["top_bigram_count"] == 1


def test_tfidf_topk(spark):
    import math

    import pandas as pd
    from ala_name_matching_spark.operators.text_analysis import tfidf_topk

    rows = [
        (0, "spark spark shuffle"),
        (1, "spark join"),
        (2, "window window window join"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = tfidf_topk(df, k=1).collect()
    top = {r["doc_id"]: r for r in out}
    # doc 0: 'spark' tf=2 df=2 -> 2*ln(1.5); 'shuffle' tf=1 df=1 -> ln(3)
    assert top[0]["term"] == "shuffle"
    assert abs(top[0]["tfidf"] - round(math.log(3), 4)) < 1e-9
    # doc 2: 'window' tf=3 df=1 dominates
    assert top[2]["term"] == "window" and top[2]["tf"] == 3


def test_unigram_logprob_hand_math(spark):
    """Corpus 'a a b' / 'b': p(a)=0.5, p(b)=0.5 -> every doc mean ln 0.5."""
    import math

    from ala_name_matching_spark.operators.text_analysis import unigram_logprob

    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a a b", "b"]})
    )
    out = {r["doc_id"]: (r["n_tokens"], r["mean_logprob"]) for r in unigram_logprob(d).collect()}
    half = round(math.log(0.5), 6)
    assert out == {0: (3, half), 1: (1, half)}
    # skewed corpus: rare token drags the mean down
    d2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a a a", "z"]})
    )
    out2 = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob(d2).collect()}
    assert out2[1] < out2[0]


def test_char_entropy_known_values(spark):
    import math

    from ala_name_matching_spark.operators.text_analysis import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "aabb"), (4, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["char_entropy"] for r in char_entropy(docs).collect()}
    assert got[1] == 0.0                       # single repeated char
    assert got[2] == round(math.log(4), 6)     # uniform over 4 chars
    assert got[3] == round(math.log(2), 6)     # two chars, equal mass
    assert 4 not in got                        # empty text filtered


def test_bigram_logprob_reference_and_edge_cases(spark):
    import math

    from ala_name_matching_spark.operators.text_analysis import bigram_logprob

    rows = [
        (1, "a b a b a"),
        (2, "a b"),
        (3, "solo"),        # < 2 tokens: n_pairs 0, null mean
        (4, "c c c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_pairs, r.mean_bigram_logprob)
        for r in bigram_logprob(df, lam=0.7).collect()
    }
    # python reference over the same corpus statistics
    toks = {i: t.split() for i, t in rows}
    uni, bi, ctx = {}, {}, {}
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    for (a, _), c in bi.items():
        ctx[a] = ctx.get(a, 0) + c
    n_total = sum(uni.values())
    for i, ws in toks.items():
        ps = list(zip(ws, ws[1:]))
        if not ps:
            assert got[i] == (0, None)
            continue
        mean = sum(
            math.log(0.7 * bi[p] / ctx[p[0]] + 0.3 * uni[p[1]] / n_total)
            for p in ps
        ) / len(ps)
        assert got[i][0] == len(ps)
        assert abs(got[i][1] - round(mean, 6)) < 2e-6, i


def test_perplexity_buckets_tertiles(spark):
    import pandas as pd

    from ala_name_matching_spark.operators.text_analysis import (
        perplexity_buckets,
    )

    # 9 docs, one language: common-word docs are probable (head), the
    # rare-word doc is improbable (tail)
    rows = [(i, "the the common words here", "en") for i in range(6)]
    rows += [(6, "the common words again now", "en")]
    rows += [(7, "mixed the rare words too", "en")]
    rows += [(8, "zzz qqq xxx yyy www", "en")]
    d = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    out = perplexity_buckets(d, n_buckets=3).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    # 9 docs -> exact tertiles of 3
    assert {b: len(v) for b, v in by_bucket.items()} == {1: 3, 2: 3, 3: 3}
    assert all(r["bucket_label"] == "head" for r in by_bucket[1])
    assert all(r["bucket_label"] == "tail" for r in by_bucket[3])
    # the rare-word doc lands in the tail, and every head score >= every
    # tail score
    assert any(r["doc_id"] == 8 for r in by_bucket[3])
    lo_head = min(r["mean_logprob"] for r in by_bucket[1])
    hi_tail = max(r["mean_logprob"] for r in by_bucket[3])
    assert lo_head >= hi_tail
