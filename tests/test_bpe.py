"""BPE trainer: pure-python reference parity (merges AND final
segmentation), left-to-right non-overlap semantics, encoding safety,
vocabulary pruning."""

import collections

import pyspark.sql.functions as F

from ala_name_matching_spark.operators.bpe import (
    apply_merge,
    encode_symbols,
    learn_merges,
    pair_counts,
    word_counts,
)


def _py_bpe(word_n, n_merges):
    segs = {w: tuple(w) for w in word_n}
    merges = []
    for step in range(1, n_merges + 1):
        cnt = collections.Counter()
        for w, n in word_n.items():
            s = segs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += n
        if not cnt:
            break
        m = max(cnt.values())
        a, b = min(p for p, c in cnt.items() if c == m)
        merges.append((step, a, b, m))
        new = {}
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new[w] = tuple(out)
        segs = new
    return merges, segs


def test_merges_and_segmentation_match_reference(spark):
    rows = [
        (0, "low lower lowest low low"),
        (1, "newer newest new news"),
        (2, "widest wider wide"),
        (3, "aaa aaaa aa a"),          # overlap stress: merge (a,a)
        (4, "the the the there then"),
        (5, "low news wide aaa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = word_counts(docs)
    wn = {r.w: r.n for r in vocab.collect()}
    mt, enc = learn_merges(vocab, 6)
    got = [(r.step, r.left, r.right, r.cnt) for r in mt.orderBy("step").collect()]
    want, want_segs = _py_bpe(wn, 6)
    assert got == want
    got_segs = {
        r.w: tuple(r.enc.strip("~").split("~~")) for r in enc.collect()
    }
    assert got_segs == want_segs


def test_left_to_right_nonoverlapping_merge(spark):
    # 'a a a a a' + merge(a,a) -> [aa, aa, a]; multi-char symbols safe:
    # 'ka b' must NOT match pattern ~a~~b~ across the 'ka' boundary
    vocab = spark.createDataFrame(
        [("aaaaa", 1), ("kab", 1)], "w string, n long"
    )
    enc = apply_merge(encode_symbols(vocab), "a", "b")
    segs = {r.w: r.enc.strip("~").split("~~") for r in enc.collect()}
    assert segs["kab"] == ["k", "ab"]
    enc2 = apply_merge(encode_symbols(vocab), "a", "a")
    segs2 = {r.w: r.enc.strip("~").split("~~") for r in enc2.collect()}
    assert segs2["aaaaa"] == ["aa", "aa", "a"]
    # after merging (k,a) -> 'ka', the pair (a,b) no longer exists in 'kab'
    enc3 = apply_merge(apply_merge(encode_symbols(vocab), "k", "a"), "a", "b")
    segs3 = {r.w: r.enc.strip("~").split("~~") for r in enc3.collect()}
    assert segs3["kab"] == ["ka", "b"]


def test_pair_counts_weighted_by_word_count(spark):
    vocab = spark.createDataFrame(
        [("ab", 5), ("abc", 2), ("z", 9)], "w string, n long"
    )
    got = {
        (r.left, r.right): r.cnt
        for r in pair_counts(encode_symbols(vocab)).collect()
    }
    assert got == {("a", "b"): 7, ("b", "c"): 2}  # 'z' has no pairs


def test_tokenize_with_merges_matches_reference_segmentation(spark):
    from ala_name_matching_spark.operators.bpe import tokenize_with_merges

    rows = [
        (0, "low lower lowest low low"),
        (1, "newer newest new news"),
        (2, "aaa aaaa aa a"),
        (3, "PUNCT! stays one-token aaa"),  # out-of-alphabet words -> 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = word_counts(docs)
    wn = {r.w: r.n for r in vocab.collect()}
    _, segs = _py_bpe(wn, 4)
    mt, _ = learn_merges(vocab, 4)
    merges = [(r.left, r.right) for r in mt.orderBy("step").collect()]
    got = {
        r.id: (r.n_words, r.n_bpe_tokens)
        for r in tokenize_with_merges(docs, merges).collect()
    }

    def py_ntok(w):
        if w not in segs:  # out-of-alphabet or hapax-pruned? apply merges
            s = list(w)
            for a, b in merges:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            return len(s)
        return len(segs[w])

    import re

    for i, text in rows:
        ws = [w for w in text.lower().split() if w]
        want_tokens = sum(
            1 if not re.fullmatch(r"[a-z0-9]+", w) else py_ntok(w)
            for w in ws
        )
        assert got[i] == (len(ws), want_tokens), text


def test_vocab_pattern_and_min_count(spark):
    docs = spark.createDataFrame(
        [(0, "keep keep keep dr~op 123ok PUNCT!"), (1, "keep once")],
        "doc_id long, text string",
    )
    vocab = word_counts(docs, min_count=2)
    rows = {r.w: r.n for r in vocab.collect()}
    assert rows == {"keep": 4}  # delimiter-bearing / punct / hapax all out
    assert "dr~op" not in rows
