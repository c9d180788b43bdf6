"""Randomized cross-checks: Spark operators vs independent pure-python
brute-force references (seeded corpora, planted structure). These are a
third leg besides unit goldens and the DuckDB oracles -- the reference
implementations share NO code with the operators."""

import hashlib

import numpy as np


def _mk_corpus(seed, n_docs=60):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = {}
    for i in range(n_docs):
        docs[i] = " ".join(rng.choice(vocab, size=rng.randint(8, 25)))
    # planted prefix chain and duplicates
    docs[100] = docs[0]
    docs[101] = " ".join(docs[1].split()[: len(docs[1].split()) // 2])
    return docs


def test_prefix_containment_vs_bruteforce(spark):
    from ala_name_matching_spark.operators.dedup import prefix_containment_flags

    docs = _mk_corpus(11)
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["contained"]
        for r in prefix_containment_flags(df).collect()
    }
    texts = set(docs.values())
    for i, t in docs.items():
        brute = any(o != t and o.startswith(t) for o in texts)
        assert got[i] == brute, (i, t)


def _py_winnow(tokens, k, w):
    """Independent winnowing reference: rightmost-min per window."""
    grams = [
        " ".join(tokens[i : i + k]) for i in range(max(len(tokens) - k + 1, 1))
    ]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
    ]
    m = len(hs)
    fps = set()
    for s in range(max(m - w + 1, 1)):
        window = hs[s : s + w]
        mn = min(window)
        # rightmost occurrence of the min
        j = max(idx for idx, v in enumerate(window) if v == mn)
        fps.add((hs[s + j], s + j + 1))  # 1-based pos
    return fps


def test_winnowing_vs_python_reference(spark):
    from ala_name_matching_spark.operators.dedup import winnow_fingerprints

    docs = _mk_corpus(12, n_docs=20)
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = {}
    for r in winnow_fingerprints(df, k=4, w=5).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_hash"], r["fp_pos"]))
    for i, t in docs.items():
        assert got.get(i, set()) == _py_winnow(t.split(), 4, 5), i


def test_ngram_containment_vs_bruteforce(spark):
    from ala_name_matching_spark.operators.dedup import ngram_containment_pairs

    docs = _mk_corpus(13, n_docs=30)
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = {
        (r["doc_id_l"], r["doc_id_r"]): r["shared"]
        for r in ngram_containment_pairs(df, shingle_n=4, threshold=0.8).collect()
    }

    def grams(t):
        tok = t.split()
        return {
            " ".join(tok[i : i + 4]) for i in range(max(len(tok) - 3, 1))
        }

    brute = {}
    ids = sorted(docs)
    for a_i in range(len(ids)):
        for b_i in range(a_i + 1, len(ids)):
            a, b = ids[a_i], ids[b_i]
            ga, gb = grams(docs[a]), grams(docs[b])
            shared = len(ga & gb)
            if shared and max(shared / len(ga), shared / len(gb)) >= 0.8:
                brute[(a, b)] = shared
    assert got == brute and brute  # planted dup guarantees non-empty
