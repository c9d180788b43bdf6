"""Unit tests for the Taxamatch phonetic layer (SURVEY.md §2.2 F4/F5).

Goldens are hand-derived by executing the reference algorithm
(TaxonNameSoundEx.java:82-159) on paper -- see each case's comment. The
property tests assert the error-class invariants the fuzzy blocking tier
relies on (FIXTURES.md §1: vowel-class swaps, K<->C, dropped H, doubled
letters, case changes all collapse to one key).
"""

from hypothesis import given
from hypothesis import strategies as st

from ala_name_matching_spark.functions.phonetic import (
    phonetic_key,
    soundex_normalize,
    treat_word,
)


def test_soundex_normalize_golden():
    # TaxonNameSoundEx.java:45-79 (effective behavior)
    assert soundex_normalize("Ab<i>c</i>d") == "ABCD"  # tags removed, content kept
    assert soundex_normalize("Señor número 42") == "SENOR NUMERO"
    assert soundex_normalize("a &AMP; b") == "A  B"  # & not in [a-zA-Z .]
    assert soundex_normalize("   ") is None
    assert soundex_normalize(None) is None
    assert soundex_normalize("Ærø") == "AERO"  # upper first: Æ->AE, Ø->O


def test_treat_word_goldens():
    # hand-derived through TaxonNameSoundEx.java:82-159:
    # BRACHYPHYLLA -> head B + RACHYPHYLLA; Y->I, H dropped -> RACIPILLA;
    # squeeze LL -> BRACIPILA (no species suffix change)
    assert treat_word("brachyphylla", "species") == "BRACIPILA"
    # OCELLATUS -> O + CELLATUS; E->I, U->I -> CILLATIS; squeeze -> OCILATIS;
    # species IS->A -> OCILATA
    assert treat_word("ocellatus", "species") == "OCILATA"
    # PSITTACUS: leading PS->S; U->I; squeeze TT -> SITACIS
    assert treat_word("Psittacus") == "SITACIS"
    # HEMIGENIA: head H kept; tail IA->A then E->I -> HIMIGINA
    assert treat_word("hemigenia") == "HIMIGINA"
    # first letter is quarantined: Z vs S initial stay distinct
    assert treat_word("zebra") == "ZIBRA"
    assert treat_word("sebra") == "SIBRA"
    assert treat_word("zebra") != treat_word("sebra")
    # leading digraph rewrites (TaxonNameSoundEx.java:88-125)
    assert treat_word("Aedes") == treat_word("edes")
    assert treat_word("Xanthium")[0] == "Z"
    assert treat_word("McDonald").startswith("MAC")
    assert treat_word(None) is None
    assert treat_word("") is None  # empty normalizes to None
    assert treat_word("   ") is None


def test_error_class_invariants():
    # the planted error classes of FIXTURES.md §1(c) collapse to one key
    assert treat_word("restarted") == treat_word("raestarted")  # ae/e swap
    assert treat_word("metric") == treat_word("metrik")  # k<->c (non-initial)
    assert treat_word("pipeline") == treat_word("pipelinne")  # doubled letter
    assert treat_word("shard") == treat_word("sharrd")
    assert treat_word("ticket") == treat_word("tycket")  # y<->i
    assert treat_word("THROTTLED") == treat_word("throttled")  # case
    assert treat_word("hemigenia") == treat_word("hemygenia")


def test_phonetic_key_compound():
    from ala_name_matching_spark.functions.phonetic import KEY_TOKENS

    # KEY_TOKENS phonetic slots + the digit-signature (voucher-analog) slot
    k = phonetic_key("The customer restarted the pod again today soon")
    assert k is not None and k.count("|") == KEY_TOKENS
    assert k.endswith("|<nodigits>")
    # fewer than max_tokens pads with the reference's "<null>" sentinel
    # (ALANameSearcher.java:1087)
    assert phonetic_key("hello").endswith(
        "|<null>" * (KEY_TOKENS - 1) + "|<nodigits>"
    )
    assert phonetic_key("") is None
    assert phonetic_key("?!") is None
    # stable under the planted perturbations
    assert phonetic_key("the customer restarted the pod") == phonetic_key(
        "THE CUSTOMER RESTARTED THE POD"
    )
    # digit runs split blocks (request numbers are identity-bearing)
    assert phonetic_key("request 1234 reviewed").endswith("|1234")
    assert phonetic_key("request 1234 reviewed") != phonetic_key(
        "request 5678 reviewed"
    )


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=40))
def test_treat_word_total_and_idempotent_shape(s):
    out = treat_word(s)
    # total: never raises; output is None/empty or uppercase [A-Z .]
    if out:
        assert all(c.isupper() or c in " ." for c in out)
        # no doubled letters survive squeezing except across the head boundary
        # (the reference squeezes AFTER re-attaching the head -- verify none)
        for a, b in zip(out, out[1:]):
            if a.isalpha():
                assert not (a == b)


def test_species_fold_and_kernel_unification():
    """Round-2 verdict item 3: one key semantics for both kernels.

    The species-suffix fold (IS/IM/AS -> A, TaxonNameSoundEx.java:146-156)
    applies to key slots 2..N (specific_ex/infra_ex analog); slot 1 keeps the
    normal treatment (genus_ex). `_species_fold(normal)` must equal the
    reference's "species" treatWord so the memoized batch kernel can fold at
    the slot level.
    """
    from ala_name_matching_spark.functions.phonetic import _species_fold

    for w in ["status", "ocellatus", "brachyphylla", "request", "maximum"]:
        assert _species_fold(treat_word(w, "normal")) == treat_word(w, "species")
    # suffix-class misspellings collapse ONLY via the fold on slots 2..N
    assert treat_word("status") != treat_word("statas")
    assert phonetic_key("the status was checked") == phonetic_key(
        "the statas was checked"
    )
    # slot 1 is NOT folded: differing first tokens stay distinct
    assert phonetic_key("status checked") != phonetic_key("statas checked")


def test_struct_kernel_parity_with_scalar_key():
    """The pipeline's batch kernel and the published phonetic_key operator
    must produce byte-identical keys on a representative corpus sample
    (they share _key_from_treated; this guards the seam)."""
    import pandas as pd

    from ala_name_matching_spark.functions.phonetic import (
        _phonetic_struct_series,
        phonetic_tokens,
    )
    from ala_name_matching_spark.sources.transcripts import (
        _base_text,
        _perturb,
    )

    texts = [None, "", "?!", "the status was checked", "the statas was checked"]
    for e in range(40):
        for v in range(7):
            texts.append(_perturb(_base_text(e), v, e))
    out = _phonetic_struct_series(pd.Series(texts, dtype=object))
    for text, got_key, got_toks in zip(
        texts, out["phonetic_key"], out["phonetic_tokens"]
    ):
        want = phonetic_key(text) if text is not None else None
        assert got_key == want, (text, got_key, want)
        if text is not None:
            assert list(got_toks) == (phonetic_tokens(text) or [])


def test_phonetic_keys_golden_file(spark):
    """Golden-file regression check for the published phonetic_keys operator
    (round-2 verdict item 5): keys for the first 40 driver documents plus
    adversarial literals, generated from the unified kernel and frozen.
    A change to the fold tables / key layout must update the goldens
    consciously."""
    import json
    import os

    here = os.path.dirname(__file__)
    with open(os.path.join(here, "golden_phonetic_keys.json")) as fh:
        golden = json.load(fh)
    # scalar path on the adversarial literals
    literals = {
        "-1": "The status was checked after request 1234",
        "-2": "the statas was checked after request 1234",
        "-3": "Re: THE CUSTOMER restarted   the pod",
        "-4": "?",
        "-5": "Señor número 42 <b>bold</b> &AMP; done",
    }
    for k, text in literals.items():
        assert phonetic_key(text) == golden[k], (text, phonetic_key(text), golden[k])
    # Spark path (the published queries() entry) on the document sample
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        return
    import sys

    sys.path.insert(0, os.path.dirname(here))
    import __spark_entry__ as entry

    from pyspark.sql import functions as F

    out = (
        entry.queries()["phonetic_keys"](spark, sf_dir)
        .filter(F.col("doc_id") < 40)
        .collect()
    )
    assert len(out) == 40
    for r in out:
        assert r["phonetic_key"] == golden[str(r["doc_id"])], r["doc_id"]


def test_full_soundex_f6_goldens():
    """F6 -- TaxonNameSoundEx.soundEx (TaxonNameSoundEx.java:168-238),
    hand-derived goldens. Key property: the per-word alphabetize step makes
    the key invariant under within-word transpositions, the misspelling
    class treatWord cannot collapse."""
    from ala_name_matching_spark.functions.phonetic import full_soundex

    # ZEBRA: no digraph, no tail fold, no repeat; Z + sorted(EBRA) = ZABER
    assert full_soundex("zebra") == "ZABER"
    # transposition class collapses (treatWord keys differ: ZIBRA vs ZIRBA)
    assert full_soundex("zebra") == full_soundex("zerba")
    assert treat_word("zebra") != treat_word("zerba")
    # first-char digraph: PSITTACUS -> SITTACUS; squeeze TT -> SITACUS;
    # alphabetize: S + sorted(ITACUS) = SACISTU
    assert full_soundex("Psittacus") == "SACISTU"
    # tail digraph fold before alphabetize: OCELLATUS: no leading rewrite
    # (OE rule needs prefix OE); tail 'CELLATUS' has no AE/IA/OE/OI/MC/SC;
    # squeeze LL -> OCELATUS -> O + sorted(CELATUS) = OACELSTU
    assert full_soundex("ocellatus") == "OACELSTU"
    # soundEx does NOT vowel-fold (the reference's EOUYKZH replaceAll is a
    # literal-string no-op, TaxonNameSoundEx.java:230): E stays E
    assert "E" in full_soundex("zebra")
    # multi-word: per-word alphabetize, space-squeeze across the string
    assert full_soundex("the  cluster") == full_soundex("the clusster")
    # null/empty totality
    assert full_soundex(None) is None
    assert full_soundex("") == ""
