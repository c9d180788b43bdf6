"""Double Metaphone goldens: functions/double_metaphone.py.

Hand-derived encodings for the classic vectors published with the
algorithm (Philips, CUJ 2000) plus cross-spelling match properties --
the behavior the alternate key exists for.
"""

from ala_name_matching_spark.functions.double_metaphone import (
    double_metaphone,
    double_metaphone_udf,
)

GOLDENS = {
    # the canonical demonstration pair: SMITH/SCHMIDT overlap on XMT
    "smith": ("SM0", "XMT"),
    "smyth": ("SM0", "XMT"),
    "schmidt": ("XMT", "SMT"),
    "johnson": ("JNSN", "ANSN"),
    "williams": ("ALMS", "FLMS"),
    "thomas": ("TMS", "TMS"),
    "catherine": ("K0RN", "KTRN"),
    "katherine": ("K0RN", "KTRN"),
    "jose": ("HS", "HS"),
    "xavier": ("SF", "SFR"),
    "wasserman": ("ASRM", "FSRM"),
    "vasserman": ("FSRM", "FSRM"),
    "filipowicz": ("FLPT", "FLPF"),
    "school": ("SKL", "SKL"),
    "sugar": ("XKR", "SKR"),
    "island": ("ALNT", "ALNT"),
    "ghost": ("KST", "KST"),
    "edge": ("AJ", "AJ"),
    "edgar": ("ATKR", "ATKR"),
    "thumb": ("0M", "TM"),
    "cabrillo": ("KPRL", "KPR"),
    "caesar": ("SSR", "SSR"),
    "michael": ("MKL", "MXL"),
    "orchestra": ("ARKS", "ARKS"),
    "accident": ("AKST", "AKST"),
    "knight": ("NT", "NT"),
    "pneumonia": ("NMN", "NMN"),
    "wrestle": ("RSTL", "RSTL"),
    "psalm": ("SLM", "SLM"),
    "gnome": ("NM", "NM"),
    "zhao": ("J", "J"),
    "laugh": ("LF", "LF"),
    "breaux": ("PR", "PR"),
}


def test_goldens():
    for word, expected in GOLDENS.items():
        assert double_metaphone(word) == expected, word


def test_cross_spelling_blocking_property():
    # the alternate key is the second-chance bucket: these spellings must
    # share at least one of the two keys (union-of-keys blocking)
    pairs = [
        ("smith", "schmidt"),
        ("catherine", "katherine"),
        ("wasserman", "vasserman"),
        ("smith", "smyth"),
    ]
    for a, b in pairs:
        ka, kb = set(double_metaphone(a)), set(double_metaphone(b))
        assert ka & kb, (a, b, ka, kb)


def test_shape_invariants():
    for w in GOLDENS:
        p, a = double_metaphone(w)
        assert len(p) <= 4 and len(a) <= 4
        assert p == p.upper() and a == a.upper()
    assert double_metaphone("") == ("", "")
    assert double_metaphone(None) is None


def test_udf_struct_output(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("smith",), ("schmidt",), (None,)], "word string"
    )
    out = df.select("word", double_metaphone_udf(F.col("word")).alias("k")).collect()
    got = {r["word"]: r["k"] for r in out}
    assert tuple(got["smith"]) == ("SM0", "XMT")
    assert tuple(got["schmidt"]) == ("XMT", "SMT")
    assert got[None]["primary"] is None and got[None]["alternate"] is None


# Extended pinned corpus: common surnames + rule-corner words. Derived by
# hand-walking the published rule cascade (CIA->S/X, -ough silents, CC
# palatalization, slavo-germanic W/CZ, pinyin ZH...); frozen here so any
# cascade edit that changes an encoding must justify itself.
EXTENDED = {
    "jones": ("JNS", "ANS"),
    "brown": ("PRN", "PRN"),
    "garcia": ("KRS", "KRX"),
    "rodriguez": ("RTRK", "RTRK"),
    "nguyen": ("NKN", "NKN"),
    "wright": ("RT", "RT"),
    "knox": ("NKS", "NKS"),
    "campbell": ("KMPL", "KMPL"),
    "sanchez": ("SNXS", "SNKS"),
    "chavez": ("XFS", "XFS"),
    "rivera": ("RFR", "RFR"),
    "gomez": ("KMS", "KMS"),
    "diaz": ("TS", "TS"),
    "cruz": ("KRS", "KRS"),
    "ortiz": ("ARTS", "ARTS"),
    "cagney": ("KKN", "KKN"),
    "gebhart": ("KPRT", "JPRT"),
    "bough": ("P", "P"),
    "ranger": ("RNJR", "RNKR"),
    "danger": ("TNJR", "TNKR"),
    "wachowski": ("AKSK", "FKFS"),
    "czerny": ("SRN", "XRN"),
    "focaccia": ("FKX", "FKX"),
    "zhivago": ("JFK", "JFK"),
    "jose maria": ("HSMR", "HSMR"),
    "mcclellan": ("MKLL", "MKLL"),
}


def test_extended_goldens():
    for word, expected in EXTENDED.items():
        assert double_metaphone(word) == expected, word


def test_entry_oracle_pins_match_goldens():
    # __spark_entry__._DM_GOLDEN feeds the double_metaphone_keys VALUES
    # oracle; it must stay identical to the hand-derived pins here so the
    # driver row remains an independent derivation, not an engine snapshot.
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    assert entry._DM_GOLDEN == {**GOLDENS, **EXTENDED}
