"""Normalization scalar functions (SURVEY.md §2.2, F1-F4/F7/F11-F12).

Semantics derive from the reference's cleaning layer:
  - space collapse: CleanedScientificName.java:214-218 (F1)
  - punctuation translation table: CleanedScientificName.java:42-68 (F2)
  - basic/ASCII spelling-out table: CleanedScientificName.java:71-161 (F3)
  - TaxonNameSoundEx.normalize: TaxonNameSoundEx.java:45-79 (F4)
  - concat-name key: ALANameSearcher.java:2074-2088 (F7)
  - canonical key derivation: ALANameAnalyser.java:216-348 (F12, transcript analog)

Everything hot-path is a built-in Column expression (JVM-side, whole-stage
codegen); the two Unicode-normalization variants that genuinely need
`unicodedata` are Arrow-vectorized pandas UDFs, never per-row Python.

NOTE on fidelity: the reference's TaxonNameSoundEx.normalize contains
`output = str.toUpperCase()` *after* its marker-stripping replaces
(TaxonNameSoundEx.java:54-62), which discards them -- the effective behavior
(what every index and test actually exercised) starts from the raw upper-cased
string. We replicate the effective behavior.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- F2: punctuation translation (CleanedScientificName.java:42-68) ---------
# All entries are 1:1 substitutions or deletions -> expressible with the
# built-in translate() (it drops source chars with no counterpart).
_PUNCT_SUBS = {
    " ": " ",  # non-breaking space
    "­": "-",  # soft hyphen
    "‐": "-",  # hyphen
    "‑": "-",  # non-breaking hyphen
    "‒": "-",  # figure dash
    "–": "-",  # en-dash
    "—": "-",  # em-dash
    "―": "-",  # horizontal bar
    "‘": "'",  # single left quotation
    "’": "'",  # single right quotation
    "‚": "'",  # single low quotation
    "‛": "'",  # single high reversed quotation
    "“": '"',  # left quote
    "”": '"',  # right quote
    "„": '"',  # low quote
    "‟": '"',  # reversed high quote
    "‧": "",   # hyphenation point (deleted)
    " ": " ",  # line separator
    " ": " ",  # paragraph separator
    "‪": "",   # LTR embedding (deleted)
    "‫": "",   # RTL embedding (deleted)
    "‬": "",   # pop directional formatting (deleted)
    "‭": "",   # LTR override (deleted)
    "‮": "",   # RTL override (deleted)
    " ": " ",  # narrow no-break space
}
_PUNCT_SRC = "".join(k for k, v in _PUNCT_SUBS.items() if v)
_PUNCT_DST = "".join(v for v in _PUNCT_SUBS.values() if v)
_PUNCT_DEL = "".join(k for k, v in _PUNCT_SUBS.items() if not v)

PUNCT_TABLE = {ord(k): v for k, v in _PUNCT_SUBS.items()}

# --- F3: basic-latin spelling-out table (CleanedScientificName.java:71-161) --
BASIC_TABLE = {
    0x00A1: "!", 0x00A2: "c", 0x00A3: "#", 0x00A4: "#", 0x00A5: "Y",
    0x00A6: "|", 0x00A7: "$", 0x00A8: "", 0x00A9: "c", 0x00AA: "",
    0x00AB: "<<", 0x00AC: "~", 0x00D7: " x ", 0x00AE: "r", 0x00AF: " ",
    0x00B0: "o", 0x00B1: "+-", 0x00B2: "2", 0x00B3: "3", 0x00B4: "",
    0x00B5: "u", 0x00B6: "@", 0x00B7: ".", 0x00B8: "", 0x00B9: "1",
    0x00BB: ">>", 0x00BF: "?", 0x00DF: "ss",
    0x03B1: " alpha ", 0x03B2: " beta ", 0x03B3: " gamma ", 0x03B4: " delta ",
    0x03B5: " epsilon ", 0x03B6: " zeta ", 0x03B7: " eta", 0x03B8: " theta ",
    0x03BA: " kappa ", 0x03BB: " lambda ", 0x03BC: " mu ", 0x03BD: " nu ",
    0x03BE: " xi ", 0x03BF: " omicron ", 0x03C0: " pi ", 0x03C1: " rho ",
    0x03C2: " sigma ", 0x03C3: " sigma", 0x03C4: " tau ", 0x03C5: " upsilon ",
    0x03C6: " phi ", 0x03C7: " chi ", 0x03C8: " psi ", 0x03C9: " omega ",
    0x1E9E: "SS", 0x2016: "|", 0x2017: "-", 0x2020: "*", 0x2021: "*",
    0x2022: "*", 0x2023: "*", 0x2024: ".", 0x2025: ".", 0x2026: ".",
    0x2030: "%", 0x2031: "%", 0x2032: "'", 0x2033: '"', 0x2034: '"',
    0x2035: "'", 0x2036: '"', 0x2037: '"', 0x2038: "^", 0x2039: "<",
    0x203A: ">", 0x203B: "*", 0x203C: "!!", 0x203D: "?!", 0x203E: "-",
    0x203F: "_", 0x2040: "-", 0x2041: "^", 0x2042: "*", 0x2043: "*",
    0x2044: "/", 0x2045: "[", 0x2046: "]", 0x2047: "??",
    0x2715: " x ", 0x2A09: " x ", 0x2A7F: " x ",
}

# --- F4: uppercase accent fold (TaxonNameSoundEx.java:70-75) ----------------
_SOUNDEX_ACC_SRC = (
    "ÁÉÍÓÚÀÈÌÒÙ"
    "ÂÊÎÔÛÄËÏÖÜ"
    "ÃÑÕÅÇØ"
)
_SOUNDEX_ACC_DST = "AEIOUAEIOUAEIOUAEIOUANOACO"
assert len(_SOUNDEX_ACC_SRC) == len(_SOUNDEX_ACC_DST)


# =============================================================================
# Column-expression builders (JVM-side; stay inside whole-stage codegen)
# =============================================================================

def norm_spaces_col(col: Column) -> Column:
    """F1 -- collapse runs of whitespace to one space and trim.

    CleanedScientificName.java:214-218 (\\s+ with UNICODE_CHARACTER_CLASS).
    """
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def norm_punct_col(col: Column) -> Column:
    """F2 (expression form) -- unicode punctuation -> ASCII, controls dropped.

    CleanedScientificName.java:42-68. All entries are 1:1 or deletions, so the
    built-in translate() covers the table exactly (no NFKC here; see
    normalised_udf for the full Unicode-normalizing variant).
    """
    return F.translate(col, _PUNCT_SRC + _PUNCT_DEL, _PUNCT_DST)


def norm_text_col(col: Column) -> Column:
    """The transcript `norm_text`: punctuation-translated + space-collapsed.

    This is the value the reference stores as its 'normalised' name variant
    (CleanedScientificName.getNormalised, :295-312) -- the first blocking tier
    (J1) joins on it.
    """
    return norm_spaces_col(norm_punct_col(col))


def soundex_normalize_col(col: Column) -> Column:
    """F4 -- TaxonNameSoundEx.normalize (effective behavior), as built-ins.

    upper -> ' &AMP; '->' & ' -> strip <...> tags -> fold accented uppercase
    -> drop all but [A-Za-z .] -> trim -> null if empty.
    TaxonNameSoundEx.java:45-79.
    """
    c = F.upper(col)
    c = F.regexp_replace(c, r" &AMP; ", " & ")
    c = F.regexp_replace(c, r"<.+?>", "")
    c = F.translate(c, _SOUNDEX_ACC_SRC, _SOUNDEX_ACC_DST)
    c = F.regexp_replace(c, r"Æ", "AE")
    c = F.regexp_replace(c, r"[^a-zA-Z .]", "")
    c = F.trim(c)
    return F.nullif(c, F.lit(""))


def concat_name_col(col: Column) -> Column:
    """F7 -- lowercase, strip every non-letter: the secondary exact key.

    ALANameSearcher.java:2074-2088 (concatName).
    """
    return F.lower(F.regexp_replace(col, "[^a-zA-Z]", ""))


# Transcript-domain marker words, mirroring the reference's rank-marker /
# annotation stripping (cf./aff./sp. handling, ALANameSearcher.java:74-77,
# PhraseNameParser loose markers ALANameAnalyser.java:91-105). For
# conversation text the analogous noise tokens are reply/forward prefixes and
# filler annotations.
MARKER_PATTERN = r"(?i)\b(?:re|fwd|fw|aka|sic|etc)[.:]\s*|\[(?:sic|edited)\]"

# F11 builder passes (ALANameAnalyser.normalise, ALANameAnalyser.java:652-665):
# bracketed/braced annotations removed wholesale (BRACKETED, :83) and the
# author conjunction folded -- the reference maps " and " -> " & "; canon
# then strips punctuation, so folding the token to a space collapses
# "A and B" / "A & B" / "A B" to one canonical form.
BRACKET_PATTERN = r"\[[^\]]*\]|\{[^}]*\}"
AUTHOR_AND_PATTERN = r"\band\b"

# F11 entity pass. The reference's only HTML-entity handling is the ' &AMP; '
# -> ' & ' fold in TaxonNameSoundEx.treatWord:65; the five additional named
# entities here are an INTENTIONAL extension beyond the reference (web-scraped
# transcript text carries them routinely, taxonomic source files do not).
# &amp; decodes LAST so
# double-encoded text ("&amp;lt;") naively resolves in one sweep the same
# way the reference's single unescape call does. The decoded characters are
# punctuation, so the canon punctuation pass then strips them.
HTML_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def html_unescape_col(col: Column) -> Column:
    """F11 -- literal named-entity decode (chained replace, all JVM)."""
    for src, dst in HTML_ENTITIES:
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


def canon_text_from_norm(norm: Column) -> Column:
    """F12 canonical chain applied to an ALREADY-normalized column.

    Lets a projection that also materializes norm_text reuse it instead of
    re-running the F1/F2 regex chain (regex is the p1 hot cost at scale;
    computing norm->canon->key as a chain of column references instead of
    three independent from-raw-text expressions cut p1's JVM regex work
    ~2.5x)."""
    c = html_unescape_col(F.lower(norm))  # F11 entity pass (lowercase forms)
    c = F.regexp_replace(c, MARKER_PATTERN, " ")
    c = F.regexp_replace(c, BRACKET_PATTERN, " ")  # F11 bracket pass
    c = F.regexp_replace(c, AUTHOR_AND_PATTERN, " ")  # F11 and-fold
    # one pass: any run of non-alphanumerics (punctuation AND spaces)
    # collapses to a single space -- equivalent to punct->space followed by
    # \s+ collapse, at one regex scan instead of two (p1's hot cost)
    return F.trim(F.regexp_replace(c, r"[^a-z0-9]+", " "))


def canon_text_col(col: Column) -> Column:
    """F12 analog -- canonical text for transcripts.

    lowercase norm_text with marker tokens stripped and all punctuation
    removed, spaces collapsed. Mirrors ALANameAnalyser.analyse()'s
    marker-strip + SciNameNormalizer + case-fold ladder
    (ALANameAnalyser.java:216-348) re-targeted at conversation text.
    """
    return canon_text_from_norm(norm_text_col(col))


def canon_key_from_canon(canon: Column, record_id: Column) -> Column:
    """Placeholder-salted key from an already-computed canonical column."""
    is_placeholder = canon.isNull() | (F.length(canon) < 2)
    return F.when(
        is_placeholder, F.concat(F.lit("__ph__"), record_id.cast("string"))
    ).otherwise(canon)


def canon_key_col(col: Column, record_id: Column) -> Column:
    """Canonical blocking key with placeholder salting.

    Placeholder/empty canonical texts must never block together -- the
    reference assigns placeholder names a UUID precisely to prevent
    over-merging (ALANameAnalyser.java:281-294). We salt with the record id,
    which is deterministic (unlike the reference's UUIDs -- documented
    non-determinism we remove).
    """
    return canon_key_from_canon(canon_text_col(col), record_id)


# =============================================================================
# Pandas UDFs -- only where `unicodedata` is genuinely required
# =============================================================================

def normalised_py(x: str | None) -> str | None:
    """Pure-python F2 full variant (NFKC + punct table + space collapse)."""
    if x is None:
        return None
    x = unicodedata.normalize("NFKC", x).translate(PUNCT_TABLE)
    return " ".join(x.split())


def basic_py(x: str | None) -> str | None:
    """Pure-python F3 (NFKC + punct + spell-out + NFD accent strip to ASCII)."""
    if x is None:
        return None
    x = unicodedata.normalize("NFKC", x).translate(PUNCT_TABLE)
    x = x.translate(BASIC_TABLE)
    x = unicodedata.normalize("NFD", x)
    x = "".join(ch for ch in x if not unicodedata.combining(ch) and ord(ch) < 128)
    return " ".join(x.split())


def _normalised_series(s: pd.Series) -> pd.Series:
    return s.map(normalised_py, na_action="ignore")


def _basic_series(s: pd.Series) -> pd.Series:
    return s.map(basic_py, na_action="ignore")


normalised_udf = F.pandas_udf(_normalised_series, T.StringType())
basic_udf = F.pandas_udf(_basic_series, T.StringType())
