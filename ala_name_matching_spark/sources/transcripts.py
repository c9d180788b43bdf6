"""Deterministic synthetic transcript generator (FIXTURES.md §1-§2).

Produces the primary input table (conv_id, turn_idx, role, text, tool, ts)
with planted duplicate groups exercising exactly the error classes the
reference's fuzzy layer collapses (TaxonNameSoundEx.treatWord,
TaxonNameSoundEx.java:82-159; CleanedScientificName.java:42-161):

  (a) case changes                  (LowerCaseKeywordAnalyzer semantics)
  (b) unicode punctuation swaps     (curly quotes, en-dash, nbsp)
  (c) phonetic misspellings         (vowel-class swaps, K<->C, dropped H,
                                     doubled letters)
  (d) marker-token insertion        (re:, fwd: -- cf./aff./sp. analogs)
  (e) author-style suffixes
  (f) species-suffix-class swaps    (status->statas: IS/US/AS all key to A
                                     ONLY under the species fold on key
                                     slots 2..N, TaxonNameSoundEx.java:
                                     146-156 -- the F1 gate catches a
                                     regression of that fold)

plus singleton negatives, adversarial homonym groups (identical text, a
conflicting role/tool -- must NOT merge), one hot entity holding ~5% of all
rows (exercises salting/capping), and placeholder turns (whitespace/'?') that
must never merge (ALANameAnalyser.java:281-294).

Generation is seeded, pure, and DISTRIBUTED: `spark.range(n)` ->
`mapInPandas`, every row a pure function of its index -- no driver-side
materialization, so the same generator scales to bench volumes.

Ground truth: `entity_id` column (the gold cluster). Labeled pairs for the
pairwise-F1 gate are derived per FIXTURES.md §2 by pairing records that share
a blocking key (positives = same entity, negatives = different entity).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
HOT_ENTITY_SHARE = 0.05
PLACEHOLDER_EVERY = 97  # ~1% of rows are placeholder turns
HOMONYM_ENTITIES = 5    # first k non-hot entities are homonym groups

_SUBJECTS = [
    "customer", "agent", "deploy", "invoice", "cluster", "pipeline", "ticket",
    "release", "database", "metric", "schema", "payment", "vendor", "account",
    "session", "token", "backup", "replica", "shard", "status",
]
_VERBS = [
    "restarted", "escalated", "reconciled", "migrated", "flagged", "resolved",
    "archived", "validated", "rejected", "throttled", "reindexed", "merged",
]
_OBJECTS = [
    "the billing report", "the kubernetes pod", "the quarterly summary",
    "the customer record", "the audit trail", "the search index",
    "the export job", "the retry queue", "the staging table",
    "the access policy", "the usage dashboard", "the shipment manifest",
]
_ROLES = ["user", "assistant", "tool"]
_TOOLS = [None, "search", "sql", "browser", "calc"]

# phonetic perturbations within treatWord fold classes (key-preserving):
_PHONETIC_SWAPS = [
    ("e", "ae"), ("ae", "e"), ("oe", "e"), ("y", "i"), ("i", "y"),
    ("k", "c"), ("c", "k"), ("ll", "l"), ("t", "tt"), ("n", "nn"),
]


def _rng_int(*parts) -> int:
    """Deterministic 64-bit int from parts (stable across processes)."""
    h = hashlib.blake2b("|".join(str(p) for p in parts).encode(), digest_size=8)
    return int.from_bytes(h.digest(), "big")


def _base_text(entity: int) -> str:
    r = _rng_int(SEED, "base", entity)
    s = _SUBJECTS[r % len(_SUBJECTS)]
    v = _VERBS[(r >> 8) % len(_VERBS)]
    o = _OBJECTS[(r >> 16) % len(_OBJECTS)]
    n = (r >> 24) % 9000 + 1000
    return f"The {s} {v} {o} after request {n} was reviewed"


def _perturb(text: str, variant: int, entity: int) -> str:
    """Apply one of the planted error classes, chosen by variant index."""
    r = _rng_int(SEED, "perturb", entity, variant)
    kind = variant % 7
    if kind == 6:  # (f) species-suffix-class swap on a key slot 2..6 token
        words = text.split()
        for idx in range(1, min(6, len(words))):
            if words[idx].lower().endswith(("us", "is")):
                words[idx] = words[idx][:-2] + "as"
                return " ".join(words)
        return text.upper()  # no eligible token: fall back to class (a)
    if kind == 0:
        return text  # pristine copy
    if kind == 1:  # (a) case change
        mode = r % 3
        if mode == 0:
            return text.upper()
        if mode == 1:
            return text.lower()
        return text.title()
    if kind == 2:  # (b) unicode punctuation swaps
        out = text.replace(" ", " ", 1)
        out = out.replace("after", "after –", 1)
        return out.replace("request", "‘request’", 1)
    if kind == 3:  # (c) phonetic misspelling in one word
        swap = _PHONETIC_SWAPS[r % len(_PHONETIC_SWAPS)]
        words = text.split()
        idx = 1 + (r >> 8) % (len(words) - 1)
        w = words[idx]
        if swap[0] in w.lower():
            words[idx] = w.lower().replace(swap[0], swap[1], 1)
        return " ".join(words)
    if kind == 4:  # (d) marker tokens
        return ("Re: " if r % 2 else "Fwd: ") + text
    # (e) author-style suffix
    initial = chr(ord("A") + r % 26)
    return f"{text} [sic] {initial}. Smith"


def _row_for_index(i: int, n_entities: int, hot_rows: int) -> dict:
    """Pure function index -> row. Gold cluster = entity_id."""
    r = _rng_int(SEED, "row", i)
    if i % PLACEHOLDER_EVERY == 0:
        # placeholder: must never merge with anything (own gold entity)
        ph = ["", "   ", "?", "...", "-"][r % 5]
        entity = -i - 1  # unique gold id
        text = ph
        role = _ROLES[r % 3]
        tool = None
    elif i < hot_rows:
        entity = 0  # the hot entity (~5% of rows in one block)
        text = _perturb(_base_text(0), (i % 7), 0)
        role = "assistant"
        tool = "sql"
    else:
        entity = 1 + (r % (n_entities - 1))
        variant = (r >> 16) % 7
        text = _perturb(_base_text(entity), variant, entity)
        if entity <= HOMONYM_ENTITIES:
            # adversarial homonym: identical text, conflicting role subgroup.
            # gold treats the two role-subgroups as DIFFERENT entities.
            sub = (r >> 32) % 2
            text = _base_text(entity)  # identical (no perturbation)
            role = "user" if sub == 0 else "tool"
            tool = None
            entity = entity * 10_000 + sub  # distinct gold ids per subgroup
        else:
            role = _ROLES[_rng_int(SEED, "role", entity) % 3]  # per-entity stable
            tool = _TOOLS[_rng_int(SEED, "tool", entity) % len(_TOOLS)]
    conv = f"c{i // 20:08d}"
    return {
        "conv_id": conv,
        "turn_idx": i % 20,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=int(i)),
        "entity_id": int(entity),
    }


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, entity_id long"
)


def synthesize_transcripts(
    spark: SparkSession, n_turns: int, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic transcript table with gold entity_id."""
    n_entities = max(20, n_turns // 20)
    hot_rows = max(2, int(n_turns * HOT_ENTITY_SHARE))
    base = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [_row_for_index(int(i), n_entities, hot_rows) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: view the driver's `documents` parquet as a transcript table.

    Deterministic projection -- doc rows become turns grouped into
    conversations of 10 by doc_id; used by __spark_entry__.entry() so the
    flagship query runs on driver-provided data.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("d"), (F.col("doc_id") / 10).cast("long").cast("string")).alias("conv_id"),
        F.pmod(F.col("doc_id"), F.lit(10)).cast("int").alias("turn_idx"),
        F.coalesce(F.col("lang"), F.lit("und")).alias("role"),
        F.col("text"),
        F.col("source").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01")).alias("ts"),
    )
