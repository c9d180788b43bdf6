"""Deterministic sampling / splitting for training-data pipelines.

At 100 TB a train/holdout split must be (a) a pure function of the record id
-- reproducible across runs, engines, and cluster sizes, no RNG state --
and (b) computable without a shuffle (narrow projection). Both operators
key on an md5 hex prefix of the id: uniform by construction, engine-neutral
(md5 is bit-identical everywhere, so a DuckDB oracle can reproduce the
split exactly), and salted so independent splits decorrelate.

The reference has no sampling surface (single-node Lucene build); this is
part of the training-data extension set alongside dedup/ANN/text-analysis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 hex digits = 65536 buckets; fraction resolution 1/65536
_PREFIX_LEN = 4
_BUCKETS = 16 ** _PREFIX_LEN


def _bucket_col(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, 65536) from the salted md5 hex prefix.

    conv(hex, 16, 10) keeps everything JVM-side; the DuckDB oracle is
    the lexicographic-equivalent arithmetic on the same md5 prefix.
    """
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, _PREFIX_LEN),
        16,
        10,
    ).cast("long")


def deterministic_split(
    df: DataFrame,
    id_col: str,
    holdout_frac: float = 0.1,
    salt: str = "split-v1",
) -> DataFrame:
    """Add a `split` column ('train' / 'holdout') keyed on md5(salt || id).

    Narrow, shuffle-free, reproducible: the same id lands in the same split
    at any scale, any partitioning, any engine. Changing `salt` draws an
    independent split (md5 avalanche decorrelates prefixes).
    """
    cutoff = int(holdout_frac * _BUCKETS)
    return df.withColumn(
        "split",
        F.when(_bucket_col(F.col(id_col), salt) < cutoff, F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum downsample (e.g. per-language quotas).

    Keeps a row iff its salted md5 bucket falls under its stratum's
    fraction -- the standard quota-sampling move for rebalancing a corpus
    (downweight boilerplate-heavy languages/sources) while staying
    reproducible and join-free: the fraction map becomes a CASE expression,
    not a broadcast table, so the filter pushes into the scan.
    """
    bucket = _bucket_col(F.col(id_col), salt)
    cut = F.lit(int(default_frac * _BUCKETS))
    for key, frac in sorted(fractions.items()):
        cut = F.when(F.col(strata_col) == key, F.lit(int(frac * _BUCKETS))).otherwise(
            cut
        )
    return df.filter(bucket < cut)
