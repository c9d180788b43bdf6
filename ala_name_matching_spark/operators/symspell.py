"""SymSpell symmetric-delete fuzzy lookup (Garbe's algorithm).

The reference's fuzzy tier answers "which dictionary names are within
edit distance d of this query" with phonetic blocking + edit-distance
rerank (ALANameSearcher.java fuzzy searches); SymSpell is the
industrial-strength exact accelerator for that lookup shape: precompute
every variant of each DICTIONARY term obtainable by deleting up to d
characters, do the same to each query term at lookup time, and candidate
pairs are exactly the ones sharing a variant -- an EQUI-JOIN, no scan of
the dictionary, no q-gram posting lists.

Completeness (the symmetric-delete property): if ed(x, y) <= d under
insert/delete/substitute, then deleting at most d chars from x and at
most d chars from y reaches a COMMON string (delete the inserted chars,
delete the substituted chars on both sides), so the equi-join on the
<= d-delete variant sets loses no true pair. The converse does not hold
(a shared variant does not bound the distance), hence the banded
Levenshtein verify -- same verify contract as ed_join, so the output
equals the brute-force truth set and is fully oracle-checkable.

Cost model vs Ed-Join: variants per term = sum_{k<=d} C(L, k) (L+1
strings at d=1, ~L^2/2 at d=2) -- generous for LONG strings but
excellent for NAME-length terms, where SymSpell's equi-join beats
posting-list intersection by orders of magnitude (no hot grams at all).
The right tool for the reference's dictionary-lookup shape; ed_join
remains the corpus self-join tool. Generation is pure codegen
(transform over a staged attribute -- the CSE discipline), exploded to a
(variant, id) table; the join is a plain shuffle/broadcast equi-join
Catalyst sizes itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletes_once(terms: Column) -> Column:
    """array of all strings obtained by deleting ONE char from each
    element of `terms` (an array column); empty results dropped later.
    `terms` must be a bound attribute (lambda CSE rule)."""
    return F.flatten(
        F.transform(
            terms,
            lambda t: F.transform(
                F.sequence(F.lit(1), F.length(t)),
                lambda i: F.concat(
                    F.substring(t, F.lit(1), i - 1),
                    F.substring(t, i + 1, F.length(t)),
                ),
            ),
        )
    )


def delete_variants(
    df: DataFrame,
    id_col: str = "id",
    term_col: str = "term",
    d: int = 2,
) -> DataFrame:
    """(id, term, variant): every distinct string reachable by deleting
    up to d chars (the term itself included -- 0 deletions)."""
    staged = (
        df.select(F.col(id_col).alias("id"), F.col(term_col).alias("term"))
        .where(F.col(term_col).isNotNull() & (F.length(term_col) >= 1))
        .withColumn("__lvl", F.array(F.col("term")))
        .withColumn("__all", F.col("__lvl"))
    )
    for _ in range(d):
        # deletes apply to the PREVIOUS level only (distance k-1 strings);
        # each step binds __lvl/__all as attributes before reuse (CSE rule)
        staged = staged.withColumn(
            "__lvl", F.array_distinct(_deletes_once(F.col("__lvl")))
        ).withColumn("__all", F.array_union("__all", "__lvl"))
    # the EMPTY variant is load-bearing: 'x' and 'a' (ed 1) meet only at
    # '' -- dropping zero-length variants silently loses every pair whose
    # common ancestor is the empty string. It is also the hottest variant
    # (shared by all terms of length <= d), bounded by the short-term count.
    return staged.select(
        "id", "term", F.explode("__all").alias("variant")
    )


def symspell_lookup(
    dictionary: DataFrame,
    queries: DataFrame,
    d: int = 2,
    dict_id: str = "dict_id",
    dict_term: str = "term",
    query_id: str = "query_id",
    query_term: str = "term",
) -> DataFrame:
    """(query_id, query_term, dict_id, dict_term, dist): all dictionary
    entries within exact edit distance d of each query term.

    Candidates via the shared-variant equi-join (complete by the
    symmetric-delete property); verified with banded Levenshtein, so the
    result is the exact truth set. The variant tables are the indexes --
    a production dictionary writes its side once (the persisted-index
    pattern of retrieval.build_index) and every lookup batch joins
    against it.
    """
    dv = delete_variants(dictionary, dict_id, dict_term, d).select(
        F.col("id").alias("dict_id"),
        F.col("term").alias("dict_term"),
        "variant",
    )
    qv = delete_variants(queries, query_id, query_term, d).select(
        F.col("id").alias("query_id"),
        F.col("term").alias("query_term"),
        "variant",
    )
    cands = (
        qv.join(dv, "variant")
        .select("query_id", "query_term", "dict_id", "dict_term")
        .distinct()
    )
    return cands.select(
        "query_id",
        "query_term",
        "dict_id",
        "dict_term",
        F.levenshtein("query_term", "dict_term", d).alias("dist"),
    ).where(F.col("dist") >= 0)
