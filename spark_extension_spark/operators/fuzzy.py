"""Fuzzy (edit-distance) joins at scale: symmetric-delete blocking +
exact Levenshtein verification.

The naive fuzzy join is a cross product with ``levenshtein() <= d``
— O(n²) comparisons, unrunnable at corpus scale.  This module uses
the *symmetric delete* scheme (the idea behind SymSpell): if
``ed(s, t) <= d`` then deleting at most ``d`` characters from each of
``s`` and ``t`` can produce a common string, so every true match is
guaranteed to meet in an **equi-join** on a deletion variant.  The
plan becomes:

    explode each side into its <= C(L, d) deletion variants
    -> hash equi-join on the variant string
    -> distinct candidate pairs
    -> exact levenshtein verification (JVM built-in) on candidates

All JVM-side column algebra (``transform``/``flatten`` over
``sequence`` for variant generation — no Python UDFs), one shuffle on
the variant key, and the verification touches only candidate pairs.
Recall is exactly 100%: the deletion-neighborhood meet is a theorem,
not a heuristic, so results equal the cross-product formulation
bit-for-bit (the DuckDB oracle runs the naive form).

Blow-up control is honest and explicit: the variant count per string
is ~L^d/d! (for 12-char strings at d=2, 79 variants), and a variant
shared by many strings produces a proportionally large bucket.  For
natural-key joins (names, titles, SKUs) buckets are small; for
adversarial inputs cap nothing here — compose an upstream length or
prefix partition if needed, because dropping buckets silently would
break the exactness contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "deletion_variants",
    "fuzzy_join_levenshtein",
    "fuzzy_dedup_pairs",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def deletion_variants(text, max_deletes: int = 2) -> Column:
    """Array of all distinct strings reachable from ``text`` by at most
    ``max_deletes`` single-character deletions (including ``text``
    itself).  Pure column algebra: nested ``transform`` over
    ``sequence(1, length)`` with ``substring`` splicing, flattened and
    deduplicated — evaluated entirely inside codegen.
    """
    if max_deletes not in (1, 2):
        raise ValueError(f"max_deletes must be 1 or 2, got {max_deletes}")
    s = _col(text)
    base = F.array(s)
    d1 = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        lambda i: F.when(
            F.length(s) >= i,
            F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))),
        ).otherwise(s),
    )
    if max_deletes == 1:
        return F.array_distinct(F.concat(base, d1))
    d2 = F.flatten(
        F.transform(
            d1,
            lambda t: F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1))),
                lambda i: F.when(
                    F.length(t) >= i,
                    F.concat(t.substr(F.lit(1), i - 1), t.substr(i + 1, F.length(t))),
                ).otherwise(t),
            ),
        )
    )
    return F.array_distinct(F.concat(base, d1, d2))


def fuzzy_join_levenshtein(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    left_id: str = None,
    right_id: str = None,
) -> DataFrame:
    """All (left_id, right_id) pairs whose strings are within
    Levenshtein distance ``max_distance`` — exact result, computed via
    symmetric-delete blocking (module docstring).

    Returns ``left_id, right_id, left_col, right_col, distance``.
    """
    left_id = left_id or left.columns[0]
    right_id = right_id or right.columns[0]
    lv = left.select(
        F.col(left_id).alias("left_id"),
        F.col(left_col).alias("__ls"),
        F.explode(deletion_variants(left_col, max_distance)).alias("__variant"),
    )
    rv = right.select(
        F.col(right_id).alias("right_id"),
        F.col(right_col).alias("__rs"),
        F.explode(deletion_variants(right_col, max_distance)).alias("__variant"),
    )
    cands = lv.join(rv, "__variant").select("left_id", "right_id", "__ls", "__rs").distinct()
    return (
        cands.withColumn("distance", F.levenshtein("__ls", "__rs"))
        .where(F.col("distance") <= max_distance)
        .select(
            "left_id",
            "right_id",
            F.col("__ls").alias(left_col),
            F.col("__rs").alias(right_col),
            "distance",
        )
    )


def fuzzy_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """Self-join form: unordered pairs (id_a < id_b) of rows whose
    strings are within ``max_distance`` edits — near-duplicate keys,
    misspelled entity names, OCR variants.  Same blocking/verification
    as :func:`fuzzy_join_levenshtein`, keeping each unordered pair
    once.

    Returns ``id_a, id_b, distance``.
    """
    pairs = fuzzy_join_levenshtein(
        df.select(F.col(id_col), F.col(text_col)),
        df.select(F.col(id_col), F.col(text_col)),
        text_col,
        text_col,
        max_distance,
        left_id=id_col,
        right_id=id_col,
    )
    return (
        pairs.where(F.col("left_id") < F.col("right_id"))
        .select(
            F.col("left_id").alias("id_a"),
            F.col("right_id").alias("id_b"),
            "distance",
        )
    )
