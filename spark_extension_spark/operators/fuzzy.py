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

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import session_shuffle_partitions

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


def _string_pairs(
    left_strings: DataFrame,
    right_strings: DataFrame,
    max_distance: int,
    join_hint: Optional[str] = "shuffle_hash",
    variant_partitions: Optional[int] = None,
) -> DataFrame:
    """Verified (``__ls``, ``__rs``, ``distance``) pairs between two
    one-column frames of **distinct** strings.  The variant equi-join
    runs at string level, so duplicate keys in the original data never
    multiply candidates — two identical strings share *all* their
    variants, and without this dedup a group of n copies would meet
    n² × variants times before ``distinct`` could collapse it."""
    # Spread the distinct strings BEFORE the variant explode.  The
    # ``distinct()`` the callers feed in is a shuffle whose read-bytes
    # are tiny (short strings), so AQE coalesces it to ~1 partition —
    # and the O(L²)-variants-per-string generation below then runs on
    # ONE task regardless of cluster size (measured: 12.0 s → 1.65 s
    # for 14k 27-char strings on local[32] with the explicit-count
    # repartition, which is exempt from AQE coalescing — the same
    # fan-out-blindness class as the verified-pairs spread below).
    # ``variant_partitions`` pins the spread width explicitly — the ANN
    # ``num_planes`` precedent: the count is data-independent, so a
    # caller who KNOWS the distinct-string cardinality is small (a gate
    # corpus, a query set) can pin a proportionate width and skip the
    # fixed overhead of a cluster-wide fan-out, with no silent
    # data-dependent shape switch.  Default: the session's shuffle
    # partitions (scale-adaptive).
    n_parts = (
        int(variant_partitions)
        if variant_partitions
        else session_shuffle_partitions(left_strings.sparkSession)
    )
    lv = left_strings.repartition(n_parts).select(
        F.col("__ls"), F.explode(deletion_variants("__ls", max_distance)).alias("__variant")
    )
    rv = right_strings.repartition(n_parts).select(
        F.col("__rs"), F.explode(deletion_variants("__rs", max_distance)).alias("__variant")
    )
    # |len(s) - len(t)| <= d is a NECESSARY condition for ed(s, t) <= d
    # (each edit changes length by at most 1), so filtering inside the
    # bucket join is lossless for recall while cutting the candidate
    # pairs that reach the distinct shuffle and the levenshtein
    # verification — on natural data most bucket collisions are between
    # strings of similar-but-not-close-enough lengths.
    # The variant join is PINNED to shuffle-hash: the planner sizes the
    # exploded frames from the strings' stats (explode fan-out is not
    # modeled), so it happily broadcasts a ~L²/2-rows-per-string variant
    # table — a driver-built hash relation hundreds of times the input
    # size that OOMs exactly when the corpus stops being a toy (the
    # salted_join rationale, `skew.py`).  Both sides are variant-keyed
    # and near-unique, so the per-task SHJ build is input-sized.  A
    # caller who KNOWS one side is tiny (query-set-against-corpus) may
    # pass join_hint="broadcast" to skip shuffling the big side's
    # variants — deliberate, never planner-guessed.
    if join_hint is not None:
        rv = rv.hint(join_hint)
    cands = (
        lv.join(rv, "__variant")
        .where(F.abs(F.length("__ls") - F.length("__rs")) <= max_distance)
        .select("__ls", "__rs")
        .distinct()
    )
    verified = cands.withColumn("distance", F.levenshtein("__ls", "__rs")).where(
        F.col("distance") <= max_distance
    )
    # Spread the verified pairs across the session's shuffle-partition
    # count before the callers' id-expansion joins.  The pair frame is
    # BYTES-tiny but each row fans out multiplicatively (|group(ls)| x
    # |group(rs)| id pairs); AQE's partition coalescing is driven by
    # shuffle-read bytes and is blind to join fan-out, so on heavily
    # duplicated key columns it bottles the whole expansion into one
    # task (measured: 5.2 s of a 6.5 s query in a single task at
    # sf0.1).  An EXPLICIT-count round-robin repartition is exempt from
    # AQE coalescing, so the expansion keeps full parallelism whether
    # the member frames broadcast (small data) or shuffle (large).
    # Granularity note: this spreads *string pairs*, so one
    # pathological pair of two mega-duplicated strings still expands in
    # one task; that regime needs an upstream exact-dedup pass anyway
    # (module docstring's honest-blowup contract).
    return verified.repartition(n_parts)


_JOIN_HINTS = ("shuffle_hash", "merge", "broadcast", None)


def _check_hint(join_hint: Optional[str]) -> None:
    # Spark's analyzer ignores unknown hint names with only a log
    # warning (the salted_join precedent) — reject typos loudly
    if join_hint not in _JOIN_HINTS:
        raise ValueError(
            f"join_hint must be one of {_JOIN_HINTS}, got: {join_hint!r}"
        )


def fuzzy_join_levenshtein(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    left_id: str = None,
    right_id: str = None,
    join_hint: Optional[str] = "shuffle_hash",
    variant_partitions: Optional[int] = None,
) -> DataFrame:
    """All (left_id, right_id) pairs whose strings are within
    Levenshtein distance ``max_distance`` — exact result, computed via
    symmetric-delete blocking (module docstring).

    Candidate generation and verification run over each side's
    *distinct strings*; row ids re-attach afterwards by equi-join on
    the string.  Levenshtein therefore runs once per distinct string
    pair no matter how many rows share a value (web-scale key columns
    are heavily duplicated), and the id expansion is exactly
    output-sized.

    ``join_hint`` pins the variant join's physical shape (default
    ``"shuffle_hash"`` — the planner's own size estimate is blind to
    the ~L²/2-per-string explode fan-out and would otherwise broadcast
    corpus-scale variant tables).  Pass ``"broadcast"`` when the RIGHT
    side is a known-small query set — its variants then broadcast and
    the big left side's variants are never shuffled — ``"merge"`` for
    a spill-graceful sort-merge join, or ``None`` to leave the planner
    unpinned.

    ``variant_partitions`` pins the explicit fan-out width of the
    variant explode and the verified-pair spread (default: the
    session's shuffle partitions).  The count is data-independent, so
    pinning a small value for a known-small distinct-string input
    trades cluster-wide spread for lower fixed overhead — results are
    identical either way.

    Returns ``left_id, right_id, left_col, right_col, distance``.
    """
    _check_hint(join_hint)
    left_id = left_id or left.columns[0]
    right_id = right_id or right.columns[0]
    sp = _string_pairs(
        left.select(F.col(left_col).alias("__ls")).distinct(),
        right.select(F.col(right_col).alias("__rs")).distinct(),
        max_distance,
        join_hint,
        variant_partitions,
    )
    lm = left.select(F.col(left_id).alias("left_id"), F.col(left_col).alias("__ls"))
    rm = right.select(F.col(right_id).alias("right_id"), F.col(right_col).alias("__rs"))
    right_out = right_col if right_col != left_col else f"{right_col}_right"
    return (
        sp.join(lm, "__ls")
        .join(rm, "__rs")
        .select(
            "left_id",
            "right_id",
            F.col("__ls").alias(left_col),
            F.col("__rs").alias(right_out),
            "distance",
        )
    )


def fuzzy_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    join_hint: Optional[str] = "shuffle_hash",
    variant_partitions: Optional[int] = None,
) -> DataFrame:
    """Self-join form: unordered pairs (id_a < id_b) of rows whose
    strings are within ``max_distance`` edits — near-duplicate keys,
    misspelled entity names, OCR variants.

    String-level pairs are computed once over *distinct* values with
    the unordered constraint applied at string level (``__ls <=
    __rs``), then expanded to id pairs; rows sharing an identical
    string pair via the degenerate ``distance = 0`` string pair, so
    exact-duplicate groups cost one levenshtein call, not n².

    ``variant_partitions`` as in :func:`fuzzy_join_levenshtein`.

    Returns ``id_a, id_b, distance``.
    """
    _check_hint(join_hint)
    strings = df.select(F.col(text_col).alias("__ls")).distinct()
    sp = _string_pairs(
        strings, strings.select(F.col("__ls").alias("__rs")), max_distance,
        join_hint, variant_partitions,
    ).where(F.col("__ls") <= F.col("__rs"))
    members_a = df.select(F.col(id_col).alias("__ia"), F.col(text_col).alias("__ls"))
    members_b = df.select(F.col(id_col).alias("__ib"), F.col(text_col).alias("__rs"))
    expanded = sp.join(members_a, "__ls").join(members_b, "__rs")
    # distinct-string pairs (__ls < __rs) carry each member pair once but
    # in string order, which may oppose id order — normalize with
    # least/greatest; identical-string pairs enumerate both orientations,
    # so keep the strict filter there (requires unique ids)
    kept = expanded.where(
        ((F.col("__ls") < F.col("__rs")) & (F.col("__ia") != F.col("__ib")))
        | ((F.col("__ls") == F.col("__rs")) & (F.col("__ia") < F.col("__ib")))
    )
    return kept.select(
        F.least("__ia", "__ib").alias("id_a"),
        F.greatest("__ia", "__ib").alias("id_b"),
        "distance",
    )
