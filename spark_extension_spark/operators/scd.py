"""Slowly-changing-dimension (SCD Type 2) snapshot merge.

The warehouse-side companion to :mod:`diff`: ``diff`` *reports* what
changed between snapshots; :func:`scd2_merge` *applies* a new snapshot
to a versioned dimension table, closing superseded versions and opening
new ones, so every historical state stays queryable
(``WHERE valid_from <= t AND (valid_to IS NULL OR valid_to > t)``).

Execution shape: ONE null-safe full-outer equi-join between the open
versions and the update snapshot, a struct comparison to detect
change, and a single-pass CASE/explode that emits every output row of
the merge (kept-open, closed, re-opened, inserted) from each joined
row — so the join is scanned, shuffled, and executed exactly once.
(The earlier formulation unioned four filtered projections of the
join; Catalyst pushed each branch's filter below the join, the four
subtrees stopped being equal, exchange reuse never fired, and the
plan scanned both inputs four times and ran four joins.)  History
rows pass through untouched (no join).  Nothing iterates; nothing
collects.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_merge", "scd2_current", "scd2_as_of", "snapshot_delta"]


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    id_cols: Sequence[str],
    ts,
    compare_cols: Optional[Sequence[str]] = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply the ``updates`` snapshot (all rows effective at ``ts``) to
    an SCD2 ``current`` table and return the new table.

    ``current`` carries ``valid_from`` / ``valid_to`` (NULL = open
    version); ``updates`` carries the id and attribute columns only.
    Per id:

    - open version attribute-identical to the update → unchanged;
    - open version differing → closed (``valid_to = ts``) plus a new
      open version (``valid_from = ts``);
    - id absent from updates → open version kept (treat deletions
      upstream — pass an explicit tombstone attribute if you need
      delete semantics);
    - id new in updates → new open version.

    Attribute comparison is null-safe over ``compare_cols`` (default:
    every update column except the ids), exactly the semantics of the
    default diff comparator."""
    ids = list(id_cols)
    if not ids:
        raise ValueError("id_cols must not be empty")
    attrs = list(compare_cols) if compare_cols is not None else [
        c for c in updates.columns if c not in ids
    ]
    missing = [c for c in ids + attrs if c not in updates.columns]
    if missing:
        raise ValueError(f"updates is missing columns: {missing}")
    if not attrs:
        raise ValueError(
            "no attribute columns to compare: updates carries only id "
            "columns (pass compare_cols explicitly if that is intended)"
        )
    ts_lit = ts if isinstance(ts, Column) else F.lit(ts)

    history = current.where(F.col(valid_to).isNotNull())
    # per-side presence markers: the join matches ids null-safely, so
    # presence must NOT be inferred from the (nullable) id values — a
    # NULL id row would read as absent-from-both-sides and be kept open
    # AND re-inserted simultaneously
    open_rows = current.where(F.col(valid_to).isNull()).withColumn(
        "__cur_present", F.lit(1)
    )
    upd = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in ids + attrs]
    ).withColumn("__upd_present", F.lit(1))
    cond = None
    for c in ids:
        clause = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        cond = clause if cond is None else cond & clause
    joined = open_rows.join(upd, cond, "full_outer")

    matched = (
        F.col("__cur_present").isNotNull() & F.col("__upd_present").isNotNull()
    )
    # null-safe attribute equality via struct comparison (diff's default)
    same = F.struct(*[F.col(c) for c in attrs]).eqNullSafe(
        F.struct(*[F.col(f"__u_{c}") for c in attrs])
    )

    # One struct per output kind, all shaped as cur_cols; every joined
    # row emits its outputs through a single CASE/explode so the join
    # runs once.  (Four `joined.where(...)` union branches would each
    # push their filter below the join — four distinct subtrees, no
    # exchange reuse, 4x the scans and joins.)
    cur_cols = current.columns
    kept = F.struct(*[F.col(c).alias(c) for c in cur_cols])
    closed = F.struct(
        *[(ts_lit if c == valid_to else F.col(c)).alias(c) for c in cur_cols]
    )

    def _new_field(c: str) -> Column:
        if c == valid_from:
            return ts_lit.alias(valid_from)
        if c == valid_to:
            return F.lit(None).cast(current.schema[valid_to].dataType).alias(valid_to)
        if c in ids or c in attrs:
            return F.col(f"__u_{c}").alias(c)
        return F.lit(None).cast(current.schema[c].dataType).alias(c)

    new_version = F.struct(*[_new_field(c) for c in cur_cols])

    emitted = (
        F.when(matched & ~same, F.array(closed, new_version))
        .when(F.col("__cur_present").isNull(), F.array(new_version))
        # matched & same, or open row absent from updates: keep as-is
        .otherwise(F.array(kept))
    )
    merged = joined.select(F.explode(emitted).alias("__row")).select("__row.*")

    return history.unionAll(merged)


def scd2_current(df: DataFrame, valid_to: str = "valid_to") -> DataFrame:
    """The open (latest) version of every id."""
    return df.where(F.col(valid_to).isNull())


def scd2_as_of(
    df: DataFrame,
    t,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """The version of every id in effect at time ``t`` (time travel)."""
    t_lit = t if isinstance(t, Column) else F.lit(t)
    return df.where(
        (F.col(valid_from) <= t_lit)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t_lit))
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    id_cols: Sequence[str],
    by: Sequence[str] = (),
) -> DataFrame:
    """Version-to-version change summary: diff two snapshots of a table
    and count rows per action — ``I`` (inserted), ``C`` (changed),
    ``D`` (deleted), ``N`` (unchanged) — optionally broken down by
    ``by`` dimensions (source, partition, tenant…).  The one-line
    answer to "what did this refresh actually do?", and the cheap
    pre-publish sanity gate ("a refresh that deletes 40% of rows does
    not ship").

    Composes the library's own
    :func:`~spark_extension_spark.operators.diff.diff` (null-safe
    full-outer differencing, SURVEY §2.1) with a count aggregate —
    the diff's SortMergeJoin is the only data-sized operation; the
    summary is a |actions × groups|-row aggregate on top.  ``by``
    columns are taken from the NEW side for I/C/N rows and the old
    side for D rows (the row no longer exists in ``new``).

    Returns ``(by…, action, n_rows)``.
    """
    from .diff import diff as _diff

    d = _diff(old, new, *id_cols)
    if by:
        side = [
            F.coalesce(F.col(f"right_{c}"), F.col(f"left_{c}")).alias(c)
            if f"right_{c}" in d.columns
            else F.col(c)
            for c in by
        ]
        picked = d.select(F.col("diff").alias("action"), *side)
        keys = [*by, "action"]
    else:
        picked = d.select(F.col("diff").alias("action"))
        keys = ["action"]
    return picked.groupBy(*[F.col(c) for c in keys]).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
