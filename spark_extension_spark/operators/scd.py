"""Slowly-changing-dimension (SCD Type 2) snapshot merge.

The warehouse-side companion to :mod:`diff`: ``diff`` *reports* what
changed between snapshots; :func:`scd2_merge` *applies* a new snapshot
to a versioned dimension table, closing superseded versions and opening
new ones, so every historical state stays queryable
(``WHERE valid_from <= t AND (valid_to IS NULL OR valid_to > t)``).

Execution shape: ONE null-safe full-outer equi-join between the open
versions and the update snapshot (the same join discipline as
``diff`` — Catalyst may shuffle or broadcast it freely), a struct
comparison to detect change, and a union of pure projections.  History
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

    cur_cols = current.columns
    kept_open = joined.where(
        (matched & same) | (F.col("__upd_present").isNull())
    ).select(*cur_cols)
    closed = joined.where(matched & ~same).select(
        *[F.col(c) if c != valid_to else ts_lit.alias(valid_to) for c in cur_cols]
    )

    def new_version(rows: DataFrame) -> DataFrame:
        proj = []
        for c in cur_cols:
            if c == valid_from:
                proj.append(ts_lit.alias(valid_from))
            elif c == valid_to:
                proj.append(F.lit(None).cast(current.schema[valid_to].dataType).alias(valid_to))
            elif c in ids or c in attrs:
                proj.append(F.col(f"__u_{c}").alias(c))
            else:
                proj.append(F.lit(None).cast(current.schema[c].dataType).alias(c))
        return rows.select(*proj)

    opened = new_version(joined.where(matched & ~same))
    inserted = new_version(joined.where(F.col("__cur_present").isNull()))

    return history.unionAll(kept_open).unionAll(closed).unionAll(opened).unionAll(inserted)


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
