"""As-of join: match each left row with the nearest right row at or
before (or after, or either side of) its time, per key — the standard
time-series alignment operator (pandas ``merge_asof``, DuckDB/kdb
``ASOF JOIN``), which Spark lacks.

Spark-first construction — the union+window technique, NOT a range
join: tag both sides, union them, and carry the nearest right payload
with ``last``/``first(ignorenulls)`` over a per-key window ordered by
(time, side).  One hash shuffle on the key, one within-partition sort,
zero join explosion — a per-key range join would generate |L|×|R|
candidate pairs per key before filtering; this stays linear.  At 100 TB
that difference is the whole ballgame.  ``direction='nearest'`` adds a
second window over the SAME partitioning (no extra exchange), then
picks the closer side.

With no ``by`` keys there is no hash key to partition the window on, so
the keyless path range-partitions the union by time and carries the
payload across partition boundaries explicitly (the same
partition-pinning technique as ``with_row_numbers``): per-partition
fills in parallel windows, then a per-partition boundary-payload table
(≤ one row per partition) prefix/suffix-scanned in a single tiny window
and broadcast back.  Both directions share ONE range partitioning and
ONE persist.  No stage ever sees more than one partition's rows — the
naive alternative (a global ``Window.orderBy``) collapses the entire
dataset onto one executor.

Tie handling is inclusive on both directions: a right row at exactly
the left row's time matches (backward — DuckDB
``ASOF JOIN ... ON l.t >= r.t`` semantics, validated against it by the
``asof_join_events`` oracle; forward mirrors with ``<=``).  ``nearest``
breaks exact-distance ties toward the backward match (pandas).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..utils import UnpersistHandle, backticks, distinct_prefix_for

__all__ = ["asof_join"]

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Union[str, Sequence[str], None] = None,
    tolerance: Optional[Column] = None,
    direction: str = "backward",
    right_prefix: str = "right",
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    unpersist_handle: Optional[UnpersistHandle] = None,
) -> DataFrame:
    """For every ``left`` row, attach the ``right`` row nearest in
    ``on`` — the largest value ≤ the left row's (``direction=
    'backward'``, default), the smallest ≥ it (``'forward'``), or
    whichever of the two is closer (``'nearest'``, exact ties to
    backward) — matching on the optional ``by`` key columns.

    Right payload columns appear as ``{right_prefix}_{name}`` (null
    when no right row qualifies).  ``tolerance`` (a Column in the units
    of ``on``'s difference, e.g. ``F.lit(60)`` for integer-second
    times) discards matches farther than ``tolerance`` in the match
    direction — for ``nearest`` it applies to each side before the
    closer one is chosen.

    If ``right`` has several rows at the same (key, time), the one
    emitted is the last in the union's sort — deduplicate first if that
    matters.

    ``storage_level``/``unpersist_handle`` apply only to the keyless
    path (``by=None``), which persists the range-partitioned union to
    pin partition ids across its plan branches (one persist regardless
    of direction).
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    by_cols: List[str] = [] if by is None else ([by] if isinstance(by, str) else list(by))
    for name in [on] + by_cols:
        if name not in left.columns or name not in right.columns:
            raise ValueError(
                f"Column '{name}' must exist on both sides "
                f"(left: {', '.join(left.columns)}; right: {', '.join(right.columns)})"
            )

    prefix = distinct_prefix_for(list(left.columns) + list(right.columns))
    side = prefix + "side"
    payload = prefix + "payload"
    right_on = prefix + "right_on"
    back_col = prefix + "back"
    fwd_col = prefix + "fwd"

    value_cols = [c for c in right.columns if c != on and c not in by_cols]
    left_cols = list(left.columns)

    # NULL-time right rows are excluded (DuckDB ASOF / pandas
    # merge_asof semantics): NULLs sort FIRST, so an unfiltered NULL
    # row's payload would carry into every left row that has no real
    # predecessor.  NULL-time LEFT rows are kept and get no match —
    # they also sort first, before any (non-NULL) right row.
    tagged_right = right.where(F.col(backticks(on)).isNotNull()).select(
        *[F.col(backticks(c)) for c in by_cols],
        F.col(backticks(on)).alias(on),
        F.lit(0).alias(side),
        F.struct(
            F.col(backticks(on)).alias(right_on),
            *[F.col(backticks(c)).alias(c) for c in value_cols],
        ).alias(payload),
        *[F.lit(None).cast(left.schema[c].dataType).alias(prefix + c) for c in left_cols
          if c != on and c not in by_cols],
    )
    tagged_left = left.select(
        *[F.col(backticks(c)) for c in by_cols],
        F.col(backticks(on)).alias(on),
        F.lit(1).alias(side),
        F.lit(None).cast(tagged_right.schema[payload].dataType).alias(payload),
        *[F.col(backticks(c)).alias(prefix + c) for c in left_cols
          if c != on and c not in by_cols],
    )

    union = tagged_right.unionByName(tagged_left)
    want_back = direction in ("backward", "nearest")
    want_fwd = direction in ("forward", "nearest")

    if by_cols:
        part = [F.col(backticks(c)) for c in by_cols]
        merged = union
        if want_back:
            # right (side 0) sorts before left at equal time: inclusive <=
            wb = (
                Window.partitionBy(*part)
                .orderBy(F.col(backticks(on)).asc(), F.col(side).asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            merged = merged.withColumn(
                back_col, F.last(payload, ignorenulls=True).over(wb)
            )
        if want_fwd:
            # scanning ascending: left (side 1) FIRST at equal time, so
            # the frame [current, following] still sees that right row
            wf = (
                Window.partitionBy(*part)
                .orderBy(F.col(backticks(on)).asc(), F.col(side).desc())
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            merged = merged.withColumn(
                fwd_col, F.first(payload, ignorenulls=True).over(wf)
            )
    else:
        merged = _keyless_fills(
            union, on, side, payload, back_col if want_back else None,
            fwd_col if want_fwd else None, prefix, storage_level, unpersist_handle,
        )

    matched = merged.where(F.col(side) == 1)

    def with_tolerance(col: Column, forward: bool) -> Column:
        if tolerance is None:
            return col
        dist = (
            (col[right_on] - F.col(backticks(on)))
            if forward
            else (F.col(backticks(on)) - col[right_on])
        )
        return F.when(dist <= tolerance, col)

    if direction == "backward":
        match_col = with_tolerance(F.col(back_col), False)
    elif direction == "forward":
        match_col = with_tolerance(F.col(fwd_col), True)
    else:
        b = with_tolerance(F.col(back_col), False)
        f = with_tolerance(F.col(fwd_col), True)
        match_col = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(
                (F.col(backticks(on)) - b[right_on])
                <= (f[right_on] - F.col(backticks(on))),
                b,
            )
            .otherwise(f)
        )

    projection = (
        [F.col(backticks(c)) for c in by_cols]
        + [F.col(backticks(on))]
        + [F.col(backticks(prefix + c)).alias(c) for c in left_cols
           if c != on and c not in by_cols]
        + [match_col[right_on].alias(f"{right_prefix}_{on}")]
        + [match_col[c].alias(f"{right_prefix}_{c}") for c in value_cols]
    )
    return matched.select(*projection)


def _keyless_fills(
    union: DataFrame,
    on: str,
    side: str,
    payload: str,
    back_col: Optional[str],
    fwd_col: Optional[str],
    prefix: str,
    storage_level: StorageLevel,
    unpersist_handle: Optional[UnpersistHandle],
) -> DataFrame:
    """Backward and/or forward payload fills in global (``on``,
    ``side``) order WITHOUT a single-partition window, sharing ONE
    range partitioning and ONE persist:

    1. range-partition the union by (on, side) — globally ordered
       across partitions, parallel within;
    2. persist to pin ``spark_partition_id`` (a correctness barrier:
       every branch below must observe the same assignment);
    3. fill within each partition in parallel windows (backward scans
       ascending, forward scans the same sorted data with a
       [current, following] frame);
    4. reduce each partition to its boundary non-null payloads (≤ one
       row per partition per direction), prefix-scan those for the
       backward carry-in / suffix-scan for the forward carry-out in
       one tiny window each, and broadcast-join the carries back.
    """
    if storage_level is None:
        raise ValueError(
            "keyless asof_join requires a real storage level: the persist pins "
            "the range partitioning both plan branches depend on"
        )
    pid = prefix + "partition_id"

    # range-partition by `on` ALONE: RangePartitioner sends equal keys
    # to one partition, so equal-time ties never straddle a boundary —
    # required because backward scans ties (side asc) and forward scans
    # them (side desc); a (on, side) partitioning could cut between the
    # two orders.  Heavy single-timestamp skew concentrates in one
    # partition; callers with that shape should pre-bucket the time.
    ranged = (
        union.repartitionByRange(F.col(backticks(on)))
        .withColumn(pid, F.spark_partition_id())
        .persist(storage_level)
    )
    if unpersist_handle is not None:
        unpersist_handle.set_dataframe(ranged)

    out = ranged
    carries_to_join = []

    if back_col is not None:
        local_b = (
            Window.partitionBy(pid)
            .orderBy(F.col(backticks(on)).asc(), F.col(side).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(back_col, F.last(payload, ignorenulls=True).over(local_b))
        carry_b = prefix + "carry_b"
        last_per_partition = ranged.groupBy(pid).agg(
            F.max_by(
                F.col(payload),
                F.when(
                    F.col(payload).isNotNull(),
                    F.struct(F.col(backticks(on)), F.col(side)),
                ),
            ).alias(payload)
        )
        carries_b = last_per_partition.select(
            F.col(pid),
            F.last(payload, ignorenulls=True)
            .over(Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1))
            .alias(carry_b),
        )
        carries_to_join.append((carries_b, back_col, carry_b))

    if fwd_col is not None:
        local_f = (
            Window.partitionBy(pid)
            .orderBy(F.col(backticks(on)).asc(), F.col(side).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        out = out.withColumn(fwd_col, F.first(payload, ignorenulls=True).over(local_f))
        carry_f = prefix + "carry_f"
        # first non-null payload of each partition in ascending order:
        # smallest (on, -side) — at equal on the right row (side 0,
        # -side 0) sorts after left (-side -1), matching the scan above
        first_per_partition = ranged.groupBy(pid).agg(
            F.min_by(
                F.col(payload),
                F.when(
                    F.col(payload).isNotNull(),
                    F.struct(F.col(backticks(on)), (-F.col(side)).alias(side)),
                ),
            ).alias(payload)
        )
        carries_f = first_per_partition.select(
            F.col(pid),
            F.first(payload, ignorenulls=True)
            .over(Window.orderBy(pid).rowsBetween(1, Window.unboundedFollowing))
            .alias(carry_f),
        )
        carries_to_join.append((carries_f, fwd_col, carry_f))

    for carries, col_name, carry_name in carries_to_join:
        out = (
            out.join(F.broadcast(carries), pid, "left")
            .withColumn(col_name, F.coalesce(F.col(col_name), F.col(carry_name)))
            .drop(carry_name)
        )
    return out.drop(pid)
