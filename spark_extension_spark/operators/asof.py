"""As-of join: match each left row with the most recent right row at or
before its time (per key) — the standard time-series alignment operator
(pandas ``merge_asof``, DuckDB/kdb ``ASOF JOIN``), which Spark lacks.

Spark-first construction — the union+window technique, NOT a range
join: tag both sides, union them, and carry the latest right payload
forward with ``last(ignorenulls)`` over a per-key window ordered by
(time, side).  One hash shuffle on the key, one within-partition sort,
zero join explosion — a per-key range join would generate |L|×|R|
candidate pairs per key before filtering; this stays linear.  At 100 TB
that difference is the whole ballgame.

With no ``by`` keys there is no hash key to partition the window on, so
the keyless path range-partitions the union by time and carries the
payload across partition boundaries explicitly (the same
partition-pinning technique as ``with_row_numbers``): a per-partition
backward fill in parallel windows, then a per-partition "last payload"
table (≤ one row per partition) prefix-scanned in a single tiny window
and broadcast back.  No stage ever sees more than one partition's rows
— the naive alternative (a global ``Window.orderBy``) collapses the
entire dataset onto one executor.

Right-side rows sort before left-side rows at equal timestamps, so a
right row at exactly the left row's time matches (inclusive backward —
DuckDB ``ASOF JOIN ... ON l.t >= r.t`` semantics; validated against it
by the ``asof_join_events`` oracle query).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..utils import UnpersistHandle, backticks, distinct_prefix_for

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Union[str, Sequence[str], None] = None,
    tolerance: Optional[Column] = None,
    right_prefix: str = "right",
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    unpersist_handle: Optional[UnpersistHandle] = None,
) -> DataFrame:
    """For every ``left`` row, attach the ``right`` row with the largest
    ``on`` value ≤ the left row's ``on`` value, matching on the optional
    ``by`` key columns.

    Right payload columns appear as ``{right_prefix}_{name}`` (null when
    no right row precedes).  ``tolerance`` (a Column interpreted in the
    units of ``on``'s difference, e.g. ``F.lit(60)`` for integer-second
    times) discards matches older than ``on - tolerance``.

    If ``right`` has several rows at the same (key, time), the one
    emitted is the last in the union's sort — deduplicate first if that
    matters.

    ``storage_level``/``unpersist_handle`` apply only to the keyless
    path (``by=None``), which persists the range-partitioned union to
    pin partition ids across its two plan branches.
    """
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

    value_cols = [c for c in right.columns if c != on and c not in by_cols]
    left_cols = list(left.columns)

    tagged_right = right.select(
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
    if by_cols:
        w = (
            Window.partitionBy(*[F.col(backticks(c)) for c in by_cols])
            .orderBy(F.col(on), F.col(side))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = union.withColumn(payload, F.last(payload, ignorenulls=True).over(w))
    else:
        merged = _keyless_backward_fill(
            union, on, side, payload, prefix, storage_level, unpersist_handle
        )

    matched = merged.where(F.col(side) == 1)
    match_col = F.col(payload)
    if tolerance is not None:
        match_col = F.when(
            F.col(on) - match_col[right_on] <= tolerance, match_col
        )

    projection = (
        [F.col(backticks(c)) for c in by_cols]
        + [F.col(on)]
        + [F.col(backticks(prefix + c)).alias(c) for c in left_cols
           if c != on and c not in by_cols]
        + [match_col[right_on].alias(f"{right_prefix}_{on}")]
        + [match_col[c].alias(f"{right_prefix}_{c}") for c in value_cols]
    )
    return matched.select(*projection)


def _keyless_backward_fill(
    union: DataFrame,
    on: str,
    side: str,
    payload: str,
    prefix: str,
    storage_level: StorageLevel,
    unpersist_handle: Optional[UnpersistHandle],
) -> DataFrame:
    """Carry the latest non-null ``payload`` forward in global
    (``on``, ``side``) order WITHOUT a single-partition window.

    1. range-partition the union by (on, side) — globally ordered
       across partitions, parallel within;
    2. persist to pin ``spark_partition_id`` (a correctness barrier:
       both branches below must observe the same assignment);
    3. backward-fill within each partition in parallel windows;
    4. reduce each partition to its last non-null payload (≤ one row
       per partition), prefix-scan those in one tiny window to get each
       partition's carry-in, and broadcast-join the carry back.
    """
    if storage_level is None:
        raise ValueError(
            "keyless asof_join requires a real storage level: the persist pins "
            "the range partitioning both plan branches depend on"
        )
    pid = prefix + "partition_id"
    carry = prefix + "carry"

    ranged = (
        union.repartitionByRange(F.col(on), F.col(side))
        .withColumn(pid, F.spark_partition_id())
        .persist(storage_level)
    )
    if unpersist_handle is not None:
        unpersist_handle.set_dataframe(ranged)

    local_w = (
        Window.partitionBy(pid)
        .orderBy(F.col(on), F.col(side))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ranged.withColumn(payload, F.last(payload, ignorenulls=True).over(local_w))

    # one row per partition: the payload of its latest (on, side) row
    # that has one (max_by skips rows whose ordering struct is null)
    last_per_partition = ranged.groupBy(pid).agg(
        F.max_by(
            F.col(payload),
            F.when(F.col(payload).isNotNull(), F.struct(F.col(on), F.col(side))),
        ).alias(payload)
    )
    carries = last_per_partition.select(
        F.col(pid),
        F.last(payload, ignorenulls=True)
        .over(Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1))
        .alias(carry),
    )

    return (
        filled.join(F.broadcast(carries), pid, "left")
        .withColumn(payload, F.coalesce(F.col(payload), F.col(carry)))
        .drop(pid, carry)
    )
