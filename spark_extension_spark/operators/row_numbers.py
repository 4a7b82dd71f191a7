"""Globally contiguous row numbers 1..N without collapsing the dataset
into a single window partition.

Parity: reference src/main/scala/uk/co/gresearch/spark/RowNumbers.scala:43-95
(algorithm documented in reference ROW_NUMBER.md).  The naive
``row_number().over(Window.orderBy(...))`` moves *all* rows into one
partition on one executor; this operator instead:

1. sorts globally (range exchange) — or keeps current order via
   ``monotonically_increasing_id`` when no order is given;
2. pins the partitioning with ``persist`` so two consumers observe the
   same ``spark_partition_id`` (a deliberate optimization *barrier*);
3. computes a local row number per Spark partition (parallel windows);
4. aggregates per-partition counts — ≤ #partitions rows — and prefix-sums
   them in a single tiny window;
5. joins the offsets back (broadcast under AQE: the offsets table has one
   row per partition) and adds.

At 100 TB the only single-threaded step sees one row per partition.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..utils import UnpersistHandle, backticks, distinct_prefix_for

__all__ = ["with_row_numbers"]


def with_row_numbers(
    df: DataFrame,
    row_number_column_name: str = "row_number",
    order: Union[str, Column, Sequence, None] = None,
    ascending: Union[bool, Sequence[bool]] = True,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    unpersist_handle: Optional[UnpersistHandle] = None,
) -> DataFrame:
    """Attach global row numbers without a single-partition window —
    the reference's 5-step algorithm (RowNumbers.scala:24-116):
    per-partition windows, a ≤#partitions prefix sum, broadcast
    offsets join."""
    prefix = distinct_prefix_for(df.columns)
    pid = prefix + "partition_id"
    local_rn = prefix + "local_row_number"
    max_rn = prefix + "max_row_number"
    offset = prefix + "cumulative_offset"
    mono = prefix + "mono_id"

    order_cols = _order_columns(order, ascending)
    if order_cols:
        prepared = df.orderBy(*order_cols)
        window_order = order_cols
    else:
        # keep the existing order: monotonically_increasing_id is
        # monotone within each partition and partition-major overall
        prepared = df.withColumn(mono, F.monotonically_increasing_id())
        window_order = [F.col(mono)]

    if storage_level is None:
        # the persist is a correctness barrier, not an optimization: the
        # local-row-number branch and the offsets branch must observe the
        # SAME spark_partition_id assignment, which only the cache pins
        # (the reference's RowNumbers.scala guards StorageLevel.NONE the
        # same way on Spark >= 3.5)
        raise ValueError(
            "with_row_numbers requires a real storage level: the persist pins "
            "the partitioning both plan branches depend on (use "
            "StorageLevel.MEMORY_AND_DISK, and an unpersist_handle to release it)"
        )
    pinned = prepared.withColumn(pid, F.spark_partition_id()).persist(storage_level)
    if unpersist_handle is not None:
        unpersist_handle.set_dataframe(pinned)

    local = pinned.withColumn(
        local_rn,
        F.row_number().over(Window.partitionBy(pid).orderBy(*window_order)),
    )

    # one row per partition; the global window below is single-partition
    # but over ≤ #partitions rows — that is the whole point
    offsets = (
        local.groupBy(pid)
        .agg(F.max(local_rn).alias(max_rn))
        .withColumn(
            offset,
            F.coalesce(
                F.sum(max_rn).over(
                    Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(pid, offset)
    )

    drop = [pid, local_rn, offset] + ([] if order_cols else [mono])
    return (
        local.join(F.broadcast(offsets), pid, "left")
        .withColumn(row_number_column_name, F.col(local_rn) + F.col(offset))
        .drop(*drop)
    )


def _order_columns(order, ascending):
    if order is None:
        return []
    if isinstance(order, (str, Column)):
        order = [order]
    cols = [F.col(backticks(c)) if isinstance(c, str) else c for c in order]
    if isinstance(ascending, bool):
        flags = [ascending] * len(cols)
    else:
        flags = list(ascending)
        if len(flags) != len(cols):
            raise ValueError("Length of ascending must match length of order")
    return [c if asc else c.desc() for c, asc in zip(cols, flags)]
