"""Time-series rollups: hypertable-style bucketed aggregation and
range (interval) joins, Spark-first.

``time_bucket`` is integer floor-division on the epoch — a pure
projection, so bucketed rollups are a single hash aggregate (map-side
partial + one shuffle of #buckets×#groups rows), the same cost shape as
any continuous-aggregate system.  Range joins need no custom operator
in Spark: a broadcast non-equi join handles band lookup (see
``range_join_bands``), and AQE handles the large-large case.
"""

from __future__ import annotations

from typing import Dict, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["time_bucket", "time_bucket_rollup", "range_join_bands"]


def time_bucket(ts: Union[str, Column], width_seconds: int) -> Column:
    """Bucket start (timestamp) of the fixed-width window containing
    ``ts``.  Equivalent to DuckDB/Timescale ``time_bucket(interval, ts)``."""
    col = F.col(ts) if isinstance(ts, str) else ts
    epoch = F.unix_micros(col.cast("timestamp"))
    width_us = width_seconds * 1_000_000
    # floored modulo in pure int64 arithmetic: Spark's % truncates toward
    # zero, which would round pre-1970 (negative-epoch) timestamps UP to
    # the wrong bucket — time_bucket semantics require flooring
    floored_mod = ((epoch % width_us) + width_us) % width_us
    return F.timestamp_micros((epoch - floored_mod).cast("long"))


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    aggregates: Dict[str, Column],
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Continuous-aggregate-style rollup: one row per (bucket, group)
    with the given aggregate expressions."""
    bucket = time_bucket(ts_col, width_seconds).alias("bucket")
    return (
        df.groupBy(bucket, *[F.col(c) for c in group_by])
        .agg(*[expr.alias(name) for name, expr in aggregates.items()])
    )


def range_join_bands(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    low_col: str = "low",
    high_col: str = "high",
) -> DataFrame:
    """Attach the band whose [low, high) interval contains the value —
    the classic dimension range join.  The band table broadcasts, so the
    non-equi condition never becomes a shuffled cross product."""
    cond = (F.col(value_col) >= bands[low_col]) & (F.col(value_col) < bands[high_col])
    return facts.join(F.broadcast(bands), cond, "left")
