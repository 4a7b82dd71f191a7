"""Histogram: per-group counts of a value column in threshold bins.

Parity: reference src/main/scala/uk/co/gresearch/spark/Histogram.scala:25-97.
Output columns ``≤t1, ≤t2, …, >tn`` (exact reference naming), one row per
distinct combination of the aggregate columns.

Scale shape: the bin indicators are a pure projection (whole-stage
codegen) and the aggregation is a standard hash aggregate with map-side
partial aggregation — a single shuffle of #groups × #bins longs,
independent of input row count.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["histogram"]


def histogram(
    df: DataFrame,
    thresholds: Sequence,
    value_column: Union[str, Column],
    *aggregate_columns: Union[str, Column],
) -> DataFrame:
    """Threshold-binned histogram per group: one row per group with
    ``≤t`` / ``>t_max`` bin counts (reference Histogram.scala:25-97).
    A single map-side-combined hash aggregate; shuffle size is
    #groups × #bins longs."""
    if len(thresholds) == 0:
        raise ValueError("Thresholds must not be empty")
    if len(set(thresholds)) != len(thresholds):
        raise ValueError("Thresholds must not contain duplicates: "
                         + ", ".join(str(t) for t in thresholds))

    ordered = sorted(thresholds)
    value = F.col(value_column) if isinstance(value_column, str) else value_column
    aggs = [F.col(c) if isinstance(c, str) else c for c in aggregate_columns]

    def indicator(cond: Column) -> Column:
        return F.when(cond, 1).otherwise(0)

    bins = [(f"≤{ordered[0]}", indicator(value <= ordered[0]))]
    bins += [
        (f"≤{hi}", indicator((value > lo) & (value <= hi)))
        for lo, hi in zip(ordered, ordered[1:])
    ]
    bins.append((f">{ordered[-1]}", indicator(value > ordered[-1])))

    flagged = df.select(*aggs, *[col.alias(name) for name, col in bins])
    # aggregate columns are the leading columns of the projection;
    # reference by position so expression-valued aggregates work too
    group_cols = [flagged[i] for i in range(len(aggs))]
    # coalesce: a global aggregate over zero rows sums to NULL, but an
    # empty histogram's counts are 0
    return flagged.groupBy(*group_cols).agg(
        *[F.coalesce(F.sum(F.col(f"`{name}`")), F.lit(0)).alias(name) for name, _ in bins]
    )
