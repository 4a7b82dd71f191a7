"""Data profiling: per-column null counts, distinct counts, and value
ranges for an entire table in ONE pass.

The profile is a single aggregate over the table — every per-column
statistic is an aggregate expression, so Spark computes all of them in
one map-side-combined scan (no per-column jobs, no driver loop over
columns).  The one-row result is then unpivoted to one row per column
with ``stack`` — a projection over a single row, free at any scale.

Distinct counts default to ``approx_count_distinct`` (HLL-based,
single-pass, constant state per column — the only sane choice at
100 TB).  ``exact=True`` switches to exact ``count_distinct``, which
Catalyst plans via an ``Expand`` (the scan is replicated once per
DISTINCT aggregate through the shuffle) — fine at audit scale, ~#cols×
shuffle volume at corpus scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile"]


def profile(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """One row per column: ``(col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value)``.  ``min_value``/``max_value`` are cast to
    string so heterogeneous column types share one schema.

    ``rsd`` is the target relative standard deviation of the
    approximate distinct count (ignored when ``exact=True``).
    """
    cols = list(columns) if columns is not None else [c for c, _ in df.dtypes]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        distinct = (
            F.count_distinct(col) if exact else F.approx_count_distinct(col, rsd)
        )
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__nn_{c}"),
            distinct.alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(
            f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
        )
        + ") as (col_name, n_nulls, n_distinct, min_value, max_value)"
    )
    return one.select(F.col("__n").alias("n_rows"), F.expr(stack)).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )
