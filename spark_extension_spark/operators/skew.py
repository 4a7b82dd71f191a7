"""Skew-aware join helpers.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin.enabled``)
covers sort-merge joins automatically; explicit salting remains the
tool when a handful of hot keys dominate a shuffle (the classic
power-law key problem at 100 TB) and AQE cannot split them — e.g.
aggregations-after-join or non-SMJ plans.

``salted_join`` implements the standard construction: the skewed
(large) side scatters each hot key across ``salt`` sub-keys; the small
side is replicated ``salt`` times; the join runs on (key, salt) so one
hot key occupies ``salt`` reducers instead of one.  Results are
identical to the unsalted equi-join (verified by oracle query
``salted_join_lineitem_orders``).
"""

from __future__ import annotations

from typing import List, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import distinct_prefix_for

__all__ = ["salted_join", "with_salt", "heavy_keys"]


def heavy_keys(df: DataFrame, keys: Sequence[str], k: int = 10) -> DataFrame:
    """The diagnostic that decides whether :func:`salted_join` (or a
    bucket cap, or AQE skew handling) is needed at all: the ``k``
    heaviest join/group keys with their row counts and share of the
    table.

    Plan: one map-side-combined count aggregate keyed by ``keys``, a
    global top-k via ``row_number`` over the *aggregated* (per-key)
    rows, and a 1-row total **broadcast** for the share — the input is
    scanned once and shuffles only (key, count) pairs.  Share divides
    two longs in double precision (exact for realistic counts), rank
    ties break by key for determinism.

    Returns ``keys..., n_rows (long), share (double), rank (int)``.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*[F.col(c) for c in keys]).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    w = Window.orderBy(F.col("n_rows").desc(), *[F.col(c).asc() for c in keys])
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__total").cast("double")).alias("share"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def with_salt(df: DataFrame, buckets: int, salt_col: str) -> DataFrame:
    """Attach a deterministic salt in ``[0, buckets)``.

    ``monotonically_increasing_id`` spreads rows evenly regardless of
    key values (hash-of-row salting would send identical rows to the
    same bucket, defeating the purpose for exact-duplicate hot rows).
    """
    return df.withColumn(
        salt_col, (F.monotonically_increasing_id() % buckets).cast("int")
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Union[str, Sequence[str]],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed``'s join keys are heavily skewed and
    ``small`` is too large to broadcast: scatter + replicate so each hot
    key runs on ``salt`` reducers.

    Supported join types: inner / left / left_semi (the replicated side
    would break right/full semantics).
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, got: {how}"
        )
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    prefix = distinct_prefix_for(list(skewed.columns) + list(small.columns))
    salt_col = prefix + "salt"

    left = with_salt(skewed, salt, salt_col)
    right = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = left.join(right, keys + [salt_col], how)
    return joined.drop(salt_col)
