"""Bucketed tables: pre-shuffled storage for shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated big-big equi-join is re-shuffling
both sides on every query.  Hash-bucketing both tables on the join key at
write time moves that shuffle into the (one-off) write: a join of two
tables bucketed on the same keys with the same bucket count plans as a
SortMergeJoin with **zero Exchange operators** — each task reads matching
bucket files from both sides.

This is Spark's native bucketing (``DataFrameWriter.bucketBy`` +
``saveAsTable``); the helpers here make the write/read/join pattern
explicit and testable.  The plan contract (no exchange on either side) is
pinned by ``tests/test_bucketed.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "colocated_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_columns: Sequence[str],
    sort_columns: Sequence[str] = (),
    path: Optional[str] = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally per-bucket-sorted) table.
    ``path`` makes it an external table; both sides of a future co-located
    join must use the same ``n_buckets`` and join on ``bucket_columns``."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if not bucket_columns:
        raise ValueError("bucket columns must not be empty")
    writer = df.write.format(format).mode(mode).bucketBy(n_buckets, *bucket_columns)
    if sort_columns:
        writer = writer.sortBy(*sort_columns)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (``spark.table`` — the bucket spec only
    survives through the catalog, not ``spark.read.parquet``)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Union[Sequence[str], Column],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket columns
    (``on`` is a name list, or an equi-condition Column when the bucket
    columns are named differently on the two sides).  With matching
    bucket specs Catalyst plans this without any Exchange — the shuffle
    was paid once at write time."""
    condition = on if isinstance(on, Column) else list(on)
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), condition, how
    )
