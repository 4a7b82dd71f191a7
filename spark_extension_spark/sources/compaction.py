"""Small-file compaction planning and execution.

The chronic failure mode of streaming/incremental ingestion at scale is
millions of KB-sized parquet files: every query pays per-file open
cost, the driver pays per-file planning cost, and row-group-level
statistics stop pruning anything.  The fix is periodic compaction —
rewrite each partition's small files into ~target-sized ones (what
Delta's OPTIMIZE / Iceberg's rewrite_data_files do for their formats).

This module provides the planner as a pure DataFrame transformation
(auditable, engine-replayable, testable against a SQL oracle) and a
thin executor that rewrites one planned bin per output file.

Reference parity note: the reference library exposes parquet file/block
metadata (SURVEY.md §2.2) but no compaction; this composes with
:mod:`~spark_extension_spark.sources.parquet_metadata` as the obvious
next step a warehouse user takes with that metadata.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["plan_compaction", "compact_files"]


def plan_compaction(
    files: DataFrame,
    target_bytes: int,
    file_col: str = "filename",
    size_col: str = "bytes",
    by: Sequence[str] = (),
) -> DataFrame:
    """Assign every file to a compaction bin of ~``target_bytes``:
    adds ``bin`` (0-based, per ``by`` group) such that files are packed
    in deterministic ``file_col`` order and a new bin starts whenever
    the running total crosses a target boundary —
    ``bin = floor(exclusive_prefix_sum / target_bytes)``.

    Properties of this closed-form packing (vs first-fit-decreasing):

    - deterministic and order-stable — the plan replays identically
      across engines and runs, so it can be audited before execution
      and re-derived after;
    - every bin except the last of each group holds ≥ ``target_bytes``
      *starting* bytes; a file straddling a boundary stays in the bin
      where its start fell, so bins can overshoot by at most one file
      — the standard, harmless tolerance (Delta OPTIMIZE behaves the
      same way);
    - one window pass over the *file list* (thousands of rows per
      partition, not data rows), so planning cost is negligible even
      for a million-file table.

    ``by`` scopes bins to hive partitions — compaction must never merge
    across partition values or the layout (and partition pruning) is
    destroyed.  Files larger than ``target_bytes`` get a bin of their
    own (the formula gives this for free: the next file's prefix sum
    already crossed the boundary).
    """
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    keys = [F.col(c) for c in by]
    w = Window.partitionBy(*keys).orderBy(F.col(file_col).asc())
    cum_excl = F.coalesce(
        F.sum(F.col(size_col)).over(w) - F.col(size_col), F.lit(0)
    )
    return files.withColumn(
        "bin", F.floor(cum_excl / F.lit(int(target_bytes))).cast("long")
    )


def compact_files(
    spark: SparkSession,
    plan: DataFrame,
    dest: str,
    file_col: str = "filename",
    compression: Optional[str] = None,
) -> DataFrame:
    """Execute a :func:`plan_compaction` plan: each bin's files are read
    together and rewritten as ONE parquet file under ``dest``; returns
    a (bin, n_files) summary.

    The rewrite is per-bin ``coalesce(1)`` over only that bin's files —
    parallelism comes from bins being independent (at cluster scale,
    run bins as separate jobs or let the scheduler overlap them; a bin
    is ~target-sized by construction, so one task per bin is the right
    granularity, not a bottleneck).  Driver materialization is the
    file→bin map — file-list-sized, not data-sized.
    """
    rows = plan.select(file_col, "bin").collect()
    bins: dict = {}
    for r in rows:
        bins.setdefault(r["bin"], []).append(r[file_col])
    writer_opts = {"compression": compression} if compression else {}
    for b, paths in sorted(bins.items()):
        part = spark.read.parquet(*paths).coalesce(1)
        w = part.write.mode("append")
        for k, v in writer_opts.items():
            w = w.option(k, v)
        w.parquet(dest)
    return spark.createDataFrame(
        [(int(b), len(paths)) for b, paths in sorted(bins.items())],
        "bin long, n_files long",
    )
