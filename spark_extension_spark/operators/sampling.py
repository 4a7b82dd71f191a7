"""Deterministic, reproducible sampling for training-data curation.

Spark's ``sample``/``sampleBy`` draw from per-partition RNG streams, so
results change with partitioning, retries, and cluster size — unacceptable
for a 100 TB corpus where the sampled set must be reproducible, auditable,
and stable under re-runs.  Everything here derives a uniform [0, 1) value
from ``md5(seed ':' id)`` instead: a pure projection (JVM codegen, no
shuffle, no RNG state), independent of partitioning, and identical across
engines (the md5-prefix→int64 trick is exact in both Spark and DuckDB,
which is what the oracle gates rely on).

Ops:
- :func:`hash_uniform` — the [0, 1) column.
- :func:`hash_sample` — Bernoulli sample at a fixed rate.
- :func:`stratified_sample` — per-stratum rates (e.g. downsample dominant
  languages, keep the tail).
- :func:`assign_splits` — disjoint train/validation/test assignment from
  one hash draw, so splits never overlap and never drift between runs.
"""

from __future__ import annotations

from typing import Dict, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_uniform",
    "hash_uniform_sql",
    "hash_sample",
    "stratified_sample",
    "assign_splits",
    "assign_splits_sql",
]

_TWO_32 = float(2**32)


def _col(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_uniform(id_col: Union[str, Column], seed: int = 42) -> Column:
    """Uniform double in [0, 1) derived from md5 of (seed, id) — the
    first 8 hex chars as an int64 over 2^32.  Deterministic across runs,
    partitionings, and engines."""
    key = F.concat(F.lit(f"{int(seed)}:"), _col(id_col).cast("string"))
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return bucket / F.lit(_TWO_32)


def hash_uniform_sql(id_expr: str, seed: int = 42) -> str:
    """DuckDB expression computing exactly :func:`hash_uniform` — kept in
    lock-step for the oracle gates."""
    return (
        f"(CAST(CONCAT('0x', substr(md5(CONCAT('{int(seed)}:', "
        f"CAST({id_expr} AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0)"
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: Union[str, Column],
    seed: int = 42,
) -> DataFrame:
    """Keep rows whose hash draw falls below ``fraction``.  Unlike
    ``DataFrame.sample`` this is a pure filter — pushed into the scan,
    stable under repartitioning, and re-runnable byte-for-byte."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_uniform(id_col, seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: Union[str, Column],
    fractions: Dict[object, float],
    id_col: Union[str, Column],
    seed: int = 42,
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (strata value → fraction); strata not
    listed get ``default``.  The whole predicate is one CASE projection —
    no shuffle, no per-stratum pass, scan-speed at any scale."""
    for value, fraction in fractions.items():
        if not 0.0 <= fraction <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1], got {fraction}")
    strata = _col(strata_col)
    rate: Column = F.lit(float(default))
    for value, fraction in fractions.items():
        rate = F.when(strata == F.lit(value), F.lit(float(fraction))).otherwise(rate)
    return df.where(hash_uniform(id_col, seed) < rate)


def assign_splits(
    df: DataFrame,
    weights: Dict[str, float],
    id_col: Union[str, Column],
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """Assign each row to exactly one named split with probability
    proportional to ``weights`` (normalized).  One hash draw against the
    cumulative thresholds → splits are disjoint, exhaustive, and frozen
    for a given seed no matter how the data is later re-partitioned."""
    if not weights:
        raise ValueError("weights must not be empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = hash_uniform(id_col, seed)
    names = list(weights)
    expr: Column = F.lit(names[-1])
    cumulative = 0.0
    thresholds = []
    for name in names[:-1]:
        cumulative += float(weights[name]) / total
        thresholds.append((name, cumulative))
    for name, threshold in reversed(thresholds):
        expr = F.when(u < F.lit(threshold), F.lit(name)).otherwise(expr)
    return df.withColumn(out, expr)


def assign_splits_sql(
    id_expr: str, weights: Dict[str, float], seed: int = 42
) -> str:
    """DuckDB CASE expression in lock-step with :func:`assign_splits`."""
    total = float(sum(weights.values()))
    u = hash_uniform_sql(id_expr, seed)
    names = list(weights)
    branches = []
    cumulative = 0.0
    for name in names[:-1]:
        cumulative += float(weights[name]) / total
        branches.append(f"WHEN {u} < {cumulative!r} THEN '{name}'")
    return "CASE " + " ".join(branches) + f" ELSE '{names[-1]}' END"
