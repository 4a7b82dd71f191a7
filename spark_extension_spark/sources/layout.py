"""Z-order (Morton-curve) data layout: cluster multi-dimensional data
so parquet min/max stats prune on *every* ordered dimension, not just
the first sort key.

A plain ``ORDER BY (a, b)`` layout gives perfect pruning on ``a`` and
none on ``b``; interleaving the bits of both keys gives near-balanced
pruning on each — the standard lakehouse layout trick (Delta/Iceberg
``OPTIMIZE ZORDER BY``) for point/range lookups into a 100 TB table.

Pure column algebra: per-column min/max from one tiny aggregate
(joined back broadcast — no collect), fixed-point scaling with integer
division, and an unrolled shift/mask bit interleave — all inside
whole-stage codegen, no UDF anywhere.  The write is one range
exchange on the z-value (disjoint z-ranges per file) + an in-partition
sort, exactly the ``writePartitionedBy`` cost shape.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "with_z_value", "write_zordered", "with_hilbert_value", "write_hilbert"]


def z_value(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of already-scaled non-negative
    integer columns (column *i* owns bit positions ``b*len(cols)+i``).
    With k columns the result occupies ``bits*k`` bits — keep ≤ 63."""
    n = len(cols)
    if n == 0:
        raise ValueError("z_value needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed long")
    out: Optional[Column] = None
    for i, c in enumerate(cols):
        for b in range(bits):
            term = F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            out = term if out is None else out + term  # disjoint bits: + == OR
    return out


def with_z_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "z_value",
) -> DataFrame:
    """Attach the z-value of ``cols`` (numeric), min/max-scaled to
    ``bits`` bits per column.

    Scaling is exact integer arithmetic: ``(v - min) * (2^bits - 1)
    div (max - min)`` — valid while ``(max - min) * (2^bits - 1)``
    fits a long, i.e. per-column range < 2^47 at the default 16 bits.
    Constant columns scale to 0; the min/max aggregate is one tiny
    row joined back broadcast, so the data never shuffles for it.
    """
    scale = (1 << bits) - 1
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("long").alias(f"__mn_{c}"),
            F.max(c).cast("long").alias(f"__mx_{c}"),
        ]
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    scaled = [
        F.expr(
            f"(CAST(`{c}` AS BIGINT) - `__mn_{c}`) * {scale} DIV "
            f"GREATEST(`__mx_{c}` - `__mn_{c}`, CAST(1 AS BIGINT))"
        )
        for c in cols
    ]
    return joined.withColumn(out_col, z_value(scaled, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: Optional[int] = None,
    format: str = "parquet",
    mode: str = "error",
) -> None:
    """Write ``df`` clustered by the z-order of ``cols``: one range
    exchange on the z-value (files own disjoint z-ranges, so their
    per-column min/max footers are tight on every dimension) + an
    in-partition sort.  The z column itself is not written."""
    zdf = with_z_value(df, cols, bits, out_col="__z")
    if num_files is not None:
        zdf = zdf.repartitionByRange(num_files, "__z")
    else:
        zdf = zdf.repartitionByRange("__z")
    (
        zdf.sortWithinPartitions("__z")
        .drop("__z")
        .write.format(format)
        .mode(mode)
        .save(path)
    )


def with_hilbert_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "h_value",
) -> DataFrame:
    """Attach the 2-D Hilbert-curve index of ``cols`` (numeric,
    min/max-scaled to ``bits`` bits per column — same exact integer
    scaling as :func:`with_z_value`).

    One tiny min/max aggregate broadcast back, then ONE higher-order
    ``aggregate()`` expression folding the classic per-level quadrant
    walk over ``sequence(bits-1, 0)``::

        s = 2^level; rx = bit(x, level); ry = bit(y, level)
        d += s*s*((3*rx) XOR ry)
        if ry == 0: {if rx == 1: x,y = n-1-x, n-1-y}; swap(x, y)

    The walk is a single expression node (a fold with a struct
    accumulator), not ``bits`` chained projections: chained
    ``withColumns`` produce an alias chain that Catalyst re-substitutes
    whenever a predicate references the (nullable) output, and at
    16 levels that blows the driver heap.  The fold keeps the plan
    O(1)-sized, so filters/joins/range-partitioning over ``out_col``
    optimize cheaply.  The reflect-and-swap step is pure integer
    arithmetic (no CASE), so a NULL coordinate propagates to a NULL
    curve value — matching :func:`with_z_value`; NULL rows range-sort
    together into the first partition instead of scattering across the
    curve and defeating min/max pruning.  No UDF, no shuffle.  Write
    with ``repartitionByRange(out_col)`` + in-partition sort for the
    clustered layout (same recipe as :func:`write_zordered`).
    """
    if len(cols) != 2:
        raise ValueError(f"hilbert layout is 2-D: need exactly 2 cols, got {len(cols)}")
    if bits < 1 or bits * 2 > 62:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    cx, cy = cols
    scale = (1 << bits) - 1
    n = 1 << bits
    stats = df.agg(
        F.min(cx).cast("long").alias("__mn_x"),
        F.max(cx).cast("long").alias("__mx_x"),
        F.min(cy).cast("long").alias("__mn_y"),
        F.max(cy).cast("long").alias("__mx_y"),
    )
    out = df.crossJoin(F.broadcast(stats)).withColumns(
        {
            "__hx": F.expr(
                f"(CAST(`{cx}` AS BIGINT) - `__mn_x`) * {scale} DIV "
                f"GREATEST(`__mx_x` - `__mn_x`, CAST(1 AS BIGINT))"
            ),
            "__hy": F.expr(
                f"(CAST(`{cy}` AS BIGINT) - `__mn_y`) * {scale} DIV "
                f"GREATEST(`__mx_y` - `__mn_y`, CAST(1 AS BIGINT))"
            ),
        }
    )
    one = F.lit(1).cast("long")
    nm1 = F.lit(n - 1).cast("long")
    levels = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))
    acc0 = F.struct(
        F.col("__hx").alias("x"),
        F.col("__hy").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, lvl):
        # s = 2^level, exact through double pow for level <= 52
        s = F.pow(F.lit(2.0), lvl.cast("double")).cast("long")
        # bit extraction without CASE: (x & s) is 0 or s, exact /s
        rx = (acc["x"].bitwiseAND(s) / s).cast("long")
        ry = (acc["y"].bitwiseAND(s) / s).cast("long")
        d_new = acc["d"] + (s * s) * (
            (F.lit(3).cast("long") * rx).bitwiseXOR(ry)
        )
        x, y = acc["x"], acc["y"]
        # ry==1: keep; ry==0 & rx==0: swap; ry==0 & rx==1: reflect+swap
        x_new = ry * x + (one - ry) * ((one - rx) * y + rx * (nm1 - y))
        y_new = ry * y + (one - ry) * ((one - rx) * x + rx * (nm1 - x))
        return F.struct(x_new.alias("x"), y_new.alias("y"), d_new.alias("d"))

    return out.withColumn(
        out_col, F.aggregate(levels, acc0, step, lambda acc: acc["d"])
    ).drop("__hx", "__hy", "__mn_x", "__mx_x", "__mn_y", "__mx_y")


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: Optional[int] = None,
    format: str = "parquet",
    mode: str = "error",
) -> None:
    """Write ``df`` clustered by the Hilbert index of ``cols`` — one
    range exchange + in-partition sort, same cost shape as
    :func:`write_zordered` with strictly better multi-dimensional
    locality."""
    hdf = with_hilbert_value(df, cols, bits, out_col="__h")
    if num_files is not None:
        hdf = hdf.repartitionByRange(num_files, "__h")
    else:
        hdf = hdf.repartitionByRange("__h")
    (
        hdf.sortWithinPartitions("__h")
        .drop("__h")
        .write.format(format)
        .mode(mode)
        .save(path)
    )
