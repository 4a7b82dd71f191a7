"""Sequence packing: place an ordered stream of documents into
fixed-capacity token blocks (GPT-style concatenate-and-chunk).

``pack_blocks`` computes, for every document, the exclusive running token
total before it and the first/last block index it lands in when the
corpus is concatenated in order and cut every ``capacity`` tokens.  This
is the closed-form (window) formulation of pretraining data packing — no
stateful scan, no driver loop.

The running total is the hard part at scale: a bare
``Window.orderBy(...)`` collapses the dataset into ONE partition (the
same trap the reference documents for global row numbers,
ROW_NUMBER.md:4-8).  :func:`with_running_total` reuses the reference's
5-step fix (RowNumbers.scala:43-95, already implemented in
``row_numbers.py``): range-sort, pin partitioning with persist, local
per-partition cumulative sums, prefix-sum the ≤ #partitions per-partition
totals, broadcast-join the offsets back.  The only serial step sees one
row per partition.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from ..utils import UnpersistHandle, backticks, distinct_prefix_for

__all__ = [
    "with_running_total",
    "pack_blocks",
    "length_batches",
    "padding_report",
]


def _cols(cols: Sequence[Union[str, Column]]):
    return [F.col(backticks(c)) if isinstance(c, str) else c for c in cols]


def with_running_total(
    df: DataFrame,
    value_col: Union[str, Column],
    order: Sequence[Union[str, Column]],
    by: Sequence[str] = (),
    out: str = "running_total",
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    unpersist_handle: Optional[UnpersistHandle] = None,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` in ``order``.

    With ``by`` keys this is an ordinary per-key window (one hash
    shuffle, fully parallel).  Without keys it is the *global* prefix
    sum, computed scalably with the partition-offsets technique instead
    of a single-partition window.

    Integral inputs total in exact int64; fractional/decimal inputs
    keep their own type (a blanket ``cast('long')`` here would
    silently truncate every fractional value — [0.7, −0.3, 0.9] would
    "total" to [0, 0, 0])."""
    value = _cols([value_col])[0]
    vtype = df.select(value).schema[0].dataType
    if not isinstance(vtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        value = value.cast("long")
    order_cols = _cols(order)
    if by:
        w = (
            Window.partitionBy(*_cols(by))
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out, F.sum(value).over(w))

    prefix = distinct_prefix_for(df.columns)
    pid = prefix + "partition_id"
    local_sum = prefix + "local_sum"
    part_total = prefix + "partition_total"
    offset = prefix + "offset"

    # 1) global range sort; 2) persist pins the partition assignment both
    # plan branches below depend on (same barrier as with_row_numbers)
    pinned = (
        df.orderBy(*order_cols)
        .withColumn(pid, F.spark_partition_id())
        .persist(storage_level)
    )
    if unpersist_handle is not None:
        unpersist_handle.set_dataframe(pinned)

    # 3) per-partition inclusive cumulative sum — parallel windows
    local_w = (
        Window.partitionBy(pid)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pinned.withColumn(local_sum, F.sum(value).over(local_w))

    # 4) one row per partition, prefix-summed in a tiny single window.
    # The partition total is a plain SUM over the pinned input — NOT
    # max(local_sum): the max of an inclusive cumulative sum equals the
    # total only when every value is non-negative, and this operator is
    # a general running sum (deltas/balances may go negative).  Summing
    # from `pinned` also skips the window entirely on this branch.
    offsets = (
        pinned.groupBy(pid)
        .agg(F.sum(value).alias(part_total))
        .withColumn(
            offset,
            F.coalesce(
                F.sum(part_total).over(
                    Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(pid, offset)
    )

    # 5) broadcast the offsets back and add
    return (
        local.join(F.broadcast(offsets), pid, "left")
        .withColumn(out, F.col(local_sum) + F.col(offset))
        .drop(pid, local_sum, offset)
    )


def pack_blocks(
    df: DataFrame,
    token_col: Union[str, Column],
    capacity: int,
    order: Sequence[Union[str, Column]],
    by: Sequence[str] = (),
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    unpersist_handle: Optional[UnpersistHandle] = None,
) -> DataFrame:
    """Concatenate-and-chunk packing: documents are laid out in ``order``
    (within each ``by`` shard, or globally) and the token stream is cut
    every ``capacity`` tokens.  Adds:

    - ``tokens_before`` — exclusive running token total (the document's
      start offset in the concatenated stream);
    - ``block_first`` / ``block_last`` — 0-based indices of the blocks
      this document's tokens fall into (a document may straddle a block
      boundary — exactly how pretraining pipelines pack).

    Empty documents (0 tokens) get ``block_last = block_first``.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    tokens = _cols([token_col])[0].cast("long")
    cum = "__pack_cum"
    out = with_running_total(
        df,
        tokens,
        order=order,
        by=by,
        out=cum,
        storage_level=storage_level,
        unpersist_handle=unpersist_handle,
    )
    cap = F.lit(int(capacity))
    # Exactness bound for the double-mediated floor-division below: a
    # long n < 2^53 is exactly representable, and floor(n / cap) can
    # only misround when the division's relative error (<= q·2^-53,
    # q = block index) reaches the 1/cap gap to the next boundary —
    # i.e. only once the token total n exceeds 2^52 ≈ 4.5e15 tokens
    # (~180x a 100 TB corpus).  Inside that domain the indices are
    # provably exact; interval_join's axis had no such bound (ns
    # epochs exceed 2^52 today), which is why it moved to pure-int64
    # cells while this stays on the simpler form.
    return (
        out.withColumn("tokens_before", F.col(cum) - tokens)
        .withColumn("block_first", F.floor(F.col("tokens_before") / cap))
        .withColumn(
            "block_last",
            F.when(tokens > 0, F.floor((F.col(cum) - 1) / cap)).otherwise(
                F.col("block_first")
            ),
        )
        .drop(cum)
    )


def length_batches(
    df: DataFrame,
    length_col: Union[str, Column],
    batch_size: int,
    id_col: Union[str, Column, None] = None,
    descending: bool = True,
    out: str = "batch_id",
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    unpersist_handle: Optional[UnpersistHandle] = None,
) -> DataFrame:
    """Padding-efficient batch assignment: order sequences by length
    (longest-first by default) and cut the stream every ``batch_size``
    rows, so each batch holds near-equal-length sequences and pads to
    its own max instead of the corpus max — the standard
    length-bucketing trick for transformer fine-tuning / inference.

    Adds ``out`` (0-based batch index).  ``id_col`` breaks length ties
    deterministically (always pass one for reproducible batches).

    The global ordering uses the reference's 5-step row-number
    algorithm (``with_row_numbers`` — range-sort, per-partition
    windows, a ≤ #partitions prefix sum, broadcast offsets), never a
    single-partition window, so the assignment scales to corpus-sized
    inputs.  See :func:`padding_report` for the per-batch waste audit.
    """
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    from .row_numbers import with_row_numbers

    length = _cols([length_col])[0].cast("long")
    order = [length.desc() if descending else length.asc()]
    if id_col is not None:
        order.append(_cols([id_col])[0].asc())
    rn = "__lb_row_number"
    numbered = with_row_numbers(
        df,
        row_number_column_name=rn,
        order=order,
        storage_level=storage_level,
        unpersist_handle=unpersist_handle,
    )
    return numbered.withColumn(
        out, ((F.col(rn) - 1) / F.lit(int(batch_size))).cast("long")
    ).drop(rn)


def padding_report(
    assigned: DataFrame,
    length_col: Union[str, Column],
    batch_col: str = "batch_id",
) -> DataFrame:
    """Per-batch padding audit over a :func:`length_batches` assignment:
    (batch, ``n_seqs``, ``max_len``, ``sum_len``, ``padded_tokens``,
    ``pad_frac``).  ``pad_frac`` is the fraction of the padded tensor
    that is padding — the number length-bucketing exists to minimize.
    One map-side-combined aggregate; integer arithmetic until the final
    ratio, so the report is exact and engine-reproducible."""
    length = _cols([length_col])[0].cast("long")
    agg = assigned.groupBy(batch_col).agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.max(length).alias("max_len"),
        F.sum(length).alias("sum_len"),
    )
    padded = F.col("max_len") * F.col("n_seqs") - F.col("sum_len")
    total = (F.col("max_len") * F.col("n_seqs")).cast("double")
    # a batch of all zero-length sequences has total 0: its padding
    # fraction is 0.0 (nothing padded), not the NULL a 0/0 would give
    pad_frac = F.when(total > 0, padded.cast("double") / total).otherwise(F.lit(0.0))
    return agg.select(
        batch_col,
        "n_seqs",
        "max_len",
        "sum_len",
        padded.alias("padded_tokens"),
        pad_frac.alias("pad_frac"),
    )
