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

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import distinct_prefix_for

__all__ = ["salted_join", "with_salt", "heavy_keys", "differential_join"]


def heavy_keys(df: DataFrame, keys: Sequence[str], k: int = 10) -> DataFrame:
    """The diagnostic that decides whether :func:`salted_join` (or a
    bucket cap, or AQE skew handling) is needed at all: the ``k``
    heaviest join/group keys with their row counts and share of the
    table.

    Plan: one map-side-combined count aggregate keyed by ``keys``, the
    global top-k via ``orderBy(...).limit(k)`` — Spark compiles this to
    ``TakeOrderedAndProject``: each partition keeps a k-row heap and a
    single k-row merge follows, so NO partition ever sorts the full
    key set (a ``row_number`` window with an unpartitioned ORDER BY
    does exactly that: at 10⁹ distinct keys the all-keys
    single-partition sort is the scale hazard this operator exists to
    diagnose in others).  Ranks are then a window over the k
    survivors only, and the 1-row total (a count of the pruned raw
    input — cheaper than making the count aggregate its own second
    consumer) joins broadcast for the share.  Share divides two longs
    in double precision (exact for realistic counts), rank ties break
    by key for determinism.

    Returns ``keys..., n_rows (long), share (double), rank (int)``.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*[F.col(c) for c in keys]).agg(F.count(F.lit(1)).alias("n_rows"))
    order = [F.col("n_rows").desc(), *[F.col(c).asc() for c in keys]]
    top = counts.orderBy(*order).limit(int(k))
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    # the rank window sees exactly <= k rows
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w))
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
    join_hint: Optional[str] = "shuffle_hash",
) -> DataFrame:
    """Equi-join where ``skewed``'s join keys are heavily skewed and
    ``small`` is too large to broadcast: scatter + replicate so each hot
    key runs on ``salt`` reducers.

    Supported join types: inner / left / left_semi (the replicated side
    would break right/full semantics).

    The replicated side carries a ``shuffle_hash`` hint by default: the
    operator's contract is "``small`` is too large to broadcast", so
    letting the planner broadcast the *salt-times-larger* exploded copy
    would be strictly worse than broadcasting ``small`` directly (a
    driver-built hash relation ``salt``× the size, with the salt doing
    nothing) — it only happens when a size estimate undershoots the
    broadcast threshold, i.e. exactly when the user's knowledge says it
    shouldn't.  The hint pins the intended physical shape: both sides
    hash-shuffled by (keys..., salt) — the scatter that splits each hot
    key across ``salt`` reducers — with the hash table built per-task
    from the replicated side, no sort on the skewed side.

    Sizing note: the per-task hash table holds one shuffle partition of
    the *replicated* side (≈ ``|small| · salt / shuffle_partitions``
    rows), so size ``spark.sql.shuffle.partitions`` to keep that within
    executor memory — the usual SHJ discipline.  On clusters where that
    cannot be guaranteed, pass ``join_hint="merge"`` for a sort-merge
    join (both sides spill gracefully; pays a sort on the skewed side)
    or ``join_hint=None`` to let the planner decide unpinned.
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, got: {how}"
        )
    # Spark's analyzer ignores unknown hint names with only a log
    # warning, and a 'broadcast' hint would re-enable exactly the
    # salt-times-larger broadcast this operator exists to forbid — so
    # reject anything outside the two shapes the contract allows.
    if join_hint not in ("shuffle_hash", "merge", None):
        raise ValueError(
            "salted_join join_hint must be 'shuffle_hash', 'merge', or "
            f"None, got: {join_hint!r}"
        )
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    prefix = distinct_prefix_for(list(skewed.columns) + list(small.columns))
    salt_col = prefix + "salt"

    left = with_salt(skewed, salt, salt_col)
    right = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    if join_hint is not None:
        right = right.hint(join_hint)
    joined = left.join(right, keys + [salt_col], how)
    return joined.drop(salt_col)


def differential_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    how: str = "inner",
    heavy_threshold: int = 100_000,
    max_heavy_keys: int = 1000,
) -> DataFrame:
    """Skew-adaptive equi-join: keys whose left-side row count exceeds
    ``heavy_threshold`` take a *broadcast* path (the right rows for
    just those keys broadcast against the heavy left rows — no
    shuffle can melt down on them), everything else takes the normal
    shuffled join.  The union of the two paths is row-for-row equal to
    the plain join — the split is an execution strategy, never a
    semantics change (the correctness gate's oracle is the plain
    join).

    This is the classic differentiated/skew-join decomposition —
    what AQE's ``skewJoin`` does for *sort-merge partitions* at
    runtime, done explicitly at the *key* level so it also covers
    cases AQE can't: a single key too hot for any partition split, or
    a downstream that needs the plan stable across runs.  Compared to
    :func:`salted_join` (which replicates the ENTIRE small side
    ``salt``×), only the heavy keys' right rows are replicated — for
    the typical "5 hot keys in a billion" profile that is a few rows
    broadcast instead of a full copy per salt bucket.

    The heavy-key list materializes to the driver (bounded by
    ``max_heavy_keys``; raises if the threshold admits more — a
    threshold that low means the profile isn't "few hot keys" and
    :func:`salted_join` is the right tool).  Supported: inner / left
    (left_semi would need dedup bookkeeping across paths).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"differential_join supports inner/left, got: {how}")
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    counts = (
        left.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > heavy_threshold)
    )
    heavy_rows = counts.limit(max_heavy_keys + 1).collect()
    if len(heavy_rows) > max_heavy_keys:
        raise ValueError(
            f"more than {max_heavy_keys} keys exceed heavy_threshold="
            f"{heavy_threshold}; this is broad skew, not hot keys — "
            "use salted_join instead"
        )
    if not heavy_rows:
        return left.join(right, keys, how)
    heavy = left.sparkSession.createDataFrame(
        [tuple(r[k] for k in keys) for r in heavy_rows],
        left.select(*keys).schema,
    )
    is_heavy_l = left.join(F.broadcast(heavy), keys, "left_semi")
    not_heavy_l = left.join(F.broadcast(heavy), keys, "left_anti")
    heavy_r = right.join(F.broadcast(heavy), keys, "left_semi")
    hot = is_heavy_l.join(F.broadcast(heavy_r), keys, how)
    cold = not_heavy_l.join(right, keys, how)
    return hot.unionByName(cold)
