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

from typing import Dict, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "decayed_aggregates",
    "time_bucket",
    "time_bucket_rollup",
    "range_join_bands",
    "interval_join",
    "sessionize",
    "session_summary",
    "rolling_aggregates",
    "cohort_retention",
    "funnel",
    "resample_interpolate",
    "transition_matrix",
]


def _epoch_axis(df: DataFrame, ts_col: str, unit_seconds: int):
    """(epoch axis column, units-per-``unit_seconds``) for a timestamp,
    TIMESTAMP_NTZ, or raw-numeric time column.  NTZ diffs against the
    NTZ epoch literal — a plain cast would shift by the session
    timezone.  Fractional numeric axes FLOOR to the integer axis: a
    bare ``cast('long')`` truncates toward zero, which would round
    negative fractional epochs UP — the same pre-1970 bucket bug the
    floored-modulo discipline below exists to avoid."""
    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(F.col(ts_col)), int(unit_seconds) * 1_000_000
    if isinstance(dtype, T.TimestampNTZType):
        axis = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
        return axis, int(unit_seconds) * 1_000_000
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.floor(F.col(ts_col)).cast("long"), int(unit_seconds)
    return F.col(ts_col).cast("long"), int(unit_seconds)


def time_bucket(ts: Union[str, Column], width_seconds: int) -> Column:
    """Bucket start (timestamp) of the fixed-width window containing
    ``ts``.  Equivalent to DuckDB/Timescale ``time_bucket(interval, ts)``.

    Column-level helper, so it cannot see the schema: it expects a
    TIMESTAMP (instant) column.  For TIMESTAMP_NTZ or raw-numeric epoch
    axes use :func:`time_bucket_rollup`, which dispatches on the actual
    column type — a blind ``cast('timestamp')`` here would shift NTZ
    values by the session timezone and misread numeric axes as
    seconds."""
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
    with the given aggregate expressions.

    ``ts_col`` may be TIMESTAMP, TIMESTAMP_NTZ, or a raw-numeric epoch
    column (``width_seconds`` then counts the column's own units, as in
    :func:`sessionize`).  The bucket column keeps the input's domain:
    timestamps bucket to their own timestamp type (NTZ stays NTZ — no
    session-timezone shift), numeric axes bucket to the numeric bucket
    start."""
    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, T.TimestampType):
        bucket = time_bucket(ts_col, width_seconds).alias("bucket")
    else:
        axis, width_units = _epoch_axis(df, ts_col, width_seconds)
        floored = axis - ((axis % width_units) + width_units) % width_units
        if isinstance(dtype, T.TimestampNTZType):
            bucket = F.timestamp_add(
                "MICROSECOND",
                floored,
                F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
            ).alias("bucket")
        else:
            bucket = floored.cast(dtype).alias("bucket")
    return (
        df.groupBy(bucket, *[F.col(c) for c in group_by])
        .agg(*[expr.alias(name) for name, expr in aggregates.items()])
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: int,
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: assign each row a per-key ``session_id``
    (1-based) that increments whenever the time since the key's previous
    event exceeds ``gap``.

    The classic scalable shape: one hash shuffle on ``by``, then two
    within-partition window passes (``lag`` for the gap flag, running
    ``sum`` for the session ordinal) — no self-join, no iteration, state
    bounded by a partition.  At 100 TB the cost is one exchange of the
    events table, the same as any per-key window.

    ``ts_col`` may be a timestamp (``gap`` in seconds) or any numeric
    epoch column (``gap`` in the column's own unit — the driver testdata's
    ``events.ts`` arrives as raw nanosecond longs, so pass nanoseconds).

    ``tiebreak`` columns make the ordering total when ``ts_col`` has
    duplicates — required for deterministic session ids (ties within
    ``gap`` never split a session, but the emitted running ordinal is
    order-sensitive).

    Rows with a NULL ``ts_col`` are row-preserved with a NULL
    ``session_id`` (no time, no session) and never shift the 1-based
    numbering of real sessions; :func:`session_summary` surfaces them
    as a single ``session_id IS NULL`` group per key.
    """
    axis, gap_units = _epoch_axis(df, ts_col, gap)
    order = [axis.asc(), *[F.col(c).asc() for c in tiebreak]]
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
    prev = F.lag(axis).over(w)
    # NULL-timestamp rows cannot belong to a time-gap session: they get
    # a NULL session_id and contribute no session starts (without the
    # guard each NULL row — ordered first — would start a phantom
    # session and shift every real session's 1-based id)
    is_new = F.when(
        axis.isNotNull(),
        (prev.isNull() | ((axis - prev) > F.lit(gap_units))).cast("long"),
    )
    run = Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_new).over(run))


def session_summary(
    df: DataFrame,
    ts_col: str,
    gap: int,
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One row per (key, session): event count and first/last event time.
    A hash aggregate over :func:`sessionize` — the window's shuffle is
    reused by the aggregate (same keys), so AQE plans a single exchange."""
    sessions = sessionize(df, ts_col, gap, by=by, tiebreak=tiebreak)
    return sessions.groupBy(*[F.col(c) for c in by], "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_first"),
        F.max(ts_col).alias("t_last"),
    )


def rolling_aggregates(
    df: DataFrame,
    ts_col: str,
    window_seconds: int,
    aggregates: Dict[str, Column],
    by: Sequence[str] = (),
) -> DataFrame:
    """Per-key trailing-window features: for every row, aggregate the
    key's rows whose timestamp lies in ``(ts - window, ts]`` — the
    time-based sliding window behind rate features, trailing averages,
    and burst detection.

    Implemented as one window spec with a ``RANGE BETWEEN`` frame over
    the epoch axis — Spark evaluates all aggregates in a single pass
    over each partition with a sliding frame, so the cost at any scale
    is exactly one hash exchange on ``by`` plus a per-partition sort
    (the same exchange any per-key operation needs; AQE reuses it for
    downstream same-key operations).  No self-join: the naive
    formulation ``events e1 JOIN events e2 ON e2.ts BETWEEN e1.ts - w
    AND e1.ts`` is O(rows × window density) and is exactly what this
    operator exists to avoid.

    ``aggregates`` maps output-column name -> aggregate Column built on
    the input columns (e.g. ``{"n_1h": F.count(F.lit(1)),
    "sum_1h": F.sum("value")}``).

    ``ts_col`` may be a timestamp (``window_seconds`` in seconds) or a
    raw numeric epoch column (``window_seconds`` in the column's unit).
    Rows with equal timestamps share a frame (RANGE, not ROWS
    semantics), which keeps results independent of tie order — and
    therefore of partitioning.
    """
    axis, width = _epoch_axis(df, ts_col, window_seconds)
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(axis.asc())
        .rangeBetween(-(width - 1), Window.currentRow)
    )
    out = df
    for name, expr in aggregates.items():
        out = out.withColumn(name, expr.over(w))
    return out


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
    # qualify the fact side: an unqualified F.col(value_col) is
    # ambiguous whenever the band table also carries a same-named column
    cond = (facts[value_col] >= bands[low_col]) & (facts[value_col] < bands[high_col])
    return facts.join(F.broadcast(bands), cond, "left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: Sequence[str] = (),
    grid: int = 3600,
) -> DataFrame:
    """Interval×interval overlap join: every (left, right) pair whose
    half-open intervals ``[start, end)`` overlap (optionally within the
    same ``by`` keys), plus ``overlap_start``/``overlap_end`` columns.

    The scalable large-large shape (neither side broadcasts): each
    interval is exploded to the fixed-width grid cells it spans and the
    two sides meet in an equi-join on ``(by…, cell)`` — only intervals
    sharing a cell are ever paired, so there is no cross product and
    the shuffle is keyed and AQE-skew-splittable.  A pair overlapping
    across k shared cells would surface k times; instead of a
    ``distinct`` shuffle, each pair is kept only in the one cell
    containing ``greatest(left_start, right_start)`` — the standard
    first-overlapping-cell dedup, a pure filter.

    ``grid`` is in the units of the interval columns (must be an
    INTEGER type — convert timestamps with ``unix_micros`` and
    fractional axes by scaling to integer units first) and should be
    on the order of typical interval length: too fine explodes many
    cells per interval, too coarse packs unrelated intervals into one
    cell.  Fractional interval columns are rejected rather than
    silently truncated: the cell assignment would truncate while the
    overlap predicate compared exact values, so a pair like
    [1.5, 2.3) × [2.2, 3.0) would never meet in the equi-join and
    vanish from the output.  Start/end columns of the two sides must
    not collide by name; ``by`` key columns must exist on both sides
    with the same name.  Empty or inverted intervals (``end <=
    start``) never match.
    """
    for side, frame, cols in (
        ("left", left, (left_start, left_end)),
        ("right", right, (right_start, right_end)),
    ):
        for c in cols:
            dtype = frame.schema[c].dataType
            if not isinstance(
                dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ):
                raise ValueError(
                    f"interval_join requires integer interval columns; "
                    f"{side} column {c!r} is {dtype.simpleString()} — scale "
                    f"to integer units first (e.g. unix_micros for "
                    f"timestamps)"
                )
    grid_l = F.lit(int(grid)).cast("long")

    # Cells are keyed by their START VALUE, not an index, so the cell
    # assignment is pure int64 arithmetic (the `time_bucket` floored-
    # modulo pattern) — exact at ANY axis magnitude.  The former
    # ``floor(x / grid)`` DOUBLE division drifts off the true cell
    # boundaries by up to 2^(exp-52) axis units once the axis passes
    # 2^52 (e.g. a nanosecond epoch, ~1.7e18 today); that form stayed
    # CORRECT — double conversion and division are monotone, so the
    # anchor cell provably lands inside both sides' enumerated ranges —
    # but its correctness rests on that subtle monotonicity argument
    # and its cell widths go fuzzy at the margins.  Start-valued cells
    # need no division at all, and ``sequence`` steps by the grid
    # width directly.
    def cell_start(x: Column) -> Column:
        x = x.cast("long")
        return x - ((x % grid_l) + grid_l) % grid_l

    def cells(df: DataFrame, start: str, end: str) -> DataFrame:
        first = cell_start(F.col(start))
        last = cell_start(F.col(end).cast("long") - 1)
        return df.where(F.col(start) < F.col(end)).withColumn(
            "__cell", F.explode(F.sequence(first, last, grid_l))
        )

    lc = cells(left, left_start, left_end)
    rc = cells(right, right_start, right_end)
    joined = lc.join(rc, [*by, "__cell"])
    ov_start = F.greatest(F.col(left_start), F.col(right_start))
    ov_end = F.least(F.col(left_end), F.col(right_end))
    anchor_cell = cell_start(ov_start)
    return (
        joined.where((ov_start < ov_end) & (F.col("__cell") == anchor_cell))
        .withColumn("overlap_start", ov_start)
        .withColumn("overlap_end", ov_end)
        .drop("__cell")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: int,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their first activity; each ``(cohort, period_offset)`` row counts
    how many of that cohort were active ``offset`` periods later —
    the standard engagement/decay readout (and, for corpus curation,
    contributor/source longevity).

    ``period`` is in the time column's own units (e.g. ``86400 *
    10**9`` for daily cohorts over a nanosecond axis); period indices
    use floored integer division — no float on the time axis (exact at
    any epoch magnitude) and floor semantics at negative epochs, so
    pre-1970 activity cohorts one period below, never into a
    double-width period straddling zero.

    Plan: one per-user ``min`` aggregate (shuffle on user), the
    cohort map joined back onto activity (same key — AQE/Catalyst
    reuses the partitioning), a distinct over ``(cohort, offset,
    user)`` and a count — all hash aggregates, nothing quadratic, no
    windows over the full table.  Rows with NULL user/timestamp are
    excluded.  Returns ``(cohort, period_offset, n_active,
    cohort_size, retention)``; ``retention`` is ``n_active /
    cohort_size`` (offset 0 is 1.0 by construction).
    """
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    u = F.col(user_col)
    axis, _ = _epoch_axis(df, ts_col, 1)
    d = (
        df.where(u.isNotNull() & F.col(ts_col).isNotNull())
        .select(u.alias("__u"), axis.alias("__ts"))
        # floored division (not `div`, which truncates toward zero):
        # pre-1970 negative epochs must land in the bucket BELOW, or
        # the period straddling zero is double-width (time_bucket's
        # floored-modulo discipline)
        .select(
            "__u",
            F.expr(
                f"(__ts - ((__ts % {int(period)}) + {int(period)})"
                f" % {int(period)}) div {int(period)}"
            ).alias("__p"),
        )
    )
    first = d.groupBy("__u").agg(F.min("__p").alias("cohort"))
    act = (
        d.join(first, "__u")
        .select("cohort", (F.col("__p") - F.col("cohort")).alias("period_offset"), "__u")
        .distinct()
    )
    per = act.groupBy("cohort", "period_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return per.join(sizes, "cohort").select(
        "cohort",
        "period_offset",
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double") / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str,
    ts_col: str,
    event_col: str = "event_type",
    within: Optional[int] = None,
) -> DataFrame:
    """Ordered-funnel conversion: one row per step with how many users
    reached it *in order* — a user counts for step k only with an
    event strictly after their step-(k−1) time (first-touch semantics:
    each step's timestamp is the user's earliest qualifying event).
    ``within`` optionally bounds the whole funnel to a window after
    the step-1 time — in SECONDS for timestamp/NTZ columns and in the
    column's own unit for raw-numeric axes, the same convention as
    :func:`sessionize`'s ``gap`` and :func:`time_bucket_rollup`'s
    width.  (Previously it was applied in raw internal-axis units —
    microseconds for timestamps — so ``within=86400`` silently bounded
    the funnel to 86.4 ms instead of a day.)

    Returns ``(step, event_type, n_users, frac_of_first,
    frac_of_prev)`` — step is 1-based, step 1's fractions are 1.0.

    Plan: ONE shuffle of the (user, event, time) triples by user, then
    ``k`` chained whole-partition window minima — step *i*'s time is
    ``min(t) FILTER (event = step_i AND t > t_{i-1} [AND t <= t0 +
    within])`` over the user's partition, and the chain's sequencing
    rides on NULL propagation (``t > NULL`` is NULL, so a user who
    missed step *i−1* can never acquire step *i*).  One per-user
    collapse reuses the window's partitioning (no second exchange) and
    the summary is ONE global aggregate, unpivoted with an explode.
    No joins at all.  (An earlier formulation joined a per-step
    aggregate back into an accumulating per-user frame; the uncached
    accumulator appeared in its own successor's lineage, so the plan
    re-executed it per step — 7 scans and 6 joins for a 3-step
    funnel, growing exponentially with ``k``.)  Nothing collects
    per-user event lists; window state is one running minimum per
    step.  NULL user/timestamp rows are excluded.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    u = F.col(user_col)
    axis, per_unit = _epoch_axis(df, ts_col, 1)
    e = df.where(u.isNotNull() & F.col(ts_col).isNotNull()).select(
        u.alias("__u"), F.col(event_col).alias("__e"), axis.alias("__t")
    )
    w = Window.partitionBy("__u")
    e = e.withColumn(
        "__t0", F.min(F.when(F.col("__e") == steps[0], F.col("__t"))).over(w)
    )
    for i, step in enumerate(steps[1:], start=1):
        cond = (F.col("__e") == step) & (F.col("__t") > F.col(f"__t{i-1}"))
        if within is not None:
            # scale from seconds to the internal axis unit (micros for
            # timestamp columns, native units for numeric axes)
            cond = cond & (
                F.col("__t") <= F.col("__t0") + F.lit(int(within) * per_unit)
            )
        e = e.withColumn(
            f"__t{i}", F.min(F.when(cond, F.col("__t"))).over(w)
        )
    # one row per user (window values are constant within the user's
    # partition; the groupBy reuses that partitioning — no exchange)
    per_user = e.groupBy("__u").agg(
        *[F.max(f"__t{i}").alias(f"__t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"__t{i}")).cast("long").alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    n0 = F.col("__n0").cast("double")
    rows = []
    for i, step in enumerate(steps):
        ni = F.col(f"__n{i}").cast("double")
        prev = F.col(f"__n{max(i-1, 0)}").cast("double")
        rows.append(
            F.struct(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(step).alias("event_type"),
                F.col(f"__n{i}").alias("n_users"),
                F.when(n0 > 0, ni / n0).alias("frac_of_first"),
                F.when(prev > 0, ni / prev).alias("frac_of_prev"),
            )
        )
    return counts.select(
        F.explode(F.array(*rows)).alias("__r")
    ).select("__r.step", "__r.event_type", "__r.n_users", "__r.frac_of_first", "__r.frac_of_prev")


def resample_interpolate(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    step: int,
    by: Sequence[str] = (),
    method: str = "linear",
    scale: int = 12,
) -> DataFrame:
    """Regularize an irregular series onto a fixed grid and fill the
    gaps: one row per ``step``-wide bucket from each group's first to
    last observation, with observed buckets averaged and missing
    buckets filled by ``method`` — the prep step before rolling
    features, FFT-ish analyses, or anything that assumes an evenly
    sampled axis.

    ``step`` is in the time column's own units (e.g. ``3600 * 10**9``
    for hourly over nanoseconds); bucket indices use floored integer
    division (floor semantics at negative epochs, like
    :func:`time_bucket`).
    Returns ``(by…, bucket_ts, value, interpolated)`` where
    ``bucket_ts`` is the bucket's start on the original axis and
    ``interpolated`` marks filled rows.

    ``method="linear"`` interpolates between the nearest observed
    buckets on each side (leading/trailing gaps stay NULL — there is
    nothing to anchor to); ``"ffill"`` holds the last observation
    (trailing fills, leading gaps stay NULL).

    Plan: one per-(group, bucket) aggregate (observed means in
    ``DECIMAL(38, scale)`` — order-independent), a per-group min/max
    aggregate whose ``sequence()`` explode generates the spine
    (spine size = time span / step per group — choose ``step`` so
    this is bounded; it is rows-out, never held in memory), a left
    join of observations onto the spine (both sides keyed the same),
    and ONE ordered window pass per direction for the anchors.  No
    driver materialization, no per-gap jobs.
    """
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    if method not in ("linear", "ffill"):
        raise ValueError(f"method must be 'linear' or 'ffill', got {method!r}")
    dec = f"decimal(38,{int(scale)})"
    keys = [F.col(c) for c in by]
    axis, _ = _epoch_axis(df, ts_col, 1)
    v = F.col(value_col).cast("double")
    d = df.where(F.col(ts_col).isNotNull() & v.isNotNull()).select(
        *keys, axis.alias("__ax"), v.alias("__v")
    )
    d = d.select(
        *[F.col(c) for c in by],
        # floored division (not `div`, which truncates toward zero) so
        # negative-epoch observations bucket below, never into a
        # double-width bucket straddling zero
        F.expr(
            f"(__ax - ((__ax % {int(step)}) + {int(step)})"
            f" % {int(step)}) div {int(step)}"
        ).alias("__idx"),
        "__v",
    )
    obs = d.groupBy(*[F.col(c) for c in by], F.col("__idx")).agg(
        (
            F.sum(F.col("__v").cast(dec)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__obs")
    )
    span = d.groupBy(*[F.col(c) for c in by]).agg(
        F.min("__idx").alias("__lo"), F.max("__idx").alias("__hi")
    )
    spine = span.select(
        *[F.col(c) for c in by],
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__idx"),
    )
    # NULL-safe on the group keys: a NULL ``by`` key survives both
    # groupBys (grouping is NULL-safe) but a plain USING join would
    # never match the group's own observations back onto its spine —
    # every bucket of a NULL-keyed group would come back value=NULL,
    # interpolated=true, even where real observations exist
    obs_r = obs.select(
        *[F.col(c).alias(f"__r_{c}") for c in by],
        F.col("__idx").alias("__r_idx"),
        "__obs",
    )
    join_cond = F.col("__idx") == F.col("__r_idx")
    for c in by:
        join_cond = join_cond & F.col(c).eqNullSafe(F.col(f"__r_{c}"))
    joined = spine.join(obs_r, join_cond, "left").drop(
        "__r_idx", *[f"__r_{c}" for c in by]
    )
    w_prev = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(F.col("__idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(F.col("__idx"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_idx = F.when(F.col("__obs").isNotNull(), F.col("__idx"))
    prev_v = F.last("__obs", ignorenulls=True).over(w_prev)
    prev_i = F.last(obs_idx, ignorenulls=True).over(w_prev)
    next_v = F.first("__obs", ignorenulls=True).over(w_next)
    next_i = F.first(obs_idx, ignorenulls=True).over(w_next)
    if method == "linear":
        frac = (F.col("__idx") - prev_i).cast("double") / (
            next_i - prev_i
        ).cast("double")
        filled = F.when(F.col("__obs").isNotNull(), F.col("__obs")).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull(),
                prev_v + (next_v - prev_v) * frac,
            )
        )
    else:
        filled = F.coalesce(F.col("__obs"), prev_v)
    return joined.select(
        *[F.col(c) for c in by],
        (F.col("__idx") * F.lit(int(step))).alias("bucket_ts"),
        filled.alias("value"),
        F.col("__obs").isNull().alias("interpolated"),
    )


def transition_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str = "event_type",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    one row per observed ``(from_event, to_event)`` with the count and
    the row-normalized probability — the Markov complement to
    :func:`funnel` (funnel asks "did they reach step k?", this asks
    "where do they go next from anywhere?"; the classic inputs to
    drop-off analysis and next-action models).

    Consecutive pairs come from ONE ``lead`` window per user (ordered
    by time, ties totalized by ``tiebreak`` columns so the sequence —
    and therefore the matrix — replays identically on any
    partitioning); counts are a hash aggregate over pairs; the
    normalizing per-``from`` totals re-aggregate from the pair frame
    (|event types|² rows, never the data) and broadcast back.  A
    user's last event has no successor and contributes nothing.  NULL
    user/time/event rows are excluded up front (previously a NULL
    *event* row was counted into the pair and total aggregates and
    then silently dropped at the null-unsafe normalizing join).

    Returns ``(from_event, to_event, n, prob)``.
    """
    u = F.col(user_col)
    axis, _ = _epoch_axis(df, ts_col, 1)
    d = df.where(
        u.isNotNull() & F.col(ts_col).isNotNull() & F.col(event_col).isNotNull()
    ).select(
        u.alias("__u"),
        axis.alias("__t"),
        F.col(event_col).alias("from_event"),
        *[F.col(c) for c in tiebreak],
    )
    w = Window.partitionBy("__u").orderBy(
        F.col("__t").asc(), *[F.col(c).asc() for c in tiebreak]
    )
    pairs = (
        d.withColumn("to_event", F.lead("from_event").over(w))
        .where(F.col("to_event").isNotNull())
        .groupBy("from_event", "to_event")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_event").agg(F.sum("n").alias("__tot"))
    return pairs.join(F.broadcast(totals), "from_event").select(
        "from_event",
        "to_event",
        "n",
        (F.col("n").cast("double") / F.col("__tot").cast("double")).alias("prob"),
    )


def decayed_aggregates(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    half_life: float,
    by: Sequence[str] = (),
    at: Optional[object] = None,
) -> DataFrame:
    """Exponentially time-decayed per-group counters — the feature-store
    staple ("activity in the recent past, smoothly forgotten"):

    ``decayed_count = Σ_i 0.5^(Δt_i / half_life)``
    ``decayed_sum   = Σ_i v_i · 0.5^(Δt_i / half_life)``

    with ``Δt_i`` the age of row *i* against the reference instant —
    ``at`` (same unit as the time axis) when given, else the
    corpus-wide ``max(ts)`` so the freshest event has weight 1.
    ``half_life`` is in SECONDS for timestamp/NTZ columns and in the
    column's native unit for raw-numeric time axes (the same
    convention as :func:`time_bucket_rollup`'s width).  Unlike a
    windowed count, every event contributes forever at exponentially
    decaying weight, so rankings degrade gracefully instead of
    cliff-dropping at the window edge.  Returns ``(by…, n_rows,
    decayed_count, decayed_sum)``.

    Determinism at scale: each per-row term is one ``pow`` on an
    exactly-derived double (integer ages divided by a constant
    half-life literal), and the per-group sums run in DECIMAL(38,18) —
    order-independent, so results are bit-identical across
    partitionings and replay exactly in SQL.  Scale shape: a 1-row
    max broadcast + ONE map-side-combined aggregate; NULL timestamps
    and values contribute nothing.
    """
    if half_life <= 0:
        raise ValueError(f"half_life must be > 0, got {half_life}")
    keys = list(by)
    axis, per_sec = _epoch_axis(df, ts_col, 1)
    # float, not int(): a fractional half_life < 1 on a raw-numeric axis
    # (per_sec=1) would truncate to 0 and yield silent NaN/Inf weights
    hl = F.lit(float(half_life) * per_sec).cast("double")

    if at is not None:
        dtype = df.schema[ts_col].dataType
        if isinstance(dtype, T.TimestampNTZType):
            # derive the reference the same way _epoch_axis derives the
            # axis — naive micros against the NTZ epoch.  to_timestamp
            # would parse `at` as a session-timezone instant while the
            # axis stays naive, silently scaling every weight by
            # 0.5^(tz_offset / half_life) off UTC.
            ref = F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01"
                f" 00:00:00', TIMESTAMP_NTZ '{at}')"
            )
        elif isinstance(dtype, T.TimestampType):
            ref = F.unix_micros(F.to_timestamp(F.lit(at)))
        else:
            ref = F.lit(int(at)).cast("long")
        based = df
    else:
        mx = df.agg(F.max(axis).alias("__ref"))
        based = df.crossJoin(F.broadcast(mx))
        ref = F.col("__ref")

    age = (ref - axis).cast("double") / hl
    w = F.when(axis.isNotNull(), F.pow(F.lit(0.5), age))
    term = w * F.col(value_col).cast("double")
    dec = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")  # noqa: E731
    return based.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dec(w).alias("decayed_count"),
        dec(term).alias("decayed_sum"),
    )
