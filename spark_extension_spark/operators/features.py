"""Feature engineering over event/document tables: categorical pivot
matrices and per-group winsorization (percentile clipping).

Both are single-exchange plans: the pivot is one hash aggregate with
map-side partials over a fixed column set; winsorize is one per-group
window pass to locate the clip bounds plus a broadcast join back —
no per-group ``collect_list`` materialization, so a group larger than
executor memory is never a problem.
"""

from __future__ import annotations

import functools

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "zscore_normalize",
    "feature_hash",
    "weighted_quantiles",
    "pivot_counts",
    "winsorize",
    "group_quantiles",
    "approx_group_quantiles",
 "mad_outliers", "rank_normalize", "group_ols", "discretize", "target_encode", "group_ttest",
 "fit_logistic", "logistic_score", "fit_logistic_sql",
]


def pivot_counts(
    df: DataFrame,
    key_cols: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg=None,
) -> DataFrame:
    """Wide categorical feature matrix: one row per key, one column per
    ``values`` entry of ``pivot_col`` holding the per-key count (or the
    supplied aggregate) of rows with that category.

    ``values`` is required, not discovered: an explicit category list
    (a) skips the extra collect-distinct job Spark's ``pivot`` runs
    when values are omitted — at 100 TB that is a full extra scan —
    and (b) pins the output schema, which downstream training
    pipelines need stable regardless of which categories a given data
    slice happens to contain.

    Built as ONE ``groupBy(key)`` with a case-filtered aggregate per
    category (``sum(case when pivot = v …)``), not ``DataFrame.pivot``
    — Spark plans pivot as *two* aggregate pairs (a (key, category)
    pre-aggregate, then ``pivotfirst``), i.e. two shuffles; the CASE
    form is a single partial+final aggregate carrying ``len(values)``
    counters per key.  Absent categories yield 0.

    ``agg`` customizes the measure: a callable taking the category's
    boolean mask Column and returning an aggregate Column, e.g.
    ``lambda m: F.sum(F.when(m, F.col("value")))`` for per-category
    value sums (default: row count).
    """
    mask_agg = agg or (lambda m: F.sum(F.when(m, 1).otherwise(0)).cast("long"))
    cols = [
        mask_agg(F.col(pivot_col) == F.lit(v)).alias(str(v)) for v in values
    ]
    out = df.groupBy(*[F.col(c) for c in key_cols]).agg(*cols)
    return out.fillna(0, subset=[str(v) for v in values])


def winsorize(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    lower: float = 0.05,
    upper: float = 0.95,
    tiebreak: Sequence[str] = (),
    clipped_col: Optional[str] = None,
) -> DataFrame:
    """Clip ``value_col`` to its per-group discrete percentiles — the
    standard outlier guard before scaling/aggregating a heavy-tailed
    feature (docs-per-domain, tokens-per-doc, price).

    Bounds are *discrete* percentiles (``percentile_disc``: the
    smallest group value whose cumulative fraction reaches ``p``, i.e.
    the value at 1-based sorted index ``max(1, ceil(p * n))``).
    Discrete — an actual data value, located by integer rank — rather
    than interpolated, so the result is exact, engine-replayable
    arithmetic with no float interpolation to drift.

    Plan shape, chosen to survive groups of any size:

    1. one window pass (``row_number`` + ``count`` over the group)
       tags each row with its sorted rank — one exchange on ``by``;
    2. the two boundary rows per group are filtered out and aggregated
       to a tiny ``(group, lo, hi)`` frame — at most 2 rows per group
       survive the filter;
    3. the bounds broadcast-join back onto the full input and the clip
       is a pure projection.

    Nothing ever materializes a whole group in memory (no
    ``collect_list``), and the only full-size shuffle is the window's
    — which AQE reuses if downstream operations group on the same key.

    ``tiebreak`` columns totalize the sort when values repeat; bounds
    are value-based, so ties never change the result, only make ranks
    deterministic for the boundary filter.

    Returns the input rows plus ``clipped_col`` (default
    ``{value_col}_winsorized``).
    """
    if not (0.0 <= lower <= upper <= 1.0):
        raise ValueError(f"need 0 <= lower <= upper <= 1, got {lower}, {upper}")
    clipped_col = clipped_col or f"{value_col}_winsorized"
    v = F.col(value_col)
    order = [v.asc(), *[F.col(c).asc() for c in tiebreak]]
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
    wn = Window.partitionBy(*[F.col(c) for c in by])
    # rank only non-NULL values: NULLs sort first under asc, so an
    # unfiltered rank shifts every quantile index and a NULL landing on
    # the lower boundary collapses __lo/__hi to a single value
    # (percentile_disc semantics exclude NULLs)
    ranked = df.where(v.isNotNull()).select(
        *[F.col(c) for c in by],
        v.alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    lo_idx = F.greatest(F.lit(1), F.ceil(F.lit(lower) * F.col("__n")))
    hi_idx = F.greatest(F.lit(1), F.ceil(F.lit(upper) * F.col("__n")))
    bounds = (
        ranked.where((F.col("__rn") == lo_idx) | (F.col("__rn") == hi_idx))
        .groupBy(*[F.col(c) for c in by])
        .agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    )
    if by:
        # NULL-safe on the group keys (mad_outliers' pattern): a plain
        # USING join never matches a NULL key back to its own bounds,
        # leaving every NULL-keyed row silently UNCLIPPED
        b2 = bounds.select(
            *[F.col(c).alias(f"__k_{c}") for c in by], "__lo", "__hi"
        )
        cond = functools.reduce(
            lambda a, c: a & F.col(c).eqNullSafe(F.col(f"__k_{c}")), by, F.lit(True)
        )
        joined = df.join(F.broadcast(b2), cond, "left").drop(
            *[f"__k_{c}" for c in by]
        )
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    # greatest/least SKIP NULLs, so an unguarded clip would turn a NULL
    # value into the lower bound — clipping must never invent a value
    clipped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    )
    return joined.withColumn(clipped_col, clipped).drop("__lo", "__hi")


def group_quantiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Exact per-group discrete quantiles, one output column per
    requested quantile (named ``q25``, ``q50``, … from the fraction) —
    the distribution summary behind length filters, latency SLOs and
    skew triage.

    Same machinery as :func:`winsorize`: each quantile is the value at
    1-based sorted index ``max(1, ceil(p * n))`` (``percentile_disc``
    semantics — an actual data value located by integer rank, no float
    interpolation, so results replay exactly in any engine).  One
    window pass ranks the group (one exchange on ``by``, external
    sort), then the ≤ ``len(quantiles)`` boundary rows per group
    collapse in a map-side-combined conditional aggregate.  Unlike
    ``percentile_approx`` there is no error bound to reason about, and
    unlike a ``sort_array(collect_list())`` formulation no group ever
    materializes in memory.

    Returns ``by..., n (long), q25, q50, ... (value_col's type)``.
    """
    qs = list(quantiles)
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be within [0, 1], got {qs}")
    v = F.col(value_col)
    order = [v.asc(), *[F.col(c).asc() for c in tiebreak]]
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
    wn = Window.partitionBy(*[F.col(c) for c in by])
    # NULL values are excluded from ranks and from n — SQL
    # percentile_disc semantics; unfiltered, NULLs (sorting first)
    # shift every index and can be returned as the quantile itself
    ranked = df.where(v.isNotNull()).select(
        *[F.col(c) for c in by],
        v.alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    def idx(p: float):
        return F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("__n")))

    # keep only rows that are some quantile's boundary, then collapse
    keep = None
    for q in qs:
        cond = F.col("__rn") == idx(q)
        keep = cond if keep is None else (keep | cond)
    aggs = [F.max("__n").alias("n")] + [
        F.max(F.when(F.col("__rn") == idx(q), F.col("__v"))).alias(
            "q" + str(q).replace("0.", "").ljust(2, "0") if q < 1 else "q100"
        )
        for q in qs
    ]
    return ranked.where(keep).groupBy(*[F.col(c) for c in by]).agg(*aggs)


def approx_group_quantiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    bins: int = 4096,
    broadcast: bool = True,
) -> DataFrame:
    """Fixed-grid approximate per-group quantiles — the corpus-scale
    companion to :func:`group_quantiles`.

    Set ``broadcast=False`` when group cardinality exceeds broadcast
    limits (the per-group ranges frame is group-count-sized; a forced
    broadcast of a huge one OOMs where a shuffle join degrades
    gracefully) — same contract as :func:`zscore_normalize`.

    The exact operator ranks every row inside a per-group window sort;
    at 100 TB that is a full shuffle + external sort of the fact table.
    This one never sorts rows: pass 1 computes each group's
    ``[min, max]`` (map-side-combined aggregate), pass 2 histograms the
    values onto a ``bins``-cell grid over that range (aggregate keyed
    by ``(by…, cell)`` — at most ``bins`` rows per group survive the
    map-side combine), and the quantile is read off the cumulative cell
    counts: the *lower edge* of the first cell whose running count
    reaches ``ceil(p·n)``.  Error is bounded by one cell width,
    ``(max-min)/bins``; all arithmetic is deterministic and
    order-independent, so results are partitioning-independent and
    replay exactly in any engine.

    Shuffles: two keyed aggregates over ``by`` (rows ≤ groups×bins) +
    one tiny window over the cell counts.  No row-level sort anywhere.

    Returns ``by..., p (double), q_estimate (double), n (long)``.
    """
    qs = list(quantiles)
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be within (0, 1], got {qs}")
    if bins < 1:
        raise ValueError(f"bins must be positive, got {bins}")
    keys = [F.col(c) for c in by]
    v = F.col(value_col).cast("double")

    ranges = df.where(v.isNotNull()).groupBy(*keys).agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )
    if by:
        # NULL-safe + (optionally) broadcast: a plain USING join dropped
        # NULL-keyed groups entirely (group_quantiles keeps them), and
        # the unbroadcast join shuffled the fact table on `by`.  The
        # hint is caller-gated: the ranges frame is group-count-sized,
        # so for a high-cardinality `by` the shuffle join is the safe
        # regime (broadcast=False).
        r2 = ranges.select(
            *[F.col(c).alias(f"__k_{c}") for c in by], "__lo", "__hi"
        )
        rcond = functools.reduce(
            lambda a, c: a & F.col(c).eqNullSafe(F.col(f"__k_{c}")), by, F.lit(True)
        )
        rhs = F.broadcast(r2) if broadcast else r2
        with_range = (
            df.where(v.isNotNull())
            .join(rhs, rcond)
            .drop(*[f"__k_{c}" for c in by])
        )
    else:
        # 1-row ranges frame: always safe to broadcast
        with_range = df.where(v.isNotNull()).crossJoin(F.broadcast(ranges))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    cell = F.least(
        F.lit(bins - 1),
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.floor((v - F.col("__lo")) / width)
        ),
    ).cast("long")
    counts = (
        with_range.select(*keys, F.col("__lo"), F.col("__hi"), cell.alias("__cell"))
        .groupBy(*keys, "__lo", "__hi", "__cell")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wsort = Window.partitionBy(*keys).orderBy("__cell")
    wall = Window.partitionBy(*keys)
    cum = counts.select(
        *keys, "__lo", "__hi", "__cell",
        F.sum("__cnt").over(wsort).alias("__cum"),
        F.sum("__cnt").over(wall).alias("__n"),
    )
    edge = F.col("__lo") + F.col("__cell").cast("double") * (
        (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    )
    picks = [
        F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(p) * F.col("__n")), edge
            )
        ).alias(f"__q_{i}")
        for i, p in enumerate(qs)
    ]
    agg = cum.groupBy(*keys, F.col("__n").alias("n")).agg(*picks)
    stack = (
        f"stack({len(qs)}, "
        + ", ".join(f"CAST({p!r} AS DOUBLE), `__q_{i}`" for i, p in enumerate(qs))
        + ") as (p, q_estimate)"
    )
    return agg.select(*[F.col(c) for c in by], "n", F.expr(stack)).select(
        *[F.col(c) for c in by], "p", "q_estimate", "n"
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    k: float = 3.0,
    tiebreak: Sequence[str] = (),
    out: str = "is_outlier",
) -> DataFrame:
    """Robust per-group outlier flagging via median absolute deviation:
    a row is an outlier when ``|x − median| > k · MAD`` (``MAD =
    median(|x − median|)``).  Unlike z-scores, both location and scale
    are medians, so the outliers themselves cannot mask the estimate —
    the standard robust rule (k = 3 ≈ "beyond 2σ" for Gaussian data
    via the 1.4826 consistency factor, which is deliberately NOT baked
    in: ``k`` is in MAD units).

    Adds ``group_median``, ``group_mad``, and ``out`` (boolean; a
    degenerate group with MAD = 0 flags every value ≠ median).

    Scale shape: two :func:`group_quantiles` passes (median, then
    median of absolute deviations — each ONE rank window on ``by``)
    plus broadcast joins of the ≤ |groups|-row summaries back; the
    data is never sorted globally and never self-joined.  Medians are
    discrete (``percentile_disc`` semantics), so flags replay exactly
    across engines and partitionings."""
    # null-safe join back (the zscore_normalize pattern): a NULL group
    # key is a real group to GROUP BY, but a plain inner join's
    # null-unsafe equality would silently drop every NULL-key row.
    # LEFT join, not inner: group_quantiles excludes NULL values, so a
    # group whose every value is NULL has no summary row at all — the
    # contract is "input rows plus flag", and those rows must survive
    # with NULL median/MAD/flag (winsorize's row-preserving behavior),
    # not vanish.  (The no-`by` crossJoin is safe as-is: a global
    # aggregate always emits exactly one row.)
    def join_back(data: DataFrame, summary: DataFrame) -> DataFrame:
        if not by:
            return data.crossJoin(F.broadcast(summary))
        renamed = summary
        for c in by:
            renamed = renamed.withColumnRenamed(c, f"__k_{c}")
        cond = functools.reduce(
            lambda a, b: a & b,
            [F.col(c).eqNullSafe(F.col(f"__k_{c}")) for c in by],
        )
        return data.join(F.broadcast(renamed), cond, "left").drop(
            *[f"__k_{c}" for c in by]
        )

    med = group_quantiles(
        df, value_col, by=by, quantiles=(0.5,), tiebreak=tiebreak
    ).select(*by, F.col("q50").alias("group_median"))
    dev = join_back(df, med).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("group_median"))
    )
    mad = group_quantiles(
        dev, "__adev", by=by, quantiles=(0.5,), tiebreak=tiebreak
    ).select(*by, F.col("q50").alias("group_mad"))
    joined = join_back(dev, mad)
    return joined.withColumn(
        out, F.col("__adev") > F.lit(float(k)) * F.col("group_mad")
    ).drop("__adev")


def rank_normalize(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
    out: str = "pct_rank",
) -> DataFrame:
    """Per-group percentile rank in [0, 1]: ``(rank − 1) / (n − 1)``
    (``percent_rank`` semantics; 0 for the minimum, 1 for the maximum,
    0.0 for singleton groups).  The calibration step for multi-source
    quality filtering: raw classifier/perplexity scores are not
    comparable across sources, their within-source ranks are — filter
    on ``pct_rank`` and every source is trimmed at the same quantile.

    One rank window per group (single exchange on ``by``); ties break
    deterministically via ``tiebreak`` columns, so the output replays
    exactly."""
    v = F.col(value_col)
    order = [v.asc(), *[F.col(c).asc() for c in tiebreak]]
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
    wn = Window.partitionBy(*[F.col(c) for c in by])
    rn = F.row_number().over(w)
    # NULL values must not rank: they sort FIRST under asc, so an
    # unfiltered rank made a NULL score the "best" pct_rank 0.0 AND
    # shifted every real row's rank.  NULLs sort first, so a non-null
    # row's rank among non-nulls is rn minus the group's null count;
    # NULL rows themselves emit NULL.
    n_all = F.count(F.lit(1)).over(wn)
    n_val = F.count(v).over(wn)  # count skips NULLs
    rn_adj = rn - (n_all - n_val)
    pct = F.when(v.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(
            n_val > 1,
            (rn_adj - F.lit(1)).cast("double") / (n_val - F.lit(1)).cast("double"),
        ).otherwise(F.lit(0.0))
    )
    return df.withColumn(out, pct)


def group_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: Sequence[str] = (),
    scale: int = 12,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line: one row per group
    with ``(n, slope, intercept, r2)`` for ``y ~ slope·x + intercept``
    — the cheap way to ask "is this metric drifting?" for every key at
    once (per-source quality over time, per-user spend trend,
    per-partition row-count growth) without a per-group model fit.

    Closed-form from sufficient statistics: ONE hash aggregate computes
    ``n, Σx, Σy, Σx², Σy², Σxy`` per group (map-side combined — the
    only shuffle carries six numbers per group, never rows), then
    slope/intercept/R² are pure scalar arithmetic on the one-row-per-
    group result.  This is the textbook

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    formulation; no iteration, no windows, no second pass.

    Determinism: the six sums run in ``DECIMAL(38, scale)`` —
    order-independent addition, so results are bit-identical across
    partitionings and replayable in any engine (each product is rounded
    once to ``scale`` decimal places before summation; the final
    arithmetic is a fixed-order double expression).  Rows where either
    coordinate is NULL are excluded pairwise.  A group whose ``x`` is
    constant has no defined slope: slope/intercept/r2 are NULL.  ``r2``
    is also NULL when ``y`` is constant (zero variance to explain).
    """
    dec = f"decimal(38,{int(scale)})"
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    # NaN must not pass: it inflates n while its DECIMAL cast silently
    # NULLs out of the sums (the fit_logistic guard, same reason)
    both = x.isNotNull() & y.isNotNull() & ~F.isnan(x) & ~F.isnan(y)

    def dsum(expr: Column, name: str) -> Column:
        return F.sum(F.when(both, expr.cast(dec))).alias(name)

    keys = [F.col(c) for c in by]
    agg = df.groupBy(*keys).agg(
        F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n"),
        dsum(x, "__sx"),
        dsum(y, "__sy"),
        dsum(x * x, "__sxx"),
        dsum(y * y, "__syy"),
        dsum(x * y, "__sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    num = n * sxy - sx * sy
    slope = F.when(dx != 0, num / dx)
    intercept = F.when(dx != 0, (sy - (num / dx) * sx) / n)
    r2 = F.when((dx != 0) & (dy != 0), (num * num) / (dx * dy))
    return agg.select(
        *[F.col(c) for c in by],
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def discretize(
    df: DataFrame,
    value_col: str,
    bins: int,
    method: str = "width",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
    out: str = "bin",
) -> DataFrame:
    """Per-group discretization of a numeric column into ``bins``
    integer buckets (0-based) — the standard prep for turning a
    continuous quality/length/score signal into a categorical feature
    or a stratification key.

    ``method="width"`` — equal-width: bucket ``i`` covers
    ``[min + i·w, min + (i+1)·w)`` with ``w = (max − min)/bins``; the
    group maximum lands in the last bucket (half-open intervals, closed
    at the top).  Plan: one tiny per-group min/max aggregate broadcast
    back, then the bucket is a pure projection — scan-speed, one
    exchange for the aggregate only.  A degenerate group (min == max)
    puts every row in bucket 0.

    ``method="freq"`` — equal-frequency: ``ntile(bins)`` minus one over
    the per-group value order (ties broken by ``tiebreak`` columns for
    a deterministic, engine-replayable assignment).  One window pass —
    one exchange on ``by``; bucket populations differ by at most one
    row.  NULL values sort last, occupy trailing ntile slots, and are
    then masked to NULL buckets — exactly replayable SQL (``ntile``
    cannot exclude rows from its partition without a second pass).
    NULL values get NULL buckets in both methods.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(value_col).cast("double")
    keys = [F.col(c) for c in by]
    if method == "width":
        rng = df.groupBy(*keys).agg(
            F.min(v).alias("__lo"), F.max(v).alias("__hi")
        )
        if by:
            # NULL-safe: a plain USING join silently DROPPED every row
            # whose group key is NULL (method='freq' keeps them)
            r2 = rng.select(
                *[F.col(c).alias(f"__k_{c}") for c in by], "__lo", "__hi"
            )
            cond = functools.reduce(
                lambda a, c: a & F.col(c).eqNullSafe(F.col(f"__k_{c}")),
                by,
                F.lit(True),
            )
            joined = df.join(F.broadcast(r2), cond).drop(
                *[f"__k_{c}" for c in by]
            )
        else:
            joined = df.crossJoin(F.broadcast(rng))
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
        raw = F.floor((v - F.col("__lo")) / width)
        bucket = (
            F.when(v.isNull(), F.lit(None).cast("long"))
            .when(F.col("__hi") == F.col("__lo"), F.lit(0).cast("long"))
            .otherwise(F.least(raw, F.lit(bins - 1)).cast("long"))
        )
        return joined.withColumn(out, bucket).drop("__lo", "__hi")
    if method == "freq":
        order = [v.asc_nulls_last(), *[F.col(c).asc() for c in tiebreak]]
        w = Window.partitionBy(*keys).orderBy(*order)
        bucket = F.when(
            v.isNotNull(), (F.ntile(bins).over(w) - F.lit(1)).cast("long")
        )
        return df.withColumn(out, bucket)
    raise ValueError(f"method must be 'width' or 'freq', got {method!r}")


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
    leave_one_out: bool = False,
    out: str = "te",
    scale: int = 12,
) -> DataFrame:
    """Smoothed mean target encoding: replace a high-cardinality
    categorical with the shrunk per-category target mean

        te(c) = (Σ_c y + m · ȳ) / (n_c + m)

    (``m = smoothing``; categories with few rows shrink toward the
    global mean ȳ, so rare categories don't memorize their handful of
    labels).  ``leave_one_out=True`` excludes each row's own target
    from its encoding — ``(Σ_c y − y_i + m·ȳ) / (n_c − 1 + m)`` — the
    standard guard against target leakage when encoding the training
    split itself (a singleton category falls back to the prior ȳ; with
    ``smoothing=0`` it has no information left at all and encodes NULL
    rather than raising under ANSI arithmetic).
    NULL targets contribute nothing and get the same encoding as their
    category's other rows (NULL-target rows are excluded from n_c).
    A NULL *category* is its own group (null-safe join), encoded from
    its own rows like any other category.

    Plan: ONE per-category aggregate (|categories| rows — tiny next to
    the input) whose global totals ride a single-partition window over
    that tiny frame (decimal addition is exact, so the windowed re-sum
    is bit-identical to a separate global aggregate), broadcast back
    onto the input; the encoding itself is a projection.  No windows
    over the full table, no second scan — and no second CONSUMER of
    the per-category aggregate: an earlier form derived the global
    totals by re-aggregating ``per_cat``, which gave the unpersisted
    aggregate two broadcast consumers and re-executed the input-side
    groupBy shuffle twice (REST census, round 10: 2.2× executor time,
    1.9× shuffle read).  Sums run in ``DECIMAL(38,scale)`` so
    encodings are bit-identical across partitionings and engines.
    """
    dec = f"decimal(38,{int(scale)})"
    y = F.col(target_col).cast("double")
    # ~isnan: NaN inflated the counts while its decimal cast NULLed out
    # of the sums (see group_ols)
    y_ok = y.isNotNull() & ~F.isnan(y)
    per_cat = df.groupBy(F.col(cat_col).alias("__k")).agg(
        F.sum(F.when(y_ok, 1).otherwise(0)).cast("long").alias("__nc"),
        F.sum(F.when(y_ok, y.cast(dec))).alias("__syc"),
    )
    # global totals as a window over the CATEGORY frame: one partition
    # of |categories| rows — broadcast-sized by assumption, so the
    # single-partition window is bounded by the same contract as the
    # broadcast itself
    wall = Window.partitionBy()
    per_cat = per_cat.select(
        "__k",
        "__nc",
        "__syc",
        F.sum("__nc").over(wall).cast("long").alias("__ng"),
        F.sum("__syc").over(wall).alias("__syg"),
    )
    m = F.lit(float(smoothing))
    # null-safe: per_cat derives from df, so every row — including a
    # NULL category — matches exactly one category row
    joined = df.join(
        F.broadcast(per_cat), F.col(cat_col).eqNullSafe(F.col("__k")), "left"
    ).drop("__k")
    prior = F.when(
        F.col("__ng") > 0, F.col("__syg").cast("double") / F.col("__ng").cast("double")
    )
    # a category whose every target is NULL/NaN has __nc=0 and a NULL
    # sum: the formula says it encodes to the prior — coalesce the sum
    # to 0 rather than letting NULL propagate through the blend
    syc = F.coalesce(F.col("__syc").cast("double"), F.lit(0.0))
    if leave_one_out:
        own = F.when(y_ok, y).otherwise(F.lit(0.0))
        n_eff = F.col("__nc") - F.when(y_ok, 1).otherwise(0)
        denom = n_eff.cast("double") + m
        enc = F.when(denom != 0, ((syc - own) + m * prior) / denom)
    else:
        denom = F.col("__nc").cast("double") + m
        enc = F.when(denom != 0, (syc + m * prior) / denom)
    # unreachable under the null-safe join (per_cat derives from df, so
    # every row matches); kept as a belt-and-braces prior fallback
    enc = F.when(F.col("__nc").isNull(), prior).otherwise(enc)
    return joined.withColumn(out, enc).drop("__nc", "__syc", "__ng", "__syg")


def group_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    scale: int = 12,
) -> DataFrame:
    """Welch's two-sample t statistic between two named groups of
    ``group_col`` — the quick "did the metric move?" readout for A/B
    slices, before/after cohorts, or source-vs-source quality scores.
    Welch's form (unpooled variances) is the safe default: it does not
    assume the two groups share a variance, and reduces to Student's t
    when they do.

    Returns one row: ``(n_a, n_b, mean_a, mean_b, var_a, var_b,
    t_stat, dof)`` with sample (n−1) variances and the
    Welch–Satterthwaite degrees of freedom.  No p-value column: Spark
    has no incomplete-beta builtin, and shipping a homegrown
    approximation silently is worse than letting the caller feed
    ``t_stat``/``dof`` to scipy — the statistic and dof are the
    portable part.  Groups with fewer than 2 observations yield NULL
    ``t_stat``/``dof``.

    Plan: ONE conditional aggregate over the data (six decimal sums —
    map-side combined, order-independent, bit-identical across
    partitionings); everything after is scalar arithmetic on a single
    row.  NULL values are excluded.
    """
    dec = f"decimal(38,{int(scale)})"
    v = F.col(value_col).cast("double")
    # ~isnan: NaN inflates the counts while vanishing from the decimal
    # sums (see group_ols)
    in_a = (F.col(group_col) == F.lit(group_a)) & v.isNotNull() & ~F.isnan(v)
    in_b = (F.col(group_col) == F.lit(group_b)) & v.isNotNull() & ~F.isnan(v)

    agg = df.agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("long").alias("__na"),
        F.sum(F.when(in_b, 1).otherwise(0)).cast("long").alias("__nb"),
        F.sum(F.when(in_a, v.cast(dec))).alias("__sa"),
        F.sum(F.when(in_b, v.cast(dec))).alias("__sb"),
        F.sum(F.when(in_a, (v * v).cast(dec))).alias("__ssa"),
        F.sum(F.when(in_b, (v * v).cast(dec))).alias("__ssb"),
    )
    na = F.col("__na").cast("double")
    nb = F.col("__nb").cast("double")
    sa = F.col("__sa").cast("double")
    sb = F.col("__sb").cast("double")
    ssa = F.col("__ssa").cast("double")
    ssb = F.col("__ssb").cast("double")
    mean_a = F.when(F.col("__na") > 0, sa / na)
    mean_b = F.when(F.col("__nb") > 0, sb / nb)
    var_a = F.when(F.col("__na") > 1, (ssa - sa * sa / na) / (na - 1))
    var_b = F.when(F.col("__nb") > 1, (ssb - sb * sb / nb) / (nb - 1))
    ok = (F.col("__na") > 1) & (F.col("__nb") > 1)
    se2 = var_a / na + var_b / nb
    t = F.when(ok & (se2 > 0), (mean_a - mean_b) / F.sqrt(se2))
    dof = F.when(
        ok & (se2 > 0),
        (se2 * se2)
        / (
            (var_a / na) * (var_a / na) / (na - 1)
            + (var_b / nb) * (var_b / nb) / (nb - 1)
        ),
    )
    return agg.select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        var_a.alias("var_a"),
        var_b.alias("var_b"),
        t.alias("t_stat"),
        dof.alias("dof"),
    )


def zscore_normalize(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    out: str = "zscore",
    ddof: int = 0,
    broadcast: bool = True,
) -> DataFrame:
    """Per-group standardization ``(v − mean) / stddev`` — the other
    standard cross-source calibration next to :func:`rank_normalize`
    (z-scores preserve distances and outlier magnitude; ranks do not).
    Zero-variance and singleton groups yield 0.0 (not NULL/NaN), so
    downstream filters never silently drop whole groups.

    Determinism at scale: mean and the raw moments accumulate in
    DECIMAL(38,12) (order-independent sums), the final
    ``sqrt``/division are single correctly-rounded IEEE ops — output
    is bit-identical across partitionings and engines.  Scale shape:
    ONE map-side-combined moment aggregate (count/sum/sum-of-squares
    per group) broadcast-joined back; the data side never shuffles.
    ``ddof`` picks population (0, default) or sample (1) variance.
    Set ``broadcast=False`` when group cardinality exceeds broadcast
    size (the join then shuffles both sides on the keys).
    """
    if ddof not in (0, 1):
        raise ValueError(f"ddof must be 0 or 1, got {ddof}")
    keys = list(by)
    v = F.col(value_col).cast("double")
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    stats = df.where(v.isNotNull() & ~F.isnan(v)).groupBy(
        *[F.col(c).alias(f"__k_{c}") for c in keys]
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        dec(v).alias("__s"),
        dec(v * v).alias("__ss"),
    )
    cond = (
        functools.reduce(
            lambda a, b: a & b,
            [F.col(c).eqNullSafe(F.col(f"__k_{c}")) for c in keys],
        )
        if keys
        else F.lit(True)
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s") / n
    var = (F.col("__ss") / n - mean * mean) * F.when(
        F.col("__n") > ddof, n / (n - F.lit(float(ddof)))
    ).otherwise(F.lit(0.0))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(sd > 0.0, (v - mean) / sd).otherwise(F.lit(0.0))
    joined = df.join(F.broadcast(stats) if broadcast else stats, cond, "left")
    # missing input stays missing: coalescing a NULL/NaN value to 0.0
    # would invent "exactly at the mean" for absent data; the 0.0
    # fallback is only for zero-variance/singleton groups (documented)
    zout = F.when(
        v.isNull() | F.isnan(v), F.lit(None).cast("double")
    ).otherwise(F.coalesce(z, F.lit(0.0)))
    return joined.select(*df.columns, zout.alias(out))


def feature_hash(
    df: DataFrame,
    cols: Sequence[str],
    dim: int = 1024,
    id_col: str = "id",
    numeric_cols: Sequence[str] = (),
) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.): map arbitrary
    categorical columns into a fixed ``dim``-dimensional space with no
    vocabulary to build, ship, or keep in sync — the standard
    featurizer for web-scale linear/GBDT models where the category
    universe is unbounded (URLs, tokens, user agents).

    Output is SPARSE — one row per (row id, feature index):
    ``(id, idx, weight)`` with ``idx = h(col ":" value) mod dim`` and
    ``weight`` the ±1 sign hash (collisions cancel in expectation —
    the property that makes the trick unbiased).  Numeric columns
    contribute their value times the sign instead.  Weights of
    colliding features within a row are summed (integer/exact for
    categoricals).  NULL values emit no feature.

    Everything is md5 column arithmetic — engine-exact, no UDF, no
    fitted state; one scan of ``df`` emitting every column's entry
    through a single explode, + one aggregate (a per-column union
    would re-scan the source, and re-read the id column, once per
    feature).  Densify downstream only if the model needs it
    (``groupBy(id).pivot`` or a vector assembler); at 100 TB the
    sparse triplet form is the one you can actually shuffle.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if not cols and not numeric_cols:
        raise ValueError("feature_hash needs at least one input column")

    def _h31(c: Column) -> Column:
        return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % (1 << 31)

    def entry(c: str, numeric: bool) -> Column:
        # categorical: the hash key is "col:value" — each distinct value
        # is its own feature.  Numeric: the key is the feature NAME
        # alone — one stable index per feature, weight = value × sign.
        # Hashing the value into a numeric key would scatter every
        # distinct value of the same feature to an unrelated index, so
        # no single model coefficient could ever cover it.
        if numeric:
            key = F.lit(c)
        else:
            key = F.concat(F.lit(c + ":"), F.col(c).cast("string"))
        sign = F.when(_h31(F.concat(F.lit("#"), key)) % 2 == 0, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )
        w = sign * F.col(c).cast("double") if numeric else sign
        return F.when(
            F.col(c).isNotNull(),
            F.struct(
                (_h31(key) % dim).cast("int").alias("idx"), w.alias("weight")
            ),
        )

    # one (idx, weight) entry per feature column, emitted by a single
    # explode over one scan of df — a per-column union would re-scan
    # the source (and re-read the id column) once per feature; NULL
    # cells produce NULL entries, dropped after the explode, exactly
    # the per-part isNotNull filter of the union form
    entries = F.array(
        *[entry(c, False) for c in cols], *[entry(c, True) for c in numeric_cols]
    )
    out = (
        df.select(F.col(id_col).alias("id"), F.explode(entries).alias("__e"))
        .where(F.col("__e").isNotNull())
        .select("id", F.col("__e.idx").alias("idx"), F.col("__e.weight").alias("weight"))
    )
    return out.groupBy("id", "idx").agg(
        F.sum(F.col("weight").cast("decimal(38,12)")).cast("double").alias("weight")
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    by: Sequence[str] = (),
) -> DataFrame:
    """Exact weighted quantiles per group: for each ``q`` the smallest
    value whose cumulative weight reaches ``q x total weight`` (the
    left-continuous weighted quantile).  The token-budget analogue of
    :func:`group_quantiles`: "the document length below which half the
    TOKENS (not documents) live" is a weighted median — unweighted
    quantiles over-represent short documents.

    Returns one row per (group, q): ``(by…, q, value)``.

    Scale shape: one map-side-combined (group, value) weight aggregate,
    one cumulative window per group (distinct-values-sized, never
    row-sized), a broadcast cross join with the tiny ``qs`` spine, and
    a min-aggregate — no row-level sort of the raw data.  Cumulative
    weights accumulate in DECIMAL(38,12) so thresholds compare
    identically across partitionings and engines.  Rows with NULL or
    non-positive weight are ignored.
    """
    from pyspark.sql import Window

    if not qs:
        raise ValueError("qs must not be empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"each q must be in (0, 1], got {q}")
    keys = list(by)
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")

    per_val = (
        df.where(v.isNotNull() & w.isNotNull() & (w > 0))
        .groupBy(*keys, v.alias("__v"))
        .agg(F.sum(w.cast("decimal(38,12)")).alias("__w"))
    )
    w_cum = (
        Window.partitionBy(*keys).orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*keys)
    stepped = per_val.select(
        *keys,
        "__v",
        F.sum("__w").over(w_cum).alias("__cum"),
        F.sum("__w").over(w_tot).alias("__tot"),
    )
    spark = df.sparkSession
    spine = spark.createDataFrame([(float(q),) for q in qs], "q double")
    hit = stepped.crossJoin(F.broadcast(spine)).where(
        F.col("__cum").cast("double") >= F.col("q") * F.col("__tot").cast("double")
    )
    return hit.groupBy(*keys, "q").agg(F.min("__v").alias("value"))


def fit_logistic(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    iterations: int = 16,
    learning_rate: float = 5.0,
    l2: float = 0.0,
    scale: int = 12,
) -> DataFrame:
    """Distributed full-batch logistic regression by gradient descent —
    the quality/language-classifier trainer of the fastText-style data
    pipeline ("train a discriminator on good-vs-raw, score the corpus
    with it"), over numeric feature columns already in the frame
    (:func:`zscore_normalize` / ratio features from ``text_stats`` are
    the usual inputs).  Binary labels (``label_col`` in {0, 1}); an
    intercept is always fitted.

    Returns one row per coefficient: ``feature`` (``'__intercept__'``
    first, then ``feature_cols`` in order) and ``weight`` (double).
    Apply with :func:`logistic_score`.

    Scale: each iteration is ONE map-side-combined hash aggregate over
    the data — the shuffle carries ``len(feature_cols)+2`` numbers
    total, never rows — with the current weights broadcast as plan
    literals.  Iteration 1's aggregate doubles as the action that
    materializes the feature cache AND the empty-input check (no
    separate count job).  The driver holds O(iterations × features)
    doubles (the 1-row aggregate per iteration, same bounded-collect
    contract as the BPE trainer's argmax window).  Rows with a NULL *or NaN* label
    or feature are excluded (a single NaN feature would otherwise
    poison every weight to NaN through the gradient sum — and Spark
    manufactures NaN where SQL engines yield NULL, e.g. ``0.0/0.0``
    under non-ANSI division, so the filter keeps the trainer and its
    SQL replay in agreement).

    Determinism (EXACTNESS discipline): the per-row sigmoid is snapped
    to the 1e-10 decimal grid (absorbing JVM-vs-libm ``exp`` ulp
    spread), each gradient term is rounded once to ``DECIMAL(38,
    scale)`` before the order-independent decimal sum, and each weight
    update is snapped back to the 1e-10 grid — so the fitted weights
    are bit-identical across partitionings and replayable exactly by
    the unrolled per-iteration SQL of :func:`fit_logistic_sql`.
    Convergence note: plain full-batch GD — pick ``learning_rate`` for
    roughly unit-scale features; this is a scoring-pipeline trainer,
    not an optimizer benchmark (use it to separate distributions, not
    to chase the MLE to 1e-12).
    """
    if not feature_cols:
        raise ValueError("fit_logistic: feature_cols must be non-empty")
    if iterations < 1:
        raise ValueError("fit_logistic: iterations must be >= 1")
    dec = f"decimal(38,{int(scale)})"
    y = F.col(label_col).cast("double")
    raw_xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    ok = y.isNotNull() & ~F.isnan(y)
    for c in feature_cols:
        xc = F.col(c).cast("double")
        ok = ok & xc.isNotNull() & ~F.isnan(xc)
    d = len(raw_xs)
    spark = df.sparkSession
    # features computed + persisted ONCE — K passes over cached columns,
    # not K source scans (at scale the repeated scan IS the cost)
    data = df.where(ok).select(
        y.alias("__y"), *[raw_xs[j].alias(f"__x{j}") for j in range(d)]
    ).persist()
    lr, reg = float(learning_rate), float(l2)
    w = [0.0] * d
    # unpersist in finally: a mid-iteration failure (job cancel, ANSI
    # overflow) must not leak the cached feature frame
    try:
        for it in range(int(iterations)):
            # current weights inlined as plan literals: the iteration is one
            # map-side-combined aggregate over the cached features, and the
            # per-iteration driver sync transports d doubles.  (A fully-lazy
            # 1-row-weights chain collected once was measured SLOWER — the
            # nested broadcast builds serialize and the deep plan bloats
            # driver-side optimization time.)
            z = F.lit(w[0]) * F.col("__x0")
            for j in range(1, d):
                z = z + F.lit(w[j]) * F.col(f"__x{j}")
            p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 10)
            r = p - F.col("__y")
            row = data.agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum((r * F.col(f"__x{j}")).cast(dec)).alias(f"g{j}")
                    for j in range(d)
                ],
            )
            # weight update computed IN-ENGINE (same arithmetic the SQL
            # oracle replays); the collect only transports the result.
            # try_divide (NULL on n=0, identical quotient on n>0) keeps
            # ANSI mode from throwing before the empty-input check below
            # — iteration 1's aggregate doubles as the cache-forcing
            # action the trainer formerly paid a separate count() for.
            upd = row.select(
                F.col("n"),
                *[
                    F.round(
                        F.lit(w[j])
                        - F.lit(lr)
                        * (
                            F.try_divide(
                                F.col(f"g{j}").cast("double"),
                                F.col("n").cast("double"),
                            )
                            + F.lit(reg) * F.lit(w[j])
                        ),
                        10,
                    ).alias(f"w{j}")
                    for j in range(d)
                ]
            ).collect()[0]
            if it == 0 and upd["n"] == 0:
                raise ValueError(
                    "fit_logistic: no training rows after dropping NULL/NaN "
                    "labels and features"
                )
            w = [float(upd[f"w{j}"]) for j in range(d)]
    finally:
        data.unpersist()
    names = ["__intercept__"] + list(feature_cols)
    return spark.createDataFrame(
        list(zip(names, w)), "feature string, weight double"
    )


def logistic_score(
    df: DataFrame,
    weights: DataFrame,
    out: str = "score",
) -> DataFrame:
    """Apply a :func:`fit_logistic` model: adds ``out`` =
    sigmoid(intercept + Σ wⱼ·xⱼ) as a plain projection (the model is
    collected once — O(features) — and inlined as plan literals, so
    scoring is scan-speed with zero joins and zero shuffles)."""
    rows = {r["feature"]: float(r["weight"]) for r in weights.collect()}
    z = F.lit(rows.pop("__intercept__", 0.0))
    for name, wj in rows.items():
        z = z + F.lit(wj) * F.col(name).cast("double")
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def fit_logistic_sql(
    data_cte: str,
    feature_exprs: Sequence[str],
    label_expr: str,
    iterations: int = 16,
    learning_rate: float = 5.0,
    l2: float = 0.0,
    scale: int = 12,
    feature_names: Optional[Sequence[str]] = None,
) -> str:
    """Unrolled per-iteration SQL replay of :func:`fit_logistic` (the
    PageRank-oracle pattern): ``data_cte`` is a FROM-able relation,
    ``feature_exprs``/``label_expr`` are SQL expressions over it.
    Decimal sums go back to DOUBLE via VARCHAR (DuckDB's direct
    decimal→double cast double-rounds; string→double is correctly
    rounded and bit-matches Spark).  Returns a complete SELECT
    producing ``(feature, weight)`` rows identical to the operator's.
    """
    d = len(feature_exprs) + 1
    names = ["__intercept__"] + list(feature_names or feature_exprs)
    fx = ["1.0"] + [f"({e})" for e in feature_exprs]
    sel_x = ", ".join(f"{e} AS x{j}" for j, e in enumerate(fx))
    parts = [
        f"WITH __d AS MATERIALIZED (SELECT ({label_expr}) AS y, {sel_x} FROM {data_cte}",
        # NULL *and* NaN rows are excluded, mirroring the operator's
        # `isNotNull & ~isnan` filter — without the isnan clause a
        # stored NaN (IS NOT NULL in SQL) would poison every replayed
        # gradient sum while the operator returns finite weights.
        "  WHERE (" + label_expr + ") IS NOT NULL"
        + f" AND NOT isnan(CAST(({label_expr}) AS DOUBLE))"
        + "".join(
            f" AND ({e}) IS NOT NULL"
            f" AND NOT isnan(CAST(({e}) AS DOUBLE))"
            for e in feature_exprs
        )
        + "),",
        "__w0 AS MATERIALIZED (SELECT "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(d))
        + "),",
    ]
    for it in range(int(iterations)):
        z = " + ".join(f"w.w{j} * d.x{j}" for j in range(d))
        p = f"round(1.0 / (1.0 + exp(-({z}))), 10)"
        gs = ", ".join(
            "CAST(CAST(SUM(CAST((" + p + f" - d.y) * d.x{j} AS DECIMAL(38,{scale})))"
            f" AS VARCHAR) AS DOUBLE) AS g{j}"
            for j in range(d)
        )
        parts.append(
            f"__g{it} AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS nd, {gs}"
            f" FROM __d d CROSS JOIN __w{it} w),"
        )
        ws = ", ".join(
            f"round(w.w{j} - {learning_rate!r} * (g.g{j} / g.nd"
            f" + {l2!r} * w.w{j}), 10) AS w{j}"
            for j in range(d)
        )
        parts.append(
            f"__w{it + 1} AS MATERIALIZED (SELECT {ws} FROM __w{it} w CROSS JOIN __g{it} g),"
        )
    final = "\nUNION ALL\n".join(
        f"SELECT '{names[j]}' AS feature, w{j} AS weight FROM __w{int(iterations)}"
        for j in range(d)
    )
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + "\n" + final
