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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["profile", "check_constraints", "psi_report", "ks_report", "corr_matrix", "categorical_association", "reliability_report"]


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


def check_constraints(df: DataFrame, rules) -> DataFrame:
    """Declarative data-expectation checking (dbt-test / Deequ-style):
    ``rules`` maps rule name → boolean Column; returns one row per rule
    with ``(rule, n_rows, n_violations, violation_frac)``.  A NULL
    predicate counts as a violation (unknown is not a pass) — the
    strictness audits want.

    Like :func:`profile`, ALL rules evaluate in ONE map-side-combined
    aggregate over a single scan (no per-rule jobs), then a ``stack``
    unpivot over the one-row result.  Constraint checking at 100 TB
    costs one pass regardless of rule count."""
    if not rules:
        raise ValueError("rules must not be empty")
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(
            F.when(F.coalesce(rules[name].cast("boolean"), F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{i}")
        for i, name in enumerate(names)
    ]
    one = df.agg(*aggs)
    pairs = ", ".join(
        # rule names are caller-chosen: escape quotes for the stack expr
        "'" + name.replace("'", "\\'") + "'" + f", __v_{i}" for i, name in enumerate(names)
    )
    return one.select(
        F.expr(f"stack({len(names)}, {pairs}) as (rule, n_violations)"),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        (F.col("n_violations").cast("double") / F.col("n_rows").cast("double")).alias(
            "violation_frac"
        ),
    )


def psi_report(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift alarm between corpus versions / time
    windows: ``PSI = Σ_bins (p_a − p_b) · ln(p_a / p_b)`` over a fixed
    ``[lo, hi)`` grid (plus underflow/overflow bins, so no value is
    silently dropped).  Rule of thumb: < 0.1 stable, 0.1–0.25 drifting,
    > 0.25 shifted.

    Returns one row per bin (``bin``, ``n_a``, ``n_b``, ``p_a``,
    ``p_b``, ``psi_term``) — ``SUM(psi_term)`` is the index; keeping
    per-bin terms makes the alarm diagnosable (*which* part of the
    distribution moved).  ``smoothing`` is the add-count keeping empty
    bins finite (Laplace, applied to BOTH sides).

    Scale shape: one map-side-combined count aggregate per side (bins
    rows each), densified against a ``range(bins+2)`` spine, pure
    arithmetic after — the snapshots are scanned once each and never
    joined row-to-row.  NULL and NaN values land in the underflow
    bin."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    width = (float(hi) - float(lo)) / int(bins)

    def bucket(df: DataFrame) -> Column:
        v = F.col(value_col).cast("double")
        raw = F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("long")
        # NaN joins NULL in the underflow bin: floor(NaN) casts to long
        # 0, which would otherwise silently land NaN in the first
        # in-range bucket and distort its p_a/p_b
        return (
            F.when(v.isNull() | F.isnan(v) | (raw < 0), F.lit(-1))
            .when(raw >= int(bins), F.lit(int(bins)))
            .otherwise(raw)
            + F.lit(1)  # shift to 0..bins+1 (0 = underflow, bins+1 = overflow)
        )

    def counts(df: DataFrame, out: str) -> DataFrame:
        return df.select(bucket(df).alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(out)
        )

    spine = a.sparkSession.range(int(bins) + 2).select(F.col("id").alias("bin"))
    dense = (
        spine.join(counts(a, "n_a"), "bin", "left")
        .join(counts(b, "n_b"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    # totals as a single-partition window over the (bins+2)-row dense
    # frame — a separate dense.agg cross-joined back made `dense` its
    # own second consumer and re-executed both snapshot scans
    # (round-10 REST census: ~8 scans for this query)
    wall = Window.partitionBy()
    s = float(smoothing)
    nb = float(bins + 2)
    with_t = dense.withColumn(
        "__ta", F.sum("n_a").over(wall).cast("double")
    ).withColumn("__tb", F.sum("n_b").over(wall).cast("double"))
    p_a = (F.col("n_a") + F.lit(s)) / (F.col("__ta") + F.lit(s * nb))
    p_b = (F.col("n_b") + F.lit(s)) / (F.col("__tb") + F.lit(s * nb))
    return with_t.select(
        "bin",
        "n_a",
        "n_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        # ln outputs quantized to 10 decimals (libm-ulp absorption, the
        # DSIR-logratio discipline) so psi_term is bit-reproducible
        # across engines; perturbs the index by ≤ ~1e-10
        ((p_a - p_b) * (F.round(F.log(p_a), 10) - F.round(F.log(p_b), 10))).alias(
            "psi_term"
        ),
    )


def corr_matrix(
    df: DataFrame,
    columns: Sequence[str],
    by: Sequence[str] = (),
    scale: int = 12,
) -> DataFrame:
    """Pairwise Pearson correlations of ``columns`` in ONE aggregate
    pass: one output row per unordered column pair (and per ``by``
    group) with ``(col_x, col_y, n, corr)`` — the standard
    feature-redundancy / leakage screen before training.

    All p per-column sums, p squared sums, and p·(p−1)/2 cross-product
    sums are aggregate expressions in a single ``groupBy().agg``, so
    the table is scanned once with map-side partials regardless of how
    many pairs are requested (``DataFrame.stat.corr`` runs one job per
    pair; at 100 TB that is p²/2 scans instead of one).  The one-row-
    per-group result is unpivoted to pair rows with ``stack`` — a
    projection over |groups| rows, free at any scale.

    Observations are *listwise* complete: rows with a NULL in any
    requested column are excluded everywhere, so every pair shares one
    ``n`` and the matrix is positive-semidefinite (pairwise-complete
    matrices need not be).  Sums run in ``DECIMAL(38, scale)`` —
    order-independent, bit-identical across partitionings and engines;
    the correlation itself is a fixed-order double expression.  A pair
    where either side is constant has NULL correlation.
    """
    cols = list(columns)
    if len(cols) < 2:
        raise ValueError(f"corr_matrix needs >= 2 columns, got {cols}")
    dec = f"decimal(38,{int(scale)})"
    complete = None
    for c in cols:
        # ~isnan too: a NaN passes isNotNull and would inflate __n
        # while its DECIMAL cast silently NULLs out of every sum —
        # corrupting the correlations (reliability_report's guard,
        # same reason)
        cond = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        complete = cond if complete is None else (complete & cond)
    d = df.where(complete)
    val = {c: F.col(c).cast("double") for c in cols}

    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(F.sum(val[c].cast(dec)).alias(f"__s_{c}"))
        aggs.append(F.sum((val[c] * val[c]).cast(dec)).alias(f"__ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for i, (a, b) in enumerate(pairs):
        aggs.append(F.sum((val[a] * val[b]).cast(dec)).alias(f"__sp_{i}"))

    keys = [F.col(c) for c in by]
    agg = d.groupBy(*keys).agg(*aggs)

    n = F.col("__n").cast("double")
    corr_cols = []
    for i, (a, b) in enumerate(pairs):
        sa = F.col(f"__s_{a}").cast("double")
        sb = F.col(f"__s_{b}").cast("double")
        da = n * F.col(f"__ss_{a}").cast("double") - sa * sa
        db = n * F.col(f"__ss_{b}").cast("double") - sb * sb
        num = n * F.col(f"__sp_{i}").cast("double") - sa * sb
        corr_cols.append(
            F.when((da > 0) & (db > 0), num / (F.sqrt(da) * F.sqrt(db)))
            .alias(f"__c_{i}")
        )
    agg = agg.select(*[F.col(c) for c in by], "__n", *corr_cols)
    stack = (
        f"stack({len(pairs)}, "
        + ", ".join(f"'{a}', '{b}', `__c_{i}`" for i, (a, b) in enumerate(pairs))
        + ") as (col_x, col_y, corr)"
    )
    return agg.select(
        *[F.col(c) for c in by], F.col("__n").alias("n"), F.expr(stack)
    ).select(*[F.col(c) for c in by], "col_x", "col_y", "n", "corr")


def categorical_association(
    df: DataFrame,
    x_col: str,
    y_col: str,
    scale: int = 12,
) -> DataFrame:
    """Association strength between two categorical columns in one
    small-footprint pass: returns a single row ``(n, n_x, n_y, mi,
    nmi, chi2, cramers_v)`` — mutual information (nats), normalized MI
    (``MI / √(H(x)·H(y))``), the χ² statistic over the full r×c grid,
    and Cramér's V (``√(χ² / (n·min(r−1, c−1)))``).  The standard
    feature-redundancy / label-leakage screen for categorical features
    (a feature with NMI ≈ 1 against the label is the label).

    Plan: ONE contingency aggregate over the data (shuffle bounded by
    r·c distinct pairs, map-side combined), marginals re-aggregated
    from that cell frame (not the data), and the χ² grid built by
    cross-joining the two marginal frames (r×c rows — category-sized,
    never data-sized) with observed cells left-joined in, so
    unobserved cells contribute their expected mass to χ² as they
    must.  Per-cell terms are fixed-order double expressions summed in
    ``DECIMAL(38, scale)`` — bit-identical across partitionings and
    engines.  Rows with NULL in either column are excluded.
    Degenerate inputs (a single category on either side) yield 0.0
    statistics, not NULLs/NaNs.
    """
    dec = f"decimal(38,{int(scale)})"
    d = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    cells = d.groupBy(
        F.col(x_col).cast("string").alias("__x"),
        F.col(y_col).cast("string").alias("__y"),
    ).agg(F.count(F.lit(1)).cast("long").alias("__nxy"))
    mx = cells.groupBy("__x").agg(F.sum("__nxy").alias("__nx"))
    my = cells.groupBy("__y").agg(F.sum("__nxy").alias("__ny"))
    tot = cells.agg(
        F.sum("__nxy").cast("long").alias("__n"),
        F.count(F.lit(1)).cast("long").alias("__cells"),
    )

    nd = F.col("__n").cast("double")
    # full expected grid: marginals cross-joined, observed counts joined in
    grid = (
        mx.crossJoin(my)
        .join(cells, ["__x", "__y"], "left")
        .select(
            "__x",
            "__y",
            F.coalesce(F.col("__nxy"), F.lit(0)).cast("long").alias("__o"),
            "__nx",
            "__ny",
        )
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("__nx").cast("double") * F.col("__ny").cast("double") / nd
    o = F.col("__o").cast("double")
    chi_term = (o - e) * (o - e) / e
    mi_term = F.when(
        F.col("__o") > 0,
        (o / nd)
        * F.log((o * nd) / (F.col("__nx").cast("double") * F.col("__ny").cast("double"))),
    ).otherwise(F.lit(0.0))
    sums = grid.agg(
        F.sum(chi_term.cast(dec)).cast("double").alias("__chi2"),
        F.sum(mi_term.cast(dec)).cast("double").alias("__mi"),
        F.count_distinct(F.col("__x")).cast("long").alias("__r"),
        F.count_distinct(F.col("__y")).cast("long").alias("__c"),
        F.max("__n").alias("__n2"),
    )
    hx_term = -(F.col("__nx").cast("double") / nd) * F.log(
        F.col("__nx").cast("double") / nd
    )
    hy_term = -(F.col("__ny").cast("double") / nd) * F.log(
        F.col("__ny").cast("double") / nd
    )
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .agg(F.sum(hx_term.cast(dec)).cast("double").alias("__hx"))
    )
    hy = (
        my.crossJoin(F.broadcast(tot))
        .agg(F.sum(hy_term.cast(dec)).cast("double").alias("__hy"))
    )
    one = sums.crossJoin(hx).crossJoin(hy)
    mind = F.least(F.col("__r") - 1, F.col("__c") - 1).cast("double")
    n2d = F.col("__n2").cast("double")
    return one.select(
        F.col("__n2").alias("n"),
        F.col("__r").alias("n_x"),
        F.col("__c").alias("n_y"),
        F.col("__mi").alias("mi"),
        F.when(
            (F.col("__hx") > 0) & (F.col("__hy") > 0),
            F.col("__mi") / F.sqrt(F.col("__hx") * F.col("__hy")),
        )
        .otherwise(F.lit(0.0))
        .alias("nmi"),
        F.col("__chi2").alias("chi2"),
        F.when(mind > 0, F.sqrt(F.col("__chi2") / (n2d * mind)))
        .otherwise(F.lit(0.0))
        .alias("cramers_v"),
    )


def reliability_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    scale: int = 12,
) -> DataFrame:
    """Calibration (reliability-diagram) table for a [0, 1] confidence
    score against a binary outcome: scores are cut into ``bins``
    equal-width buckets; each row reports the bucket's mean score
    (confidence), observed positive rate (accuracy), their absolute
    gap, and the bucket's weight — so ``Σ weight · abs_gap`` is the
    Expected Calibration Error.  The standard audit for
    quality-classifier scores before thresholding them into keep/drop
    decisions: a model can rank well and still be wildly miscalibrated.

    Returns ``(bin, n, avg_score, frac_positive, abs_gap, weight,
    ece_term)``; only observed buckets appear.  Scores are clamped
    into [0, 1] (values outside land in the edge buckets); NULL or NaN
    score/label rows are excluded.  ONE hash aggregate (decimal sums —
    order-independent) + a single-partition window over the
    ≤``bins``-row bucket frame for the total: scan-speed at any size,
    and the input aggregate has exactly one consumer (no re-execution).
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    dec = f"decimal(38,{int(scale)})"
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    # NaN is excluded like NULL: it would count toward n (NaN IS NOT
    # NULL) while its decimal cast is NULL and vanishes from the sums —
    # understating avg_score/frac_positive for its bucket
    d = df.where(s.isNotNull() & ~F.isnan(s) & y.isNotNull() & ~F.isnan(y))
    bucket = F.least(
        F.greatest(F.floor(s * F.lit(int(bins))).cast("long"), F.lit(0)),
        F.lit(int(bins) - 1),
    )
    per = d.groupBy(bucket.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(s.cast(dec)).alias("__ss"),
        F.sum(y.cast(dec)).alias("__sy"),
    )
    # total weight as a single-partition window over the ≤``bins``-row
    # bucket frame — NOT a separate ``per.agg`` cross-joined back: that
    # form gave the unpersisted input aggregate two consumers, and the
    # input-side hash aggregate executed twice (the target_encode
    # REST-census finding, round 10)
    total = F.sum("n").over(Window.partitionBy()).cast("double")
    nd = F.col("n").cast("double")
    avg_score = F.col("__ss").cast("double") / nd
    frac_pos = F.col("__sy").cast("double") / nd
    gap = F.abs(frac_pos - avg_score)
    weight = nd / total
    return per.select(
        "bin",
        "n",
        avg_score.alias("avg_score"),
        frac_pos.alias("frac_positive"),
        gap.alias("abs_gap"),
        weight.alias("weight"),
        (weight * gap).alias("ece_term"),
    )


def ks_report(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between two
    snapshots of a numeric column, optionally per group — the
    non-parametric complement to :func:`psi_report`: no grid to pick,
    detects *any* distributional change (location, scale, shape), and
    the statistic has a distribution-free significance approximation.

    ``D = sup_x |F_a(x) − F_b(x)|`` over the empirical CDFs.  Because
    both CDFs are right-continuous step functions that only jump at
    sample points, the supremum is attained at one of the observed
    values, so the exact statistic is a max over distinct values —
    no approximation.

    Returns one row per group: ``(by…, n_a, n_b, ks_stat, ks_at,
    p_approx)`` where ``ks_at`` is the value attaining the supremum
    (smallest such value on ties — deterministic) and ``p_approx`` is
    the asymptotic two-sided significance ``2·exp(−2·m·D²)`` with
    ``m = n_a·n_b/(n_a+n_b)`` (clamped to 1; meaningful for
    n ≳ 35 per side, as in the classical tables).

    Scale shape: one map-side-combined count per (group, distinct
    value) per side, a union, one window pass ordered by value inside
    each group (Spark sorts within hash partitions — groups spread
    across the cluster, no global sort), one row-number pass to locate
    the supremum.  Shuffle volume is distinct-values-sized, never
    row-sized; NULLs are dropped (a CDF is undefined there — use
    :func:`profile` for null drift).
    """
    from pyspark.sql import Window

    keys = list(by)
    v = F.col(value_col).cast("double")

    def side(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.where(v.isNotNull())
            .groupBy(*keys, v.alias("__v"))
            .agg(F.count(F.lit(1)).alias("__c"))
            .select(
                *keys,
                "__v",
                F.col("__c").alias(f"__c_{tag}"),
                F.lit(0).cast("long").alias(f"__c_{'b' if tag == 'a' else 'a'}"),
            )
        )

    cols = [*keys, "__v", "__c_a", "__c_b"]
    per_val = (
        side(a, "a").select(*cols)
        .unionByName(side(b, "b").select(*cols))
        .groupBy(*keys, "__v")
        .agg(F.sum("__c_a").alias("__na"), F.sum("__c_b").alias("__nb"))
    )

    w_cum = (
        Window.partitionBy(*keys).orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*keys)
    stepped = per_val.select(
        *keys,
        "__v",
        F.sum("__na").over(w_cum).alias("__ca"),
        F.sum("__nb").over(w_cum).alias("__cb"),
        F.sum("__na").over(w_tot).alias("__ta"),
        F.sum("__nb").over(w_tot).alias("__tb"),
    )
    # D evaluated at each jump point; a side with zero rows yields an
    # empty CDF -> statistic degenerates to the other side's sup = 1.0
    d = F.abs(
        F.when(F.col("__ta") > 0, F.col("__ca") / F.col("__ta")).otherwise(F.lit(0.0))
        - F.when(F.col("__tb") > 0, F.col("__cb") / F.col("__tb")).otherwise(F.lit(0.0))
    )
    w_pick = Window.partitionBy(*keys).orderBy(F.col("__d").desc(), F.col("__v"))
    picked = (
        stepped.select(*keys, "__v", "__ta", "__tb", d.alias("__d"))
        .select(*keys, "__v", "__ta", "__tb", "__d",
                F.row_number().over(w_pick).alias("__rn"))
        .where(F.col("__rn") == 1)
    )
    m = (F.col("__ta") * F.col("__tb")).cast("double") / (
        F.col("__ta") + F.col("__tb")
    ).cast("double")
    p = F.least(F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * m * F.col("__d") * F.col("__d")))
    return picked.select(
        *keys,
        F.col("__ta").alias("n_a"),
        F.col("__tb").alias("n_b"),
        F.col("__d").alias("ks_stat"),
        F.col("__v").alias("ks_at"),
        p.alias("p_approx"),
    )
