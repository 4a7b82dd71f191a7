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

from typing import Dict, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "global_top_n",
    "hash_uniform",
    "hash_uniform_sql",
    "hash_sample",
    "stratified_sample",
    "assign_splits",
    "assign_splits_sql",
    "resample_to_mix",
    "cap_per_group",
    "cap_per_group_sql",
    "take_token_budget",
    "take_token_budget_sql",
    "resample_to_mix_sql",
    "top_per_group",
    "weighted_sample",
    "top_per_group_sql",
    "interleave_by_mix",
    "interleave_by_mix_sql",
    "repeat_upsample",
    "temperature_mix",
    "temperature_mix_sql",
]

_TWO_32 = float(2**32)


def _sql_str(v) -> str:
    """Render a value as a single-quoted SQL literal, doubling embedded
    quotes — interpolated stratum/split names must never produce
    malformed oracle SQL."""
    return "'" + str(v).replace("'", "''") + "'"


# `orderBy().limit(n)` plans as TakeOrderedAndProject: per-task n-row
# priority queues merged once — the right shape for diagnostics-sized n
# (heavy keys, zipf ranks, sketch minima), but the heap NEVER SPILLS,
# so at data-selection sizes (n in the millions, e.g. "select the best
# 50M documents") it trades the old single-partition-sort latency
# hazard for an executor OOM.  Above this bound `global_top_n` switches
# to the spillable form instead of relying on the cluster operator
# having lowered `spark.sql.execution.topKSortFallbackThreshold`
# (default IntMax: Spark itself would happily heap 50M rows per task).
TOP_N_SPILL_THRESHOLD = 1_000_000


def global_top_n(
    df: DataFrame,
    order: Sequence[Column],
    n: int,
    unpersist_handle=None,
) -> DataFrame:
    """Global top-``n`` rows under ``order`` (pre-built sort Columns,
    e.g. ``[F.col("k").desc(), F.col("id").asc()]`` — the order must be
    total for a deterministic selection).

    Two physical forms, same selection: for ``n`` up to
    :data:`TOP_N_SPILL_THRESHOLD` the plan is ``TakeOrderedAndProject``
    (per-partition n-row heaps + one n-row merge, no full sort); above
    it, a range-partitioned external sort with the 5-step row-number
    algorithm (:func:`~spark_extension_spark.operators.row_numbers.with_row_numbers`:
    per-partition windows + broadcast offsets) and a rank filter —
    slower, but every stage spills, so a 100M-row selection cannot OOM
    an executor.  The large-``n`` path persists the sorted frame (the
    row-number algorithm's partition-id pin); pass ``unpersist_handle``
    to release it after the action."""
    n = int(n)
    if n <= TOP_N_SPILL_THRESHOLD:
        return df.orderBy(*order).limit(n)
    from ..utils import distinct_prefix_for
    from .row_numbers import with_row_numbers

    rank = distinct_prefix_for(df.columns) + "top_n_rank"
    ranked = with_row_numbers(
        df, rank, order=list(order), unpersist_handle=unpersist_handle
    )
    return ranked.where(F.col(rank) <= n).drop(rank)


def _col(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_uniform(id_col: Union[str, Column], seed: int = 42) -> Column:
    """Uniform double in [0, 1) derived from md5 of (seed, id) — the
    first 8 hex chars as an int64 over 2^32.  Deterministic across runs,
    partitionings, and engines.

    NULL ids draw as the empty-string key (all NULL ids share one
    draw).  This is exactly what the SQL twin's ``CONCAT`` already did
    (DuckDB CONCAT skips NULLs); Spark's NULL-propagating ``concat``
    previously returned a NULL draw instead, which silently dropped
    NULL-id rows from samples, dumped them all into the last split,
    and ranked them first (NULLS FIRST) in every quota ordering."""
    key = F.concat(
        F.lit(f"{int(seed)}:"),
        F.coalesce(_col(id_col).cast("string"), F.lit("")),
    )
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
    # eqNullSafe so a None key in `fractions` matches NULL strata (a
    # plain == can never match NULL and the entry would be dead)
    for value, fraction in fractions.items():
        rate = F.when(strata.eqNullSafe(F.lit(value)), F.lit(float(fraction))).otherwise(rate)
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
    # a negative weight would pass the sum check but corrupt every
    # cumulative threshold after it — silently wrong splits
    for name, w in weights.items():
        if float(w) < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {w}")
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
    """DuckDB CASE expression in lock-step with :func:`assign_splits` —
    including its validation: the same inputs the Spark twin refuses
    (empty weights, a negative weight, non-positive total) must never
    silently generate a corrupt oracle CASE."""
    if not weights:
        raise ValueError("weights must not be empty")
    for name, w in weights.items():
        if float(w) < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {w}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = hash_uniform_sql(id_expr, seed)
    names = list(weights)
    branches = []
    cumulative = 0.0
    for name in names[:-1]:
        cumulative += float(weights[name]) / total
        branches.append(f"WHEN {u} < {cumulative!r} THEN {_sql_str(name)}")
    return "CASE " + " ".join(branches) + f" ELSE {_sql_str(names[-1])} END"


def resample_to_mix(
    df: DataFrame,
    strata_col: Union[str, Column],
    target_shares: Dict[object, float],
    id_col: Union[str, Column],
    seed: int = 42,
) -> DataFrame:
    """Downsample to an exact target distribution (data mixing): keep
    the largest corpus whose strata shares match ``target_shares``.

    With per-stratum counts ``c_g`` and normalized targets ``t_g``, the
    achievable size is ``N = min_g(c_g / t_g)`` (the binding stratum
    keeps 100%); every stratum then keeps at rate ``t_g * N / c_g``.
    Strata absent from ``target_shares`` are dropped.  The draw is the
    deterministic :func:`hash_uniform`, so the resampled corpus is
    frozen across runs and partitionings; realized counts are binomial
    around the exact rates, as with every Bernoulli sampler here.

    Scale shape: one map-side-combined count aggregate over the corpus,
    a ≤ |strata|-row rate table derived from it, and one broadcast join
    back — the corpus itself is scanned twice (count + filter) and
    never shuffled.  Persist upstream if the scan is expensive.
    """
    if not target_shares:
        raise ValueError("target_shares must not be empty")
    total = float(sum(target_shares.values()))
    if total <= 0:
        raise ValueError("target_shares must sum to a positive value")
    strata = _col(strata_col)

    counts = df.groupBy(strata.alias("__stratum")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    # eqNullSafe: a None key must match the NULL stratum (the join
    # below is already null-safe for exactly this case); a plain ==
    # left the None entry dead while its share still inflated `total`,
    # silently shrinking every other stratum's target
    t: Column = F.lit(None).cast("double")
    for value, share in target_shares.items():
        t = F.when(
            F.col("__stratum").eqNullSafe(F.lit(value)), F.lit(float(share) / total)
        ).otherwise(t)
    with_t = counts.select("__stratum", "__c", t.alias("__t")).where(
        F.col("__t").isNotNull()
    )
    # the limiting stratum's ratio rides a single-partition window over
    # the |strata|-row count frame — a separate .agg cross-joined back
    # made with_t (and the corpus groupBy beneath it) its own second
    # consumer (round-10 REST census discipline; min is min, values
    # unchanged)
    mn = F.min(F.col("__c").cast("double") / F.col("__t")).over(Window.partitionBy())
    rates = with_t.select(
        "__stratum",
        ((F.col("__t") * mn) / F.col("__c").cast("double")).alias("__rate"),
    )
    joined = df.join(
        F.broadcast(rates), strata.eqNullSafe(F.col("__stratum")), "inner"
    )
    return joined.where(hash_uniform(id_col, seed) < F.col("__rate")).drop(
        "__stratum", "__rate"
    )


def cap_per_group(
    df: DataFrame,
    group_col: Union[str, Column],
    cap: int,
    id_col: Union[str, Column],
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the per-domain/per-source
    quota of web-scale curation (no single site may dominate the mix).
    Within an over-quota group the kept rows are the ``cap`` smallest
    deterministic hash draws (ties broken by id), so the selection is a
    uniform sample frozen across runs, partitionings, and engines —
    not "whichever rows arrived first".

    Scale shape: one map-side-combined count per group finds the
    over-quota groups (usually a tiny minority); rows of under-quota
    groups pass through via a **broadcast** anti-join — no shuffle, no
    sort.  Only the over-quota slice shuffles into per-group windows.
    The residual skew risk is a single group so large its window sort
    dominates one task — at that point cap/|group| is tiny, and
    :func:`hash_sample` at a slightly generous rate is the cheap
    pre-filter to compose in front."""
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    order = [hash_uniform(id_col, seed).asc(), _col(id_col).asc()]
    return _keep_per_group(df, _col(group_col), cap, order)


def _keep_per_group(df: DataFrame, group: Column, cap: int, order) -> DataFrame:
    """Shared skew-split quota core: under-quota groups bypass the
    window via a broadcast anti-join; only the over-quota slice shuffles
    and sorts."""
    over = (
        df.groupBy(group.alias("__g"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > cap)
        .select("__g")
    )
    small = df.join(F.broadcast(over), group.eqNullSafe(F.col("__g")), "left_anti")
    big = df.join(F.broadcast(over), group.eqNullSafe(F.col("__g")), "left_semi")
    w = Window.partitionBy(group).orderBy(*order)
    capped = (
        big.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= cap)
        .drop("__rank")
    )
    return small.unionByName(capped)


def top_per_group(
    df: DataFrame,
    group_col: Union[str, Column],
    k: int,
    score_col: Union[str, Column],
    id_col: Union[str, Column],
    descending: bool = True,
) -> DataFrame:
    """Keep the ``k`` best rows per group by ``score_col`` (quality
    score, log-likelihood, relevance) — :func:`cap_per_group` with a
    merit order instead of the uniform hash draw: "the 10k highest
    quality documents per source".  Ties break on id, so the selection
    is total-ordered and reproducible.  Same skew-split execution:
    groups already within quota never shuffle."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    score = _col(score_col)
    order = [score.desc() if descending else score.asc(), _col(id_col).asc()]
    return _keep_per_group(df, _col(group_col), k, order)


def top_per_group_sql(
    table: str,
    group_expr: str,
    k: int,
    score_expr: str,
    id_expr: str,
    descending: bool = True,
    columns: str = "*",
) -> str:
    """DuckDB SELECT in lock-step with :func:`top_per_group` (explicit
    NULLS placement: Spark's desc is NULLS LAST / asc NULLS FIRST,
    DuckDB defaults to NULLS LAST for both)."""
    direction = "DESC NULLS LAST" if descending else "ASC NULLS FIRST"
    return f"""
SELECT {columns} FROM {table}
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY {group_expr} ORDER BY {score_expr} {direction}, {id_expr} ASC
) <= {int(k)}
"""


def cap_per_group_sql(
    table: str,
    group_expr: str,
    cap: int,
    id_expr: str,
    seed: int = 42,
    columns: str = "*",
) -> str:
    """DuckDB SELECT in lock-step with :func:`cap_per_group` (same draw,
    same tie-break) — the oracle-gate companion."""
    u = hash_uniform_sql(id_expr, seed)
    return f"""
SELECT {columns} FROM {table}
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY {group_expr} ORDER BY {u} ASC, {id_expr} ASC
) <= {int(cap)}
"""


def take_token_budget(
    df: DataFrame,
    budget: int,
    tokens_col: Union[str, Column],
    id_col: Union[str, Column],
    group_col: Union[str, Column] = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministically fill a token budget: keep documents, in hash-draw
    order, while the running token total stays ≤ ``budget`` ("give me
    1B tokens of this corpus", reproducibly).  With ``group_col`` the
    budget applies per group ("1B tokens per language").

    The kept set is a prefix of the frozen hash order, so it is stable
    across runs/partitionings, and growing the budget only ever *adds*
    documents — successive curation rounds are supersets, never
    reshuffles.  The first over-budget document is excluded (strict
    prefix), so the result can undershoot but never overshoot.

    Scale shape: one window (cumulative sum over the draw order) —
    per-group windows parallelize over groups; the ungrouped form is a
    single global ordering (use groups at corpus scale, exactly like
    global sorts anywhere)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    part = [_col(group_col)] if group_col is not None else []
    w = (
        Window.partitionBy(*part)
        .orderBy(hash_uniform(id_col, seed).asc(), _col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(_col(tokens_col).cast("long")).over(w)
    return (
        df.withColumn("__running", running)
        .where(F.col("__running") <= budget)
        .drop("__running")
    )


def take_token_budget_sql(
    table: str,
    budget: int,
    tokens_expr: str,
    id_expr: str,
    group_expr: str = None,
    seed: int = 42,
    columns: str = "*",
) -> str:
    """DuckDB SELECT in lock-step with :func:`take_token_budget`."""
    u = hash_uniform_sql(id_expr, seed)
    part = f"PARTITION BY {group_expr} " if group_expr else ""
    return f"""
SELECT {columns} FROM {table}
QUALIFY SUM(CAST({tokens_expr} AS BIGINT)) OVER (
  {part}ORDER BY {u} ASC, {id_expr} ASC
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
) <= {int(budget)}
"""


def resample_to_mix_sql(
    table: str,
    strata_expr: str,
    target_shares: Dict[object, float],
    id_expr: str,
    seed: int = 42,
    columns: str = "*",
) -> str:
    """DuckDB SELECT in exact lock-step with :func:`resample_to_mix`
    (same normalized-share literals, same association order, same
    hash draw) — the oracle-gate companion."""
    total = float(sum(target_shares.values()))
    # references the `stratum` alias (we are inside the counts CTE);
    # explicit DOUBLE casts keep DuckDB from parsing the shares as
    # DECIMAL literals
    branches = " ".join(
        (
            f"WHEN stratum IS NULL THEN CAST({float(s) / total!r} AS DOUBLE)"
            if v is None
            else f"WHEN stratum = {_sql_str(v)} THEN CAST({float(s) / total!r} AS DOUBLE)"
        )
        for v, s in target_shares.items()
    )
    u = hash_uniform_sql(id_expr, seed)
    return f"""
WITH counts AS (
  SELECT {strata_expr} AS stratum, COUNT(*) AS c FROM {table} GROUP BY 1
),
with_t AS (
  SELECT stratum, c, CASE {branches} END AS t FROM counts
  WHERE CASE {branches} END IS NOT NULL
),
mn AS (SELECT MIN(CAST(c AS DOUBLE) / t) AS n FROM with_t),
rates AS (
  SELECT stratum, (t * n) / CAST(c AS DOUBLE) AS rate FROM with_t CROSS JOIN mn
)
SELECT {columns} FROM {table} d
JOIN rates r ON {strata_expr} IS NOT DISTINCT FROM r.stratum
WHERE {u} < r.rate
"""


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: Union[str, Column],
    id_col: Union[str, Column],
    by: Sequence[str] = (),
    seed: int = 42,
    unpersist_handle=None,
) -> DataFrame:
    """Weighted sampling without replacement, ``k`` rows (per group):
    each row's inclusion probability is proportional to its weight —
    quality-weighted corpus subsetting, importance-sampled eval sets.

    The Efraimidis–Spirakis priority construction: draw ``u`` from the
    row's deterministic md5 hash (:func:`hash_uniform` shifted to
    ``(0, 1]`` so ``ln`` is always finite) and keep the ``k`` smallest
    ``-ln(u) / w`` — an ``Exp(w)`` variate, so the min-k are exactly a
    weight-proportional sample without replacement.  The draw is pure
    column algebra: reproducible across runs, partitionings, and
    engines (``ln`` and ``/`` are IEEE correctly-rounded in both Spark
    and DuckDB — the same guarantee the BM25/TF-IDF oracles rely on).

    Rows with NULL or non-positive weight are excluded (a zero-weight
    row can never be drawn; a negative weight is a caller bug surfaced
    by omission, not a crash).

    Plan: one projection + per-group window top-k (one exchange on
    ``by``); the global ``by=()`` case plans as
    ``TakeOrderedAndProject`` (per-partition k-row heaps + one k-row
    merge) instead of an all-rows single-partition window — the
    global-top-k hazard class (round 10).

    Returns the sampled input rows (original schema).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = _col(weight_col)
    # (bucket + 1) / 2^32 == hash_uniform + 2^-32 exactly (both terms
    # are dyadic multiples of 2^-32, so the sum is exact) — reuse the
    # shared draw instead of duplicating the md5 pipeline, inheriting
    # its NULL-id handling
    u = hash_uniform(id_col, seed) + F.lit(1.0 / _TWO_32)  # (0, 1]
    priority = -F.log(u) / w.cast("double")
    eligible = df.where(w.isNotNull() & (w.cast("double") > 0)).withColumn(
        "__priority", priority
    )
    if by:
        win = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
            F.col("__priority").asc(), _col(id_col).asc()
        )
        return (
            eligible.withColumn("__rn", F.row_number().over(win))
            .where(F.col("__rn") <= k)
            .drop("__priority", "__rn")
        )
    # global form: TakeOrderedAndProject for sane k, spillable
    # sort+rank above TOP_N_SPILL_THRESHOLD (the per-task heap does
    # not spill — see global_top_n)
    return global_top_n(
        eligible,
        [F.col("__priority").asc(), _col(id_col).asc()],
        int(k),
        unpersist_handle=unpersist_handle,
    ).drop("__priority")


def interleave_by_mix(
    df: DataFrame,
    source_col: str,
    weights: Dict[str, float],
    id_col: Union[str, Column],
    seed: int = 42,
    out: str = "interleave_key",
) -> DataFrame:
    """Deterministic training-order interleaving: a global ordering in
    which every prefix contains each source in (approximately) its
    target proportion — stride scheduling applied to data mixing.
    Sorting by ``out`` yields a stream where a source with share ``w``
    appears once every ``1/w`` positions, instead of the
    source-clumped order a plain sort or union produces.

    Each row gets a frozen within-source rank ``r`` (md5 draw keyed on
    ``id_col`` — reproducible, partitioning-independent) and the key
    ``(r − 0.5) · (Σweights / w_source)`` — the classic stride formula:
    merging all sources by key interleaves them at their target rates
    from the very first row (no epoch boundary, no RNG state).

    Rows whose source has no entry in ``weights`` get a NULL key —
    visible, never silently dropped.  One hash-partition exchange on
    the source (the rank window); the sort by ``out`` is wherever the
    consumer puts it (e.g. a range-partitioned write).

    Adds ``src_rank`` and ``out``."""
    if not weights:
        raise ValueError("weights must not be empty")
    total = float(sum(weights.values()))
    if total <= 0 or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    u = hash_uniform(id_col, seed)
    w_rank = Window.partitionBy(source_col).orderBy(u.asc(), _col(id_col).asc())
    ranked = df.withColumn("src_rank", F.row_number().over(w_rank))
    # per-source stride as a Python-computed literal: identical float in
    # Spark and any SQL oracle (no engine-side division ordering issues)
    expr: Column = F.lit(None).cast("double")
    for name, w in weights.items():
        stride = total / float(w)
        expr = F.when(F.col(source_col) == name, F.lit(stride)).otherwise(expr)
    return ranked.withColumn(
        out, (F.col("src_rank").cast("double") - F.lit(0.5)) * expr
    )


def interleave_by_mix_sql(
    table_or_subquery: str,
    source_expr: str,
    weights: Dict[str, float],
    id_expr: str,
    seed: int = 42,
) -> str:
    """DuckDB query in lock-step with :func:`interleave_by_mix`."""
    total = float(sum(weights.values()))
    u = hash_uniform_sql(id_expr, seed)
    branches = " ".join(
        f"WHEN {source_expr} = {_sql_str(name)} THEN {total / float(w)!r}"
        for name, w in weights.items()
    )
    return f"""
SELECT *,
       (CAST(src_rank AS DOUBLE) - 0.5)
         * (CASE {branches} ELSE NULL END) AS interleave_key
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY {source_expr} ORDER BY {u} ASC, {id_expr} ASC
         ) AS src_rank
  FROM {table_or_subquery}
)
"""


def repeat_upsample(
    df: DataFrame,
    rate,
    id_col: Union[str, Column],
    strata_col: Union[str, Column, None] = None,
    seed: int = 42,
    out: str = "epoch",
) -> DataFrame:
    """Fractional-epoch upsampling: materialize each row
    ``floor(rate)`` times plus one more with probability
    ``rate − floor(rate)`` — how mixture training realizes "2.4 epochs
    of Wikipedia" deterministically.  ``rate`` is a float applied to
    every row, or a ``{stratum: rate}`` dict with ``strata_col``
    (strata absent from the dict are dropped — same contract as
    :func:`resample_to_mix`).  Rates below 1 degrade to the plain
    Bernoulli keep.

    The fractional draw is the frozen md5 draw, so the expanded corpus
    is reproducible and partitioning-independent; ``out`` numbers each
    copy 0..n−1 (distinct copies stay distinguishable downstream, e.g.
    for :func:`deterministic_shuffle`).

    Scale shape: a pure projection (rate lookup + draw) followed by one
    ``posexplode`` — no join, no shuffle; output size is exactly
    Σ n_i."""
    if isinstance(rate, dict):
        if strata_col is None:
            raise ValueError("strata_col is required when rate is a dict")
        if not rate:
            raise ValueError("rate dict must not be empty")
        strata = _col(strata_col)
        r: Column = F.lit(None).cast("double")
        for value, item in rate.items():
            if float(item) < 0:
                raise ValueError(f"rates must be >= 0, got {item!r} for {value!r}")
            # eqNullSafe so a None key matches NULL strata (== never can)
            r = F.when(strata.eqNullSafe(F.lit(value)), F.lit(float(item))).otherwise(r)
    else:
        if float(rate) < 0:
            raise ValueError(f"rate must be >= 0, got {rate!r}")
        r = F.lit(float(rate))
    whole = F.floor(r).cast("long")
    frac = r - F.floor(r)
    extra = (hash_uniform(id_col, seed) < frac).cast("long")
    n = (whole + extra).alias("__n")
    # sequence(1, 0) would DESCEND — guard empties explicitly; explode of
    # an empty array drops the row (that's the rate<1 keep semantics),
    # and a NULL rate (stratum not in the dict) drops the row the same way
    empty = F.array_remove(F.array(F.lit(1)), 1)
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(empty)
    return df.select("*", F.posexplode(copies).alias(out, "__copy")).drop("__copy")


def temperature_mix(
    df: DataFrame,
    strata_col: Union[str, Column],
    alpha: float,
    id_col: Union[str, Column],
    seed: int = 42,
) -> DataFrame:
    """Temperature-scaled mixture downsampling (the multilingual
    "alpha sampling" of mC4 / XLM-R): resample so stratum shares become
    proportional to ``count^alpha`` instead of ``count``.  ``alpha=1``
    keeps the natural mix (no-op rates), ``alpha=0`` targets a uniform
    mix; the usual 0.3–0.7 range lifts low-resource strata without
    letting the head domains dominate.

    Realized exactly like :func:`resample_to_mix` — the largest corpus
    achieving the target shares keeps the binding stratum at 100%.
    With ``t_g ∝ c_g^α`` the per-stratum keep rate collapses to the
    closed form ``(c_min / c_g)^(1-α)``: the *smallest* stratum is
    always the binding one, everything larger is thinned toward it.
    The draw is the deterministic :func:`hash_uniform`, so the output
    is frozen across runs and partitionings.

    Scale shape: one map-side-combined count aggregate with the rarest
    count window-attached on its |strata|-row output (single consumer —
    round-10 REST discipline), a ≤|strata|-row broadcast rate table
    joined back — the corpus scans twice (count + filter) and never
    shuffles.  Unlike
    :func:`resample_to_mix` there is no target dict to maintain: the
    mix is derived from the data, so new strata are handled without
    config changes.
    """
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    strata = _col(strata_col)
    counts = df.groupBy(strata.alias("__stratum")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    # the rarest stratum's count rides a single-partition window over
    # the |strata|-row count frame — a separate .agg cross-joined back
    # made the corpus groupBy its own second consumer (round-10 REST
    # census discipline; min is min, values unchanged)
    cmin = F.min("__c").over(Window.partitionBy())
    rates = counts.select(
        "__stratum",
        F.pow(
            cmin.cast("double") / F.col("__c").cast("double"),
            F.lit(1.0 - float(alpha)),
        ).alias("__rate"),
    )
    joined = df.join(F.broadcast(rates), strata.eqNullSafe(F.col("__stratum")), "inner")
    return joined.where(hash_uniform(id_col, seed) < F.col("__rate")).drop(
        "__stratum", "__rate"
    )


def temperature_mix_sql(
    table: str,
    strata_expr: str,
    alpha: float,
    id_expr: str,
    *,
    seed: int = 42,
    columns: str = "d.*",
) -> str:
    """DuckDB query computing exactly :func:`temperature_mix` — kept in
    lock-step for the oracle gates.

    .. note:: ``seed`` and ``columns`` are keyword-only.  An earlier
       release took ``(columns, seed)`` positionally in the opposite
       order; the keyword-only marker turns any stale positional call
       into an immediate ``TypeError`` instead of silently binding
       ``columns`` to ``seed``."""
    return f"""
WITH counts AS (
  SELECT {strata_expr} AS stratum, COUNT(*) AS c
  FROM {table} d GROUP BY 1
),
mn AS (SELECT MIN(c) AS cmin FROM counts),
rates AS (
  SELECT stratum,
         pow(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE), {1.0 - float(alpha)!r}) AS rate
  FROM counts CROSS JOIN mn
)
SELECT {columns}
FROM {table} d JOIN rates r ON {strata_expr} IS NOT DISTINCT FROM r.stratum
WHERE {hash_uniform_sql(id_expr, seed)} < r.rate
"""
