"""Structured Streaming extensions.

The reference is batch-only (SURVEY.md §2.11) — this module is
beyond-parity surface: the pipeline operators re-expressed for
``readStream`` sources, built purely on Spark's streaming-native
primitives (watermarks, ``dropDuplicatesWithinWatermark``, windowed
aggregation, ``foreachBatch``), so state management, late-data handling
and checkpointing come from Spark, not custom code.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.text import normalize_text

__all__ = [
    "streaming_exact_dedup",
    "streaming_dedup_against",
    "streaming_histogram",
    "streaming_quality_monitor",
    "streaming_rolling_counts",
    "streaming_running_stats",
    "streaming_sessionize",
    "foreach_batch_diff",
    "foreach_batch_near_dedup",
    "streaming_ttl_dedup",
    "streaming_mix_monitor",
    "streaming_asof_enrich",
]


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
    normalized: bool = True,
) -> DataFrame:
    """Streaming exact dedup: drop rows whose content hash was already
    seen within the watermark horizon.  State is bounded by the
    watermark (Spark evicts expired hashes) — the streaming analogue of
    :func:`~spark_extension_spark.operators.dedup.exact_dedup`."""
    content = normalize_text(text_col) if normalized else F.col(text_col)
    hashed = stream.withColumn("__content_hash", F.md5(content))
    deduped = hashed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        ["__content_hash"]
    )
    return deduped.drop("__content_hash")


def streaming_dedup_against(
    stream: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    seen_text_col: str = None,
) -> DataFrame:
    """Streaming ingestion against an accepted corpus: drop stream rows
    whose normalized content hash occurs in the static ``seen`` table —
    the streaming analogue of
    :func:`~spark_extension_spark.operators.dedup.dedup_against`,
    expressed as a stream-static left-anti join (supported natively by
    Structured Streaming; the static side is re-read per micro-batch,
    so point it at the *fingerprint* table, not 100 TB of text, and
    refresh it out-of-band).  Compose :func:`streaming_exact_dedup`
    after it to also dedup within the stream's watermark horizon."""
    from ..operators.text import fingerprint

    seen_fp = seen.select(
        fingerprint(seen_text_col or text_col).alias("__fp")
    ).distinct()
    return (
        stream.withColumn("__fp", fingerprint(text_col))
        .join(seen_fp, "__fp", "left_anti")
        .drop("__fp")
    )


def streaming_histogram(
    stream: DataFrame,
    thresholds: Sequence,
    value_column: str,
    event_time_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed threshold histogram over a stream: per event-time window,
    counts of the value column in ``≤t…>t`` bins — the streaming analogue
    of :func:`~spark_extension_spark.operators.histogram.histogram`,
    with late data handled by the watermark."""
    if len(thresholds) == 0:
        raise ValueError("Thresholds must not be empty")
    if len(set(thresholds)) != len(thresholds):
        raise ValueError("Thresholds must not contain duplicates")
    ordered = sorted(thresholds)
    value = F.col(value_column)

    def indicator(cond: Column) -> Column:
        return F.when(cond, 1).otherwise(0)

    bins = [(f"≤{ordered[0]}", indicator(value <= ordered[0]))]
    bins += [
        (f"≤{hi}", indicator((value > lo) & (value <= hi)))
        for lo, hi in zip(ordered, ordered[1:])
    ]
    bins.append((f">{ordered[-1]}", indicator(value > ordered[-1])))

    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window_duration).alias("window"))
        .agg(*[F.sum(col).alias(name) for name, col in bins])
    )


def streaming_quality_monitor(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window corpus quality aggregates (doc count, mean length,
    empty-doc count) — a streaming QC dashboard feed."""
    t = F.col(text_col)
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window_duration).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.length(t)).alias("mean_chars"),
            F.sum(F.when(F.trim(t) == "", 1).otherwise(0)).alias("n_empty"),
        )
    )


def streaming_rolling_counts(
    stream: DataFrame,
    by: Sequence[str] = (),
    event_time_col: str = "ts",
    window_duration: str = "1 hour",
    slide_duration: str = "5 minutes",
    watermark: str = "10 minutes",
    aggregates: dict = None,
) -> DataFrame:
    """Per-key sliding-window aggregates over a stream — the streaming
    analogue of
    :func:`~spark_extension_spark.operators.timeseries.rolling_aggregates`
    (rate features, burst detection) built on Spark's native sliding
    ``window()``: each event lands in ``window/slide`` overlapping
    windows and state is bounded per (key, window), evicted once the
    watermark passes.

    Batch `rolling_aggregates` gives an exact per-*row* trailing frame;
    a stream cannot (that frame never closes), so this trades frame
    granularity for the ``slide_duration`` grid — the standard
    streaming formulation.  Default aggregates: event count.
    """
    aggs = aggregates or {"n_events": F.count(F.lit(1))}
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(
            F.window(event_time_col, window_duration, slide_duration).alias("window"),
            *[F.col(c) for c in by],
        )
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )


def streaming_sessionize(
    stream: DataFrame,
    gap: str = "30 minutes",
    by: Sequence[str] = ("user_id",),
    event_time_col: str = "ts",
    watermark: str = "1 hour",
    aggregates=None,
) -> DataFrame:
    """Streaming gap-based sessionization via Spark's native
    ``session_window``: one row per closed (key, session) with event
    count, session bounds, and any extra ``aggregates`` (name → Column).

    The streaming analogue of
    :func:`~spark_extension_spark.operators.timeseries.session_summary`:
    the same gap semantics, but sessions extend while events keep
    arriving within ``gap`` and close when the watermark passes — state
    per open session only, evicted on close, so it runs indefinitely."""
    extra = aggregates or {}
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(
            F.session_window(F.col(event_time_col), gap).alias("session"),
            *[F.col(c) for c in by],
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(event_time_col).alias("t_first"),
            F.max(event_time_col).alias("t_last"),
            *[c.alias(n) for n, c in extra.items()],
        )
    )


def foreach_batch_diff(
    stream: DataFrame,
    reference: DataFrame,
    id_columns: Sequence[str],
    on_batch: Callable[[DataFrame, int], None],
    options=None,
):
    """Data-drift monitor: diff every micro-batch against a static
    reference table and hand the I/C/D/N result to ``on_batch``.
    Returns a ``DataStreamWriter`` — call ``.start()`` (with a
    checkpoint location) to run."""
    from ..operators.diff import Differ

    differ = Differ(options)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        on_batch(differ.diff(batch_df, reference, list(id_columns)), batch_id)

    return stream.writeStream.foreachBatch(process)


def streaming_running_stats(
    stream: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: exact
    per-key running statistics (count / sum / min / max) maintained in
    managed GroupState across micro-batches — the pattern for stateful
    logic that native watermarked windows cannot express (cross-window
    lifetime totals, per-entity accumulators).

    Each micro-batch emits one updated row per key seen in the batch
    (output mode ``update``).  State is one fixed-size tuple per key —
    bounded by cardinality, not stream length — and Spark checkpoints
    it, so the operator restarts exactly.  The kernel is Arrow-batched
    (pandas per group-batch), never row-at-a-time.

    The running ``total`` is a float accumulated in arrival order —
    inherent to any incremental streaming sum; counts/min/max are
    exact."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if key_col in ("n", "total", "vmin", "vmax"):
        # the output schema would gain a duplicate field while the
        # yielded pandas dict collapses the colliding key — every
        # micro-batch would then fail deep in Arrow conversion
        raise ValueError(
            f"key_col {key_col!r} collides with a stats output column "
            f"('n', 'total', 'vmin', 'vmax'); rename the key column first"
        )
    key_field = stream.schema[key_col]
    out_schema = StructType(
        [
            StructField(key_col, key_field.dataType),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("vmin", DoubleType()),
            StructField("vmax", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("vmin", DoubleType()),
            StructField("vmax", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            n, total, vmin, vmax = state.get
        else:
            n, total, vmin, vmax = 0, 0.0, None, None
        for pdf in pdfs:
            # NULLs arrive as NaN after the float64 cast: drop them so
            # n counts exactly the values summed, and so an all-NULL
            # first batch can't checkpoint vmin = vmax = NaN (NaN never
            # orders under min/max — the poison would survive restarts)
            vals = pdf[value_col].astype("float64")
            vals = vals[vals.notna()]
            if len(vals) == 0:
                continue
            n += int(len(vals))
            total += float(vals.sum())
            bmin, bmax = float(vals.min()), float(vals.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
        state.update((n, total, vmin, vmax))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "total": [total],
                "vmin": [vmin],
                "vmax": [vmax],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def foreach_batch_near_dedup(
    stream: DataFrame,
    seen: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int = 10_000,
):
    """Streaming ingestion with *near*-duplicate screening against an
    accepted corpus: each micro-batch is run through
    :func:`~spark_extension_spark.operators.dedup.near_dedup_against`
    (banded MinHash LSH, new×seen bucket join, agreement-verified) and
    the surviving rows are handed to ``on_batch`` — the fuzzy
    complement of :func:`streaming_dedup_against`'s exact-hash filter.

    ``foreachBatch`` is the right primitive here (not a stream-static
    join): signatures need a per-document aggregate, which a streaming
    plan would force into stateful aggregation; per-batch batch-mode
    reuse keeps the documented LSH plan — bucket caps, broadcast-able
    seen side — intact.  At steady state, persist ``seen``'s signature
    frame upstream so only the batch side re-hashes per trigger; the
    per-batch caches are released via UnpersistHandles after each call.

    Returns a ``DataStreamWriter`` — call ``.start()`` (with a
    checkpoint location) to run."""
    from ..operators.dedup import near_dedup_against
    from ..utils import SilentUnpersistHandle

    def process(batch_df: DataFrame, batch_id: int) -> None:
        new_h, seen_h = SilentUnpersistHandle(), SilentUnpersistHandle()
        try:
            kept = near_dedup_against(
                batch_df,
                seen,
                id_col=id_col,
                text_col=text_col,
                n=n,
                num_hashes=num_hashes,
                bands=bands,
                threshold=threshold,
                max_bucket_size=max_bucket_size,
                new_unpersist_handle=new_h,
                seen_unpersist_handle=seen_h,
            )
            on_batch(kept, batch_id)
        finally:
            new_h()
            seen_h()

    return stream.writeStream.foreachBatch(process)


def streaming_ttl_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ttl_ms: Optional[int] = None,
    normalized: bool = True,
):
    """Exact streaming dedup with TTL state — Spark 4's
    ``transformWithStateInPandas`` (the successor stateful API): the
    first document carrying each content hash passes, every later copy
    is dropped for as long as the hash stays in state.

    Unlike :func:`streaming_exact_dedup` (whose memory horizon is the
    *watermark* — tied to event time), state here lives for ``ttl_ms``
    of processing time (``None`` = forever): "dedup against everything
    ingested in the last 7 days" regardless of how late events are.
    State is one boolean per distinct content hash, TTL-evicted by the
    state store, checkpointed, and rescales with the shuffle — the
    exact-dedup hash-aggregate re-expressed as keyed streaming state.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package (the transformWithState driver worker speaks
    protobuf to the JVM state server) — probed at call time so a
    missing dependency fails fast here, not mid-query."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-specific
        raise ImportError(
            "streaming_ttl_dedup needs the 'protobuf' package: Spark's "
            "transformWithStateInPandas driver worker requires it "
            "(pip install protobuf). Use streaming_exact_dedup "
            "(watermark-horizon state, no extra deps) instead."
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    content = normalize_text(text_col) if normalized else F.col(text_col)
    hashed = stream.withColumn("__content_hash", F.md5(content))
    out_schema = hashed.schema

    class _FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "seen boolean", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            first = None
            for pdf in rows:
                if len(pdf) and first is None:
                    first = pdf.iloc[[0]]
            if self._seen.exists() or first is None:
                return iter(())
            self._seen.update((True,))
            return iter((first,))

        def close(self) -> None:
            pass

    deduped = hashed.groupBy("__content_hash").transformWithStateInPandas(
        statefulProcessor=_FirstSeen(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="ProcessingTime",
    )
    return deduped.drop("__content_hash")


def streaming_mix_monitor(
    stream: DataFrame,
    targets: dict,
    strata_col: str = "source",
    event_time_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed corpus-mix drift monitor: per event-time window, each
    target stratum's observed share vs its target share, plus the
    worst absolute deviation (``max_abs_dev`` — alert when it crosses
    your threshold).  The streaming observability companion to
    :func:`~spark_extension_spark.operators.sampling.interleave_by_mix`
    / ``resample_to_mix``: is the stream actually delivering the mix
    the pipeline was tuned for?

    Like :func:`streaming_histogram`, the whole computation is ONE
    watermarked windowed aggregate (conditional counts per target
    stratum — no second aggregation, which Structured Streaming would
    reject); strata outside ``targets`` fold into ``n_other``."""
    if not targets:
        raise ValueError("targets must not be empty")
    total_w = float(sum(targets.values()))
    if total_w <= 0:
        raise ValueError("targets must sum to a positive value")
    # 'total'/'other' strata would emit a second n_total/n_other column
    # — ambiguous for every downstream reference; reject up front
    reserved = {"total", "other"} & {str(n) for n in targets}
    if reserved:
        raise ValueError(
            f"target strata named {sorted(reserved)} collide with the"
            " n_total/n_other output columns; rename the stratum"
        )
    from ..utils import distinct_prefix_for

    s = F.col(strata_col)
    names = list(targets)
    # two keys that stringify identically (e.g. int 1 and str '1') would
    # both emit n_1/share_1 — a duplicate-name schema every sink rejects
    # and every downstream reference finds ambiguous; reject up front
    if len({f"{n}" for n in names}) != len(names):
        raise ValueError(
            "target strata stringify to colliding output column names: "
            f"{sorted(str(n) for n in names)}"
        )
    # aggregate under index-based internal aliases: stratum names are
    # data values and may contain dots or anything else that breaks a
    # column reference — only the final select exposes n_{name}
    prefix = distinct_prefix_for(stream.columns)
    aggs = [
        F.sum(F.when(s == F.lit(name), 1).otherwise(0)).alias(f"{prefix}n_{i}")
        for i, name in enumerate(names)
    ] + [
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(s.isin(names), 0).otherwise(1)).alias("n_other"),
    ]
    agg = (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window_duration).alias("window"))
        .agg(*aggs)
    )
    total = F.col("n_total").cast("double")
    counts = []
    shares = []
    devs = []
    for i, name in enumerate(names):
        n_i = F.col(f"{prefix}n_{i}")
        counts.append(n_i.alias(f"n_{name}"))
        share = n_i.cast("double") / total
        shares.append(share.alias(f"share_{name}"))
        devs.append(F.abs(share - F.lit(float(targets[name]) / total_w)))
    max_dev = devs[0]
    for d in devs[1:]:
        max_dev = F.greatest(max_dev, d)
    return agg.select(
        "window",
        "n_total",
        "n_other",
        *counts,
        *shares,
        max_dev.alias("max_abs_dev"),
    )


def streaming_asof_enrich(
    stream: DataFrame,
    dimension: DataFrame,
    on: str,
    by=None,
    on_batch: Callable[[DataFrame, int], None] = None,
    tolerance=None,
    direction: str = "backward",
):
    """Enrich a stream with the time-nearest row of a *static* slowly-
    changing dimension: every micro-batch is as-of joined (via the
    batch :func:`~spark_extension_spark.operators.asof.asof_join`)
    against ``dimension`` and handed to ``on_batch`` — the streaming
    counterpart of "attach the quote in effect at trade time" /
    "attach the model version live at event time".

    ``foreachBatch`` is the right mechanism, not a stream-stream join:
    the dimension is bounded and batch-readable, the as-of semantics
    (union + ordered window) are already exact in the batch operator,
    and each micro-batch joins against the dimension *as of that
    batch's execution* — re-reading a dimension that grew between
    batches is the desired behavior for slowly-changing enrichment.
    Returns a ``DataStreamWriter``; call ``.start()`` with a
    checkpoint location.
    """
    from ..operators.asof import asof_join
    from ..utils import SilentUnpersistHandle

    if on_batch is None:
        # fail at call time with a clear message — otherwise the query
        # launches and every micro-batch dies with a NoneType TypeError
        # deep inside the foreachBatch worker
        raise TypeError(
            "streaming_asof_enrich() requires on_batch: a callable "
            "(batch_df, batch_id) -> None that consumes each enriched "
            "micro-batch"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # the keyless asof path persists its range-partitioned union;
        # without releasing it after on_batch, a long-running stream
        # accumulates one cached frame per micro-batch until executor
        # storage thrashes (the foreach_batch_near_dedup discipline)
        handle = SilentUnpersistHandle()
        try:
            enriched = asof_join(
                batch_df,
                dimension,
                on,
                by=by,
                tolerance=tolerance,
                direction=direction,
                unpersist_handle=handle,
            )
            on_batch(enriched, batch_id)
        finally:
            handle()

    return stream.writeStream.foreachBatch(process)
