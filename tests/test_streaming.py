"""Structured Streaming extension tests — file source, availableNow
trigger, memory sink (fast, deterministic)."""

import datetime

import pytest

from spark_extension_spark.streaming import (
    foreach_batch_diff,
    streaming_exact_dedup,
    streaming_histogram,
    streaming_quality_monitor,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def stream_source(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "docs")
    rows = [
        (1, "hello world", T0),
        (2, "hello  world!", T0 + datetime.timedelta(seconds=10)),  # dup of 1
        (3, "different text", T0 + datetime.timedelta(seconds=20)),
        (4, "hello world", T0 + datetime.timedelta(seconds=90)),    # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    df.coalesce(1).write.parquet(path)
    return path


def _run(spark, stream_df, name, mode="append"):
    # aggregates use "complete": in append mode a window only emits once
    # the watermark passes it, which never happens in a single
    # availableNow batch
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def _read_stream(spark, path):
    return (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(path)
    )


def test_streaming_exact_dedup(spark, stream_source):
    stream = _read_stream(spark, stream_source)
    out = _run(
        spark,
        streaming_exact_dedup(stream, watermark="1 minute"),
        "dedup_sink",
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    # 2 dedups against 1 (same watermark window); 3 unique;
    # 4 arrives within state horizon of the single batch -> also dropped
    assert 1 in ids and 3 in ids
    assert 2 not in ids
    assert len(ids) <= 3


def test_streaming_histogram(spark, stream_source):
    stream = _read_stream(spark, stream_source)
    lengths = stream.selectExpr("doc_id", "length(text) as n", "ts")
    out = _run(
        spark,
        streaming_histogram(lengths, [12], "n", window_duration="1 minute"),
        "hist_sink",
        mode="complete",
    )
    rows = out.collect()
    assert rows, "windowed aggregate should emit finalized windows"
    total = sum(r["≤12"] + r[">12"] for r in rows)
    assert total == 4


def test_streaming_quality_monitor(spark, stream_source):
    stream = _read_stream(spark, stream_source)
    out = _run(
        spark,
        streaming_quality_monitor(stream, window_duration="1 minute"),
        "quality_sink",
        mode="complete",
    )
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == 4
    assert all(r["n_empty"] == 0 for r in rows)


def test_foreach_batch_diff(spark, stream_source, tmp_path):
    stream = _read_stream(spark, stream_source)
    reference = spark.createDataFrame(
        [(1, "hello world"), (9, "only in reference")], ["doc_id", "text"]
    )
    seen = {}

    def on_batch(diff_df, batch_id):
        for r in diff_df.collect():
            seen[(r["doc_id"], r["diff"])] = True

    writer = foreach_batch_diff(
        stream.select("doc_id", "text"), reference, ["doc_id"], on_batch
    )
    q = writer.option("checkpointLocation", str(tmp_path / "ckpt")).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    assert (1, "N") in seen          # identical row
    assert (9, "I") in seen          # reference-only row
    assert any(k[1] == "D" for k in seen)  # stream-only rows


def test_streaming_sessionize(spark, tmp_path_factory):
    from spark_extension_spark.streaming import streaming_sessionize

    path = str(tmp_path_factory.mktemp("stream") / "events")
    rows = [
        # user 1: two bursts separated by > 30 min -> two sessions
        (1, T0),
        (1, T0 + datetime.timedelta(minutes=5)),
        (1, T0 + datetime.timedelta(minutes=90)),
        # user 2: one event
        (2, T0 + datetime.timedelta(minutes=1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(path)
    out = _run(
        spark,
        streaming_sessionize(stream, gap="30 minutes", by=["user_id"]),
        "sessions_test",
        mode="complete",
    )
    got = sorted(
        (r["user_id"], r["n_events"]) for r in out.collect()
    )
    assert got == [(1, 1), (1, 2), (2, 1)]
    bounds = {
        (r["user_id"], r["n_events"]): (r["t_first"], r["t_last"]) for r in out.collect()
    }
    assert bounds[(1, 2)] == (T0, T0 + datetime.timedelta(minutes=5))


def test_streaming_dedup_against(spark, stream_source):
    from spark_extension_spark.streaming import streaming_dedup_against

    seen = spark.createDataFrame(
        [(100, "HELLO world"), (101, "never streamed")], ["doc_id", "text"]
    )
    stream = _read_stream(spark, stream_source)
    out = _run(
        spark,
        streaming_dedup_against(stream, seen),
        "dedup_against_sink",
    )
    got = sorted(r["doc_id"] for r in out.collect())
    # 1, 2, 4 normalize to "hello world" = seen doc 100; only 3 survives
    assert got == [3]


def test_streaming_rolling_counts(spark, stream_source):
    from spark_extension_spark.streaming import streaming_rolling_counts

    stream = _read_stream(spark, stream_source)
    out = _run(
        spark,
        streaming_rolling_counts(
            stream,
            window_duration="1 minute",
            slide_duration="30 seconds",
            watermark="1 minute",
        ),
        "rolling_sink",
        mode="complete",
    ).collect()
    got = {
        (r["window"]["start"].strftime("%H:%M:%S"), r["n_events"]) for r in out
    }
    # events at t=0s,10s,20s,90s; 1-minute windows sliding every 30s:
    # [23:59:30, 00:00:30) -> 3, [00:00:00, 00:01:00) -> 3,
    # [00:00:30, 00:01:30) -> 1, [00:01:00, 00:02:00) -> 1
    assert ("00:00:00", 3) in got
    assert ("00:01:00", 1) in got
    # each event contributes to exactly window/slide = 2 windows
    assert sum(n for _, n in got) == 8


def test_streaming_running_stats(spark, tmp_path):
    """applyInPandasWithState: per-key totals must accumulate across
    micro-batches (state survives between files)."""
    import datetime as _dt

    from spark_extension_spark.streaming import streaming_running_stats

    path = str(tmp_path / "events")
    t0 = _dt.datetime(2024, 1, 1)
    batch1 = [(1, 10.0, t0), (1, 20.0, t0), (2, 5.0, t0)]
    batch2 = [(1, 30.0, t0), (2, -1.0, t0)]
    schema = "user_id long, value double, ts timestamp"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(path)
    )
    out = streaming_running_stats(stream, "user_id", "value")
    query = (
        out.writeStream.format("memory")
        .queryName("running_stats_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.sql("select * from running_stats_sink").collect()
    # last emitted row per key reflects the full history
    last = {}
    for r in rows:
        last[r["user_id"]] = r  # memory sink appends in batch order
    assert last[1]["n"] == 3 and last[1]["total"] == 60.0
    assert last[1]["vmin"] == 10.0 and last[1]["vmax"] == 30.0
    assert last[2]["n"] == 2 and last[2]["total"] == 4.0 and last[2]["vmin"] == -1.0


def test_foreach_batch_near_dedup(spark, tmp_path):
    """Micro-batches are screened against the accepted corpus with
    MinHash LSH: near-copies (suffix-shifted) drop, fresh docs pass."""
    import datetime as _dt

    from spark_extension_spark.streaming import foreach_batch_near_dedup

    t0 = _dt.datetime(2024, 1, 1)
    base_text = " ".join(f"word{i} token{i}" for i in range(40))
    seen = spark.createDataFrame(
        [(100, base_text)], "doc_id long, text string"
    )
    path = str(tmp_path / "incoming")
    incoming = [
        (1, base_text + " tiny new suffix", t0),          # near-dup of seen
        (2, " ".join(f"fresh{i} novel{i}" for i in range(40)), t0),  # new
    ]
    spark.createDataFrame(
        incoming, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.parquet(path)

    survivors = []

    def collect_batch(df, batch_id):
        survivors.extend(r["doc_id"] for r in df.select("doc_id").collect())

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(path)
    )
    q = (
        foreach_batch_near_dedup(stream, seen, collect_batch, threshold=0.5)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert survivors == [2]


def test_streaming_ttl_dedup(spark, tmp_path):
    """transformWithStateInPandas: first copy of each content passes,
    later copies drop — across micro-batches (state persists).

    Skipped where the protobuf package is absent (the
    transformWithState driver worker needs it; this container lacks
    it) — the operator probes and raises a clear ImportError then."""
    import datetime as _dt

    from spark_extension_spark.streaming import streaming_ttl_dedup

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        stream0 = spark.readStream.format("rate").load()
        with pytest.raises(ImportError, match="protobuf"):
            streaming_ttl_dedup(stream0, text_col="value")
        pytest.skip("protobuf not installed: transformWithState unavailable")

    t0 = _dt.datetime(2024, 1, 1)
    path = str(tmp_path / "docs")
    schema = "doc_id long, text string, ts timestamp"
    spark.createDataFrame(
        [(1, "hello world", t0), (2, "fresh content", t0)], schema
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, "Hello,  WORLD!", t0), (4, "brand new", t0)], schema  # 3 dups 1
    ).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        streaming_ttl_dedup(stream)
        .writeStream.format("memory")
        .queryName("ttl_dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.sql("select * from ttl_dedup_sink").collect()
    )
    assert got == [1, 2, 4]  # doc 3 is a normalized duplicate of doc 1


def test_streaming_mix_monitor(spark, tmp_path):
    import datetime as _dt

    from spark_extension_spark.streaming import streaming_mix_monitor

    t0 = _dt.datetime(2024, 1, 1)
    rows = (
        [(i, "web", t0) for i in range(6)]
        + [(10 + i, "wiki", t0) for i in range(3)]
        + [(20, "unlisted", t0)]
    )
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, source string, ts timestamp").coalesce(
        1
    ).write.parquet(path)
    stream = spark.readStream.schema("doc_id long, source string, ts timestamp").parquet(path)
    out = streaming_mix_monitor(
        stream, {"web": 0.5, "wiki": 0.5}, window_duration="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mix_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r = spark.sql("select * from mix_sink").collect()[0]
    assert r["n_total"] == 10 and r["n_other"] == 1
    assert r["share_web"] == 0.6 and r["share_wiki"] == 0.3
    assert r["max_abs_dev"] == pytest.approx(0.2)  # wiki 0.3 vs target 0.5


def test_streaming_asof_enrich(spark, tmp_path, tmp_path_factory):
    from spark_extension_spark.streaming import streaming_asof_enrich

    path = str(tmp_path_factory.mktemp("stream") / "trades")
    spark.createDataFrame(
        [(1, 100, 10.0), (2, 205, 20.0), (3, 50, 30.0)], "id long, t long, v double"
    ).write.parquet(path)
    quotes = spark.createDataFrame(
        [(90, "q90"), (200, "q200")], "t long, quote string"
    )
    stream = spark.readStream.schema("id long, t long, v double").parquet(path)
    got = {}

    def on_batch(df, batch_id):
        for r in df.collect():
            got[r["id"]] = r["right_quote"]

    q = (
        streaming_asof_enrich(stream, quotes, "t", on_batch=on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_asof"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got == {1: "q90", 2: "q200", 3: None}  # nearest quote at-or-before


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    """Offset + state-store recovery: a second availableNow run on the
    same checkpoint must (a) process only newly-arrived files and
    (b) still drop a duplicate of a row seen by the FIRST run — the
    dedup hash state lives in the checkpointed state store, not the
    process."""
    import os

    from spark_extension_spark.streaming import streaming_exact_dedup

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def arrive(batch, rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, ts timestamp"
        ).coalesce(1).write.parquet(f"{src}/b{batch}", mode="overwrite")
        # file source discovers files under the input path glob
        for f in os.listdir(f"{src}/b{batch}"):
            if f.endswith(".parquet"):
                os.rename(f"{src}/b{batch}/{f}", f"{src}/{f}")

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .parquet(src)
        )
        q = (
            streaming_exact_dedup(stream, watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    arrive(1, [(1, "hello world", T0),
               (2, "unique alpha", T0 + datetime.timedelta(seconds=10))])
    run_once()
    first = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert first == {1, 2}

    # doc 3 duplicates doc 1 (seen only by the previous run); doc 4 is new
    arrive(2, [(3, "hello  world!", T0 + datetime.timedelta(seconds=60)),
               (4, "unique beta", T0 + datetime.timedelta(seconds=70))])
    run_once()
    second = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert second == {1, 2, 4}  # 3 dropped by recovered state


def test_streaming_mix_monitor_awkward_stratum_names(spark, tmp_path):
    """Stratum names are data values: dots must not break column
    references, and 'total'/'other' (which would collide with the
    n_total/n_other outputs) are rejected up front."""
    import datetime as _dt

    from spark_extension_spark.streaming import streaming_mix_monitor

    t0 = _dt.datetime(2024, 1, 1)
    rows = [(0, "a.b", t0), (1, "a.b", t0), (2, "plain", t0), (3, "x", t0)]
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, source string, ts timestamp").coalesce(
        1
    ).write.parquet(path)
    schema = "doc_id long, source string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(path)
    out = streaming_mix_monitor(
        stream, {"a.b": 0.5, "plain": 0.5}, window_duration="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mix_dots_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r = spark.sql("select * from mix_dots_sink").collect()[0]
    assert r["n_total"] == 4 and r["n_other"] == 1
    assert r["n_a.b"] == 2 and r["share_plain"] == 0.25

    for bad in ("total", "other"):
        with pytest.raises(ValueError, match="collide"):
            streaming_mix_monitor(stream, {bad: 1.0})


def test_streaming_running_stats_skips_nulls(spark, tmp_path):
    """NULL values must not count toward n, and an all-NULL first batch
    must not checkpoint NaN into vmin/vmax (NaN never orders under
    min/max, so it would poison the key's stats forever)."""
    import datetime as _dt

    from spark_extension_spark.streaming import streaming_running_stats

    path = str(tmp_path / "events")
    t0 = _dt.datetime(2024, 1, 1)
    schema = "user_id long, value double, ts timestamp"
    # batch 1: all NULL for user 1; batch 2: real values
    spark.createDataFrame(
        [(1, None, t0), (1, None, t0)], schema
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(1, 5.0, t0), (1, None, t0), (1, 7.0, t0)], schema
    ).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = streaming_running_stats(stream, "user_id", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("running_stats_nulls_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from running_stats_nulls_sink").collect()
    last = rows[-1]
    assert last["n"] == 2 and last["total"] == 12.0
    assert last["vmin"] == 5.0 and last["vmax"] == 7.0


def test_streaming_asof_enrich_releases_batch_caches(spark, tmp_path):
    """The per-batch keyless asof persist must be released after
    on_batch — a long stream otherwise accumulates one cached frame per
    micro-batch."""
    from spark_extension_spark.streaming import streaming_asof_enrich

    path = str(tmp_path / "trades")
    spark.createDataFrame(
        [(1, 100, 10.0), (2, 205, 20.0)], "id long, t long, v double"
    ).write.parquet(path)
    quotes = spark.createDataFrame([(90, "q90")], "t long, quote string")
    stream = spark.readStream.schema("id long, t long, v double").parquet(path)

    def on_batch(df, batch_id):
        df.count()

    before = len(
        [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    )
    q = (
        streaming_asof_enrich(stream, quotes, "t", on_batch=on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    after = len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    assert after <= before


def test_streaming_running_stats_rejects_colliding_key_col(spark):
    from spark_extension_spark.streaming import streaming_running_stats

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value % 3 as total", "cast(value as double) as v")
    )
    with pytest.raises(ValueError, match="collides with a stats output column"):
        streaming_running_stats(stream, key_col="total", value_col="v")


def test_streaming_mix_monitor_rejects_stringify_collisions(spark):
    from spark_extension_spark.streaming import streaming_mix_monitor

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("timestamp as ts", "cast(value % 2 as string) as source")
    )
    with pytest.raises(ValueError, match="colliding output column names"):
        streaming_mix_monitor(stream, targets={1: 0.5, "1": 0.5})


def test_streaming_asof_enrich_requires_on_batch(spark):
    from spark_extension_spark.streaming import streaming_asof_enrich

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("timestamp as ts", "value as v")
    )
    dim = spark.createDataFrame([(0, 1.0)], "ts long, price double")
    with pytest.raises(TypeError, match="requires on_batch"):
        streaming_asof_enrich(stream, dim, "ts")
