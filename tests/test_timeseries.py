"""Time-bucket rollup and range join tests."""

import datetime

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.timeseries import (
    range_join_bands,
    time_bucket,
    time_bucket_rollup,
)


def test_time_bucket(spark):
    t = datetime.datetime(2024, 1, 1, 10, 37, 22)
    df = spark.createDataFrame([(t,)], "ts timestamp")
    row = df.select(time_bucket("ts", 3600).alias("b")).collect()[0]
    assert row["b"] == datetime.datetime(2024, 1, 1, 10, 0, 0)


def test_time_bucket_pre_epoch_floors_down(spark):
    # negative epochs: Spark's % truncates toward zero, which would
    # round 23:59:30 UP to 1970-01-01 00:00:00 — time_bucket must floor
    t = datetime.datetime(1969, 12, 31, 23, 59, 30)
    df = spark.createDataFrame([(t,)], "ts timestamp")
    row = df.select(time_bucket("ts", 60).alias("b")).collect()[0]
    assert row["b"] == datetime.datetime(1969, 12, 31, 23, 59, 0)


def test_time_bucket_rollup(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t0 + datetime.timedelta(minutes=m), "click", 1.0) for m in (0, 30, 61, 62)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, kind string, v double")
    out = time_bucket_rollup(
        df, "ts", 3600, {"n": F.count(F.lit(1))}, group_by=["kind"]
    )
    got = {r["bucket"]: r["n"] for r in out.collect()}
    assert got == {t0: 2, t0 + datetime.timedelta(hours=1): 2}


def test_range_join_bands(spark):
    facts = spark.createDataFrame([(1, 5.0), (2, 50.0), (3, -1.0)], ["id", "v"])
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 100.0)], ["band", "low", "high"]
    )
    rows = {r["id"]: r["band"] for r in range_join_bands(facts, bands, "v").collect()}
    assert rows == {1: "low", 2: "mid", 3: None}


def test_range_join_is_broadcast(spark):
    from spark_extension_spark.plans import summarize_plan

    facts = spark.createDataFrame([(1, 5.0)], ["id", "v"])
    bands = spark.createDataFrame([("low", 0.0, 10.0)], ["band", "low", "high"])
    plan = summarize_plan(range_join_bands(facts, bands, "v"))
    assert "BroadcastNestedLoopJoin" in plan.joins
    assert not plan.has_cartesian


# -- sessionization ---------------------------------------------------------


def test_sessionize_gap_splitting(spark):
    from spark_extension_spark import sessionize

    rows = [
        # user 1: events at t=0s, 10s, 2000s, 2010s -> two sessions
        (1, 1, 0), (1, 2, 10_000_000), (1, 3, 2_000_000_000), (1, 4, 2_010_000_000),
        # user 2: single event
        (2, 5, 500),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts_us"])
    out = sessionize(df, "ts_us", gap=1_000_000_000, by=["user_id"], tiebreak=["event_id"])
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_timestamp_column(spark):
    from spark_extension_spark import sessionize
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base),
        (1, 2, base + dt.timedelta(minutes=10)),
        (1, 3, base + dt.timedelta(hours=3)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = sessionize(df, "ts", gap=3600, by=["user_id"], tiebreak=["event_id"])
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_session_summary_counts(spark):
    from spark_extension_spark import session_summary

    rows = [(1, i, i * 100) for i in range(5)] + [(1, 9, 10_000_000)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts_us"])
    out = session_summary(df, "ts_us", gap=1_000_000, by=["user_id"], tiebreak=["event_id"])
    got = {r["session_id"]: (r["n_events"], r["t_first"], r["t_last"]) for r in out.collect()}
    assert got == {1: (5, 0, 400), 2: (1, 10_000_000, 10_000_000)}


def test_sessionize_single_exchange(spark):
    from spark_extension_spark import sessionize
    from spark_extension_spark.plans import summarize_plan
    from spark_extension_spark.registry import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select("user_id", "event_id", "ts")
    plan = summarize_plan(
        sessionize(ev, "ts", gap=10**12, by=["user_id"], tiebreak=["event_id"])
    )
    # both window passes share the user_id hash partitioning: one shuffle
    assert plan.exchanges == 1 and plan.joins == []


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------


def test_interval_join_matches_naive_cross(spark):
    from spark_extension_spark.operators.timeseries import interval_join

    left = spark.createDataFrame(
        [(k, i, s, e) for i, (k, s, e) in enumerate(
            [("a", 0, 100), ("a", 50, 250), ("a", 300, 301), ("b", 0, 100),
             ("a", 400, 400),  # empty interval: never matches
             ("a", 500, 450)]  # inverted: never matches
        )],
        ["k", "lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [(k, i, s, e) for i, (k, s, e) in enumerate(
            [("a", 90, 120), ("a", 240, 360), ("b", 99, 500), ("a", 100, 240),
             ("a", 395, 405)]
        )],
        ["k", "rid", "rs", "re"],
    )
    got = {
        (r["lid"], r["rid"], r["overlap_start"], r["overlap_end"])
        for r in interval_join(
            left, right, "ls", "le", "rs", "re", by=["k"], grid=64
        ).collect()
    }
    naive = {
        (lr["lid"], rr["rid"], max(lr["ls"], rr["rs"]), min(lr["le"], rr["re"]))
        for lr in left.collect()
        for rr in right.collect()
        if lr["k"] == rr["k"]
        and max(lr["ls"], rr["rs"]) < min(lr["le"], rr["re"])
    }
    assert got == naive and len(got) > 0
    # pair (lid=1, rid=1) spans several 64-wide cells: surfaced exactly once
    mult = interval_join(left, right, "ls", "le", "rs", "re", by=["k"], grid=16)
    assert sorted(
        (r["lid"], r["rid"]) for r in mult.collect()
    ) == sorted((lid, rid) for lid, rid, _, _ in naive)


def test_interval_join_touching_intervals_do_not_match(spark):
    from spark_extension_spark.operators.timeseries import interval_join

    left = spark.createDataFrame([(1, 0, 100)], ["lid", "ls", "le"])
    right = spark.createDataFrame([(1, 100, 200)], ["rid", "rs", "re"])
    assert interval_join(left, right, "ls", "le", "rs", "re", grid=50).count() == 0


def test_interval_join_exact_at_nanosecond_axis_magnitude(spark):
    # cell assignment is pure int64 (start-valued cells): axes beyond
    # 2^52, where double-mediated floor(x / grid) drifts off the true
    # boundaries, still produce exact results — intervals packed
    # tightly around a cell boundary B near a present-day nanosecond
    # epoch (~1.7e18), including the B-1 edge doubles round away
    from spark_extension_spark.operators.timeseries import interval_join

    grid = 6 * 3600 * 10**9  # 6 h in nanoseconds
    b = (1_700_000_000_000_000_000 // grid + 1) * grid  # cell boundary
    left = spark.createDataFrame(
        [(0, b - 1, b), (1, b - grid, b - 1), (2, b, b + 1), (3, b - 2, b + 2)],
        "lid long, ls long, le long",
    )
    right = spark.createDataFrame(
        [(0, b - grid, b), (1, b - 1, b + 1), (2, b, b + grid)],
        "rid long, rs long, re long",
    )
    got = {
        (r["lid"], r["rid"], r["overlap_start"], r["overlap_end"])
        for r in interval_join(
            left, right, "ls", "le", "rs", "re", grid=grid
        ).collect()
    }
    naive = {
        (lr["lid"], rr["rid"], max(lr["ls"], rr["rs"]), min(lr["le"], rr["re"]))
        for lr in left.collect()
        for rr in right.collect()
        if max(lr["ls"], rr["rs"]) < min(lr["le"], rr["re"])
    }
    assert got == naive and len(got) > 0


class TestCohortRetention:
    def test_small_known_matrix(self, spark):
        from spark_extension_spark.operators.timeseries import cohort_retention

        # periods of width 10; users 1,2 start at p0, user 3 at p1
        rows = [
            (1, 5), (1, 15), (1, 25),   # active p0,p1,p2
            (2, 7), (2, 27),            # active p0,p2
            (3, 12), (3, 22),           # cohort p1, active p1,p2
            (3, 13),                    # same period dup -> one active row
            (None, 5), (4, None),       # excluded
        ]
        df = spark.createDataFrame(rows, "user_id long, ts long")
        out = {(r["cohort"], r["period_offset"]): r
               for r in cohort_retention(df, "user_id", "ts", 10).collect()}
        assert out[(0, 0)]["n_active"] == 2 and out[(0, 0)]["retention"] == 1.0
        assert out[(0, 1)]["n_active"] == 1 and out[(0, 1)]["retention"] == 0.5
        assert out[(0, 2)]["n_active"] == 2
        assert out[(1, 0)]["cohort_size"] == 1
        assert out[(1, 1)]["n_active"] == 1
        assert (1, 2) not in out

    def test_validation(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.timeseries import cohort_retention

        df = spark.createDataFrame([(1, 1)], "user_id long, ts long")
        with _pytest.raises(ValueError, match="period"):
            cohort_retention(df, "user_id", "ts", 0)


class TestFunnel:
    def test_order_matters(self, spark):
        from spark_extension_spark.operators.timeseries import funnel

        rows = [
            (1, "a", 10), (1, "b", 20), (1, "c", 30),  # full conversion
            (2, "a", 10), (2, "b", 5),                 # b BEFORE a: no step 2
            (3, "b", 10), (3, "c", 20),                # never did a: not counted
            (4, "a", 10), (4, "b", 20),                # stops at b
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
        out = {r["step"]: r for r in
               funnel(df, ["a", "b", "c"], "user_id", "ts").collect()}
        assert [out[s]["n_users"] for s in (1, 2, 3)] == [3, 2, 1]
        assert out[1]["frac_of_first"] == 1.0
        assert abs(out[2]["frac_of_prev"] - 2 / 3) < 1e-12
        assert abs(out[3]["frac_of_first"] - 1 / 3) < 1e-12
        assert out[3]["frac_of_prev"] == 0.5
        assert [out[s]["event_type"] for s in (1, 2, 3)] == ["a", "b", "c"]

    def test_within_window(self, spark):
        from spark_extension_spark.operators.timeseries import funnel

        rows = [
            (1, "a", 0), (1, "b", 5), (1, "c", 9),    # converts within 10
            (2, "a", 0), (2, "b", 5), (2, "c", 50),   # c outside window
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
        out = {r["step"]: r["n_users"] for r in
               funnel(df, ["a", "b", "c"], "user_id", "ts", within=10).collect()}
        assert out == {1: 2, 2: 2, 3: 1}

    def test_single_step_and_empty(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.timeseries import funnel

        df = spark.createDataFrame([(1, "a", 1)], "user_id long, event_type string, ts long")
        out = funnel(df, ["a"], "user_id", "ts").collect()
        assert len(out) == 1 and out[0]["n_users"] == 1
        with _pytest.raises(ValueError, match="at least one"):
            funnel(df, [], "user_id", "ts")


class TestResampleInterpolate:
    def test_linear_fill_known_values(self, spark):
        from spark_extension_spark.operators.timeseries import resample_interpolate

        # key g: observed at buckets 0 (v=10) and 3 (v=40); gaps at 1,2
        df = spark.createDataFrame(
            [("g", 5, 10.0), ("g", 35, 40.0), ("g", 36, 44.0)],
            "k string, ts long, v double",
        )
        out = {r["bucket_ts"]: r for r in
               resample_interpolate(df, "ts", "v", 10, by=["k"]).collect()}
        assert sorted(out) == [0, 10, 20, 30]
        assert out[0]["value"] == 10.0 and out[0]["interpolated"] is False
        assert out[30]["value"] == 42.0  # bucket mean of 40, 44
        assert abs(out[10]["value"] - (10 + (42 - 10) / 3)) < 1e-9
        assert abs(out[20]["value"] - (10 + 2 * (42 - 10) / 3)) < 1e-9
        assert out[10]["interpolated"] is True

    def test_ffill_and_edges(self, spark):
        from spark_extension_spark.operators.timeseries import resample_interpolate

        df = spark.createDataFrame(
            [("g", 10, 5.0), ("g", 40, 8.0)], "k string, ts long, v double"
        )
        lin = {r["bucket_ts"]: r["value"] for r in
               resample_interpolate(df, "ts", "v", 10, by=["k"]).collect()}
        ff = {r["bucket_ts"]: r["value"] for r in
              resample_interpolate(df, "ts", "v", 10, by=["k"], method="ffill").collect()}
        assert ff[20] == 5.0 and ff[30] == 5.0  # held, not interpolated
        assert lin[20] == 6.0 and lin[30] == 7.0

    def test_validation(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.timeseries import resample_interpolate

        df = spark.createDataFrame([("g", 1, 1.0)], "k string, ts long, v double")
        with _pytest.raises(ValueError, match="step"):
            resample_interpolate(df, "ts", "v", 0)
        with _pytest.raises(ValueError, match="method"):
            resample_interpolate(df, "ts", "v", 10, method="spline")


class TestTransitionMatrix:
    def test_known_sequences(self, spark):
        from spark_extension_spark.operators.timeseries import transition_matrix

        rows = [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),   # a->b, b->a
            (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),   # a->b, b->c
            (3, 9, "z"),                              # no successor
        ]
        df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
        out = {(r["from_event"], r["to_event"]): r for r in
               transition_matrix(df, "user_id", "ts").collect()}
        assert out[("a", "b")]["n"] == 2 and out[("a", "b")]["prob"] == 1.0
        assert out[("b", "a")]["prob"] == 0.5 and out[("b", "c")]["prob"] == 0.5
        assert ("z", None) not in out and all(k[0] != "z" for k in out)

    def test_tiebreak_determinism(self, spark):
        from spark_extension_spark.operators.timeseries import transition_matrix

        # two events at the SAME timestamp: order decided by id tiebreak
        df = spark.createDataFrame(
            [(1, 10, 100, "x"), (1, 10, 101, "y"), (1, 20, 102, "z")],
            "user_id long, ts long, event_id long, event_type string",
        )
        a = sorted(map(tuple, transition_matrix(
            df.coalesce(1), "user_id", "ts", tiebreak=["event_id"]).collect()))
        b = sorted(map(tuple, transition_matrix(
            df.repartition(5), "user_id", "ts", tiebreak=["event_id"]).collect()))
        assert a == b
        assert ("x", "y", 1, 1.0) in a  # 100 before 101 at equal ts


class TestDecayedAggregates:
    def test_matches_numpy_and_partitioning(self, spark):
        import numpy as np
        from datetime import datetime, timedelta

        from spark_extension_spark.operators.timeseries import decayed_aggregates

        t0 = datetime(2024, 1, 1)
        rows = [
            ("g%d" % (i % 2), t0 + timedelta(seconds=i * 37), float((i * 13) % 50))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, ["g", "ts", "v"])
        got = {r["g"]: r for r in decayed_aggregates(df, "ts", "v", 3600.0, by=["g"]).collect()}
        got2 = {r["g"]: r for r in decayed_aggregates(df.repartition(7), "ts", "v", 3600.0, by=["g"]).collect()}

        tmax = max(r[1] for r in rows)
        for g in ("g0", "g1"):
            ages = np.array([(tmax - r[1]).total_seconds() for r in rows if r[0] == g])
            vals = np.array([r[2] for r in rows if r[0] == g])
            w = 0.5 ** (ages / 3600.0)
            assert abs(got[g]["decayed_count"] - w.sum()) < 1e-9
            assert abs(got[g]["decayed_sum"] - (w * vals).sum()) < 1e-6
            assert got[g]["n_rows"] == len(vals)
            # bit-identical across partitionings (decimal sums)
            assert got[g]["decayed_count"] == got2[g]["decayed_count"]
            assert got[g]["decayed_sum"] == got2[g]["decayed_sum"]

    def test_explicit_reference_time_and_guard(self, spark):
        from datetime import datetime

        import pytest as _pytest

        from spark_extension_spark.operators.timeseries import decayed_aggregates

        df = spark.createDataFrame(
            [(datetime(2024, 1, 1), 10.0)], ["ts", "v"]
        )
        # one half-life after the event: weight exactly 0.5
        row = decayed_aggregates(
            df, "ts", "v", 86400.0, at="2024-01-02 00:00:00"
        ).collect()[0]
        assert row["decayed_count"] == 0.5
        assert row["decayed_sum"] == 5.0
        with _pytest.raises(ValueError):
            decayed_aggregates(df, "ts", "v", 0.0)

    def test_ntz_explicit_reference_is_timezone_independent(self, spark):
        """NTZ `at` must diff against the NTZ epoch like the axis does;
        to_timestamp would parse it as a session-timezone instant and
        scale every weight by 0.5^(tz_offset / half_life)."""
        from spark_extension_spark.operators.timeseries import decayed_aggregates

        df = spark.sql(
            "SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts, 10.0 AS v"
        )
        tz = spark.conf.get("spark.sql.session.timeZone")
        try:
            for zone in ("UTC", "America/New_York"):
                spark.conf.set("spark.sql.session.timeZone", zone)
                row = decayed_aggregates(
                    df, "ts", "v", 86400.0, at="2024-01-02 00:00:00"
                ).collect()[0]
                assert row["decayed_count"] == 0.5, zone
                assert row["decayed_sum"] == 5.0, zone
        finally:
            spark.conf.set("spark.sql.session.timeZone", tz)

    def test_fractional_half_life_on_numeric_axis(self, spark):
        """half_life < 1 in the axis unit must not truncate to 0 (NaN
        weights); hl stays a float literal."""
        from spark_extension_spark.operators.timeseries import decayed_aggregates

        df = spark.createDataFrame([(0, 1.0), (1, 1.0)], ["t", "v"])
        row = decayed_aggregates(df, "t", "v", 0.5, at=1).collect()[0]
        # ages 1 and 0 against half-life 0.5 -> weights 0.25 and 1.0
        assert abs(row["decayed_count"] - 1.25) < 1e-12
        assert abs(row["decayed_sum"] - 1.25) < 1e-12


def test_time_bucket_rollup_ntz_no_session_tz_shift(spark):
    # NTZ axes must bucket on wall-clock, not shift by the session tz
    # (UTC+5:30 is not a whole hour, so a shift splits buckets at :30)
    import datetime

    from pyspark.sql import types as T

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        rows = [
            (datetime.datetime(2024, 1, 1, 10, 15),),
            (datetime.datetime(2024, 1, 1, 10, 45),),
            (datetime.datetime(2024, 1, 1, 11, 5),),
        ]
        schema = T.StructType([T.StructField("ts", T.TimestampNTZType())])
        df = spark.createDataFrame(rows, schema)
        out = time_bucket_rollup(df, "ts", 3600, {"n": F.count(F.lit(1))})
        assert isinstance(out.schema["bucket"].dataType, T.TimestampNTZType)
        got = {r["bucket"]: r["n"] for r in out.collect()}
        assert got == {
            datetime.datetime(2024, 1, 1, 10, 0): 2,
            datetime.datetime(2024, 1, 1, 11, 0): 1,
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_time_bucket_rollup_raw_numeric_axis(spark):
    # raw nanosecond longs (the events.ts shape) bucket in their own
    # unit — previously cast('timestamp') read nanos as seconds
    ns = 3_600 * 10**9
    df = spark.createDataFrame(
        [(ns + 5,), (ns + 7,), (3 * ns - 1,)], "ts long"
    )
    out = time_bucket_rollup(df, "ts", ns, {"n": F.count(F.lit(1))})
    got = {r["bucket"]: r["n"] for r in out.collect()}
    assert got == {ns: 2, 2 * ns: 1}
    assert dict(out.dtypes)["bucket"] == "bigint"


def test_negative_epoch_floored_bucketing(spark):
    # truncating `div` merges the buckets either side of zero; floored
    # division must keep -9 and +9 in distinct buckets
    from spark_extension_spark.operators.timeseries import (
        cohort_retention,
        resample_interpolate,
    )

    df = spark.createDataFrame(
        [(1, -9, 1.0), (1, 9, 3.0)], "user_id long, ts long, value double"
    )
    res = resample_interpolate(df, "ts", "value", 10, by=["user_id"])
    got = {r["bucket_ts"]: (r["value"], r["interpolated"]) for r in res.collect()}
    assert got == {-10: (1.0, False), 0: (3.0, False)}

    coh = cohort_retention(df, "user_id", "ts", 10).collect()
    # single user cohorted in period -1, active again 1 period later
    offsets = {(r["cohort"], r["period_offset"]) for r in coh}
    assert offsets == {(-1, 0), (-1, 1)}


def test_funnel_within_is_seconds_for_timestamps(spark):
    from spark_extension_spark.operators.timeseries import funnel

    ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "view", ts),
        (1, "click", ts + datetime.timedelta(hours=1)),     # inside 1 day
        (2, "view", ts),
        (2, "click", ts + datetime.timedelta(days=2)),      # outside 1 day
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["event_type"]: r["n_users"]
           for r in funnel(df, ["view", "click"], "user_id", "ts", within=86400).collect()}
    # within=86400 must mean ONE DAY (seconds), not 86.4 ms of raw
    # internal microseconds — user 1 converts, user 2 does not
    assert out == {"view": 2, "click": 1}


def test_sessionize_null_ts_rows_get_null_session(spark):
    from spark_extension_spark.operators.timeseries import (
        session_summary,
        sessionize,
    )

    rows = [(1, None), (1, None), (1, 100), (1, 110), (1, 500)]
    df = spark.createDataFrame(rows, "u long, t long")
    out = sessionize(df, "t", gap=50, by=["u"]).collect()
    by_t = {}
    for r in out:
        by_t.setdefault(r["t"], []).append(r["session_id"])
    # NULL-ts rows: NULL session; real sessions stay 1-based
    assert by_t[None] == [None, None]
    assert by_t[100] == [1] and by_t[110] == [1] and by_t[500] == [2]
    summ = session_summary(df, "t", gap=50, by=["u"]).collect()
    real = {r["session_id"]: r["n_events"] for r in summ if r["session_id"] is not None}
    assert real == {1: 2, 2: 1}


def test_interval_join_rejects_fractional_columns(spark):
    from spark_extension_spark.operators.timeseries import interval_join

    li = spark.createDataFrame([(1.5, 2.3)], "s double, e double")
    ri = spark.createDataFrame([(2, 3)], "s2 long, e2 long")
    with pytest.raises(ValueError, match="integer interval columns"):
        interval_join(li, ri, "s", "e", "s2", "e2", grid=1)
    with pytest.raises(ValueError, match="integer interval columns"):
        interval_join(ri, li, "s2", "e2", "s", "e", grid=1)


def test_range_join_bands_same_named_column(spark):
    from spark_extension_spark.operators.timeseries import range_join_bands

    facts = spark.createDataFrame([(1, 5.0)], "id long, value double")
    bands = spark.createDataFrame(
        [(0.0, 10.0, "low-band", 99.0)], "low double, high double, name string, value double"
    )
    out = range_join_bands(facts, bands, "value")
    assert out.count() == 1  # previously AMBIGUOUS_REFERENCE


def test_resample_interpolate_null_group_key(spark):
    from spark_extension_spark.operators.timeseries import resample_interpolate

    rows = [(None, 0, 1.0), (None, 20, 3.0), ("a", 0, 5.0), ("a", 10, 6.0)]
    df = spark.createDataFrame(rows, "source string, t long, v double")
    out = resample_interpolate(df, "t", "v", step=10, by=["source"]).collect()
    null_grp = {r["bucket_ts"]: (r["value"], r["interpolated"])
                for r in out if r["source"] is None}
    # the NULL-keyed group must keep its real observations (previously
    # every bucket came back value=NULL, interpolated=true)
    assert null_grp[0] == (1.0, False)
    assert null_grp[20] == (3.0, False)
    assert null_grp[10] == (2.0, True)  # linear midpoint


def test_transition_matrix_null_events_excluded(spark):
    from spark_extension_spark.operators.timeseries import transition_matrix

    rows = [(1, 0, "A"), (1, 1, None), (1, 2, "B")]
    df = spark.createDataFrame(rows, "u long, t long, event_type string")
    out = {(r["from_event"], r["to_event"]): r["n"]
           for r in transition_matrix(df, "u", "t").collect()}
    # NULL event rows are excluded up front: the sequence bridges to
    # (A, B); nothing is counted-then-dropped at the normalizing join
    assert out == {("A", "B"): 1}


def test_time_bucket_rollup_fractional_negative_epoch(spark):
    from spark_extension_spark.operators.timeseries import time_bucket_rollup

    df = spark.createDataFrame([(-0.5, 1.0), (5.0, 2.0)], "t double, v double")
    out = {r["bucket"]: r["n"] for r in time_bucket_rollup(
        df, "t", 10, {"n": F.count(F.lit(1))}).collect()}
    # floor discipline: -0.5 floors into bucket -10, never bucket 0
    assert out == {-10: 1, 0: 1}
