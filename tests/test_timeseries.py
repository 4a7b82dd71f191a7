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
