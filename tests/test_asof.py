"""As-of join tests: backward-inclusive semantics, keys, tolerance."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [("A", 10, 1.0), ("A", 20, 2.0), ("B", 15, 9.0)],
        ["sym", "t", "px"],
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("A", 5, 100), ("A", 10, 200), ("A", 25, 300), ("B", 14, 400), ("B", 16, 500)],
        ["sym", "t", "qty"],
    )


def test_asof_backward_inclusive(trades, quotes):
    result = asof_join(trades, quotes, on="t", by="sym")
    rows = {(r["sym"], r["t"]): (r["right_t"], r["right_px"]) for r in result.collect()}
    assert rows[("A", 5)] == (None, None)       # nothing at or before 5
    assert rows[("A", 10)] == (10, 1.0)         # exact time matches (inclusive)
    assert rows[("A", 25)] == (20, 2.0)         # most recent prior
    assert rows[("B", 14)] == (None, None)
    assert rows[("B", 16)] == (15, 9.0)


def test_asof_no_key(spark):
    left = spark.createDataFrame([(10,), (30,)], ["t"])
    right = spark.createDataFrame([(5, "x"), (20, "y")], ["t", "v"])
    rows = {r["t"]: r["right_v"] for r in asof_join(left, right, on="t").collect()}
    assert rows == {10: "x", 30: "y"}


def test_asof_no_key_scales_across_partitions(spark):
    # keyless path: range-partitioned two-pass, NOT a single global
    # window — verify the boundary carry is exact on data that spans
    # many range partitions, including long runs with no right rows
    from spark_extension_spark.utils import UnpersistHandle

    left = spark.range(0, 1000).select(F.col("id").alias("t"))
    # right rows only at multiples of 7 below 300: every partition
    # beyond the first ranges must take its match from the carry chain
    right = (
        spark.range(0, 300, 7)
        .select(F.col("id").alias("t"), (F.col("id") * 10).alias("v"))
    )
    handle = UnpersistHandle()
    result = asof_join(left, right, on="t", unpersist_handle=handle)
    rows = {r["t"]: r["right_t"] for r in result.collect()}
    assert len(rows) == 1000
    last_right = 294  # largest multiple of 7 below 300
    for t in range(1000):
        expected = (t // 7) * 7 if t < last_right else last_right
        assert rows[t] == expected, f"t={t}"
    handle()  # release the pinned union


def test_asof_no_key_rejects_storage_level_none(spark):
    left = spark.createDataFrame([(10,)], ["t"])
    right = spark.createDataFrame([(5, "x")], ["t", "v"])
    with pytest.raises(ValueError, match="storage level"):
        asof_join(left, right, on="t", storage_level=None)


def test_asof_tolerance(trades, quotes):
    within = asof_join(trades, quotes, on="t", by="sym", tolerance=F.lit(5))
    rows = {(r["sym"], r["t"]): r["right_t"] for r in within.collect()}
    assert rows[("A", 10)] == 10                # gap 0 <= 5
    assert rows[("A", 25)] == 20                # gap 5 <= 5 (inclusive)
    tight = asof_join(trades, quotes, on="t", by="sym", tolerance=F.lit(3))
    rows = {(r["sym"], r["t"]): r["right_t"] for r in tight.collect()}
    assert rows[("A", 25)] is None              # gap 5 > 3: discarded


def test_asof_preserves_left_rows(trades, quotes):
    assert asof_join(trades, quotes, on="t", by="sym").count() == trades.count()


def test_asof_missing_column(trades, quotes):
    with pytest.raises(ValueError, match="must exist on both sides"):
        asof_join(trades, quotes, on="nope")
