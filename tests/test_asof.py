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


# ---------------------------------------------------------------------------
# directions: forward / nearest
# ---------------------------------------------------------------------------


def _mk(spark):
    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 25), (3, "u", 40), (4, "v", 5)],
        ["lid", "k", "t"],
    )
    right = spark.createDataFrame(
        [("u", 8, "a"), ("u", 25, "b"), ("u", 100, "c"), ("w", 1, "z")],
        ["k", "t", "val"],
    )
    return left, right


def test_asof_forward_keyed(spark):
    from spark_extension_spark.operators.asof import asof_join

    left, right = _mk(spark)
    got = {
        r["lid"]: (r["right_t"], r["right_val"])
        for r in asof_join(left, right, on="t", by="k", direction="forward").collect()
    }
    assert got[1] == (25, "b")     # next at-or-after 10
    assert got[2] == (25, "b")     # inclusive: exact time matches
    assert got[3] == (100, "c")
    assert got[4] == (None, None)  # key v has no right rows


def test_asof_nearest_keyed_and_ties(spark):
    from spark_extension_spark.operators.asof import asof_join

    left, right = _mk(spark)
    got = {
        r["lid"]: (r["right_t"], r["right_val"])
        for r in asof_join(left, right, on="t", by="k", direction="nearest").collect()
    }
    assert got[1] == (8, "a")      # dist 2 back vs 15 fwd
    assert got[2] == (25, "b")     # exact
    assert got[3] == (25, "b")     # dist 15 back vs 60 fwd
    # equidistant tie -> backward (pandas semantics)
    left2 = spark.createDataFrame([(9, "u", 16)], ["lid", "k", "t"])
    # dist: 16-8=8 back, 25-16=9 fwd -> back; and a true tie:
    right2 = spark.createDataFrame([("u", 10, "lo"), ("u", 20, "hi")], ["k", "t", "val"])
    left3 = spark.createDataFrame([(1, "u", 15)], ["lid", "k", "t"])
    tie = asof_join(left3, right2, on="t", by="k", direction="nearest").collect()[0]
    assert tie["right_val"] == "lo"


def test_asof_forward_tolerance(spark):
    import pyspark.sql.functions as F
    from spark_extension_spark.operators.asof import asof_join

    left, right = _mk(spark)
    got = {
        r["lid"]: r["right_val"]
        for r in asof_join(
            left, right, on="t", by="k", direction="forward", tolerance=F.lit(20)
        ).collect()
    }
    assert got[1] == "b"          # 15 ahead, within 20
    assert got[3] is None         # 60 ahead, beyond tolerance


def test_asof_directions_keyless(spark):
    from spark_extension_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (2, 25), (3, 40)], ["lid", "t"])
    right = spark.createDataFrame([(8, "a"), (25, "b"), (100, "c")], ["t", "val"])
    fwd = {
        r["lid"]: r["right_val"]
        for r in asof_join(left, right, on="t", direction="forward").collect()
    }
    assert fwd == {1: "b", 2: "b", 3: "c"}
    near = {
        r["lid"]: r["right_val"]
        for r in asof_join(left, right, on="t", direction="nearest").collect()
    }
    assert near == {1: "a", 2: "b", 3: "b"}


def test_asof_keyless_forward_partitioning_independent(spark, sf_dir):
    import pyspark.sql.functions as F
    from spark_extension_spark.operators.asof import asof_join

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = events.select(
        "event_id", (F.col("event_id") * 7 % 1000).alias("t"), "value"
    )
    ref = base.where(F.col("event_id") % 17 == 0).select(
        "t", F.col("value").alias("ref_value")
    ).distinct()
    a = sorted(map(tuple, asof_join(base, ref, on="t", direction="forward").collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                base.repartition(7), ref.repartition(3), on="t", direction="forward"
            ).collect(),
        )
    )
    assert a == b


def test_asof_rejects_bad_direction(spark):
    from spark_extension_spark.operators.asof import asof_join

    left, right = _mk(spark)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="t", by="k", direction="sideways")


def test_asof_null_time_rows(spark):
    # a NULL-time right row must never match (DuckDB ASOF / pandas
    # semantics: NULLs sort first and would otherwise become the
    # carried payload for every left row with no real predecessor);
    # NULL-time left rows are kept with no match
    from spark_extension_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 50, "early"), (2, 150, "late"), (3, None, "null-t")],
        "id long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(None, "phantom"), (100, "q100")], "t long, quote string"
    )
    got = {r["id"]: r["right_quote"] for r in asof_join(left, right, "t").collect()}
    assert got == {1: None, 2: "q100", 3: None}


def test_asof_dotted_on_column(spark):
    from spark_extension_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], ["id", "event.time"])
    right = spark.createDataFrame([(90, "q")], ["event.time", "quote"])
    row = asof_join(left, right, "event.time").collect()[0]
    assert row["right_quote"] == "q" and row["right_event.time"] == 90
