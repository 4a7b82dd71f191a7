"""Row-number tests (reference SparkSuite row number sections +
test_row_number.py)."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark import UnpersistHandle, with_row_numbers


def test_row_numbers_no_order(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["id"]).repartition(7)
    result = with_row_numbers(df)
    rows = result.collect()
    assert sorted(r["row_number"] for r in rows) == list(range(1, 101))
    assert result.columns == ["id", "row_number"]


def test_row_numbers_ordered(spark):
    df = spark.createDataFrame([(i, 100 - i) for i in range(50)], ["id", "v"])
    result = with_row_numbers(df.repartition(5), order="v")
    rows = {r["id"]: r["row_number"] for r in result.collect()}
    # v = 100-id, ascending v means descending id
    assert rows[49] == 1 and rows[0] == 50


def test_row_numbers_descending(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    result = with_row_numbers(df, order="id", ascending=False)
    rows = {r["id"]: r["row_number"] for r in result.collect()}
    assert rows[9] == 1 and rows[0] == 10


def test_row_numbers_multi_order_and_name(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (2, "a")], ["num", "txt"]
    )
    result = with_row_numbers(
        df, row_number_column_name="rn", order=["num", "txt"]
    )
    rows = {(r["num"], r["txt"]): r["rn"] for r in result.collect()}
    assert rows == {(1, "a"): 1, (1, "b"): 2, (2, "a"): 3}


def test_row_numbers_unpersist_handle(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    handle = UnpersistHandle()
    result = with_row_numbers(df, unpersist_handle=handle)
    assert result.count() == 10
    handle()  # must not raise


def test_row_numbers_rejects_storage_level_none(spark):
    # the persist is a correctness barrier (pins spark_partition_id
    # across the two plan branches), so skipping it must be an error —
    # the reference's RowNumbers.scala guards StorageLevel.NONE the same way
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="storage level"):
        with_row_numbers(df, storage_level=None)


def test_row_numbers_internal_name_collision(spark):
    df = spark.createDataFrame([(1, 2)], ["id", "_partition_id"])
    result = with_row_numbers(df)
    assert set(result.columns) == {"id", "_partition_id", "row_number"}
    assert result.collect()[0]["row_number"] == 1
