"""Partitioned-write layout tests (reference WritePartitionedSuite)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from spark_extension_spark import UnpersistHandle, write_partitioned_by


@pytest.fixture(scope="module")
def df(spark):
    rows = [(i, i % 3, f"v{i}") for i in range(300)]
    return spark.createDataFrame(rows, ["id", "bucket", "v"]).repartition(8)


def test_write_layout(df, tmp_path):
    path = str(tmp_path / "out")
    write_partitioned_by(df, ["bucket"]).parquet(path)
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{path}/bucket=*"))
    assert dirs == ["bucket=0", "bucket=1", "bucket=2"]
    # range partitioning by bucket: each partition dir holds few files
    for d in dirs:
        files = glob.glob(f"{path}/{d}/*.parquet")
        assert 1 <= len(files) <= 2


def test_write_sorted_files(df, tmp_path, spark):
    path = str(tmp_path / "sorted")
    write_partitioned_by(
        df, ["bucket"], more_file_order=["id"], partitions=3
    ).parquet(path)
    # rows inside each file must be ordered by id
    for f in glob.glob(f"{path}/bucket=*/*.parquet"):
        ids = [r["id"] for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids)


def test_write_computed_partition_column(df, tmp_path, spark):
    path = str(tmp_path / "computed")
    write_partitioned_by(
        df, [(F.col("id") % 2).cast("int").alias("parity")]
    ).parquet(path)
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{path}/parity=*"))
    assert dirs == ["parity=0", "parity=1"]
    back = spark.read.parquet(path)
    assert back.count() == 300 and "parity" in back.columns


def test_write_projection(df, tmp_path, spark):
    path = str(tmp_path / "proj")
    write_partitioned_by(
        df, ["bucket"], written_projection=["bucket", "id"]
    ).parquet(path)
    back = spark.read.parquet(path)
    assert sorted(back.columns) == ["bucket", "id"]


def test_write_unnamed_computed_column_fails(df):
    with pytest.raises(ValueError, match="must be named"):
        write_partitioned_by(df, [F.col("id") % 2])


def test_write_empty_partition_columns(df):
    with pytest.raises(ValueError, match="must not be empty"):
        write_partitioned_by(df, [])


def test_unpersist_handle_accepted(df, tmp_path):
    handle = UnpersistHandle()
    write_partitioned_by(df, ["bucket"], unpersist_handle=handle).parquet(
        str(tmp_path / "h")
    )
    handle()  # no-op on Spark >= 3.5, must not raise


def test_string_column_named_like_expression_is_accepted(spark, tmp_path):
    # the unnamed-computed-expression heuristic must not reject a REAL
    # column whose name merely contains parentheses
    from pyspark.sql import functions as F

    from spark_extension_spark.sources.partitioned_write import (
        write_partitioned_by,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "k"]).withColumn(
        "f(x)", F.col("id") % 2
    )
    path = str(tmp_path / "out")
    write_partitioned_by(df, ["f(x)"]).parquet(path)
    assert spark.read.parquet(path).count() == 2
    # unnamed computed expressions still raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must be named"):
        write_partitioned_by(df, [F.col("id") % 3])
