"""Combinatorial diff coverage, modelled on DiffSuite's option matrices:
modes × sparse × ignore columns, case sensitivity, comparator/change
interactions, name collisions."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark import DiffComparators, DiffMode, DiffOptions, diff, diff_with


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "a", 1.0, "x"), (2, "b", 2.0, "y"), (3, "c", 3.0, "z")],
        ["id", "v", "score", "meta"],
    )
    right = spark.createDataFrame(
        [(1, "a", 1.0, "X"), (2, "B", 2.0, "y"), (4, "d", 4.0, "w")],
        ["id", "v", "score", "meta"],
    )
    return left, right


ALL_MODES = [DiffMode.ColumnByColumn, DiffMode.SideBySide, DiffMode.LeftSide, DiffMode.RightSide]


@pytest.mark.parametrize("mode", ALL_MODES)
@pytest.mark.parametrize("sparse", [False, True])
def test_mode_sparse_matrix_actions_invariant(frames, mode, sparse):
    """Actions are identical across every mode × sparse combination."""
    left, right = frames
    opts = DiffOptions().with_diff_mode(mode).with_sparse_mode(sparse)
    result = diff(left, right, ["id"], ["meta"], options=opts)
    actions = {r["id"]: r["diff"] for r in result.collect()}
    assert actions == {1: "N", 2: "C", 3: "D", 4: "I"}


@pytest.mark.parametrize("mode", ALL_MODES)
def test_mode_ignore_columns_emitted(frames, mode):
    left, right = frames
    opts = DiffOptions().with_diff_mode(mode)
    result = diff(left, right, ["id"], ["meta"], options=opts)
    if mode == DiffMode.ColumnByColumn:
        assert result.columns == [
            "diff", "id", "left_v", "right_v", "left_score", "right_score",
            "left_meta", "right_meta",
        ]
    elif mode == DiffMode.SideBySide:
        assert result.columns == [
            "diff", "id", "left_v", "left_score", "left_meta",
            "right_v", "right_score", "right_meta",
        ]
    else:
        assert result.columns == ["diff", "id", "v", "score", "meta"]


def test_sparse_mode_keeps_ignored_sparse_too(frames):
    left, right = frames
    opts = DiffOptions().with_sparse_mode(True)
    row1 = {
        r["id"]: r for r in diff(left, right, ["id"], ["meta"], options=opts).collect()
    }[1]
    # id 1: v and score equal -> nulled; meta differs (x vs X) -> kept
    assert row1["left_v"] is None and row1["right_v"] is None
    assert row1["left_meta"] == "x" and row1["right_meta"] == "X"


def test_case_insensitive_id_resolution(spark):
    spark.conf.set("spark.sql.caseSensitive", "false")
    left = spark.createDataFrame([(1, "a")], ["ID", "Value"])
    right = spark.createDataFrame([(1, "b")], ["id", "value"])
    result = diff(left, right, "Id")
    assert result.collect()[0]["diff"] == "C"


def test_case_sensitive_rejects_mismatched_names(spark):
    spark.conf.set("spark.sql.caseSensitive", "true")
    try:
        left = spark.createDataFrame([(1, "a")], ["ID", "value"])
        right = spark.createDataFrame([(1, "b")], ["id", "value"])
        with pytest.raises(ValueError, match="same schema|number of columns"):
            diff(left, right, "ID")
    finally:
        spark.conf.set("spark.sql.caseSensitive", "false")


def test_change_column_with_comparator(spark):
    """A comparator that equates values must also keep them out of the
    change column (DiffComparatorSuite:415)."""
    left = spark.createDataFrame([(1, 100.0, "a")], ["id", "num", "txt"])
    right = spark.createDataFrame([(1, 100.4, "b")], ["id", "num", "txt"])
    opts = (
        DiffOptions()
        .with_change_column("changes")
        .with_column_name_comparator(DiffComparators.epsilon(1.0).as_absolute(), "num")
    )
    row = diff(left, right, "id", options=opts).collect()[0]
    assert row["diff"] == "C"
    assert row["changes"] == ["txt"]  # num is equal under epsilon


def test_diff_with_ignore_columns(frames):
    left, right = frames
    result = diff_with(left, right, ["id"], ignore_columns=["meta"])
    rows = {r["left"]["id"] if r["left"] else r["right"]["id"]: r for r in result.collect()}
    assert rows[1]["diff"] == "N"
    assert rows[1]["left"]["meta"] == "x" and rows[1]["right"]["meta"] == "X"


def test_left_prefix_used_in_output(frames):
    left, right = frames
    opts = DiffOptions().with_left_column_prefix("before").with_right_column_prefix("after")
    result = diff(left, right, "id", options=opts)
    assert "before_v" in result.columns and "after_v" in result.columns


def test_all_columns_as_ids_yields_no_change_rows(frames):
    left, _ = frames
    result = diff(left, left)
    assert {r["diff"] for r in result.collect()} == {"N"}
    assert result.columns == ["diff", "id", "v", "score", "meta"]


def test_value_column_named_like_exists_flag(spark):
    # internal exists/rename prefixes must never collide with user columns
    left = spark.createDataFrame([(1, 1)], ["id", "_exl"])
    right = spark.createDataFrame([(1, 2)], ["id", "_exl"])
    result = diff(left, right, "id")
    assert result.collect()[0]["diff"] == "C"


def test_empty_frames(spark):
    empty = spark.createDataFrame([], "id int, v string")
    result = diff(empty, empty, "id")
    assert result.count() == 0
    assert result.columns == ["diff", "id", "left_v", "right_v"]


def test_diff_array_columns(spark):
    left = spark.createDataFrame([(1, [1, 2]), (2, [3])], "id int, tags array<int>")
    right = spark.createDataFrame([(1, [1, 2]), (2, [3, 4])], "id int, tags array<int>")
    rows = {r["id"]: r["diff"] for r in diff(left, right, "id").collect()}
    assert rows == {1: "N", 2: "C"}


def test_diff_struct_columns(spark):
    left = spark.createDataFrame(
        [(1, (10, "a")), (2, (20, "b"))], "id int, s struct<x:int,y:string>"
    )
    right = spark.createDataFrame(
        [(1, (10, "a")), (2, (21, "b"))], "id int, s struct<x:int,y:string>"
    )
    rows = {r["id"]: r["diff"] for r in diff(left, right, "id").collect()}
    assert rows == {1: "N", 2: "C"}


def test_histogram_with_column_expressions(spark):
    from spark_extension_spark import histogram

    df = spark.createDataFrame([(1, 5), (2, 15)], ["k", "v"])
    result = histogram(df, [10], F.col("v") * 2, (F.col("k") % 2).alias("parity"))
    rows = {r["parity"]: (r["≤10"], r[">10"]) for r in result.collect()}
    assert rows == {1: (1, 0), 0: (0, 1)}
