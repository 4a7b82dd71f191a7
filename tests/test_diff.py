"""Golden tests for diff — modelled on the reference's DiffSuite
(src/test/scala/uk/co/gresearch/spark/diff/DiffSuite.scala)."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_extension_spark import (
    DiffComparators,
    DiffMode,
    DiffOptions,
    diff,
    diff_with,
)


@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [(1, "one", 1.0), (2, "two", 2.0), (3, "three", 3.0)],
        ["id", "label", "score"],
    )


@pytest.fixture(scope="module")
def right(spark):
    return spark.createDataFrame(
        [(1, "one", 1.0), (2, "Two", 2.0), (4, "four", 4.0)],
        ["id", "label", "score"],
    )


def by_id(rows):
    return sorted(rows, key=lambda r: (r[1] is None, r[1]))


def test_diff_basic(left, right):
    result = diff(left, right, "id")
    assert result.columns == [
        "diff", "id", "left_label", "right_label", "left_score", "right_score",
    ]
    rows = by_id(result.collect())
    assert rows == [
        Row("N", 1, "one", "one", 1.0, 1.0),
        Row("C", 2, "two", "Two", 2.0, 2.0),
        Row("D", 3, "three", None, 3.0, None),
        Row("I", 4, None, "four", None, 4.0),
    ]


def test_diff_no_ids_is_set_diff(left, right):
    result = diff(left, right)
    actions = {tuple(r) for r in result.collect()}
    assert ("N", 1, "one", 1.0) in actions
    assert ("D", 2, "two", 2.0) in actions
    assert ("I", 2, "Two", 2.0) in actions
    assert ("D", 3, "three", 3.0) in actions
    assert ("I", 4, "four", 4.0) in actions


def test_diff_change_column(left, right):
    opts = DiffOptions().with_change_column("changes")
    result = diff(left, right, "id", options=opts)
    assert result.columns[:2] == ["diff", "changes"]
    changes = {r["id"]: r["changes"] for r in result.collect()}
    assert changes[1] == []
    assert changes[2] == ["label"]
    assert changes[3] is None
    assert changes[4] is None


def test_diff_side_by_side(left, right):
    opts = DiffOptions().with_diff_mode(DiffMode.SideBySide)
    result = diff(left, right, "id", options=opts)
    assert result.columns == [
        "diff", "id", "left_label", "left_score", "right_label", "right_score",
    ]


def test_diff_left_side_right_side(left, right):
    res_l = diff(left, right, "id", options=DiffOptions().with_diff_mode(DiffMode.LeftSide))
    assert res_l.columns == ["diff", "id", "label", "score"]
    rows = {r["id"]: r for r in res_l.collect()}
    assert rows[2]["label"] == "two"  # left values
    res_r = diff(left, right, "id", options=DiffOptions().with_diff_mode(DiffMode.RightSide))
    assert {r["id"]: r for r in res_r.collect()}[2]["label"] == "Two"


def test_diff_sparse_mode(left, right):
    opts = DiffOptions().with_sparse_mode(True)
    result = diff(left, right, "id", options=opts)
    row2 = {r["id"]: r for r in result.collect()}[2]
    assert row2["left_label"] == "two" and row2["right_label"] == "Two"
    assert row2["left_score"] is None and row2["right_score"] is None


def test_diff_ignore_columns(spark):
    l = spark.createDataFrame([(1, "a", "x")], ["id", "v", "meta"])
    r = spark.createDataFrame([(1, "a", "y")], ["id", "v", "meta"])
    result = diff(l, r, ["id"], ["meta"])
    assert result.columns == [
        "diff", "id", "left_v", "right_v", "left_meta", "right_meta",
    ]
    row = result.collect()[0]
    assert row["diff"] == "N"  # ignored column change is not a change
    assert row["left_meta"] == "x" and row["right_meta"] == "y"


def test_diff_null_ids(spark):
    l = spark.createDataFrame([(None, "a"), (1, "b")], "id int, v string")
    r = spark.createDataFrame([(None, "A"), (1, "b")], "id int, v string")
    rows = {r["id"]: r for r in diff(l, r, "id").collect()}
    assert rows[None]["diff"] == "C"  # null ids join null-safely
    assert rows[1]["diff"] == "N"


def test_diff_custom_values(left, right):
    opts = (
        DiffOptions()
        .with_insert_diff_value("ins")
        .with_delete_diff_value("del")
        .with_change_diff_value("chg")
        .with_nochange_diff_value("eq")
        .with_diff_column("action")
    )
    result = diff(left, right, "id", options=opts)
    actions = {r["id"]: r["action"] for r in result.collect()}
    assert actions == {1: "eq", 2: "chg", 3: "del", 4: "ins"}


def test_diff_with(left, right):
    result = diff_with(left, right, "id")
    assert result.columns == ["diff", "left", "right"]
    rows = {(r["left"] or r["right"])["id"]: r for r in result.collect()}
    assert rows[3]["right"] is None and rows[3]["left"]["label"] == "three"
    assert rows[4]["left"] is None and rows[4]["right"]["label"] == "four"
    assert rows[2]["left"]["label"] == "two" and rows[2]["right"]["label"] == "Two"


def test_diff_self_derived_frame(spark):
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "v"])
    mutated = base.withColumn("v", F.col("v") * 2)
    rows = {r["id"]: r["diff"] for r in diff(base, mutated, "id").collect()}
    assert rows == {1: "C", 2: "C"}


# -- validation errors ------------------------------------------------------


def test_diff_requires_same_schema(spark, left):
    other = spark.createDataFrame([(1, "one")], ["id", "label"])
    with pytest.raises(ValueError, match="number of columns doesn't match"):
        diff(left, other, "id")


def test_diff_requires_same_types(spark, left):
    other = spark.createDataFrame([(1, "one", "x")], ["id", "label", "score"])
    with pytest.raises(ValueError, match="not have the same schema"):
        diff(left, other, "id")


def test_diff_missing_id_column(left, right):
    with pytest.raises(ValueError, match="id columns do not exist"):
        diff(left, right, "nope")


def test_diff_missing_ignore_column(left, right):
    with pytest.raises(ValueError, match="ignore columns do not exist"):
        diff(left, right, ["id"], ["nope"])


def test_diff_column_collides_with_id(left, right):
    opts = DiffOptions().with_diff_column("id")
    with pytest.raises(ValueError, match="must not contain the diff column"):
        diff(left, right, "id", options=opts)


def test_diff_prefix_collision(spark):
    l = spark.createDataFrame([(1, "a")], ["id", "left_v"])
    # left prefix 'left' + value column 'v' produces 'left_v' == existing id?
    # here: value column "left_v" prefixed becomes "left_left_v"; craft a real
    # collision instead: diff column equals produced prefixed name
    opts = DiffOptions().with_diff_column("left_left_v")
    with pytest.raises(ValueError, match="must not produce the diff column"):
        diff(l, l, "id", options=opts)


def test_options_distinct_diff_values():
    with pytest.raises(ValueError, match="must be distinct"):
        DiffOptions().with_insert_diff_value("C")


def test_options_same_prefixes():
    with pytest.raises(ValueError, match="must be distinct"):
        DiffOptions().with_left_column_prefix("x").with_right_column_prefix("x")


def test_comparator_registration_conflict():
    with pytest.raises(ValueError, match="exists already"):
        DiffOptions().with_column_name_comparator(
            DiffComparators.default(), "a"
        ).with_column_name_comparator(DiffComparators.default(), "a")


# -- comparators ------------------------------------------------------------


def test_epsilon_comparator(spark):
    l = spark.createDataFrame([(1, 100.0), (2, 100.0)], ["id", "v"])
    r = spark.createDataFrame([(1, 100.5), (2, 150.0)], ["id", "v"])
    opts = DiffOptions().with_column_name_comparator(
        DiffComparators.epsilon(0.01).as_relative(), "v"
    )
    rows = {x["id"]: x["diff"] for x in diff(l, r, "id", options=opts).collect()}
    assert rows == {1: "N", 2: "C"}
    opts_abs = DiffOptions().with_column_name_comparator(
        DiffComparators.epsilon(1.0).as_absolute(), "v"
    )
    rows = {x["id"]: x["diff"] for x in diff(l, r, "id", options=opts_abs).collect()}
    assert rows == {1: "N", 2: "C"}


def test_whitespace_comparator(spark):
    l = spark.createDataFrame([(1, "a  b"), (2, "ab")], ["id", "v"])
    r = spark.createDataFrame([(1, " a b "), (2, "a b")], ["id", "v"])
    opts = DiffOptions().with_column_name_comparator(DiffComparators.string(True), "v")
    rows = {x["id"]: x["diff"] for x in diff(l, r, "id", options=opts).collect()}
    assert rows == {1: "N", 2: "C"}


def test_duration_comparator(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    l = spark.createDataFrame([(1, t0), (2, t0)], "id int, ts timestamp")
    r = spark.createDataFrame(
        [(1, t0 + datetime.timedelta(seconds=30)), (2, t0 + datetime.timedelta(hours=2))],
        "id int, ts timestamp",
    )
    opts = DiffOptions().with_column_name_comparator(
        DiffComparators.duration(datetime.timedelta(minutes=1)), "ts"
    )
    rows = {x["id"]: x["diff"] for x in diff(l, r, "id", options=opts).collect()}
    assert rows == {1: "N", 2: "C"}


def test_map_comparator(spark):
    l = spark.createDataFrame([(1, {"a": 1, "b": 2}), (2, {"a": 1})], "id int, m map<string,int>")
    r = spark.createDataFrame([(1, {"b": 2, "a": 1}), (2, {"a": 2})], "id int, m map<string,int>")
    opts = DiffOptions().with_data_type_comparator(
        DiffComparators.map(False), l.schema["m"].dataType
    )
    rows = {x["id"]: x["diff"] for x in diff(l, r, "id", options=opts).collect()}
    assert rows == {1: "N", 2: "C"}


def test_equiv_comparator(spark):
    l = spark.createDataFrame([(1, "abc"), (2, "abc")], ["id", "v"])
    r = spark.createDataFrame([(1, "ABC"), (2, "xyz")], ["id", "v"])
    opts = DiffOptions().with_column_name_comparator(
        DiffComparators.equiv(lambda a, b: a.lower() == b.lower()), "v"
    )
    rows = {x["id"]: x["diff"] for x in diff(l, r, "id", options=opts).collect()}
    assert rows == {1: "N", 2: "C"}


def test_dots_in_column_names(spark):
    l = spark.createDataFrame([(1, "a")], ["the.id", "the.value"])
    r = spark.createDataFrame([(1, "b")], ["the.id", "the.value"])
    result = diff(l, r, "the.id")
    assert result.columns == ["diff", "the.id", "left_the.value", "right_the.value"]
    assert result.collect()[0]["diff"] == "C"


def test_equiv_comparator_null_safe(spark):
    # BatchEvalPython evaluates the UDF for every row BEFORE the
    # isNotNull conjuncts — a null-unaware lambda must not crash the
    # job on one-sided NULLs; the row simply reports as changed
    from spark_extension_spark.operators.comparators import DiffComparators
    from spark_extension_spark.operators.diff import diff, DiffOptions

    left = spark.createDataFrame([(1, "A"), (2, None)], "id long, v string")
    right = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    opts = DiffOptions().with_column_name_comparator(
        DiffComparators.equiv(lambda a, b: a.lower() == b.lower()), "v"
    )
    got = {r["id"]: r["diff"] for r in diff(left, right, "id", options=opts).collect()}
    assert got == {1: "C", 2: "N"}


def test_sparse_mode_with_one_sided_ignore_column(spark):
    # validate() permits one-sided ignore columns; sparse mode must not
    # crash referencing the missing side — the one-sided column passes
    # through unchanged (it has no counterpart to compare against)
    left = spark.createDataFrame([(1, "a", "x")], ["id", "v", "extra"])
    right = spark.createDataFrame([(1, "b")], ["id", "v"])
    opts = DiffOptions(sparse_mode=True)
    rows = diff(left, right, "id", options=opts, ignore_columns=["extra"]).collect()
    assert rows[0]["diff"] == "C" and rows[0]["left_extra"] == "x"
