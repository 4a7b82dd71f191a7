"""Histogram golden tests (reference HistogramSuite.scala)."""

import pytest

from spark_extension_spark import histogram


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 15), ("b", 3), ("b", 100)], ["k", "v"]
    )


def test_histogram_schema_and_counts(df):
    result = histogram(df, [0, 10, 50], "v", "k")
    assert result.columns == ["k", "≤0", "≤10", "≤50", ">50"]
    rows = {r["k"]: (r["≤0"], r["≤10"], r["≤50"], r[">50"]) for r in result.collect()}
    assert rows == {"a": (0, 2, 1, 0), "b": (0, 1, 0, 1)}


def test_histogram_no_aggregate_columns(df):
    result = histogram(df, [10], "v")
    assert result.columns == ["≤10", ">10"]
    assert result.collect()[0] == (3, 2)


def test_histogram_double_thresholds(spark):
    df = spark.createDataFrame([(0.5,), (1.5,)], ["v"])
    result = histogram(df, [1.0], "v")
    assert result.columns == ["≤1.0", ">1.0"]
    assert result.collect()[0] == (1, 1)


def test_histogram_unsorted_thresholds(df):
    # thresholds are sorted internally
    result = histogram(df, [50, 0, 10], "v", "k")
    assert result.columns == ["k", "≤0", "≤10", "≤50", ">50"]


def test_histogram_empty_thresholds(df):
    with pytest.raises(ValueError, match="must not be empty"):
        histogram(df, [], "v")


def test_histogram_duplicate_thresholds(df):
    with pytest.raises(ValueError, match="duplicates"):
        histogram(df, [1, 1], "v")
