"""Salted join tests: result equivalence and skew scattering."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.skew import salted_join, with_salt


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + a tail
    rows = [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)]
    return spark.createDataFrame(rows, ["k", "v"]).repartition(8)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(k, f"name_{k}") for k in range(1, 102)], ["k", "name"])


def test_salted_join_equals_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k").count()
    salted = salted_join(skewed, dim, "k", salt=8).groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join(skewed, dim, spark):
    extra = skewed.unionAll(spark.createDataFrame([(999, 0)], ["k", "v"]))
    result = salted_join(extra, dim, "k", how="left")
    unmatched = result.where(F.col("name").isNull()).collect()
    assert [r["k"] for r in unmatched] == [999]


def test_salt_scatters_hot_key(skewed):
    salted = with_salt(skewed.where(F.col("k") == 1), 8, "salt")
    buckets = salted.select("salt").distinct().count()
    assert buckets > 1  # the hot key occupies multiple buckets


def test_unsupported_join_type(skewed, dim):
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(skewed, dim, "k", how="full")


class TestHeavyKeys:
    def test_counts_share_and_rank(self, spark):
        from spark_extension_spark.operators.skew import heavy_keys

        df = spark.createDataFrame(
            [(k,) for k in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]], ["k"]
        )
        rows = heavy_keys(df, ["k"], k=3).orderBy("rank").collect()
        assert [(r["k"], r["n_rows"], r["rank"]) for r in rows] == [
            ("a", 5, 1),
            ("b", 3, 2),
            ("c", 2, 3),
        ]
        assert abs(rows[0]["share"] - 5 / 11) < 1e-12

    def test_tie_breaks_deterministic(self, spark):
        from spark_extension_spark.operators.skew import heavy_keys

        df = spark.createDataFrame([("x",), ("y",)], ["k"])
        rows = heavy_keys(df, ["k"], k=2).orderBy("rank").collect()
        assert [r["k"] for r in rows] == ["x", "y"]


class TestDifferentialJoin:
    def test_equals_plain_join_and_both_paths(self, spark):
        from pyspark.sql import functions as F

        from spark_extension_spark.operators.skew import differential_join

        left = spark.createDataFrame(
            [(1, i) for i in range(500)]        # key 1: hot
            + [(2, i) for i in range(3)]         # cold
            + [(3, i) for i in range(2)]         # cold
            + [(9, 0)],                          # no match on right
            ["k", "lv"],
        )
        right = spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three"), (8, "eight")], ["k", "rv"]
        )
        plain = set(map(tuple, left.join(right, "k").collect()))
        diffj = set(map(tuple, differential_join(
            left, right, "k", heavy_threshold=100).collect()))
        assert diffj == plain

        leftj = set(map(tuple, differential_join(
            left, right, "k", how="left", heavy_threshold=100).collect()))
        assert leftj == set(map(tuple, left.join(right, "k", "left").collect()))

    def test_no_heavy_keys_falls_through(self, spark):
        from spark_extension_spark.operators.skew import differential_join

        left = spark.createDataFrame([(1, 1), (2, 2)], ["k", "lv"])
        right = spark.createDataFrame([(1, "x")], ["k", "rv"])
        out = differential_join(left, right, "k", heavy_threshold=100)
        assert set(map(tuple, out.collect())) == {(1, 1, "x")}

    def test_too_many_heavy_keys_rejected(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.skew import differential_join

        left = spark.createDataFrame([(i, j) for i in range(50) for j in range(3)], ["k", "lv"])
        right = spark.createDataFrame([(1, "x")], ["k", "rv"])
        with _pytest.raises(ValueError, match="broad skew"):
            differential_join(left, right, "k", heavy_threshold=1, max_heavy_keys=10)

    def test_rejects_unsupported_how(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.skew import differential_join

        df = spark.createDataFrame([(1, 1)], ["k", "v"])
        with _pytest.raises(ValueError, match="supports inner/left"):
            differential_join(df, df, "k", how="full")


def test_salted_join_hint_escape_hatches(skewed, dim, spark):
    from spark_extension_spark.plans import summarize_plan

    plain = sorted(map(tuple, skewed.join(dim, "k").groupBy("k").count().collect()))
    for hint in ("shuffle_hash", "merge", None):
        j = salted_join(skewed, dim, "k", salt=4, join_hint=hint)
        got = sorted(map(tuple, j.groupBy("k").count().collect()))
        assert got == plain, hint
    merged = salted_join(skewed, dim, "k", salt=4, join_hint="merge")
    assert "SortMergeJoin" in summarize_plan(merged).joins


def test_salted_join_rejects_unknown_hint(skewed, dim):
    # Spark's analyzer would silently ignore a typo'd hint (and a
    # 'broadcast' hint would defeat the operator's whole purpose), so
    # both must be rejected loudly.
    for bad in ("shufle_hash", "broadcast", "SHUFFLE_HASH "):
        with pytest.raises(ValueError, match="join_hint must be"):
            salted_join(skewed, dim, "k", join_hint=bad)
