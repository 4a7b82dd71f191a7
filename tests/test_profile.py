"""profile(): one-pass per-column table profiling."""

from spark_extension_spark.operators.profile import profile


def test_profile_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 5.0), (3, "a", 7.5)],
        ["k", "s", "v"],
    )
    rows = {r["col_name"]: r for r in profile(df, exact=True).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert rows["k"]["n_nulls"] == 0 and rows["k"]["n_distinct"] == 3
    assert rows["k"]["min_value"] == "1" and rows["k"]["max_value"] == "3"
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["v"]["n_nulls"] == 1 and rows["v"]["n_distinct"] == 2
    assert rows["v"]["max_value"] == "7.5"


def test_profile_column_subset_and_approx(spark):
    df = spark.createDataFrame([(i, i % 10) for i in range(1000)], ["a", "b"])
    rows = {r["col_name"]: r for r in profile(df, columns=["b"]).collect()}
    assert set(rows) == {"b"}
    # HLL estimate of 10 distinct values at rsd=0.01 is exact-ish
    assert abs(rows["b"]["n_distinct"] - 10) <= 1


def test_profile_single_aggregate_plan(spark):
    from spark_extension_spark.plans import explain_text, summarize_plan
    from spark_extension_spark.registry import load

    df = load(spark, "/root/testdata/sf0.001", "orders")
    profiled = profile(df, columns=["o_orderkey", "o_orderstatus"])
    # approximate path: one aggregate pair, one exchange, no Expand
    assert summarize_plan(profiled).exchanges == 1
    assert "Expand" not in explain_text(profiled)
