"""Bucketed-table tests: the co-located join must plan with zero
Exchange operators — the whole point of paying the shuffle at write time."""

import tempfile

import pytest
from pyspark.sql import functions as F

from spark_extension_spark import colocated_join, read_bucketed, write_bucketed
from spark_extension_spark.plans import summarize_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    base = tempfile.mkdtemp(prefix="bucketed_test_")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(orders, "t_orders_b", 8, ["o_custkey"],
                   sort_columns=["o_custkey"], path=f"{base}/orders")
    write_bucketed(customer, "t_customer_b", 8, ["c_custkey"],
                   sort_columns=["c_custkey"], path=f"{base}/customer")
    yield "t_orders_b", "t_customer_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    t_orders, t_customer = bucketed_tables
    joined = read_bucketed(spark, t_orders).join(
        read_bucketed(spark, t_customer),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    plain = spark.read.parquet(f"{SF}/orders.parquet").join(
        spark.read.parquet(f"{SF}/customer.parquet"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    assert joined.count() == plain.count()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # at toy sizes the planner rightly broadcasts (and disables the
    # bucketed scan); the no-exchange contract is for big-big joins, so
    # pin it with broadcast off — exactly the 100 TB scenario
    t_orders, t_customer = bucketed_tables
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, t_orders).join(
            read_bucketed(spark, t_customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = summarize_plan(joined)
        assert "SortMergeJoin" in plan.joins
        assert plan.exchanges == 0, "bucketed join must not re-shuffle either side"
        # the identical plain-parquet join pays two exchanges
        plain = spark.read.parquet(f"{SF}/orders.parquet").join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert summarize_plan(plain).exchanges >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_write_bucketed_validation(spark):
    df = spark.range(10)
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "t_bad", 0, ["id"])
    with pytest.raises(ValueError, match="bucket columns"):
        write_bucketed(df, "t_bad", 4, [])
