"""Sequence packing / scalable running-total tests."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_extension_spark import pack_blocks, with_running_total
from spark_extension_spark.utils import UnpersistHandle


@pytest.fixture(scope="module")
def toks(spark):
    # (id, shard, tokens): crafted so docs straddle block boundaries
    rows = [(i, i % 2, t) for i, t in enumerate([100, 300, 250, 0, 512, 1, 700, 5])]
    return spark.createDataFrame(rows, ["id", "shard", "tokens"]).repartition(4)


def test_global_running_total_matches_naive_window(toks):
    got = with_running_total(toks, "tokens", order=["id"], out="run")
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = toks.withColumn("run", F.sum(F.col("tokens").cast("long")).over(w))
    assert (
        got.select("id", "run").exceptAll(want.select("id", "run")).count() == 0
    )
    assert got.count() == want.count()


def test_running_total_by_key(toks):
    got = with_running_total(toks, "tokens", order=["id"], by=["shard"], out="run")
    w = Window.partitionBy("shard").orderBy("id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = toks.withColumn("run", F.sum(F.col("tokens").cast("long")).over(w))
    assert got.exceptAll(want).count() == 0


def test_pack_blocks_boundaries(toks):
    packed = {
        r["id"]: (r["tokens_before"], r["block_first"], r["block_last"])
        for r in pack_blocks(toks, "tokens", 512, order=["id"]).collect()
    }
    # cumulative: 100, 400, 650, 650, 1162, 1163, 1863, 1868
    assert packed[0] == (0, 0, 0)
    assert packed[1] == (100, 0, 0)        # 100..399 fits block 0
    assert packed[2] == (400, 0, 1)        # straddles the 512 boundary
    assert packed[3] == (650, 1, 1)        # empty doc: first == last
    assert packed[4] == (650, 1, 2)        # exactly capacity, straddles
    assert packed[5] == (1162, 2, 2)
    assert packed[6] == (1163, 2, 3)
    assert packed[7] == (1863, 3, 3)


def test_pack_blocks_sharded(toks):
    packed = pack_blocks(toks, "tokens", 512, order=["id"], by=["shard"])
    # shard 0 ids: 0,2,4,6 -> before: 0,100,350,862
    got = {r["id"]: r["tokens_before"] for r in packed.where("shard = 0").collect()}
    assert got == {0: 0, 2: 100, 4: 350, 6: 862}


def test_pack_blocks_validation_and_unpersist(toks):
    with pytest.raises(ValueError, match="capacity"):
        pack_blocks(toks, "tokens", 0, order=["id"])
    handle = UnpersistHandle()
    pack_blocks(toks, "tokens", 512, order=["id"], unpersist_handle=handle).count()
    handle()  # must not raise; releases the pinned intermediate


def test_running_total_offsets_join_is_broadcast(toks):
    from spark_extension_spark.plans import summarize_plan

    plan = summarize_plan(with_running_total(toks, "tokens", order=["id"], out="run"))
    # global path must use the offsets technique: broadcast join, and no
    # single-partition window over the full data (same shape as
    # with_row_numbers, pinned in PLANS.md)
    assert "BroadcastHashJoin" in plan.joins


def test_global_running_total_with_negative_values(spark):
    # partition totals must be SUM, not max(cumsum): with negatives the
    # max of the inclusive prefix sum overstates the partition total and
    # every later partition's offset is wrong
    rows = [(0, 5), (1, -3), (2, 2), (3, 1), (4, -10), (5, 4)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(3)
    got = with_running_total(df, "v", order=["id"], out="run")
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("run", F.sum(F.col("v").cast("long")).over(w))
    assert (
        got.select("id", "run").exceptAll(want.select("id", "run")).count() == 0
    )
    assert got.count() == want.count()
