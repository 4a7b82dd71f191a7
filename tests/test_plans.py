"""Plan-shape regression tests: pin the physical-plan properties each
operator promises (see PLANS.md).  A change that keeps results correct
but breaks one of these shapes is a scale regression."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.plans import summarize_plan
from spark_extension_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_diff_is_sort_merge_equi_join(spark):
    plan = summarize_plan(QUERIES["diff_lineitem"](spark, SF))
    # null-safe id equality must stay an equi-join: SMJ (or SHJ), never
    # a nested-loop/cartesian fallback
    assert "SortMergeJoin" in plan.joins or "ShuffledHashJoin" in plan.joins
    assert not plan.has_cartesian


def test_histogram_prunes_scan(spark):
    plan = summarize_plan(QUERIES["histogram_lineitem_price"](spark, SF))
    # scan must read exactly the value + group columns
    assert plan.read_columns() == [["l_extendedprice", "l_returnflag"]]
    assert plan.joins == []


def test_row_numbers_offsets_join_is_broadcast(spark):
    plan = summarize_plan(QUERIES["row_numbers_orders"](spark, SF))
    # the per-partition offsets table (<= #partitions rows) must
    # broadcast, never shuffle the data side again
    assert "BroadcastHashJoin" in plan.joins
    assert plan.read_columns()[0] == ["o_orderkey", "o_orderdate"]


def test_similarity_broadcasts_queries(spark):
    plan = summarize_plan(QUERIES["similarity_topk_embeddings"](spark, SF))
    # the query side is explicitly broadcast; the non-equi condition
    # makes BroadcastNestedLoop the correct strategy (cartesian would
    # mean the broadcast hint was lost)
    assert "BroadcastNestedLoopJoin" in plan.joins
    assert not plan.has_cartesian


def test_minhash_lsh_joins_on_buckets(spark):
    plan = summarize_plan(QUERIES["minhash_signatures_documents"](spark, SF))
    assert plan.joins == []  # signatures are a single aggregate, no join


def test_dedup_clusters_single_aggregate(spark):
    plan = summarize_plan(QUERIES["dedup_clusters_documents"](spark, SF))
    assert plan.joins == []
    assert not plan.has_cartesian


def test_text_stats_no_shuffle(spark):
    plan = summarize_plan(QUERIES["text_stats_documents"](spark, SF))
    # per-row transform: no exchange at all
    assert plan.exchanges == 0
    assert plan.joins == []
