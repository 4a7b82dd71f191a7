"""Sketch operators: KMV / HLL distinct estimation, count-min
frequency estimation, Bloom-filter join pruning.

Correctness bar: sketches are *estimates*, so tests assert (a) exact
agreement in the sub-capacity regime where the sketch provably
degrades to exact counting, (b) bounded relative error in the
estimating regime, (c) the one-sided guarantees (CMS never
undercounts; Bloom never drops a true match), and (d) partitioning
independence — the same sketch from any shuffle layout.
"""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.sketches import (
    bloom_prune,
    cms_counts,
    hll_distinct,
    kmv_distinct,
)

from conftest import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load(spark, sf_dir, "events")


class TestKMV:
    def test_exact_below_capacity(self, docs):
        # distinct langs per source is far below k=64 -> estimate is exact
        got = {
            r["source"]: (r["n_distinct_est"], r["n_exact_capped"])
            for r in kmv_distinct(docs, "lang", by=["source"], k=64).collect()
        }
        want = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(
                F.countDistinct("lang").alias("n")
            ).collect()
        }
        assert set(got) == set(want)
        for src, n in want.items():
            assert got[src] == (float(n), n)

    def test_estimating_regime_bounded_error(self, events):
        truth = events.select("event_id").distinct().count()
        est = kmv_distinct(events, "event_id", k=32).collect()[0]["n_distinct_est"]
        assert truth > 32  # actually estimating, not exact
        # KMV std error ~ 1/sqrt(k-2) ~ 18% at k=32; allow 3 sigma
        assert abs(est - truth) / truth < 0.55

    def test_partitioning_independent(self, events):
        a = kmv_distinct(events, "event_id", k=16).collect()[0]["n_distinct_est"]
        b = kmv_distinct(events.repartition(13, "event_type"), "event_id", k=16).collect()[0][
            "n_distinct_est"
        ]
        assert a == b


class TestHLL:
    def test_bounded_error(self, events):
        truth = events.select("event_id").distinct().count()
        est = hll_distinct(events, "event_id", bucket_bits=8).collect()[0]["n_distinct_est"]
        # raw HLL std error ~ 1.04/sqrt(256) ~ 6.5%; raw estimator biases
        # high below ~2.5m distincts, allow a generous 35% band
        assert abs(est - truth) / truth < 0.35

    def test_grouped_and_partitioning_independent(self, events):
        a = hll_distinct(events, "user_id", by=["event_type"], bucket_bits=6)
        b = hll_distinct(
            events.repartition(7, "user_id"), "user_id", by=["event_type"], bucket_bits=6
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_rejects_bad_bits(self, events):
        with pytest.raises(ValueError):
            hll_distinct(events, "user_id", bucket_bits=1)


class TestCMS:
    def test_never_undercounts_and_tight_on_heavy(self, docs):
        toks = docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
        ).where(F.col("token") != "")
        truth = {r["token"]: r["n"] for r in toks.groupBy("token").agg(F.count("*").alias("n")).collect()}
        keys = toks.select("token").distinct()
        est = {r["token"]: r["est_count"] for r in cms_counts(toks, "token", keys, depth=4, width=2048).collect()}
        assert set(est) == set(truth)
        for t, n in truth.items():
            assert est[t] >= n  # one-sided guarantee
        # small vocabulary vs 2048-wide rows: collisions are rare; the
        # heaviest token should be estimated exactly
        heaviest = max(truth, key=truth.get)
        assert est[heaviest] == truth[heaviest]

    def test_absent_key_small(self, docs):
        toks = docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
        ).where(F.col("token") != "")
        missing = docs.sparkSession.createDataFrame([("zzz-not-a-token",)], ["token"])
        est = cms_counts(toks, "token", missing, depth=4, width=2048).collect()[0]["est_count"]
        # may collide (overcount) but must stay far below the corpus size
        assert est < toks.count() * 0.05


class TestBloomPrune:
    def test_no_false_negatives(self, spark, sf_dir):
        orders = load(spark, sf_dir, "orders")
        cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
        pruned = bloom_prune(orders, cust, "o_custkey", "c_custkey")
        true_matches = orders.join(
            cust.select("c_custkey").distinct(),
            orders.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        # every true match survives the prune
        assert pruned.join(
            true_matches.select("o_orderkey"), "o_orderkey", "left_semi"
        ).count() == true_matches.count()

    def test_prunes_most_nonmatches(self, spark, sf_dir):
        orders = load(spark, sf_dir, "orders")
        dim = load(spark, sf_dir, "customer").limit(5)
        pruned = bloom_prune(orders, dim, "o_custkey", "c_custkey", num_bits=1 << 16)
        true_n = orders.join(
            dim.select("c_custkey").distinct(),
            orders.o_custkey == F.col("c_custkey"),
            "left_semi",
        ).count()
        n = pruned.count()
        assert n >= true_n
        # with 5 keys * 3 hashes in 65536 bits, false-positive rate is tiny
        assert n <= true_n + max(5, int(orders.count() * 0.01))

    def test_schema_preserved(self, spark, sf_dir):
        orders = load(spark, sf_dir, "orders")
        dim = load(spark, sf_dir, "customer").limit(5)
        assert bloom_prune(orders, dim, "o_custkey", "c_custkey").columns == orders.columns


class TestKMVOverlap:
    def test_exact_below_capacity(self, spark):
        from spark_extension_spark.operators.sketches import kmv_overlap

        a = spark.createDataFrame([(v,) for v in range(0, 30)], ["k"])
        b = spark.createDataFrame([(v,) for v in range(20, 50)], ["k"])
        r = kmv_overlap(a, b, "k", "k", k=256).collect()[0]
        # everything below sketch capacity -> exact set arithmetic
        assert r["est_distinct_left"] == 30.0
        assert r["est_distinct_right"] == 30.0
        assert r["est_union"] == 50.0
        assert r["est_intersection"] == 10.0
        assert abs(r["jaccard_est"] - 10 / 50) < 1e-9

    def test_estimates_bounded_error(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from spark_extension_spark.operators.sketches import kmv_overlap

        orders = load(spark, sf_dir, "orders").select("o_custkey")
        cust = load(spark, sf_dir, "customer").select("c_custkey")
        r = kmv_overlap(orders, cust, "o_custkey", "c_custkey", k=64).collect()[0]
        truth_b = cust.distinct().count()
        truth_i = orders.distinct().join(
            cust.distinct(), orders.o_custkey == F.col("c_custkey"), "left_semi"
        ).count()
        assert abs(r["est_distinct_right"] - truth_b) / truth_b < 0.4
        assert abs(r["est_intersection"] - truth_i) / max(truth_i, 1) < 0.5

    def test_disjoint_sets(self, spark):
        from spark_extension_spark.operators.sketches import kmv_overlap

        a = spark.createDataFrame([(1,), (2,)], ["k"])
        b = spark.createDataFrame([(9,), (10,)], ["k"])
        r = kmv_overlap(a, b, "k", "k").collect()[0]
        assert r["jaccard_est"] == 0.0 and r["est_intersection"] == 0.0


def test_hll_and_kmv_empty_inputs_zero_not_null(spark):
    from spark_extension_spark.operators.sketches import (
        hll_distinct,
        kmv_overlap,
    )

    empty = spark.createDataFrame([], "v string")
    h = hll_distinct(empty, "v").collect()[0]
    assert h["n_distinct_est"] == 0.0 and h["n_registers"] == 0
    all_null = spark.createDataFrame([(None,)], "v string")
    assert hll_distinct(all_null, "v").collect()[0]["n_distinct_est"] == 0.0
    ov = kmv_overlap(empty, empty, "v").collect()[0]
    assert ov["est_distinct_left"] == 0.0
    assert ov["est_union"] == 0.0
    assert ov["jaccard_est"] == 0.0
    assert ov["est_intersection"] == 0.0
