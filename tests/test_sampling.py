"""Deterministic sampling tests: reproducibility under repartitioning is
the whole point (Spark's RNG-based sample is partitioning-dependent)."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark import (
    assign_splits,
    hash_sample,
    hash_uniform,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_hash_uniform_range_and_determinism(docs):
    u = docs.select(hash_uniform("doc_id", seed=1).alias("u"))
    stats = u.agg(F.min("u"), F.max("u")).first()
    assert 0.0 <= stats[0] and stats[1] < 1.0
    # same seed -> identical draw; different seed -> different draw
    again = docs.select(hash_uniform("doc_id", seed=1).alias("u"))
    assert u.exceptAll(again).count() == 0
    other = docs.select(hash_uniform("doc_id", seed=2).alias("u"))
    assert u.exceptAll(other).count() > 0


def test_hash_sample_stable_under_repartitioning(docs):
    a = set(r["doc_id"] for r in hash_sample(docs, 0.3, "doc_id").collect())
    b = set(
        r["doc_id"]
        for r in hash_sample(docs.repartition(17), 0.3, "doc_id").collect()
    )
    assert a == b
    # roughly the requested rate (hash-uniform, 500 docs)
    assert 0.2 <= len(a) / docs.count() <= 0.4


def test_hash_sample_bounds(docs):
    assert hash_sample(docs, 0.0, "doc_id").count() == 0
    assert hash_sample(docs, 1.0, "doc_id").count() == docs.count()
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, 1.5, "doc_id")


def test_stratified_rates(docs):
    sampled = stratified_sample(
        docs, "lang", {"en": 1.0, "zh": 0.0}, "doc_id", default=0.0
    )
    langs = {r["lang"] for r in sampled.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.where(F.col("lang") == "en").count()
    assert sampled.count() == n_en
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, "lang", {"en": 2.0}, "doc_id")


def test_assign_splits_disjoint_exhaustive(docs):
    out = assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()  # exhaustive, one split each
    assert counts["train"] > counts["val"]
    # frozen: re-running with a different partitioning yields the same map
    again = assign_splits(
        docs.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id"
    )
    assert out.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).count() == 0


def test_assign_splits_validation(docs):
    with pytest.raises(ValueError, match="empty"):
        assign_splits(docs, {}, "doc_id")
    with pytest.raises(ValueError, match="positive"):
        assign_splits(docs, {"a": 0.0}, "doc_id")


def test_sample_filter_reaches_scan(docs, spark):
    from spark_extension_spark.plans import summarize_plan

    plan = summarize_plan(hash_sample(docs, 0.5, "doc_id"))
    # a pure projection filter: no shuffle, no join, single scan
    assert plan.joins == [] and plan.exchanges == 0 and plan.scans == 1


# -- resample_to_mix ---------------------------------------------------------


def test_resample_to_mix_shares(spark):
    from spark_extension_spark.operators.sampling import resample_to_mix

    rows = (
        [(i, "en") for i in range(6000)]
        + [(i + 10000, "de") for i in range(3000)]
        + [(i + 20000, "fr") for i in range(600)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = resample_to_mix(df, "lang", {"en": 0.5, "de": 0.3, "fr": 0.2}, "doc_id")
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # fr binds: N = 600/0.2 = 3000 -> expect ~1500/900/600 (binomial)
    assert counts["fr"] == 600  # rate 1.0 keeps everything
    assert abs(counts["en"] - 1500) < 150
    assert abs(counts["de"] - 900) < 120


def test_resample_to_mix_drops_unlisted_and_is_deterministic(spark):
    from spark_extension_spark.operators.sampling import resample_to_mix

    rows = [(i, ["en", "de", "zz"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    a = resample_to_mix(df, "lang", {"en": 0.5, "de": 0.5}, "doc_id")
    assert {r["lang"] for r in a.select("lang").distinct().collect()} <= {"en", "de"}
    b = resample_to_mix(df.repartition(13), "lang", {"en": 0.5, "de": 0.5}, "doc_id")
    assert {r["doc_id"] for r in a.collect()} == {r["doc_id"] for r in b.collect()}


def test_resample_to_mix_validation(spark):
    from spark_extension_spark.operators.sampling import resample_to_mix

    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    with pytest.raises(ValueError):
        resample_to_mix(df, "lang", {}, "doc_id")
    with pytest.raises(ValueError):
        resample_to_mix(df, "lang", {"en": -1.0}, "doc_id")


# -- per-group quota capping -------------------------------------------------


def test_cap_per_group_caps_only_over_quota(spark):
    from spark_extension_spark.operators.sampling import cap_per_group

    rows = [(i, "big") for i in range(20)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = cap_per_group(df, "source", 5, "doc_id").collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_group["big"]) == 5
    assert sorted(by_group["small"]) == [100, 101, 102]  # under quota: untouched


def test_cap_per_group_deterministic_and_partitioning_independent(spark):
    from spark_extension_spark.operators.sampling import cap_per_group

    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = sorted(r["doc_id"] for r in cap_per_group(df.coalesce(1), "source", 7, "doc_id").collect())
    b = sorted(r["doc_id"] for r in cap_per_group(df.repartition(13), "source", 7, "doc_id").collect())
    assert a == b and len(a) == 21
    # different seed selects a different (but equally sized) subset
    c = sorted(r["doc_id"] for r in cap_per_group(df, "source", 7, "doc_id", seed=7).collect())
    assert len(c) == 21 and c != a


def test_cap_per_group_null_group_and_zero_cap(spark):
    from spark_extension_spark.operators.sampling import cap_per_group

    rows = [(1, None), (2, None), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = cap_per_group(df, "source", 1, "doc_id").collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_group[None]) == 1 and by_group["x"] == [3]

    assert cap_per_group(df, "source", 0, "doc_id").count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="cap must be >= 0"):
        cap_per_group(df, "source", -1, "doc_id")


# -- token-budget subsetting -------------------------------------------------


def test_take_token_budget_prefix_and_monotone(spark):
    from spark_extension_spark.operators.sampling import take_token_budget
    from pyspark.sql import functions as F

    rows = [(i, 10) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    small = sorted(r["doc_id"] for r in take_token_budget(df, 200, "n_tok", "doc_id").collect())
    big = sorted(r["doc_id"] for r in take_token_budget(df, 500, "n_tok", "doc_id").collect())
    assert len(small) == 20 and len(big) == 50
    assert set(small) <= set(big)  # growing the budget only adds documents

    # partitioning-independent
    alt = sorted(r["doc_id"] for r in
                 take_token_budget(df.repartition(9), 200, "n_tok", "doc_id").collect())
    assert alt == small


def test_take_token_budget_never_overshoots(spark):
    from spark_extension_spark.operators.sampling import take_token_budget

    rows = [(1, 60), (2, 60), (3, 60)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    kept = take_token_budget(df, 100, "n_tok", "doc_id").collect()
    assert sum(r["n_tok"] for r in kept) <= 100
    assert len(kept) == 1  # strict prefix: the over-budget doc is excluded

    import pytest as _pytest
    with _pytest.raises(ValueError, match="budget must be >= 0"):
        take_token_budget(df, -1, "n_tok", "doc_id")


def test_take_token_budget_per_group(spark):
    from spark_extension_spark.operators.sampling import take_token_budget

    rows = [(i, 10, f"g{i % 2}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok", "lang"])
    kept = take_token_budget(df, 50, "n_tok", "doc_id", group_col="lang").collect()
    per = {}
    for r in kept:
        per[r["lang"]] = per.get(r["lang"], 0) + r["n_tok"]
    assert per == {"g0": 50, "g1": 50}  # budget applies per group


def test_top_per_group_merit_order(spark):
    from spark_extension_spark.operators.sampling import top_per_group

    rows = [(i, "g", float(i)) for i in range(10)] + [(100, "h", 1.0)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "score"])
    best = sorted(r["doc_id"] for r in top_per_group(df, "grp", 3, "score", "doc_id").collect())
    assert best == [7, 8, 9, 100]  # top-3 of g by score; h under quota
    worst = sorted(
        r["doc_id"]
        for r in top_per_group(df, "grp", 3, "score", "doc_id", descending=False).collect()
    )
    assert worst == [0, 1, 2, 100]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be >= 0"):
        top_per_group(df, "grp", -1, "score", "doc_id")


class TestWeightedSample:
    def test_weight_proportional_inclusion(self, spark):
        from pyspark.sql import functions as F

        from spark_extension_spark.operators.sampling import weighted_sample

        # two weight classes, 10x apart; heavy rows must dominate the
        # sample across many disjoint seed draws
        rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(200)]
        df = spark.createDataFrame(rows, ["id", "w"])
        heavy = 0
        for seed in range(5):
            s = weighted_sample(df, 20, "w", "id", seed=seed)
            heavy += s.where(F.col("w") == 10.0).count()
        # E[heavy] ~ 5 seeds * 20 * (10/11-ish with depletion) >> half
        assert heavy > 5 * 20 * 0.6

    def test_without_replacement_and_exact_k(self, spark):
        from spark_extension_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame([(i, float(i + 1)) for i in range(30)], ["id", "w"])
        s = weighted_sample(df, 7, "w", "id").collect()
        assert len(s) == 7
        assert len({r["id"] for r in s}) == 7

    def test_null_and_nonpositive_weights_excluded(self, spark):
        from spark_extension_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 0.0), (4, -2.0)], ["id", "w"]
        )
        s = weighted_sample(df, 10, "w", "id").collect()
        assert [r["id"] for r in s] == [1]

    def test_partitioning_independent_and_validates(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame([(i, float(i % 7 + 1)) for i in range(100)], ["id", "w"])
        a = sorted(r["id"] for r in weighted_sample(df, 10, "w", "id").collect())
        b = sorted(r["id"] for r in weighted_sample(df.repartition(13), 10, "w", "id").collect())
        assert a == b
        with _pytest.raises(ValueError):
            weighted_sample(df, 0, "w", "id")


class TestGlobalTopN:
    def test_small_n_is_take_ordered(self, spark):
        from pyspark.sql import functions as F

        from spark_extension_spark.operators.sampling import global_top_n

        df = spark.createDataFrame([(i, float(i % 17)) for i in range(500)], ["id", "v"])
        q = global_top_n(df, [F.col("v").desc(), F.col("id").asc()], 10)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_large_n_spillable_form_same_selection(self, spark, monkeypatch):
        from pyspark.sql import functions as F

        from spark_extension_spark.operators import sampling
        from spark_extension_spark.operators.sampling import global_top_n

        df = spark.createDataFrame(
            [(i, float((i * 37) % 101)) for i in range(500)], ["id", "v"]
        )
        order = [F.col("v").desc(), F.col("id").asc()]
        heap = {r["id"] for r in global_top_n(df, order, 50).collect()}
        # force the spillable branch at a tiny threshold: the 5-step
        # row-number form must pick the identical 50 rows and must NOT
        # plan a per-task heap
        monkeypatch.setattr(sampling, "TOP_N_SPILL_THRESHOLD", 10)
        q = global_top_n(df, order, 50)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" not in plan
        assert {r["id"] for r in q.collect()} == heap


# ---------------------------------------------------------------------------
# stride-scheduled interleaving
# ---------------------------------------------------------------------------


def test_interleave_prefix_mix(spark):
    """Every prefix of the interleaved order must contain each source at
    ~its target share — the stride-scheduling property."""
    from spark_extension_spark.operators.sampling import interleave_by_mix

    rows = [(s * 1000 + i, f"s{s}") for s in range(3) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    weights = {"s0": 0.5, "s1": 0.3, "s2": 0.2}
    out = interleave_by_mix(df, "source", weights, "doc_id")
    ordered = [r["source"] for r in out.orderBy("interleave_key", "doc_id").collect()]
    for prefix in (50, 100, 200, 400):
        counts = {s: 0 for s in weights}
        for s in ordered[:prefix]:
            counts[s] += 1
        for s, w in weights.items():
            assert abs(counts[s] / prefix - w) < 0.05, (prefix, s, counts)


def test_interleave_deterministic_and_null_for_unknown(spark):
    from spark_extension_spark.operators.sampling import interleave_by_mix

    rows = [(i, "a" if i % 2 else "mystery") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out1 = interleave_by_mix(df, "source", {"a": 1.0}, "doc_id").collect()
    out2 = interleave_by_mix(df.repartition(5), "source", {"a": 1.0}, "doc_id").collect()
    k1 = {r["doc_id"]: r["interleave_key"] for r in out1}
    k2 = {r["doc_id"]: r["interleave_key"] for r in out2}
    assert k1 == k2
    # unknown sources surface as NULL keys, not silently dropped rows
    assert len(out1) == 20
    assert all(k1[i] is None for i in range(0, 20, 2))


def test_interleave_rejects_bad_weights(spark):
    from spark_extension_spark.operators.sampling import interleave_by_mix

    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interleave_by_mix(df, "source", {}, "doc_id")
    with _pytest.raises(ValueError):
        interleave_by_mix(df, "source", {"a": -1.0}, "doc_id")


# ---------------------------------------------------------------------------
# fractional-epoch upsampling
# ---------------------------------------------------------------------------


def test_repeat_upsample_whole_rates(spark):
    from spark_extension_spark.operators.sampling import repeat_upsample

    df = spark.createDataFrame([(i, "a") for i in range(10)], ["doc_id", "source"])
    out = repeat_upsample(df, 3.0, "doc_id").collect()
    assert len(out) == 30
    epochs = {}
    for r in out:
        epochs.setdefault(r["doc_id"], set()).add(r["epoch"])
    assert all(e == {0, 1, 2} for e in epochs.values())


def test_repeat_upsample_fractional_rate_expected_size(spark):
    from spark_extension_spark.operators.sampling import repeat_upsample

    df = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])
    out = repeat_upsample(df, 1.5, "doc_id")
    n = out.count()
    assert 1400 <= n <= 1600  # 1.5 ± binomial noise
    # deterministic across partitionings
    n2 = repeat_upsample(df.repartition(7), 1.5, "doc_id").count()
    assert n == n2


def test_repeat_upsample_per_stratum_and_drop(spark):
    from spark_extension_spark.operators.sampling import repeat_upsample

    rows = [(i, "keep2" if i < 5 else ("drop" if i < 10 else "zero")) for i in range(15)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = repeat_upsample(df, {"keep2": 2.0, "zero": 0.0}, "doc_id", strata_col="source")
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"keep2": 10}  # 'drop' absent from dict, 'zero' rate 0


def test_repeat_upsample_rejects_bad(spark):
    from spark_extension_spark.operators.sampling import repeat_upsample

    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        repeat_upsample(df, -1.0, "doc_id")
    with _pytest.raises(ValueError):
        repeat_upsample(df, {"a": 1.0}, "doc_id")  # dict without strata_col


class TestTemperatureMix:
    def test_alpha_one_keeps_everything(self, spark):
        from spark_extension_spark.operators.sampling import temperature_mix

        rows = [(i, "s%d" % (i % 3)) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        assert temperature_mix(df, "source", 1.0, "doc_id").count() == 300

    def test_alpha_zero_targets_uniform(self, spark):
        from spark_extension_spark.operators.sampling import temperature_mix

        # skewed strata: 600 / 200 / 60 rows
        rows = (
            [(i, "big") for i in range(600)]
            + [(1000 + i, "mid") for i in range(200)]
            + [(2000 + i, "small") for i in range(60)]
        )
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        out = temperature_mix(df, "source", 0.0, "doc_id")
        by = {r["source"]: r["n"] for r in out.groupBy("source").agg(
            __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
        ).collect()}
        # binding (smallest) stratum kept 100%; others ~c_min each
        assert by["small"] == 60
        assert abs(by["big"] - 60) <= 25 and abs(by["mid"] - 60) <= 25

    def test_deterministic_and_partitioning_independent(self, spark):
        from spark_extension_spark.operators.sampling import temperature_mix

        rows = [(i, "s%d" % (i % 4)) for i in range(400)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        a = sorted(r["doc_id"] for r in temperature_mix(df.coalesce(1), "source", 0.5, "doc_id").collect())
        b = sorted(r["doc_id"] for r in temperature_mix(df.repartition(13), "source", 0.5, "doc_id").collect())
        assert a == b

    def test_bad_alpha_raises(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.sampling import temperature_mix

        df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
        with _pytest.raises(ValueError):
            temperature_mix(df, "source", 1.5, "doc_id")


def test_assign_splits_rejects_negative_weight(spark):
    from spark_extension_spark.operators.sampling import assign_splits

    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="must be >= 0"):
        assign_splits(df, {"train": -0.2, "val": 0.6, "test": 0.6}, "id")


def test_hash_uniform_null_id_matches_sql_twin(spark):
    import duckdb

    from spark_extension_spark.operators.sampling import (
        hash_uniform,
        hash_uniform_sql,
    )

    df = spark.createDataFrame([(None,), ("x",)], "id string")
    got = {r["id"]: r["u"] for r in df.select("id", hash_uniform("id").alias("u")).collect()}
    want_null = duckdb.sql(f"SELECT {hash_uniform_sql('NULL')} AS u").fetchone()[0]
    # NULL ids draw as the empty-string key — exactly the SQL twin's
    # CONCAT-skips-NULL behavior (previously Spark returned a NULL draw:
    # dropped from samples, dumped into the last split, NULLS FIRST in
    # every quota ordering)
    assert got[None] == want_null
    assert got[None] is not None and 0.0 <= got[None] < 1.0


def test_none_strata_keys_are_live(spark):
    from spark_extension_spark.operators.sampling import (
        resample_to_mix,
        stratified_sample,
    )

    rows = [(i, None if i % 2 else "en") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = stratified_sample(df, "lang", {None: 1.0, "en": 0.0}, "doc_id")
    # the None entry must match the NULL stratum (== never can)
    assert kept.where(F.col("lang").isNull()).count() == 50
    assert kept.where(F.col("lang") == "en").count() == 0
    mixed = resample_to_mix(df, "lang", {None: 0.5, "en": 0.5}, "doc_id")
    # both strata survive; previously the None share inflated the
    # normalization while matching nothing, so NULL rows vanished
    assert mixed.where(F.col("lang").isNull()).count() > 0
    assert mixed.where(F.col("lang") == "en").count() > 0


def test_sql_helpers_validate_and_escape(spark):
    from spark_extension_spark.operators.sampling import (
        assign_splits_sql,
        resample_to_mix_sql,
    )

    with pytest.raises(ValueError, match="must not be empty"):
        assign_splits_sql("doc_id", {})
    with pytest.raises(ValueError, match=">= 0"):
        assign_splits_sql("doc_id", {"train": -1, "test": 2})
    sql = assign_splits_sql("doc_id", {"it's": 1.0, "b": 1.0})
    assert "'it''s'" in sql
    # expression arguments must render unqualified in the final join
    # (previously d.{strata_expr} produced 'd.lower(lang)')
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES (1, 'EN'), (2, 'de')) t(doc_id, lang)")
    q = resample_to_mix_sql("documents", "lower(lang)", {"en": 0.5, "de": 0.5}, "doc_id",
                            columns="d.doc_id")
    con.execute(q)  # must parse and run


def test_with_running_total_fractional_values(spark):
    from spark_extension_spark.operators.packing import with_running_total

    df = spark.createDataFrame(
        [(1, 0.7), (2, -0.3), (3, 0.9)], "id long, delta double"
    )
    out = {r["id"]: r["running_total"]
           for r in with_running_total(df, "delta", order=["id"], by=[]).collect()}
    # fractional inputs must not silently truncate to long
    assert out[1] == pytest.approx(0.7)
    assert out[2] == pytest.approx(0.4)
    assert out[3] == pytest.approx(1.3)


def test_padding_report_zero_length_batch(spark):
    from spark_extension_spark.operators.packing import padding_report

    df = spark.createDataFrame([("b1", 0), ("b1", 0)], "batch string, length long")
    row = padding_report(df, "length", batch_col="batch").collect()[0]
    assert row["pad_frac"] == 0.0  # not NULL from 0/0
