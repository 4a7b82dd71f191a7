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


# ---------------------------------------------------------------------------
# constraint checking + PSI drift
# ---------------------------------------------------------------------------


def test_check_constraints_counts(spark):
    import pyspark.sql.functions as F
    from spark_extension_spark.operators.profile import check_constraints

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 7.0)], "id long, v double"
    )
    out = {
        r["rule"]: r
        for r in check_constraints(
            df, {"v_positive": F.col("v") > 0, "id_small": F.col("id") < 10}
        ).collect()
    }
    # NULL predicate counts as a violation
    assert out["v_positive"]["n_violations"] == 2
    assert out["v_positive"]["n_rows"] == 4
    assert out["v_positive"]["violation_frac"] == 0.5
    assert out["id_small"]["n_violations"] == 0


def test_check_constraints_single_pass_plan(spark):
    import pyspark.sql.functions as F
    from spark_extension_spark.operators.profile import check_constraints
    from spark_extension_spark.plans import summarize_plan

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = summarize_plan(
        check_constraints(df, {"a": F.col("o_totalprice") > 0, "b": F.col("o_custkey").isNotNull()})
    )
    assert plan.joins == []  # one aggregate, no joins, no per-rule jobs


def test_check_constraints_rejects_empty(spark):
    from spark_extension_spark.operators.profile import check_constraints

    df = spark.createDataFrame([(1,)], ["id"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        check_constraints(df, {})


def test_psi_identical_populations_near_zero(spark):
    from spark_extension_spark.operators.profile import psi_report
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(float(i % 50),) for i in range(500)], ["v"])
    rep = psi_report(df, df, "v", lo=0.0, hi=50.0, bins=10)
    total = rep.agg(F.sum("psi_term")).collect()[0][0]
    assert abs(total) < 1e-12


def test_psi_detects_shift(spark):
    from spark_extension_spark.operators.profile import psi_report
    import pyspark.sql.functions as F

    a = spark.createDataFrame([(float(i % 50),) for i in range(500)], ["v"])
    b = spark.createDataFrame([(float(i % 50) + 30.0,) for i in range(500)], ["v"])
    rep = psi_report(a, b, "v", lo=0.0, hi=50.0, bins=10)
    total = rep.agg(F.sum("psi_term")).collect()[0][0]
    assert total > 0.25  # "shifted" by the standard rule of thumb
    # overflow bin captured b's mass beyond hi — nothing silently dropped
    rows = {r["bin"]: r for r in rep.collect()}
    assert rows[11]["n_b"] > 0 and rows[11]["n_a"] == 0
    assert sum(r["n_a"] for r in rows.values()) == 500
    assert sum(r["n_b"] for r in rows.values()) == 500


def test_psi_rejects_bad_range(spark):
    from spark_extension_spark.operators.profile import psi_report

    df = spark.createDataFrame([(1.0,)], ["v"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        psi_report(df, df, "v", lo=5.0, hi=5.0)


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from spark_extension_spark.operators.profile import corr_matrix

    rows = [
        (float(i), float(2 * i + (i * 7) % 5), float((i * 13) % 23), 1.0)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c", "d"])
    out = {
        (r["col_x"], r["col_y"]): r
    for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert len(out) == 6
    with np.errstate(invalid="ignore"):  # column d is constant: stddev 0
        mat = np.corrcoef(np.array(rows).T)
    names = ["a", "b", "c", "d"]
    for i, x in enumerate(names):
        for j in range(i + 1, len(names)):
            r = out[(x, names[j])]
            assert r["n"] == 200
            if x == "d" or names[j] == "d":  # constant column -> NULL corr
                assert r["corr"] is None
            else:
                assert abs(r["corr"] - mat[i][j]) < 1e-9


def test_corr_matrix_listwise_complete_and_single_pass(spark):
    from spark_extension_spark.operators.profile import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, None, 1.0), (3.0, 1.0, None), (4.0, 5.0, 6.0)],
        ["a", "b", "c"],
    )
    out = corr_matrix(df, ["a", "b", "c"])
    # plan BEFORE execution: AQE's finalized string repeats the stage's
    # exchange (ShuffleQueryStage + original node), inflating the count
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one aggregate pass, no per-pair jobs
    assert {r["n"] for r in out.collect()} == {2}  # listwise: only complete rows


def test_corr_matrix_validation(spark):
    import pytest as _pytest

    from spark_extension_spark.operators.profile import corr_matrix

    df = spark.createDataFrame([(1.0,)], ["a"])
    with _pytest.raises(ValueError, match="needs >= 2"):
        corr_matrix(df, ["a"])


def test_categorical_association_known_values(spark):
    import math

    from spark_extension_spark.operators.profile import categorical_association

    # perfectly dependent: y == x
    rows = [(c, c) for c in "aabbcc"]
    df = spark.createDataFrame(list(rows), ["x", "y"])
    r = categorical_association(df, "x", "y").collect()[0]
    assert r["n"] == 6 and r["n_x"] == 3 and r["n_y"] == 3
    assert abs(r["nmi"] - 1.0) < 1e-12          # identical variables
    assert abs(r["mi"] - math.log(3)) < 1e-12   # H(x) = ln 3 (uniform)
    assert abs(r["cramers_v"] - 1.0) < 1e-12    # chi2 = n*min(r-1,c-1)

    # independent: every (x, y) combo equally likely
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = categorical_association(df, "x", "y").collect()[0]
    assert abs(r["mi"]) < 1e-12
    assert abs(r["chi2"]) < 1e-12
    assert r["cramers_v"] == 0.0


def test_categorical_association_unobserved_cells_count_in_chi2(spark):
    from spark_extension_spark.operators.profile import categorical_association

    # x=a only ever sees y=c; cell (a, d) is unobserved but expected>0
    df = spark.createDataFrame(
        [("a", "c")] * 4 + [("b", "c")] * 2 + [("b", "d")] * 2, ["x", "y"]
    )
    r = categorical_association(df, "x", "y").collect()[0]
    # hand-computed chi2 over the FULL 2x2 grid (o=4,2,0,2; e=3,1,3,1... )
    n = 8.0
    exp = {("a","c"): 4*6/n, ("a","d"): 4*2/n, ("b","c"): 4*6/n, ("b","d"): 4*2/n}
    obs = {("a","c"): 4, ("a","d"): 0, ("b","c"): 2, ("b","d"): 2}
    chi2 = sum((obs[k]-e)**2/e for k, e in exp.items())
    assert abs(r["chi2"] - chi2) < 1e-9


def test_categorical_association_degenerate_single_category(spark):
    from spark_extension_spark.operators.profile import categorical_association

    df = spark.createDataFrame([("a", "c"), ("a", "d")], ["x", "y"])
    r = categorical_association(df, "x", "y").collect()[0]
    assert r["mi"] == 0.0 and r["nmi"] == 0.0 and r["cramers_v"] == 0.0


def test_reliability_report_perfect_and_miscalibrated(spark):
    from spark_extension_spark.operators.profile import reliability_report

    # perfectly calibrated: in each bin, positives occur at the bin's score
    rows = []
    for b in range(10):
        s = b / 10 + 0.05
        npos = int(round(s * 20))
        rows += [(s, 1.0)] * npos + [(s, 0.0)] * (20 - npos)
    df = spark.createDataFrame(rows, "s double, y double")
    out = reliability_report(df, "s", "y", bins=10).collect()
    import pyspark.sql.functions as F

    ece = sum(r["ece_term"] for r in out)
    assert ece < 0.011  # rounding of npos only
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-12

    # overconfident: score 0.95 but only 20% positive
    df2 = spark.createDataFrame([(0.95, 1.0)] * 2 + [(0.95, 0.0)] * 8, "s double, y double")
    r = reliability_report(df2, "s", "y", bins=10).collect()[0]
    assert r["bin"] == 9
    assert abs(r["abs_gap"] - 0.75) < 1e-12
    assert abs(r["ece_term"] - 0.75) < 1e-12


def test_reliability_report_clamps_and_validates(spark):
    import pytest as _pytest

    from spark_extension_spark.operators.profile import reliability_report

    df = spark.createDataFrame(
        [(-0.5, 0.0), (1.7, 1.0), (None, 1.0), (0.5, None)], "s double, y double"
    )
    out = {r["bin"]: r["n"] for r in reliability_report(df, "s", "y", bins=10).collect()}
    assert out == {0: 1, 9: 1}  # clamped into edge bins; NULLs excluded
    with _pytest.raises(ValueError, match="bins"):
        reliability_report(df, "s", "y", bins=0)


def test_ks_report_matches_bruteforce(spark):
    import numpy as np

    from spark_extension_spark.operators.profile import ks_report

    rng = [((i * 37) % 101) / 10.0 for i in range(300)]
    a_vals = rng[:180]
    b_vals = [v + (0.8 if v > 5 else 0.0) for v in rng[180:]]
    a = spark.createDataFrame([(v,) for v in a_vals], ["v"])
    b = spark.createDataFrame([(v,) for v in b_vals], ["v"])

    row = ks_report(a, b, "v").collect()[0]

    xs = np.array(sorted(set(a_vals) | set(b_vals)))
    fa = np.searchsorted(np.sort(a_vals), xs, side="right") / len(a_vals)
    fb = np.searchsorted(np.sort(b_vals), xs, side="right") / len(b_vals)
    d = np.abs(fa - fb)
    assert row["ks_stat"] == max(d)
    assert row["ks_at"] == float(xs[int(np.argmax(d))])
    assert row["n_a"] == 180 and row["n_b"] == 120
    assert 0.0 <= row["p_approx"] <= 1.0


def test_ks_report_identical_zero_and_groups(spark):
    from spark_extension_spark.operators.profile import ks_report

    rows = [("g%d" % (i % 3), float((i * 7) % 40)) for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "v"])
    rep = {r["g"]: r for r in ks_report(df, df, "v", by=["g"]).collect()}
    assert set(rep) == {"g0", "g1", "g2"}
    for r in rep.values():
        assert r["ks_stat"] == 0.0
        assert r["p_approx"] == 1.0


def test_ks_report_disjoint_supports_is_one(spark):
    from spark_extension_spark.operators.profile import ks_report

    a = spark.createDataFrame([(float(i),) for i in range(50)], ["v"])
    b = spark.createDataFrame([(float(i + 100),) for i in range(50)], ["v"])
    row = ks_report(a, b, "v").collect()[0]
    assert row["ks_stat"] == 1.0
    assert row["ks_at"] == 49.0  # smallest value attaining the sup
    # nulls are dropped, not binned
    a2 = spark.createDataFrame([(None,), (1.0,)], ["v"])
    row2 = ks_report(a2, a2, "v").collect()[0]
    assert row2["n_a"] == 1 and row2["ks_stat"] == 0.0


def test_psi_nan_lands_in_underflow_bin(spark):
    # floor(NaN)->long 0 would otherwise put NaN in the first in-range
    # bucket; NaN must join NULL in underflow (bin 0)
    from spark_extension_spark.operators.profile import psi_report

    a = spark.createDataFrame(
        [(float("nan"),), (None,), (5.0,)], "v double"
    )
    b = spark.createDataFrame([(5.0,)], "v double")
    rows = {r["bin"]: (r["n_a"], r["n_b"]) for r in
            psi_report(a, b, "v", lo=0.0, hi=10.0, bins=2).collect()}
    assert rows[0] == (2, 0)          # NaN + NULL in underflow
    assert rows[2] == (1, 1)          # 5.0 in [5,10)
    assert rows[1] == (0, 0)


def test_reliability_excludes_nan_rows(spark):
    # NaN passes isNotNull but vanishes from decimal sums — it must be
    # excluded from n as well, like NULL
    from spark_extension_spark.operators.profile import reliability_report

    df = spark.createDataFrame(
        [(0.25, 1.0), (0.25, 0.0), (float("nan"), 1.0), (0.35, float("nan"))],
        "s double, y double",
    )
    rows = {r["bin"]: r for r in reliability_report(df, "s", "y", bins=4).collect()}
    assert set(rows) == {1}
    assert rows[1]["n"] == 2 and rows[1]["avg_score"] == 0.25
    assert rows[1]["frac_positive"] == 0.5
