import pytest

from spark_extension_spark.operators.basket import association_rules


def _rows(out):
    return {
        (r["antecedent"], r["consequent"]): r
        for r in out.collect()
    }


def test_association_rules_known_values(spark):
    # baskets: {a,b}, {a,b}, {a,c}, {b}  -> n_baskets=4, a:3 b:3 c:1
    data = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
        (4, "b"),          # duplicate membership counts once
        (5, None), (None, "a"),  # NULLs excluded
    ]
    df = spark.createDataFrame(data, ["basket", "item"])
    out = _rows(association_rules(df, "basket", "item", min_count=2))
    # only (a,b)/(b,a) co-occur >= 2 times
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    assert ab["n_ab"] == 2 and ab["n_antecedent"] == 3 and ab["n_consequent"] == 3
    assert ab["support"] == pytest.approx(2 / 4)
    assert ab["confidence"] == pytest.approx(2 / 3)
    assert ab["lift"] == pytest.approx((2 / 3) / (3 / 4))
    ba = out[("b", "a")]
    assert ba["confidence"] == pytest.approx(2 / 3)


def test_association_rules_basket_cap(spark):
    # the 3-item basket is dropped by the cap, killing the (a,b) pair
    # it contributed; the 2-item baskets survive
    data = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
    ]
    df = spark.createDataFrame(data, ["basket", "item"])
    out = _rows(
        association_rules(df, "basket", "item", min_count=2, max_basket_size=2)
    )
    assert set(out) == {("a", "b"), ("b", "a")}
    assert out[("a", "b")]["n_ab"] == 2
    # capped baskets are excluded from every denominator
    assert out[("a", "b")]["n_antecedent"] == 2
    assert out[("a", "b")]["support"] == pytest.approx(2 / 2)


def test_association_rules_min_count_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["basket", "item"])
    with pytest.raises(ValueError):
        association_rules(df, "basket", "item", min_count=0)
