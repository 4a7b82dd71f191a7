"""SCD Type 2 snapshot merge."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.scd import scd2_as_of, scd2_current, scd2_merge


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [
            (1, "alice", "NYC", 0, None),
            (2, "bob", "SF", 0, None),
            (3, "carol", "LA", 0, 50),      # already-closed history row
            (3, "carol", "SEA", 50, None),  # carol moved at t=50
        ],
        "id long, name string, city string, valid_from long, valid_to long",
    )


def test_scd2_merge_cases(spark, dim):
    updates = spark.createDataFrame(
        [
            (1, "alice", "BOS"),   # changed -> close + open
            (2, "bob", "SF"),      # unchanged -> no-op
            (4, "dave", "CHI"),    # new id -> insert
        ],
        "id long, name string, city string",
    )
    out = scd2_merge(dim, updates, ["id"], F.lit(100).cast("long"))
    rows = sorted(
        map(tuple, out.select("id", "city", "valid_from", "valid_to").collect())
    )
    assert rows == sorted(
        [
            (1, "NYC", 0, 100),    # closed
            (1, "BOS", 100, None), # opened
            (2, "SF", 0, None),    # untouched open
            (3, "LA", 0, 50),      # history passthrough
            (3, "SEA", 50, None),  # open, absent from updates -> kept
            (4, "CHI", 100, None), # brand new
        ],
        key=lambda t: (t[0], t[2]),
    ) or rows == sorted(
        [
            (1, "NYC", 0, 100),
            (1, "BOS", 100, None),
            (2, "SF", 0, None),
            (3, "LA", 0, 50),
            (3, "SEA", 50, None),
            (4, "CHI", 100, None),
        ]
    )
    # idempotence: re-applying the same snapshot changes nothing
    again = scd2_merge(out, updates, ["id"], F.lit(200).cast("long"))
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


def test_scd2_null_safe_attribute_compare(spark):
    dim = spark.createDataFrame(
        [(1, None, 0, None)], "id long, city string, valid_from long, valid_to long"
    )
    same = spark.createDataFrame([(1, None)], "id long, city string")
    out = scd2_merge(dim, same, ["id"], F.lit(9).cast("long"))
    assert out.count() == 1  # NULL == NULL: unchanged, no new version


def test_scd2_current_and_as_of(spark, dim):
    assert {r["city"] for r in scd2_current(dim).collect()} == {"NYC", "SF", "SEA"}
    at_25 = {r["id"]: r["city"] for r in scd2_as_of(dim, F.lit(25)).collect()}
    assert at_25[3] == "LA"  # carol's pre-move version
    at_75 = {r["id"]: r["city"] for r in scd2_as_of(dim, F.lit(75)).collect()}
    assert at_75[3] == "SEA"


def test_scd2_rejects_bad_args(spark, dim):
    upd = spark.createDataFrame([(1, "x", "y")], "id long, name string, city string")
    with pytest.raises(ValueError):
        scd2_merge(dim, upd, [], F.lit(1))
    bad = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="no attribute columns"):
        scd2_merge(dim, bad, ["id"], F.lit(1))
    with pytest.raises(ValueError, match="missing columns"):
        scd2_merge(dim, upd, ["id"], F.lit(1), compare_cols=["nope"])


class TestSnapshotDelta:
    def test_counts_all_four_actions(self, spark):
        from spark_extension_spark.operators.scd import snapshot_delta

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)], ["id", "src", "v"]
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 99), (4, "b", 40)], ["id", "src", "v"]
        )
        out = {r["action"]: r["n_rows"] for r in
               snapshot_delta(old, new, ["id"]).collect()}
        assert out == {"N": 1, "C": 1, "D": 1, "I": 1}

    def test_by_takes_new_side_except_deletes(self, spark):
        from spark_extension_spark.operators.scd import snapshot_delta

        old = spark.createDataFrame([(1, "olddim", 1), (2, "x", 2)], ["id", "src", "v"])
        new = spark.createDataFrame([(1, "newdim", 9)], ["id", "src", "v"])
        out = {(r["src"], r["action"]): r["n_rows"] for r in
               snapshot_delta(old, new, ["id"], by=["src"]).collect()}
        assert out[("newdim", "C")] == 1  # C rows labelled with the NEW dim
        assert out[("x", "D")] == 1       # D rows can only use the old dim


def test_scd2_merge_null_id_rows(spark):
    # presence is detected with per-side markers, not the nullable key:
    # an unchanged NULL-id row must stay a single open version, and a
    # changed one must be closed + reopened exactly once
    from spark_extension_spark.operators.scd import scd2_merge

    current = spark.createDataFrame(
        [(None, "x", 0, None)], "id string, attr string, valid_from long, valid_to long"
    )
    same = spark.createDataFrame([(None, "x")], "id string, attr string")
    out = scd2_merge(current, same, ["id"], ts=5, valid_from="valid_from",
                     valid_to="valid_to").collect()
    assert len(out) == 1 and out[0]["valid_to"] is None

    changed = spark.createDataFrame([(None, "y")], "id string, attr string")
    out2 = sorted(
        scd2_merge(current, changed, ["id"], ts=5, valid_from="valid_from",
                   valid_to="valid_to").collect(),
        key=lambda r: (r["valid_to"] is None, r["attr"]),
    )
    assert len(out2) == 2
    assert out2[0]["attr"] == "x" and out2[0]["valid_to"] == 5
    assert out2[1]["attr"] == "y" and out2[1]["valid_to"] is None
