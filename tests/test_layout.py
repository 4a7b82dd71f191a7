import glob

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.sources.layout import with_z_value, write_zordered, z_value


def interleave2(x, y, bits=16):
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_z_value_bit_exact(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", z_value([F.col("x"), F.col("y")]).alias("z")).collect()
    for r in got:
        assert r["z"] == interleave2(r["x"], r["y"])


def test_z_value_guards():
    with pytest.raises(ValueError):
        z_value([])
    with pytest.raises(ValueError):
        z_value([F.col("a"), F.col("b")], bits=32)


def test_with_z_value_scaling(spark):
    # two corners of the grid: (min,min) -> 0; (max,max) -> all bits set
    df = spark.createDataFrame([(10, 100), (20, 300), (15, 200)], "a long, b long")
    got = {(r["a"], r["b"]): r["z_value"] for r in with_z_value(df, ["a", "b"], bits=4).collect()}
    assert got[(10, 100)] == 0
    assert got[(20, 300)] == interleave2(15, 15, bits=4)
    # midpoint scales to (7, 7): (5*15) DIV 10 = 7, (100*15) DIV 200 = 7
    assert got[(15, 200)] == interleave2(7, 7, bits=4)


def test_with_z_value_constant_column(spark):
    df = spark.createDataFrame([(1, 7), (2, 7)], "a long, b long")
    got = with_z_value(df, ["a", "b"], bits=4).collect()
    assert all(r["z_value"] == interleave2(15 if r["a"] == 2 else 0, 0, bits=4) for r in got)


def test_write_zordered_disjoint_file_ranges(spark, tmp_path):
    import itertools

    rows = [(x, y) for x, y in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    out = str(tmp_path / "zorder")
    write_zordered(df, out, ["x", "y"], bits=5, num_files=4)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    # range partitioning on z => per-file z intervals are disjoint, so
    # per-file (x, y) bounding boxes are tighter than random placement
    back = spark.read.parquet(out)
    assert back.count() == 1024 and set(back.columns) == {"x", "y"}
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
        .collect()
    )
    # a random 4-way split would give every file the full 0..31 span on
    # both axes; z-clustering must beat that on average
    avg_span = sum((r[2] - r[1]) + (r[4] - r[3]) for r in per_file) / len(per_file)
    assert avg_span < 62


class TestHilbert:
    def test_true_hilbert_curve(self, spark):
        # 8x8 grid: the index must be a permutation of 0..63 AND every
        # consecutive pair of curve positions must be grid-adjacent
        # (the property that distinguishes Hilbert from Morton)
        from spark_extension_spark.sources.layout import with_hilbert_value

        rows = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(rows, ["x", "y"])
        got = {
            (r["x"], r["y"]): r["h_value"]
            for r in with_hilbert_value(df, ["x", "y"], bits=3).collect()
        }
        assert sorted(got.values()) == list(range(64))
        inv = {d: xy for xy, d in got.items()}
        assert all(
            abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
            for d in range(63)
        )

    def test_locality_beats_zorder(self, spark):
        # total grid distance along the curve: Hilbert is strictly
        # better than Morton (which jumps diagonally between quadrants)
        from spark_extension_spark.sources.layout import with_hilbert_value, with_z_value

        rows = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows, ["x", "y"])

        def total_jump(col):
            if col == "h":
                out = with_hilbert_value(df, ["x", "y"], bits=4, out_col="v")
            else:
                out = with_z_value(df, ["x", "y"], bits=4, out_col="v")
            inv = {r["v"]: (r["x"], r["y"]) for r in out.collect()}
            ds = sorted(inv)
            return sum(
                abs(inv[a][0] - inv[b][0]) + abs(inv[a][1] - inv[b][1])
                for a, b in zip(ds, ds[1:])
            )

        assert total_jump("h") < total_jump("z")

    def test_validation_and_write(self, spark, tmp_path):
        import pytest as _pytest

        from spark_extension_spark.sources.layout import (
            with_hilbert_value,
            write_hilbert,
        )

        df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
        with _pytest.raises(ValueError):
            with_hilbert_value(df, ["a", "b", "c"])
        with _pytest.raises(ValueError):
            with_hilbert_value(df, ["a", "b"], bits=40)
        path = str(tmp_path / "hilbert")
        write_hilbert(df.select("a", "b"), path, ["a", "b"], bits=4)
        assert spark.read.parquet(path).count() == 1


def test_hilbert_null_coordinates_yield_null_value(spark):
    # a NULL coordinate must yield a NULL curve value (like
    # with_z_value) — not a meaningless index scattered inside the
    # curve, which would silently destroy min/max pruning
    from spark_extension_spark.sources.layout import with_hilbert_value

    df = spark.createDataFrame(
        [(1, 1, 2), (2, None, 5), (3, 4, None)], "id long, x int, y int"
    )
    got = {r["id"]: r["h_value"] for r in with_hilbert_value(df, ["x", "y"], bits=3).collect()}
    assert got[1] is not None and got[2] is None and got[3] is None
