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
