"""Compaction planner/executor and schema-evolution-tolerant union."""

import pytest

from pyspark.sql import functions as F

from spark_extension_spark.sources.compaction import compact_files, plan_compaction
from spark_extension_spark.utils import safe_union


class TestPlanCompaction:
    def test_bins_fill_to_target(self, spark):
        files = spark.createDataFrame(
            [(f"f{i:02d}", 40) for i in range(10)], ["filename", "bytes"]
        )
        out = {r["filename"]: r["bin"] for r in plan_compaction(files, 100).collect()}
        # prefix sums 0,40,80,120,... -> bins 0,0,0,1,1,2,2,2,3,3
        assert [out[f"f{i:02d}"] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]

    def test_oversized_file_isolated_and_partition_scoped(self, spark):
        files = spark.createDataFrame(
            [("p1", "a", 500), ("p1", "b", 10), ("p1", "c", 10),
             ("p2", "a", 10), ("p2", "b", 10)],
            ["part", "filename", "bytes"],
        )
        out = {(r["part"], r["filename"]): r["bin"]
               for r in plan_compaction(files, 100, by=["part"]).collect()}
        assert out[("p1", "a")] == 0        # giant file alone in bin 0
        assert out[("p1", "b")] == 5        # next file starts past 5 targets
        assert out[("p1", "b")] == out[("p1", "c")]
        assert out[("p2", "a")] == 0        # bins restart per partition
        with pytest.raises(ValueError, match="target_bytes"):
            plan_compaction(files, 0)

    def test_compact_files_roundtrip(self, spark, tmp_path):
        src = str(tmp_path / "small")
        dest = str(tmp_path / "compacted")
        n = 40
        spark.range(n).withColumn("v", F.col("id") * 2).repartition(8).write.parquet(src)
        import glob
        parts = sorted(glob.glob(f"{src}/part-*.parquet"))
        assert len(parts) == 8
        import os
        files = spark.createDataFrame(
            [(p, os.path.getsize(p)) for p in parts], ["filename", "bytes"]
        )
        plan = plan_compaction(files, 2 * int(files.agg(F.max("bytes")).first()[0]))
        summary = compact_files(spark, plan, dest)
        assert summary.agg(F.sum("n_files")).first()[0] == 8
        back = spark.read.parquet(dest)
        assert back.count() == n
        assert sorted(r["id"] for r in back.collect()) == list(range(n))
        out_files = glob.glob(f"{dest}/part-*.parquet")
        assert len(out_files) < 8  # actually compacted
        assert len(out_files) == summary.count()


class TestSafeUnion:
    def test_missing_columns_and_widening(self, spark):
        a = spark.createDataFrame([(1, "x", 10)], "id int, s string, n int")
        b = spark.createDataFrame([(2, 20)], "id bigint, n bigint")
        out = safe_union([a, b])
        assert out.columns == ["id", "s", "n"]
        assert dict(out.dtypes) == {"id": "bigint", "s": "string", "n": "bigint"}
        rows = {r["id"]: r for r in out.collect()}
        assert rows[2]["s"] is None

    def test_float_plus_long_goes_double(self, spark):
        a = spark.createDataFrame([(1.5,)], "v float")
        b = spark.createDataFrame([(2**60,)], "v bigint")
        out = safe_union([a, b])
        assert dict(out.dtypes)["v"] == "double"
        assert 2.0**60 in {r["v"] for r in out.collect()}

    def test_decimal_plus_bigint_widens_precision(self, spark):
        a = spark.createDataFrame([(1,)], "v bigint").select(
            F.col("v").cast("decimal(5,2)").alias("v")
        )
        b = spark.createDataFrame([(2**60,)], "v bigint")
        out = safe_union([a, b])
        assert dict(out.dtypes)["v"] == "decimal(38,2)"
        assert out.where(F.col("v").isNull()).count() == 0

    def test_incompatible_raises_unless_coerced(self, spark):
        a = spark.createDataFrame([("x",)], "v string")
        b = spark.createDataFrame([(1,)], "v int")
        with pytest.raises(TypeError, match="incompatible"):
            safe_union([a, b])
        out = safe_union([a, b], coerce_to_string=True)
        assert dict(out.dtypes)["v"] == "string"
        assert {r["v"] for r in out.collect()} == {"x", "1"}

    def test_empty_input_raises(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            safe_union([])
