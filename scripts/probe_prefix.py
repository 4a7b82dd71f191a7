"""Probe: prefix_jaccard_documents under the exact bench session config.

Prints the physical plan of the intersect-bearing join (broadcast vs
shuffle regime) and warmup + 3 timed runs, plus loadavg per run.
Usage: python scripts/probe_prefix.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from spark_extension_spark.registry import QUERIES

SF = os.environ.get("SF", "/root/repo/.bench_cache/sf0.1")
WARM = os.environ.get("WARM", "/root/repo/.bench_cache/sf0.001")

spark = (
    SparkSession.builder.master("local[32]")
    .appName("probe-prefix")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "90g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.files.openCostInBytes", str(64 * 1024))
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

name = sys.argv[1] if len(sys.argv) > 1 else "prefix_jaccard_documents"
fn = QUERIES[name]

if os.environ.get("EXPLAIN", "1") == "1":
    fn(spark, SF).explain("formatted")

fn(spark, WARM).write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
runs = []
for i in range(3):
    la = os.getloadavg()[0]
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    runs.append(dt)
    print(f"run {i}: {dt:.3f}s  (loadavg before: {la:.2f})")
    spark.catalog.clearCache()
print(f"{name} median: {sorted(runs)[1]:.3f}  min: {min(runs):.3f}")
spark.stop()
