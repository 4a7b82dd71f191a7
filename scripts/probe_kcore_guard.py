"""A/B the k_core early-exit guard's isolated cost on the gate shape.

Variants (interleaved round-robin so ambient noise hits all equally):
  sum    — current guard: count + decimal(20,0) sum of xxhash64
  xor    — count + bit_xor of xxhash64 (pure int64, no decimal path)
  count  — count only (the pre-r12 exit; retry-unsafe on clusters)

Usage: python scripts/probe_kcore_guard.py [rounds_per_variant]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = os.environ.get("SF", "/root/repo/.bench_cache/sf0.1")
WARM = os.environ.get("WARM", "/root/repo/.bench_cache/sf0.001")

spark = (
    SparkSession.builder.master("local[32]")
    .appName("probe-kcore-guard")
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

from spark_extension_spark.operators import graph as G
from spark_extension_spark.registry import QUERIES

VARIANTS = {
    "sum": lambda: [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(20,0)")).alias("h"),
    ],
    "xor": lambda: [
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))).alias("h"),
    ],
    # duplicate count stands in for "h" so k_core's exit tuple still
    # reads — a second count on the same aggregate is ~free, so this
    # measures the no-hash-guard cost
    "count": lambda: [
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).alias("h"),
    ],
}


def steal():
    with open("/proc/stat") as f:
        p = f.readline().split()
    return int(p[8])


fn = QUERIES["k_core_lineitem"]
rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
res = {k: [] for k in VARIANTS}
# warmup each variant once at the small SF (codegen differs per variant)
for name, mk in VARIANTS.items():
    G._kcore_exit_metrics = mk
    fn(spark, WARM).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
for r in range(rounds):
    for name, mk in VARIANTS.items():
        G._kcore_exit_metrics = mk
        s0 = steal()
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        res[name].append((dt, steal() - s0))
        spark.catalog.clearCache()
        print(f"round {r} {name}: {dt:.3f}s steal {res[name][-1][1]}")
for name, runs in res.items():
    walls = sorted(w for w, _ in runs)
    print(f"{name}: median {walls[len(walls)//2]:.3f} min {walls[0]:.3f} runs {[(round(w,3),s) for w,s in runs]}")
spark.stop()
