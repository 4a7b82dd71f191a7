"""Noise-free structural census for a registry query: Spark jobs,
stages, tasks, and total shuffle-write/read bytes per run, from the UI
REST API.  Wall-clock on a contended host lies; byte and stage counts
do not — use this to adjudicate whether a restructure actually removed
work.

Usage: python scripts/probe_structure.py query [query ...]
Env: SF, WARM as usual.
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF = os.environ.get("SF", "/root/repo/.bench_cache/sf0.1")
WARM = os.environ.get("WARM", "/root/repo/.bench_cache/sf0.001")
PORT = int(os.environ.get("PORT", "4099"))

spark = (
    SparkSession.builder.master("local[32]")
    .appName("probe-structure")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "90g")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", str(PORT))
    .config("spark.sql.files.openCostInBytes", str(64 * 1024))
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
app_id = spark.sparkContext.applicationId

from spark_extension_spark.registry import QUERIES


def _api(path):
    url = f"http://localhost:{PORT}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def _totals():
    st = _api("stages?status=complete")
    return {
        "stages": len(st),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in st),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in st),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in st),
        "jobs": len(_api("jobs")),
    }


for name in sys.argv[1:]:
    fn = QUERIES[name]
    try:
        fn(spark, WARM).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    spark.catalog.clearCache()
    t0w = _totals()
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    time.sleep(1.0)
    t1w = _totals()
    d = {k: t1w[k] - t0w[k] for k in t0w}
    spark.catalog.clearCache()
    print(
        f"{name}: jobs {d['jobs']} stages {d['stages']} tasks {d['tasks']} "
        f"shufW {d['shuffle_write']/1e6:.2f}MB shufR {d['shuffle_read']/1e6:.2f}MB "
        f"wall {wall:.3f}s"
    )
spark.stop()
