"""UI-REST executorRunTime census for named gate queries.

Runs each query (codegen warmup at sf0.001, then N timed noop-writes at
the bench SF) in a bench-shaped session WITH the UI enabled, and after
each timed run sums per-stage `executorRunTime` / `inputBytes` /
`shuffleRead` deltas from `/api/v1/applications/<id>/stages` — the
round-8 ground-truth discipline (plan strings over-count persisted
lineage; wall-clock alone can't separate guard cost from machine load;
executor CPU time can).

Usage: python scripts/census_rest.py query [query ...]
Env: SF (default /root/repo/.bench_cache/sf0.1), RUNS (default 3).
Prints one JSON line per query:
  {"query": ..., "wall": [...], "exec_ms": [...], "loadavg": [...]}
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from spark_extension_spark.registry import QUERIES

SF = os.environ.get("SF", "/root/repo/.bench_cache/sf0.1")
WARM = os.environ.get("WARM", "/root/repo/.bench_cache/sf0.001")
RUNS = int(os.environ.get("RUNS", "3"))

spark = (
    SparkSession.builder.master("local[32]")
    .appName("census-rest")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "90g")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4099")
    .config("spark.sql.files.openCostInBytes", str(64 * 1024))
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
app_id = spark.sparkContext.applicationId


def _stage_totals():
    url = f"http://localhost:4099/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return (
        sum(s.get("executorRunTime", 0) for s in stages),
        sum(s.get("inputBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


for name in sys.argv[1:]:
    fn = QUERIES[name]
    try:
        fn(spark, WARM).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    spark.catalog.clearCache()
    walls, execs, loads, inbytes, shreads = [], [], [], [], []
    for _ in range(RUNS):
        loads.append(round(os.getloadavg()[0], 2))
        e0, i0, s0 = _stage_totals()
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        # completed-stage metrics can lag the job end briefly
        time.sleep(0.5)
        e1, i1, s1 = _stage_totals()
        execs.append(e1 - e0)
        inbytes.append(i1 - i0)
        shreads.append(s1 - s0)
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "query": name,
                "wall": walls,
                "exec_ms": execs,
                "input_bytes": inbytes,
                "shuffle_read": shreads,
                "loadavg": loads,
            }
        ),
        flush=True,
    )

spark.stop()
