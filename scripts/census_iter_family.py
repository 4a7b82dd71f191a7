"""Job-level census for the iterative-operator family (round 11).

For each named gate query, runs codegen warmup at sf0.001 then RUNS
timed noop-writes at the bench SF in a bench-shaped session with the
UI enabled, and records per run: wall seconds, summed per-stage
executorRunTime delta, the NUMBER of Spark jobs the query launched,
and each job's duration — the ground truth for "how much of this
operator is fixed per-action machinery (job scheduling, convergence
counts, checkpoint materializations) vs real iteration work".  A query
whose job durations are dominated by many ~100 ms jobs is paying
scheduling/action overhead; one big job per round is paying compute.

Usage: python scripts/census_iter_family.py query [query ...]
Env: SF (default /root/repo/.bench_cache/sf0.1), RUNS (default 3).
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
    .appName("census-iter-family")
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


def _api(path):
    url = f"http://localhost:4099/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def _stage_exec_ms():
    return sum(s.get("executorRunTime", 0) for s in _api("stages?status=complete"))


def _jobs():
    out = {}
    for j in _api("jobs"):
        if j.get("status") != "RUNNING" and j.get("completionTime"):
            # ISO times like 2026-08-16T13:00:00.123GMT
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t0 = datetime.strptime(j["submissionTime"], fmt)
            t1 = datetime.strptime(j["completionTime"], fmt)
            out[j["jobId"]] = round((t1 - t0).total_seconds(), 3)
    return out


for name in sys.argv[1:]:
    fn = QUERIES[name]
    try:
        fn(spark, WARM).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    spark.catalog.clearCache()
    recs = []
    for _ in range(RUNS):
        la = round(os.getloadavg()[0], 2)
        e0 = _stage_exec_ms()
        j0 = set(_jobs())
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        time.sleep(0.5)  # completed-stage metrics lag the job end briefly
        e1 = _stage_exec_ms()
        jobs = {k: v for k, v in _jobs().items() if k not in j0}
        recs.append(
            {
                "wall": wall,
                "exec_ms": e1 - e0,
                "n_jobs": len(jobs),
                "job_secs": [jobs[k] for k in sorted(jobs)],
                "la1": la,
            }
        )
        spark.catalog.clearCache()
    print(json.dumps({"query": name, "runs": recs}), flush=True)

spark.stop()
