"""Dump `.explain("formatted")` for a list of registry queries to files.

Usage:
    python scripts/dump_plans.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, containing the
formatted physical plan of the DataFrame the registry builds (the same
frame the bench times).  Runs on the bench data dir ($SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.1) with the same session shape as bench.py so
the plans match what the driver measures.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    if len(sys.argv) < 4:
        print(
            "usage: python scripts/dump_plans.py OUTDIR SUFFIX query [query ...]",
            file=sys.stderr,
        )
        return 2
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dump_plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.openCostInBytes", str(64 * 1024))
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_extension_spark.registry import QUERIES

    import contextlib
    import io

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        # public API: explain(mode=...) prints; capture its stdout
        # (the former PythonSQLUtils/_jdf route relied on PySpark
        # internals that can move across versions)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
