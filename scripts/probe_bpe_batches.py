"""Instrument bpe_train's speculate-and-validate batching on the gate
corpus: log, per job, the guess list and what was accepted, so the
speculation misses can be diagnosed (stale-order wrong? chained-symbol
merge the stale table cannot contain?).

Usage: python scripts/probe_bpe_batches.py [batch_size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF = os.environ.get("SF", "/root/repo/.bench_cache/sf0.1")

spark = (
    SparkSession.builder.master("local[32]")
    .appName("probe-bpe")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "32g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.files.openCostInBytes", str(64 * 1024))
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spark_extension_spark.operators import bpe as B

orig = B._plan_batch
jobs = []


def spy(step_tops, guess, cap):
    accepted, next_guess, done = orig(step_tops, guess, cap)
    jobs.append(
        {
            "guess": list(guess),
            "accepted": list(accepted),
            "next_guess_head": next_guess[:4],
            "tops0_head": (step_tops.get(0) or [])[:4],
            "done": done,
        }
    )
    return accepted, next_guess, done


B._plan_batch = spy

from spark_extension_spark.registry import QUERIES

batch = int(sys.argv[1]) if len(sys.argv) > 1 else None
name = "bpe_train_documents"
if batch is None:
    t0 = time.perf_counter()
    QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
    print(f"gate wall: {time.perf_counter() - t0:.3f}s")
else:
    from spark_extension_spark.registry import load
    from pyspark.sql import functions as F

    docs = load(spark, SF, "documents")
    t0 = time.perf_counter()
    B.bpe_train(docs, n_merges=12, batch_size=batch).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"bpe_train(batch_size={batch}) wall: {time.perf_counter() - t0:.3f}s")

for i, j in enumerate(jobs):
    print(f"job {i + 1}: guess={j['guess']}")
    print(f"        accepted={j['accepted']}")
    print(f"        mismatch_at={next((k for k, g in enumerate(j['guess']) if k >= len(j['accepted']) - 0 or j['accepted'][k] != g), None)}")
    print(f"        state0_tops={j['tops0_head']}")
print(f"jobs: {len(jobs)}, accepted per job: {[len(j['accepted']) for j in jobs]}")
spark.stop()
