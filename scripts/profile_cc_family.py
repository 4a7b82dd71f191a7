"""Profile where the CC-family gates spend their time: candidate
generation (n-gram Jaccard pairs) vs the label-propagation loop vs the
post-CC consumers.

Phases timed with perf_counter around forced sub-plans under the exact
bench session config (repacked data, warmup pass first).  The CC loop's
internal actions (sym materialize, per-batch checkpoints, final count)
are what the "cc loop" bucket measures; "consumers" is the remaining
cost of the gate's final noop write.

Usage: python scripts/profile_cc_family.py [near_dup|keep_best|splits]
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
    .appName("profile-cc")
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

from spark_extension_spark import registry as R
from spark_extension_spark.operators import dedup as D


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s")
    return out, dt


def profile(sf_dir, which):
    docs = R._docs_with_near_dups(spark, sf_dir)
    print(f"[{which} @ {sf_dir}]")
    # phase 1: candidate pairs alone
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.6)
    _, t_pairs = timed("pairs (ngram_jaccard) noop", lambda: noop(pairs))
    # phase 2: full gate
    fn = R.QUERIES[
        {
            "near_dup": "near_dup_clusters_documents",
            "keep_best": "dedup_keep_best_documents",
            "splits": "cluster_splits_documents",
        }[which]
    ]
    _, t_total = timed("full gate noop", lambda: noop(fn(spark, sf_dir)))
    spark.catalog.clearCache()
    # phase 3: CC loop on precomputed (persisted) pairs
    pairs2 = D.ngram_jaccard_pairs(docs, n=3, threshold=0.6).persist()
    n_pairs = pairs2.count()
    t0 = time.perf_counter()
    labels = D.near_dup_clusters(pairs2, warn_single_use=False)
    t_cc_build = time.perf_counter() - t0
    _, t_cc_read = timed("labels noop (post-loop read)", lambda: noop(labels))
    print(f"  cc loop (construction actions over cached pairs, {n_pairs} pairs): {t_cc_build:.3f}s")
    from spark_extension_spark.operators.dedup import cc_stats_log

    print(f"  cc stats: {cc_stats_log(clear=True)}")
    pairs2.unpersist()
    spark.catalog.clearCache()
    print(
        f"  => pairs {t_pairs:.3f}s | total {t_total:.3f}s | "
        f"cc-over-cached-pairs {t_cc_build:.3f}s"
    )


which = sys.argv[1] if len(sys.argv) > 1 else "near_dup"
# codegen warmup at the small SF
profile(WARM, which)
print("--- timed at bench SF ---")
profile(SF, which)
spark.stop()
