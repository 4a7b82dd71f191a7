"""Round-4 surface demo: event feature engineering, corpus sketches,
fuzzy matching, and layout — composed the way an ops/feature job
would chain them.

    events  -> typed JSON fields              (scan-speed projection)
            -> trailing 1h window features    (one exchange)
            -> per-user category pivot        (one aggregate)
            -> winsorized value sums          (rank + broadcast clip)
    corpus  -> KMV/HLL distinct sketches      (bounded state)
            -> join-cardinality estimate      (no join executed)
            -> Bloom-pruned fact scan         (semi-join probes)
    part    -> exact Levenshtein near-dup keys (symmetric-delete)
    layout  -> Hilbert-clustered write         (range exchange)

Run: PYTHONPATH=. python examples/features_and_sketches.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession, functions as F

from spark_extension_spark import (
    bloom_prune,
    extract_json_fields,
    fuzzy_dedup_pairs,
    heavy_keys,
    hll_distinct,
    kmv_overlap,
    pivot_counts,
    rolling_aggregates,
    winsorize,
)
from spark_extension_spark.sources.layout import write_hilbert


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("features-and-sketches-demo")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    # typed JSON extraction + trailing-window features + pivot
    ev = extract_json_fields(events, "props", {"k": "int"})
    ev = rolling_aggregates(
        ev, "ts", 3600, {"n_1h": F.count(F.lit(1)), "sum_1h": F.sum("value")}, by=["user_id"]
    )
    features = pivot_counts(ev, ["user_id"], "event_type", ["click", "view", "purchase"])
    print("feature matrix:", features.count(), "users ×", len(features.columns) - 1, "categories")

    # robust per-type value sums
    clipped = winsorize(events, "value", by=["event_type"])
    clipped.groupBy("event_type").agg(
        F.round(F.sum("value_winsorized"), 2).alias("wsum")
    ).show(5, truncate=False)

    # sketches: who is heavy, how many distinct, how selective a join would be
    heavy_keys(events, ["user_id"], k=3).show(truncate=False)
    hll_distinct(events, "event_id", by=["event_type"]).show(5, truncate=False)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    kmv_overlap(orders, customer, "o_custkey", "c_custkey", k=128).show(truncate=False)

    building = customer.where(F.col("c_mktsegment") == "BUILDING")
    pruned = bloom_prune(orders, building, "o_custkey", "c_custkey")
    print("bloom prune:", orders.count(), "orders ->", pruned.count(), "candidates")

    # fuzzy key dedup
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_name")
    pairs = fuzzy_dedup_pairs(part, "p_partkey", "p_name", max_distance=1)
    print("fuzzy near-dup part-name pairs (d<=1):", pairs.count())

    # Hilbert-clustered layout
    with tempfile.TemporaryDirectory() as tmp:
        write_hilbert(
            events.select("event_id", "user_id", "value"),
            f"{tmp}/events_hilbert",
            ["user_id", "event_id"],
            bits=10,
            num_files=4,
        )
        n = spark.read.parquet(f"{tmp}/events_hilbert").count()
        print("hilbert-clustered rows written+read:", n)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
