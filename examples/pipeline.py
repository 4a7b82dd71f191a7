"""End-to-end training-data pipeline demo: the operators composed the
way a 100 TB corpus job would chain them.

    raw documents
      -> quality metrics + language ID          (scan-speed projections)
      -> quality filter
      -> exact dedup                            (one hash aggregate)
      -> MinHash-LSH near-dedup                 (bucket join + verify)
      -> stable ids                             (scalable row numbers)
      -> partitioned write                      (few, sorted files)
    plus: drift report of kept vs raw           (diff statistics)

Run: PYTHONPATH=. python examples/pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession, functions as F

from spark_extension_spark import (
    diff,
    exact_dedup,
    language_id,
    minhash_lsh_pairs,
    with_quality_metrics,
    with_row_numbers,
    write_partitioned_by,
)


def run_pipeline(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. annotate: quality + language (zero shuffles)
    annotated = with_quality_metrics(raw).withColumn("lang_guess", language_id("text"))

    # 2. quality gate
    kept = annotated.where(
        (F.col("q_n_tokens") >= 5)
        & (F.col("q_alpha_ratio") >= 0.5)
        & (F.col("q_mean_token_len") < 15)
    )

    # 3. exact dedup (normalized content hash)
    unique = exact_dedup(kept)

    # 4. near-dedup: drop the higher-id member of every LSH pair
    pairs = minhash_lsh_pairs(unique, num_hashes=32, bands=8, threshold=0.9)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = unique.join(losers, "doc_id", "left_anti")

    # 5. stable contiguous ids
    final = with_row_numbers(
        deduped, row_number_column_name="stable_id", order="doc_id"
    )

    # 6. layout: partition by language guess, sorted inside files
    write_partitioned_by(
        final, ["lang_guess"], more_file_order=["stable_id"]
    ).mode("overwrite").parquet(out_dir)

    # 7. drift report: what did the pipeline drop?
    report = (
        diff(raw.select("doc_id", "text"), final.select("doc_id", "text"), "doc_id")
        .groupBy("diff")
        .count()
        .orderBy("diff")
    )

    back = spark.read.parquet(out_dir)
    return {
        "raw": raw.count(),
        "kept": kept.count(),
        "unique": unique.count(),
        "deduped": deduped.count(),
        "written": back.count(),
        "partitions": back.select("lang_guess").distinct().count(),
        "drift": {r["diff"]: r["count"] for r in report.collect()},
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp() + "/corpus"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("pipeline-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    stats = run_pipeline(spark, sf_dir, out_dir)
    print(stats)


if __name__ == "__main__":
    main()
