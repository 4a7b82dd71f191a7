"""Data-selection + training-order demo: the round-6 operators composed
the way a curation job would chain them.

    raw documents
      -> DSIR importance weights vs an in-domain target     (broadcast-scored)
      -> Gumbel-top-k selection                             (frozen draw)
      -> leakage-safe train/val/test splits                 (cluster-keyed)
      -> stride-interleaved training order                  (prefix-true mix)
      -> length-bucketed batches + padding audit            (5-step row numbers)
    plus: winnowing overlap screen vs a "benchmark" corpus  (MOSS sketches)
    plus: constraint checks + PSI drift between splits      (one-pass audits)

Run: PYTHONPATH=. python examples/data_selection.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession, functions as F

from spark_extension_spark import (
    check_constraints,
    importance_model,
    importance_weights,
    interleave_by_mix,
    leakage_safe_splits,
    length_batches,
    padding_report,
    psi_report,
    select_by_importance,
    winnow_fingerprints,
    winnow_overlap_pairs,
    zipf_report,
)


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("data-selection-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 0. input expectations: fail loudly before spending cluster time
    report = check_constraints(
        docs,
        {
            "doc_id_not_null": F.col("doc_id").isNotNull(),
            "text_nonempty": F.length("text") > 0,
            "lang_known": F.col("lang").isin("en", "de", "fr", "es", "zh"),
        },
    )
    print("constraints:")
    report.show(truncate=False)

    # 1. DSIR: score every document against an in-domain target (here:
    #    the English slice stands in for "looks like my eval domain")
    model = importance_model(docs.filter("lang = 'en'"), docs, buckets=4096)
    weights = importance_weights(docs, model)
    picked = select_by_importance(weights, n=200)
    print("selected:", picked.count(), "docs; top by weight:")
    picked.orderBy(F.col("logw").desc()).show(5)

    selected = docs.join(picked.select("doc_id"), "doc_id", "left_semi")

    # 2. benchmark decontamination screen at the substring level
    bench = docs.limit(5).select("doc_id", "text")  # stand-in benchmark
    overlaps = winnow_overlap_pairs(
        winnow_fingerprints(selected.select("doc_id", "text")),
        winnow_fingerprints(bench),
        min_shared=2,
    )
    contaminated = overlaps.select(F.col("id_a").alias("doc_id")).distinct()
    clean = selected.join(contaminated, "doc_id", "left_anti")
    print("dropped as benchmark-overlapping:", selected.count() - clean.count())

    # 3. leakage-safe splits: near-dup clusters never straddle train/test
    split_df = leakage_safe_splits(
        clean, {"train": 0.9, "val": 0.05, "test": 0.05}, threshold=0.5
    )
    split_df.groupBy("split").count().show()

    # 4. training order: stride-interleave sources so every prefix of the
    #    stream carries the target mix
    mix = {f"src{i}": 1.0 for i in range(20)}
    train = split_df.filter("split = 'train'")
    ordered = interleave_by_mix(train, "source", mix, "doc_id")

    # 5. batches: longest-first length bucketing + padding audit
    batched = length_batches(
        ordered.withColumn("n_tokens", F.size(F.split("text", " "))),
        "n_tokens",
        batch_size=32,
        id_col="doc_id",
    )
    print("padding audit (first batches):")
    padding_report(batched, "n_tokens").orderBy("batch_id").show(5)

    # 6. corpus-level sanity: Zipf fit and PSI drift between splits
    print("zipf:", zipf_report(clean).collect())
    drift = psi_report(
        split_df.filter("split = 'train'").select(F.col("n_chars").cast("double").alias("v")),
        split_df.filter("split = 'test'").select(F.col("n_chars").cast("double").alias("v")),
        "v",
        lo=0.0,
        hi=600.0,
    )
    print("train-vs-test PSI:", drift.agg(F.sum("psi_term")).collect()[0][0])

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
