"""Benchmark decontamination: flag / drop training documents that share
word n-grams with an evaluation set.

The standard pre-training hygiene step (GPT-3 §B, PaLM, Llama all
document a variant): any training document containing an ``n``-gram
that also occurs in a benchmark's text is *contaminated* and must be
excluded (or at least flagged) so evaluation numbers stay meaningful.

Execution shape, sized for a 100 TB corpus vs a few-MB benchmark:

* Both sides shingle with the same single-regex pass the dedup
  operators use (:func:`~spark_extension_spark.operators.dedup.shingles`
  — one ``regexp_extract_all`` + explode, no UDF).
* The benchmark side is distinct n-grams only — for real benchmarks a
  few hundred thousand rows, which Spark/AQE broadcasts; the corpus
  then never shuffles: flagging is a map-side hash-join probe + one
  map-side-combined count per document.
* The corpus side skips its distinct (a duplicated contaminated
  n-gram still contaminates; counting *distinct* matching n-grams is
  what needs the per-doc dedup, so :func:`contamination_flags` does
  distinct only when ``count_distinct=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles

__all__ = ["contamination_flags", "decontaminate"]


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """One row per document: (id, ``n_contaminated``, ``contaminated``).

    ``n_contaminated`` counts the document's *distinct* n-grams that
    occur anywhere in the benchmark text; ``contaminated`` is
    ``n_contaminated >= min_overlap``.  Documents sharing nothing get
    0 / false (left join keeps them).
    """
    bench_grams = shingles(
        benchmark.select(F.col(bench_text_col).alias("text")).withColumn(
            "__bid", F.monotonically_increasing_id()
        ),
        id_col="__bid",
        text_col="text",
        n=n,
    ).select("shingle").distinct()

    doc_grams = shingles(docs, id_col=id_col, text_col=text_col, n=n)
    hits = (
        doc_grams.join(bench_grams, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated", F.lit(0).cast("long")).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0).cast("long")) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """The clean corpus: ``docs`` minus every contaminated document.

    Implemented as a left anti join against the contaminated id set —
    the id set is the aggregate's output (small), so the corpus passes
    through with one broadcast-able probe and keeps all its columns.
    """
    dirty = contamination_flags(
        docs, benchmark, n, id_col, text_col, bench_text_col, min_overlap
    ).where(F.col("contaminated")).select(id_col)
    return docs.join(dirty, id_col, "left_anti")
