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
* The corpus side needs its per-document dedup shuffle only when
  *distinct* matching n-grams are being counted
  (``count_distinct=True``, the default for
  :func:`contamination_flags`); when only the yes/no flag at
  ``min_overlap=1`` matters (the :func:`decontaminate` path) a
  duplicated contaminated n-gram still contaminates, so the distinct
  is skipped.
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
    count_distinct: bool = True,
) -> DataFrame:
    """One row per document: (id, ``n_contaminated``, ``contaminated``).

    With ``count_distinct=True`` (default) ``n_contaminated`` counts the
    document's *distinct* n-grams that occur anywhere in the benchmark
    text; with ``count_distinct=False`` the corpus side skips its
    per-document dedup shuffle and ``n_contaminated`` counts matching
    n-gram *occurrences* (a gram repeated in the doc counts each time).
    The two agree on the ``contaminated`` flag whenever
    ``min_overlap == 1`` — any overlap is contamination either way —
    which is why :func:`decontaminate` takes the cheap path there.
    ``contaminated`` is ``n_contaminated >= min_overlap``; documents
    sharing nothing get 0 / false (left join keeps them).
    """
    bench_grams = shingles(
        benchmark.select(F.col(bench_text_col).alias("text")).withColumn(
            "__bid", F.monotonically_increasing_id()
        ),
        id_col="__bid",
        text_col="text",
        n=n,
    ).select("shingle").distinct()

    doc_grams = shingles(
        docs, id_col=id_col, text_col=text_col, n=n, distinct=count_distinct
    )
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
    When ``min_overlap == 1`` the flag is duplicate-insensitive, so the
    corpus-side distinct shuffle is skipped (``count_distinct=False``);
    higher thresholds keep exact distinct-gram counting.
    """
    dirty = contamination_flags(
        docs, benchmark, n, id_col, text_col, bench_text_col, min_overlap,
        count_distinct=(min_overlap > 1),
    ).where(F.col("contaminated")).select(id_col)
    return docs.join(dirty, id_col, "left_anti")
