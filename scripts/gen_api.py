"""Regenerate API.md: every public symbol per module (__all__-driven),
with the first docstring line as its summary."""

from __future__ import annotations

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = [
    ("Diff", "spark_extension_spark.operators.diff"),
    ("Diff comparators", "spark_extension_spark.operators.comparators"),
    ("Sorted groups", "spark_extension_spark.operators.sorted_groups"),
    ("Histogram", "spark_extension_spark.operators.histogram"),
    ("Row numbers", "spark_extension_spark.operators.row_numbers"),
    ("Packing & batching", "spark_extension_spark.operators.packing"),
    ("Sampling & mixing", "spark_extension_spark.operators.sampling"),
    ("BPE tokenization", "spark_extension_spark.operators.bpe"),
    ("Importance resampling", "spark_extension_spark.operators.importance"),
    ("Text analysis", "spark_extension_spark.operators.text"),
    ("Deduplication", "spark_extension_spark.operators.dedup"),
    ("Similarity / ANN", "spark_extension_spark.operators.similarity"),
    ("Lexical ranking", "spark_extension_spark.operators.ranking"),
    ("Decontamination", "spark_extension_spark.operators.decontam"),
    ("As-of join", "spark_extension_spark.operators.asof"),
    ("Time series", "spark_extension_spark.operators.timeseries"),
    ("Skew tools", "spark_extension_spark.operators.skew"),
    ("Feature engineering", "spark_extension_spark.operators.features"),
    ("Profiling & data quality", "spark_extension_spark.operators.profile"),
    ("Graph algorithms", "spark_extension_spark.operators.graph"),
    ("SCD2 dimension maintenance", "spark_extension_spark.operators.scd"),
    ("Sketches", "spark_extension_spark.operators.sketches"),
    ("Fuzzy matching", "spark_extension_spark.operators.fuzzy"),
    ("Semi-structured", "spark_extension_spark.operators.semistructured"),
    ("Multimodal", "spark_extension_spark.operators.multimodal"),
    ("Parquet metadata sources", "spark_extension_spark.sources.parquet_metadata"),
    ("Partitioned write", "spark_extension_spark.sources.partitioned_write"),
    ("Bucketed tables", "spark_extension_spark.sources.bucketed"),
    ("Clustered layout", "spark_extension_spark.sources.layout"),
    ("Data skipping", "spark_extension_spark.sources.skipping"),
    ("Footer crypto", "spark_extension_spark.sources.footer_crypto"),
    ("Streaming", "spark_extension_spark.streaming"),
    ("Functions", "spark_extension_spark.functions"),
    ("Session utilities", "spark_extension_spark.session"),
    ("Utils", "spark_extension_spark.utils"),
    ("Version", "spark_extension_spark.version"),
    ("Patching", "spark_extension_spark.patch"),
]


def first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    return doc.split("\n")[0].strip()


def main() -> None:
    lines = [
        "# API index",
        "",
        "Every public symbol, by module (`__all__`-driven).  Full signatures",
        "and scale notes live in the docstrings; plan shapes in `PLANS.md`;",
        "per-symbol correctness gates in `COVERAGE.md`.",
    ]
    total = 0
    for title, modname in SECTIONS:
        mod = importlib.import_module(modname)
        names = getattr(mod, "__all__", None) or [
            n for n in dir(mod) if not n.startswith("_")
        ]
        lines += ["", f"## {title} — `{modname}`", ""]
        for name in names:
            obj = getattr(mod, name)
            kind = "class" if inspect.isclass(obj) else "def"
            lines.append(f"- `{name}` ({kind}) — {first_line(obj)}")
            total += 1
    lines += ["", f"Total public symbols: {total}", ""]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "API.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {total} symbols")


if __name__ == "__main__":
    main()
