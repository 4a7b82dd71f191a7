"""Diff CLI: read two datasets, diff them, write the result.

Parity: reference src/main/scala/uk/co/gresearch/spark/diff/App.scala:24-330
(scopt option surface re-expressed with argparse).

    python -m spark_extension_spark.diff_app \
        --format parquet --id l_orderkey --id l_linenumber \
        left.parquet right.parquet out.parquet
"""

from __future__ import annotations

import argparse
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.diff import DiffMode, DiffOptions, Differ


def _parse_options(option_pairs: List[str]) -> dict:
    out = {}
    for pair in option_pairs or []:
        if "=" not in pair:
            raise ValueError(f"Reader/writer option must be key=value: {pair}")
        key, value = pair.split("=", 1)
        out[key] = value
    return out


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="spark-extension-diff",
        description="Differencing DataFrames: compute I/C/D/N changes "
        "between two datasets and write them out.",
    )
    parser.add_argument("left_path", help="left (before) dataset path or table")
    parser.add_argument("right_path", help="right (after) dataset path or table")
    parser.add_argument("output_path", help="output path or table")

    io = parser.add_argument_group("input/output")
    io.add_argument("--format", default="parquet", help="format for all sides")
    io.add_argument("--left-format", help="left input format")
    io.add_argument("--right-format", help="right input format")
    io.add_argument("--output-format", help="output format")
    io.add_argument("--schema", help="DDL schema applied to both inputs")
    io.add_argument("--left-schema", help="left DDL schema")
    io.add_argument("--right-schema", help="right DDL schema")
    io.add_argument("--left-option", action="append", default=[], metavar="K=V")
    io.add_argument("--right-option", action="append", default=[], metavar="K=V")
    io.add_argument("--output-option", action="append", default=[], metavar="K=V")
    io.add_argument("--hive", action="store_true",
                    help="treat paths as Hive table names")
    io.add_argument("--save-mode", default="errorifexists",
                    choices=["append", "overwrite", "ignore", "errorifexists"])

    d = parser.add_argument_group("diff")
    d.add_argument("--id", action="append", default=[], help="id column (repeatable)")
    d.add_argument("--ignore", action="append", default=[], help="ignored column")
    d.add_argument("--diff-column", default="diff")
    d.add_argument("--left-prefix", default="left")
    d.add_argument("--right-prefix", default="right")
    d.add_argument("--insert-value", default="I")
    d.add_argument("--change-value", default="C")
    d.add_argument("--delete-value", default="D")
    d.add_argument("--nochange-value", default="N")
    d.add_argument("--change-column", default=None)
    d.add_argument("--mode", default="ColumnByColumn",
                   choices=[m.name for m in DiffMode])
    d.add_argument("--sparse", action="store_true")
    d.add_argument("--filter", action="append", default=[],
                   help="only write rows with these diff actions")
    d.add_argument("--statistics", action="store_true",
                   help="write diff action counts instead of rows")
    return parser


def _read(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: Optional[str],
    options: dict,
    hive: bool,
) -> DataFrame:
    # reader options and schema apply on BOTH routes, mirroring the
    # reference (App.scala:250-265 chains .options/.schema before
    # either .load or .table) — previously --hive silently ignored
    # --schema / --left-option / --right-option
    reader = spark.read.options(**options)
    if schema:
        reader = reader.schema(schema)
    if hive:
        return reader.table(path)
    return reader.format(fmt).load(path)


def run(spark: SparkSession, args: argparse.Namespace) -> None:
    options = DiffOptions(
        diff_column=args.diff_column,
        left_column_prefix=args.left_prefix,
        right_column_prefix=args.right_prefix,
        insert_diff_value=args.insert_value,
        change_diff_value=args.change_value,
        delete_diff_value=args.delete_value,
        nochange_diff_value=args.nochange_value,
        change_column=args.change_column,
        diff_mode=DiffMode[args.mode],
        sparse_mode=args.sparse,
    )

    left = _read(spark, args.left_path, args.left_format or args.format,
                 args.left_schema or args.schema, _parse_options(args.left_option),
                 args.hive)
    right = _read(spark, args.right_path, args.right_format or args.format,
                  args.right_schema or args.schema, _parse_options(args.right_option),
                  args.hive)

    result = Differ(options).diff(left, right, args.id, ignore_columns=args.ignore)
    if args.filter:
        result = result.where(F.col(options.diff_column).isin(args.filter))
    if args.statistics:
        result = result.groupBy(options.diff_column).count().orderBy(options.diff_column)

    writer = (
        result.write.format(args.output_format or args.format)
        .options(**_parse_options(args.output_option))
        .mode(args.save_mode)
    )
    if args.hive:
        writer.saveAsTable(args.output_path)
    else:
        writer.save(args.output_path)


def main(argv: Optional[List[str]] = None) -> None:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("spark-extension-diff").getOrCreate()
    run(spark, args)


if __name__ == "__main__":
    main()
