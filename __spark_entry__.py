"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship diff query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator with a
DuckDB oracle (see spark_extension_spark/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from spark_extension_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["diff_lineitem"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
