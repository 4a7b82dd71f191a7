"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle SQL string computing the same result with the same column
names.  This feeds ``__spark_entry__.py`` (driver correctness gate) and
``bench.py`` (throughput).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.diff import diff

Query = Callable[[SparkSession, str], DataFrame]

QUERIES: Dict[str, Query] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: str = None):
    def wrap(fn: Query) -> Query:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# diff — flagship.  Left/right are deterministic splits+mutations of
# lineitem so every action I/C/D/N occurs; ids (l_orderkey, l_linenumber).
# ---------------------------------------------------------------------------

_LINEITEM_VALUE_COLUMNS = [
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def _diff_inputs(spark: SparkSession, sf_dir: str):
    li = load(spark, sf_dir, "lineitem")
    left = li.where(F.col("l_orderkey") % 10 != 7)
    right = li.where(F.col("l_orderkey") % 10 != 3).withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 7 == 0, F.col("l_quantity") + 1).otherwise(
            F.col("l_quantity")
        ),
    )
    return left, right


_DIFF_ORACLE = """
WITH lft AS (
  SELECT *, 1 AS ex FROM lineitem WHERE l_orderkey % 10 <> 7
), rgt AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
         CASE WHEN l_orderkey % 7 = 0 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate,
         1 AS ex
  FROM lineitem WHERE l_orderkey % 10 <> 3
)
SELECT
  CASE
    WHEN l.ex IS NULL THEN 'I'
    WHEN r.ex IS NULL THEN 'D'
    WHEN NOT ({unchanged}) THEN 'C'
    ELSE 'N'
  END AS diff,
  COALESCE(l.l_orderkey, r.l_orderkey) AS l_orderkey,
  COALESCE(l.l_linenumber, r.l_linenumber) AS l_linenumber,
  {values}
FROM lft l
FULL OUTER JOIN rgt r
  ON l.l_orderkey IS NOT DISTINCT FROM r.l_orderkey
 AND l.l_linenumber IS NOT DISTINCT FROM r.l_linenumber
""".format(
    unchanged=" AND ".join(
        f"l.{c} IS NOT DISTINCT FROM r.{c}" for c in _LINEITEM_VALUE_COLUMNS
    ),
    values=",\n  ".join(
        f"l.{c} AS left_{c}, r.{c} AS right_{c}" for c in _LINEITEM_VALUE_COLUMNS
    ),
)


@register("diff_lineitem", _DIFF_ORACLE)
def q_diff_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _diff_inputs(spark, sf_dir)
    return diff(left, right, "l_orderkey", "l_linenumber")


_DIFF_STATS_ORACLE = """
WITH lft AS (
  SELECT *, 1 AS ex FROM lineitem WHERE l_orderkey % 10 <> 7
), rgt AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey % 7 = 0 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
         l_partkey, l_suppkey, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate, 1 AS ex
  FROM lineitem WHERE l_orderkey % 10 <> 3
), d AS (
  SELECT CASE
    WHEN l.ex IS NULL THEN 'I'
    WHEN r.ex IS NULL THEN 'D'
    WHEN NOT ({unchanged}) THEN 'C'
    ELSE 'N' END AS diff
  FROM lft l
  FULL OUTER JOIN rgt r
    ON l.l_orderkey IS NOT DISTINCT FROM r.l_orderkey
   AND l.l_linenumber IS NOT DISTINCT FROM r.l_linenumber
)
SELECT diff, count(*) AS cnt FROM d GROUP BY diff ORDER BY diff
""".format(
    unchanged=" AND ".join(
        f"l.{c} IS NOT DISTINCT FROM r.{c}" for c in _LINEITEM_VALUE_COLUMNS
    )
)


@register("diff_lineitem_stats", _DIFF_STATS_ORACLE)
def q_diff_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff-App ``--statistics`` shape: action counts (App.scala:280-281)."""
    left, right = _diff_inputs(spark, sf_dir)
    return (
        diff(left, right, "l_orderkey", "l_linenumber")
        .groupBy("diff")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("diff")
    )
