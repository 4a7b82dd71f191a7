"""spark_extension_spark — a PySpark-native engine with the query and
data-processing capabilities of G-Research/spark-extension, re-expressed
Spark-first (DataFrame/SQL/Catalyst), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Everything is a ``DataFrame -> DataFrame`` transformation built from
stock ``pyspark.sql`` primitives; no custom JVM code, no Py4J reach-ins.
"""

from .utils import (
    backticks,
    count_null,
    distinct_prefix_for,
    UnpersistHandle,
    SilentUnpersistHandle,
    NoopUnpersistHandle,
)
from .operators import (
    DiffComparator,
    DiffComparators,
    DiffMode,
    DiffOptions,
    Differ,
    diff,
    diff_with,
)

__version__ = "0.1.0"
