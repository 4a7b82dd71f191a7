"""Semi-structured (JSON) column handling: typed field extraction at
scan speed.

Event/crawl tables routinely carry a free-form JSON properties column;
the scalable pattern is to extract the fields a query needs as *typed
columns in the scan projection* — whole-stage codegen, zero shuffles,
no Python — rather than parsing downstream or materializing a parsed
copy of the corpus.

``from_json`` with an explicit schema (not ``schema_of_json``
inference, which costs an extra pass and can drift between data
slices) parses each document once per row and all requested fields
project out of the single parsed struct.  Malformed documents yield
NULL fields (Spark's PERMISSIVE mode), so bad records degrade visibly
instead of failing the job.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_json_fields"]


def extract_json_fields(
    df: DataFrame,
    json_col: str,
    fields: Dict[str, str],
    prefix: str = "",
) -> DataFrame:
    """Add one typed column per requested JSON field.

    ``fields`` maps field name → Spark SQL type string (``"int"``,
    ``"string"``, ``"double"``, ``"array<string>"``, …).  Output
    columns are named ``{prefix}{field}``.

    One ``from_json`` per row (all fields share the parse), evaluated
    in the scan projection — a single codegen stage, no exchange; at
    100 TB this runs at scan speed and column pruning still applies to
    every other column.
    """
    schema = ", ".join(f"`{name}` {dtype}" for name, dtype in fields.items())
    parsed = F.from_json(F.col(json_col), schema)
    out = df
    for name in fields:
        out = out.withColumn(f"{prefix}{name}", parsed[name])
    return out
