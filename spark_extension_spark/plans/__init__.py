"""Plan inspection utilities: programmatic access to the physical-plan
properties that matter at scale — scan pruning, filter pushdown, join
strategies, exchange (shuffle) counts.

Used by the plan-audit tests (tests/test_plans.py) to pin the *shape*
of each operator's plan, not just its results: a correctness-preserving
regression that turns a broadcast join into a cross join or widens a
pruned scan to SELECT * should fail CI, because at 100 TB it is an
outage, not a slowdown.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field
from typing import List

from pyspark.sql import DataFrame

__all__ = ["PlanSummary", "summarize_plan", "explain_text"]


@dataclass
class PlanSummary:
    joins: List[str] = field(default_factory=list)
    exchanges: int = 0
    pushed_filters: List[str] = field(default_factory=list)
    read_schemas: List[str] = field(default_factory=list)
    scans: int = 0
    has_cartesian: bool = False

    def read_columns(self) -> List[List[str]]:
        out = []
        for schema in self.read_schemas:
            out.append(re.findall(r"(\w+):", schema))
        return out


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """The ``df.explain(mode)`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


_JOIN_KINDS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def summarize_plan(df: DataFrame) -> PlanSummary:
    """Parse ``explain`` output into a :class:`PlanSummary` (joins,
    exchange count, pushed filters, read schemas, cartesian flag)."""
    text = explain_text(df)
    summary = PlanSummary()
    for line in text.splitlines():
        stripped = line.strip()
        for kind in _JOIN_KINDS:
            # count the tree form only ("+- SortMergeJoin FullOuter (7)"),
            # not the "(7) SortMergeJoin" detail header formatted explain
            # prints for the same node — otherwise every join counts
            # twice.  Anchor on the trailing node id so AQE annotations
            # that themselves contain parentheses (e.g.
            # "SortMergeJoin(skew=true) Inner (8)") still count.
            if re.search(rf"\b{kind}\b.*\(\d+\)$", stripped):
                summary.joins.append(kind)
        # formatted explain prints each node twice: a tree line
        # "+- Exchange (5)" and a detail header "(5) Exchange" — count
        # only the tree form
        if re.search(r"\bExchange(\b[^(]*)?\(\d+\)", stripped) and "Reused" not in stripped:
            summary.exchanges += 1
        if "PushedFilters:" in stripped:
            summary.pushed_filters.append(stripped.split("PushedFilters:", 1)[1].strip())
        if "ReadSchema:" in stripped:
            summary.read_schemas.append(stripped.split("ReadSchema:", 1)[1].strip())
        if stripped.startswith("(") and "Scan parquet" in stripped:
            summary.scans += 1
    summary.has_cartesian = "CartesianProduct" in summary.joins
    return summary
