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

__all__ = [
    "PlanSummary",
    "summarize_plan",
    "explain_text",
    "unpartitioned_windows",
]


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


def unpartitioned_windows(df: DataFrame) -> List[str]:
    """Window expressions in ``df``'s executed plan whose
    ``windowspecdefinition`` has an EMPTY partition clause — the
    global-top-k hazard class: such a window sorts its ENTIRE input in
    one partition, which at 10⁹ rows is a single-task sort (the
    heavy_keys / dsir_select / zipf_fit / weighted_sample findings,
    round 10).  Bounded-output global rankings must plan as
    ``TakeOrderedAndProject`` (``orderBy().limit(k)``) or the 5-step
    row-number algorithm instead.

    An unpartitioned window is LEGITIMATE only over an input bounded
    by construction (≤ k survivors after a limit, ≤ #partitions offset
    rows, a vocabulary-sized count frame) — the CI test keeps the
    explicit allowlist of those cases.

    Detection: inside ``windowspecdefinition(part..., order..., frame)``
    the partition expressions carry no sort direction, order
    expressions end in ``ASC/DESC NULLS ...`` — an empty partition
    clause means the FIRST argument is already a sort-order expression
    (or the frame itself, for the degenerate no-order spec).

    The plan string is rendered with ``spark.sql.debug.maxToStringFields``
    raised for the call: at its default (25) a wide plan elides
    expression lists as "... N more fields", which would silently drop
    a hazard window from the scan — a false negative in the CI gate."""
    conf = df.sparkSession.conf
    key = "spark.sql.debug.maxToStringFields"
    old = conf.get(key, None)
    conf.set(key, "1000000")
    try:
        text = df._jdf.queryExecution().executedPlan().toString()
    finally:
        if old is None:
            conf.unset(key)
        else:
            conf.set(key, old)
    out = []
    for m in re.finditer(r"windowspecdefinition\(", text):
        # capture the argument list up to the matching close paren
        depth, i = 1, m.end()
        while depth and i < len(text):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        args = text[m.end() : i - 1]
        # first top-level argument
        depth = 0
        first_end = len(args)
        for j, ch in enumerate(args):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                first_end = j
                break
        first = args[:first_end].strip()
        if first.startswith("specifiedwindowframe") or re.search(
            r"\b(ASC|DESC)\b", first
        ):
            out.append(args)
    return out


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
