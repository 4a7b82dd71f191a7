from .comparators import (
    DiffComparator,
    DiffComparators,
    DefaultDiffComparator,
    NullSafeEqualDiffComparator,
    EpsilonDiffComparator,
    StringDiffComparator,
    WhitespaceDiffComparator,
    DurationDiffComparator,
    MapDiffComparator,
    EquivDiffComparator,
)
from .diff import DiffMode, DiffOptions, Differ, diff, diff_with
from .histogram import histogram
from .row_numbers import with_row_numbers
from .sorted_groups import SortedGroupByDataFrame, group_by_sorted

__all__ = [
    "DiffComparator",
    "DiffComparators",
    "DefaultDiffComparator",
    "NullSafeEqualDiffComparator",
    "EpsilonDiffComparator",
    "StringDiffComparator",
    "WhitespaceDiffComparator",
    "DurationDiffComparator",
    "MapDiffComparator",
    "EquivDiffComparator",
    "DiffMode",
    "DiffOptions",
    "Differ",
    "diff",
    "diff_with",
    "histogram",
    "with_row_numbers",
    "SortedGroupByDataFrame",
    "group_by_sorted",
]
