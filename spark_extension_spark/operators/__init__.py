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
]
