"""Diff comparators: pluggable column-equivalence predicates for ``diff``.

Each comparator turns a pair of columns into a boolean ``Column`` that is
true when the two values should be considered *unchanged*.  Parity targets:
reference src/main/scala/uk/co/gresearch/spark/diff/comparator/*.scala
(SURVEY.md §2.5).  Unlike the reference's Python bindings — where the
duration and map comparators silently fall back to null-safe equality
(reference python/gresearch/spark/diff/comparator/__init__.py:133-148) —
every comparator here implements the full Scala semantics with pure column
expressions; only :class:`EquivDiffComparator` (arbitrary user lambda)
needs a Python UDF.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
]


class DiffComparator:
    """Base: ``equiv(left, right)`` -> boolean Column (true = unchanged)."""

    def equiv(self, left: Column, right: Column) -> Column:
        raise NotImplementedError


def _both_null_or(left: Column, right: Column, when_both_set: Column) -> Column:
    """Standard null guard: equal when both null; when both set, defer to
    ``when_both_set``; otherwise (one-sided null) not equal."""
    return (left.isNull() & right.isNull()) | (
        left.isNotNull() & right.isNotNull() & when_both_set
    )


class NullSafeEqualDiffComparator(DiffComparator):
    def equiv(self, left: Column, right: Column) -> Column:
        return left.eqNullSafe(right)


class DefaultDiffComparator(NullSafeEqualDiffComparator):
    pass


class StringDiffComparator(DiffComparator):
    """Plain string equality (typed marker for StringType registration)."""

    def equiv(self, left: Column, right: Column) -> Column:
        return left.eqNullSafe(right)


class WhitespaceDiffComparator(DiffComparator):
    """Strings equal up to leading/trailing whitespace and runs of
    whitespace collapsed to a single space — a pure-column rewrite of the
    reference's JVM UTF8String comparison
    (WhitespaceDiffComparator.scala:21-29)."""

    @staticmethod
    def _norm(col: Column) -> Column:
        return F.regexp_replace(F.trim(col), r"\s+", " ")

    def equiv(self, left: Column, right: Column) -> Column:
        return self._norm(left).eqNullSafe(self._norm(right))


@dataclass(frozen=True)
class EpsilonDiffComparator(DiffComparator):
    """Numeric values equal within ``epsilon`` — relative to
    ``max(abs(l), abs(r))`` by default, absolute via :meth:`as_absolute`;
    threshold inclusive by default (EpsilonDiffComparator.scala:22-46)."""

    epsilon: float
    relative: bool = True
    inclusive: bool = True

    def as_relative(self) -> "EpsilonDiffComparator":
        return EpsilonDiffComparator(self.epsilon, relative=True, inclusive=self.inclusive)

    def as_absolute(self) -> "EpsilonDiffComparator":
        return EpsilonDiffComparator(self.epsilon, relative=False, inclusive=self.inclusive)

    def as_inclusive(self) -> "EpsilonDiffComparator":
        return EpsilonDiffComparator(self.epsilon, relative=self.relative, inclusive=True)

    def as_exclusive(self) -> "EpsilonDiffComparator":
        return EpsilonDiffComparator(self.epsilon, relative=self.relative, inclusive=False)

    def equiv(self, left: Column, right: Column) -> Column:
        threshold = (
            F.greatest(F.abs(left), F.abs(right)) * self.epsilon
            if self.relative
            else F.lit(self.epsilon)
        )
        gap = F.abs(left - right)
        in_eps = gap <= threshold if self.inclusive else gap < threshold
        return _both_null_or(left, right, in_eps)


@dataclass(frozen=True)
class DurationDiffComparator(DiffComparator):
    """Date/timestamp values equal within a ``datetime.timedelta``
    (DurationDiffComparator.scala:36-56).  Implemented as microsecond
    arithmetic so it works for any Spark ≥ 3.5 without interval literals."""

    duration: _dt.timedelta
    inclusive: bool = True

    def as_inclusive(self) -> "DurationDiffComparator":
        return DurationDiffComparator(self.duration, inclusive=True)

    def as_exclusive(self) -> "DurationDiffComparator":
        return DurationDiffComparator(self.duration, inclusive=False)

    def equiv(self, left: Column, right: Column) -> Column:
        micros = int(self.duration.total_seconds() * 1_000_000)
        l_us = F.unix_micros(left.cast(T.TimestampType()))
        r_us = F.unix_micros(right.cast(T.TimestampType()))
        gap = F.abs(l_us - r_us)
        in_window = gap <= F.lit(micros) if self.inclusive else gap < F.lit(micros)
        return _both_null_or(left, right, in_window)


@dataclass(frozen=True)
class MapDiffComparator(DiffComparator):
    """Map equality: same size, same keys, equal values per key
    (MapDiffComparator.scala:26-90).  Pure-column rewrite: compare
    ``map_entries`` — sorted by key when key order is irrelevant."""

    key_order_sensitive: bool = False

    def equiv(self, left: Column, right: Column) -> Column:
        if self.key_order_sensitive:
            l_entries, r_entries = F.map_entries(left), F.map_entries(right)
        else:
            l_entries = F.sort_array(F.map_entries(left))
            r_entries = F.sort_array(F.map_entries(right))
        return _both_null_or(left, right, l_entries == r_entries)


class EquivDiffComparator(DiffComparator):
    """Arbitrary user equivalence lifted into the plan via a Python UDF —
    the documented slow path (EquivDiffComparator.scala:28-115 implements
    this with JVM codegen; in PySpark a UDF is the equivalent extension
    point).  ``input_type`` optionally pins the operand type."""

    def __init__(self, equiv: Callable, input_type: Optional[T.DataType] = None) -> None:
        self._equiv = equiv
        self.input_type = input_type
        fn = equiv
        # None-guard INSIDE the UDF: Catalyst extracts Python UDFs into
        # BatchEvalPython, which evaluates them for every row BEFORE the
        # surrounding isNotNull conjuncts — without the guard, a
        # one-sided NULL reaches the user lambda and typically raises
        # TypeError in the worker.  False is inert: _both_null_or's
        # null logic decides those rows.
        self._udf = F.udf(
            lambda a, b: False if a is None or b is None else bool(fn(a, b)),
            T.BooleanType(),
        )

    def equiv(self, left: Column, right: Column) -> Column:
        if self.input_type is not None:
            left = left.cast(self.input_type)
            right = right.cast(self.input_type)
        return _both_null_or(left, right, self._udf(left, right))


class DiffComparators:
    """Factory mirroring the reference's ``DiffComparators`` entry point."""

    @staticmethod
    def default() -> DefaultDiffComparator:
        return DefaultDiffComparator()

    @staticmethod
    def null_safe_equal() -> NullSafeEqualDiffComparator:
        return NullSafeEqualDiffComparator()

    @staticmethod
    def epsilon(epsilon: float) -> EpsilonDiffComparator:
        return EpsilonDiffComparator(epsilon)

    @staticmethod
    def string(whitespace_agnostic: bool = True) -> DiffComparator:
        return WhitespaceDiffComparator() if whitespace_agnostic else StringDiffComparator()

    @staticmethod
    def duration(duration: _dt.timedelta) -> DurationDiffComparator:
        return DurationDiffComparator(duration)

    @staticmethod
    def map(key_order_sensitive: bool = False) -> MapDiffComparator:
        return MapDiffComparator(key_order_sensitive)

    @staticmethod
    def equiv(fn: Callable, input_type: Optional[T.DataType] = None) -> EquivDiffComparator:
        return EquivDiffComparator(fn, input_type)
