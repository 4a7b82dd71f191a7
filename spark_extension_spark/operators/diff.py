"""Row-level dataset differencing (the flagship operator).

Semantics parity with the reference's ``Diff``
(src/main/scala/uk/co/gresearch/spark/diff/Diff.scala:277-320 and
python/gresearch/spark/diff/__init__.py:566-602):

For two DataFrames sharing a schema (up to ignored columns and
nullability), ``diff`` emits one row per id-key occurrence labelled

* ``I`` — row exists only in the right ("inserted"),
* ``D`` — row exists only in the left ("deleted"),
* ``C`` — row exists in both with at least one non-id column changed,
* ``N`` — row exists in both, unchanged.

The plan is a single null-safe equi full-outer join (Catalyst keeps it a
shuffle-able equi-join; sort-merge or broadcast under AQE) followed by a
projection — one shuffle per side, no UDFs unless a custom comparator
demands one.  That shape survives 100 TB: the join shuffles on the id
hash, partial evaluation of the change predicate is whole-stage codegen,
and no data is ever collected to the driver.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from enum import Enum
from functools import reduce
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..utils import (
    backticks,
    distinct_prefix_for,
    fold_name,
    is_case_sensitive,
    names_contain,
    names_diff,
    names_intersect,
)
from .comparators import DefaultDiffComparator, DiffComparator

__all__ = ["DiffMode", "DiffOptions", "Differ", "diff", "diff_with"]


class DiffMode(Enum):
    """Output layout of the diff result (DiffOptions.scala:36-72)."""

    ColumnByColumn = "ColumnByColumn"
    SideBySide = "SideBySide"
    LeftSide = "LeftSide"
    RightSide = "RightSide"


DiffMode.Default = DiffMode.ColumnByColumn


@dataclass(frozen=True)
class DiffOptions:
    """Immutable diff configuration with fluent ``with_*`` methods."""

    diff_column: str = "diff"
    left_column_prefix: str = "left"
    right_column_prefix: str = "right"
    insert_diff_value: str = "I"
    change_diff_value: str = "C"
    delete_diff_value: str = "D"
    nochange_diff_value: str = "N"
    change_column: Optional[str] = None
    diff_mode: DiffMode = DiffMode.ColumnByColumn
    sparse_mode: bool = False
    default_comparator: DiffComparator = dataclasses.field(default_factory=DefaultDiffComparator)
    data_type_comparators: Dict[T.DataType, DiffComparator] = dataclasses.field(default_factory=dict)
    column_name_comparators: Dict[str, DiffComparator] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        values = {
            "insert": self.insert_diff_value,
            "change": self.change_diff_value,
            "delete": self.delete_diff_value,
            "nochange": self.nochange_diff_value,
        }
        if len(set(values.values())) != len(values):
            raise ValueError(
                f"Diff values must be distinct: "
                f"insert={self.insert_diff_value}, change={self.change_diff_value}, "
                f"delete={self.delete_diff_value}, nochange={self.nochange_diff_value}"
            )
        if self.left_column_prefix == "" or self.right_column_prefix == "":
            raise ValueError("Column prefix must not be empty")
        if self.left_column_prefix == self.right_column_prefix:
            raise ValueError(
                f"Left and right column prefix must be distinct: {self.left_column_prefix}"
            )
        if self.diff_column == "":
            raise ValueError("Diff column name must not be empty")

    def _replace(self, **kwargs) -> "DiffOptions":
        return dataclasses.replace(self, **kwargs)

    def with_diff_column(self, name: str) -> "DiffOptions":
        return self._replace(diff_column=name)

    def with_left_column_prefix(self, prefix: str) -> "DiffOptions":
        return self._replace(left_column_prefix=prefix)

    def with_right_column_prefix(self, prefix: str) -> "DiffOptions":
        return self._replace(right_column_prefix=prefix)

    def with_insert_diff_value(self, value: str) -> "DiffOptions":
        return self._replace(insert_diff_value=value)

    def with_change_diff_value(self, value: str) -> "DiffOptions":
        return self._replace(change_diff_value=value)

    def with_delete_diff_value(self, value: str) -> "DiffOptions":
        return self._replace(delete_diff_value=value)

    def with_nochange_diff_value(self, value: str) -> "DiffOptions":
        return self._replace(nochange_diff_value=value)

    def with_change_column(self, name: str) -> "DiffOptions":
        return self._replace(change_column=name)

    def without_change_column(self) -> "DiffOptions":
        return self._replace(change_column=None)

    def with_diff_mode(self, mode: DiffMode) -> "DiffOptions":
        return self._replace(diff_mode=mode)

    def with_sparse_mode(self, sparse: bool = True) -> "DiffOptions":
        return self._replace(sparse_mode=sparse)

    def with_default_comparator(self, comparator: DiffComparator) -> "DiffOptions":
        return self._replace(default_comparator=comparator)

    def with_data_type_comparator(
        self, comparator: DiffComparator, *data_types: T.DataType
    ) -> "DiffOptions":
        clashes = sorted(dt.simpleString() for dt in data_types if dt in self.data_type_comparators)
        if clashes:
            plural = "s" if len(clashes) > 1 else ""
            raise ValueError(
                f"A comparator for data type{plural} {', '.join(clashes)} exists already."
            )
        merged = {**self.data_type_comparators, **{dt: comparator for dt in data_types}}
        return self._replace(data_type_comparators=merged)

    def with_column_name_comparator(
        self, comparator: DiffComparator, *column_names: str
    ) -> "DiffOptions":
        clashes = sorted(c for c in column_names if c in self.column_name_comparators)
        if clashes:
            plural = "s" if len(clashes) > 1 else ""
            raise ValueError(
                f"A comparator for column name{plural} {', '.join(clashes)} exists already."
            )
        merged = {**self.column_name_comparators, **{c: comparator for c in column_names}}
        return self._replace(column_name_comparators=merged)

    def comparator_for(self, field: T.StructField) -> DiffComparator:
        """Resolution order: column name -> data type -> default
        (DiffOptions.scala:473-477)."""
        by_name = self.column_name_comparators.get(field.name)
        if by_name is not None:
            return by_name
        by_type = self.data_type_comparators.get(field.dataType)
        if by_type is not None:
            return by_type
        return self.default_comparator


class _ResolvedDiff:
    """Column bookkeeping resolved once per diff call: id/value/ignored
    column partitions under the session's case-sensitivity rule."""

    def __init__(
        self,
        left: DataFrame,
        right: DataFrame,
        id_columns: Sequence[str],
        ignore_columns: Sequence[str],
        options: DiffOptions,
    ) -> None:
        self.left = left
        self.right = right
        self.options = options
        self.case_sensitive = is_case_sensitive(left.sparkSession)
        self.ignore_columns = list(ignore_columns)
        cs = self.case_sensitive

        self.comparable_columns = names_diff(left.columns, self.ignore_columns, cs)
        self.id_columns = list(id_columns) or list(self.comparable_columns)
        self.value_columns = names_diff(self.comparable_columns, self.id_columns, cs)
        self.left_ignored = names_intersect(left.columns, self.ignore_columns, cs)
        self.right_ignored = names_intersect(right.columns, self.ignore_columns, cs)

        fields = {fold_name(f.name, cs): f for f in left.schema.fields}
        self.value_comparators: List[Tuple[str, DiffComparator]] = [
            (c, options.comparator_for(fields[fold_name(c, cs)])) for c in self.value_columns
        ]

        # Collision-free internal prefixes. Renaming every column before the
        # join (instead of disambiguating via DataFrame column references)
        # makes diff robust against self-joins — diffing a frame against a
        # projection of itself is the most common use and trips Spark's
        # ambiguous-lineage detection otherwise.
        base = distinct_prefix_for(list(left.columns) + list(right.columns))
        self._lp, self._rp = base + "l_", base + "r_"
        self._lex, self._rex = base + "exl", base + "exr"

    # -- validation ---------------------------------------------------------

    def validate(self) -> None:
        left, right, opts, cs = self.left, self.right, self.options, self.case_sensitive

        def require(ok: bool, message: str) -> None:
            if not ok:
                raise ValueError(message)

        require(
            len(set(left.columns)) == len(left.columns)
            and len(set(right.columns)) == len(right.columns),
            "The datasets have duplicate columns.\n"
            f"Left column names: {', '.join(left.columns)}\n"
            f"Right column names: {', '.join(right.columns)}",
        )

        left_cols = names_diff(left.columns, self.ignore_columns, cs)
        right_cols = names_diff(right.columns, self.ignore_columns, cs)
        ignored_suffix = " except ignored columns" if self.ignore_columns else ""
        require(
            len(left_cols) == len(right_cols),
            "The number of columns doesn't match.\n"
            f"Left column names{ignored_suffix} ({len(left_cols)}): {', '.join(left_cols)}\n"
            f"Right column names{ignored_suffix} ({len(right_cols)}): {', '.join(right_cols)}",
        )
        require(len(left_cols) > 0, f"The schema{ignored_suffix} must not be empty")

        def typed(df: DataFrame) -> Dict[str, T.DataType]:
            return {
                fold_name(f.name, cs): f.dataType
                for f in df.schema.fields
                if not names_contain(self.ignore_columns, f.name, cs)
            }

        left_types, right_types = typed(left), typed(right)
        only_left = sorted(set(left_types.items()) - set(right_types.items()))
        only_right = sorted(set(right_types.items()) - set(left_types.items()))
        require(
            not only_left and not only_right,
            "The datasets do not have the same schema.\n"
            f"Left extra columns: {', '.join(f'{n} ({t.typeName()})' for n, t in only_left)}\n"
            f"Right extra columns: {', '.join(f'{n} ({t.typeName()})' for n, t in only_right)}",
        )

        missing_ids = names_diff(self.id_columns, left_cols, cs)
        require(
            not missing_ids,
            f"Some id columns do not exist: {', '.join(missing_ids)} "
            f"missing among {', '.join(left_cols)}",
        )
        missing_ignored = names_diff(self.ignore_columns, list(left.columns) + list(right.columns), cs)
        require(
            not missing_ignored,
            f"Some ignore columns do not exist: {', '.join(missing_ignored)} "
            f"missing among {', '.join(sorted(set(left_cols + right_cols)))}",
        )

        require(
            not names_contain(self.id_columns, opts.diff_column, cs),
            f"The id columns must not contain the diff column name "
            f"'{opts.diff_column}': {', '.join(self.id_columns)}",
        )
        require(
            opts.change_column is None
            or not names_contain(self.id_columns, opts.change_column, cs),
            f"The id columns must not contain the change column name "
            f"'{opts.change_column}': {', '.join(self.id_columns)}",
        )

        output_value_names = [name for name, _ in self._value_projection()]
        if opts.diff_mode in (DiffMode.LeftSide, DiffMode.RightSide):
            side = "left" if opts.diff_mode == DiffMode.LeftSide else "right"
            side_df = left if opts.diff_mode == DiffMode.LeftSide else right
            non_id = names_diff(side_df.columns, self.id_columns, cs)
            require(
                not names_contain(output_value_names, opts.diff_column, cs),
                f"The {side} non-id columns must not contain the diff column name "
                f"'{opts.diff_column}': {', '.join(non_id)}",
            )
            require(
                opts.change_column is None
                or not names_contain(output_value_names, opts.change_column, cs),
                f"The {side} non-id columns must not contain the change column name "
                f"'{opts.change_column}': {', '.join(non_id)}",
            )
        else:
            prefixes = (
                f"The column prefixes '{opts.left_column_prefix}' and "
                f"'{opts.right_column_prefix}', together with these non-id columns "
            )
            require(
                not names_contain(output_value_names, opts.diff_column, cs),
                prefixes
                + f"must not produce the diff column name '{opts.diff_column}': "
                + ", ".join(self.value_columns),
            )
            require(
                opts.change_column is None
                or not names_contain(output_value_names, opts.change_column, cs),
                prefixes
                + f"must not produce the change column name '{opts.change_column}': "
                + ", ".join(self.value_columns),
            )
            require(
                all(not names_contain(self.id_columns, n, cs) for n in output_value_names),
                prefixes
                + f"must not produce any id column name '{', '.join(self.id_columns)}': "
                + ", ".join(self.value_columns),
            )

    # -- projection ---------------------------------------------------------

    def _side(self, name: str, left_side: bool) -> Column:
        return F.col(backticks((self._lp if left_side else self._rp) + name))

    def _value_expr(self, name: str, left_side: bool) -> Column:
        value = self._side(name, left_side)
        if self.options.sparse_mode:
            cs = self.case_sensitive
            # sparse nulling needs BOTH sides to compare; a one-sided
            # ignore column has no counterpart, so it passes through
            # unchanged (the reference's sparse projection references
            # both sides unconditionally and would throw here —
            # Diff.scala:198-216 — an uncovered corner of its own test
            # matrix; graceful pass-through is the only sane semantics)
            one_sided = names_contain(
                self.left_ignored, name, cs
            ) != names_contain(self.right_ignored, name, cs)
            if one_sided:
                return value
            l, r = self._side(name, True), self._side(name, False)
            return F.when(~l.eqNullSafe(r), value)
        return value

    def _value_projection(self) -> List[Tuple[str, Column]]:
        """(output name, column) pairs for all non-id output columns, in
        the order dictated by the diff mode."""
        opts, cs = self.options, self.case_sensitive

        def left_col(name: str, prefixed: bool = True) -> Tuple[str, Column]:
            out = f"{opts.left_column_prefix}_{name}" if prefixed else name
            return out, self._value_expr(name, left_side=True).alias(out)

        def right_col(name: str, prefixed: bool = True) -> Tuple[str, Column]:
            out = f"{opts.right_column_prefix}_{name}" if prefixed else name
            return out, self._value_expr(name, left_side=False).alias(out)

        mode = opts.diff_mode
        if mode == DiffMode.ColumnByColumn:
            pairs = [col for name in self.value_columns for col in (left_col(name), right_col(name))]
            for name in self.ignore_columns:
                if names_contain(self.left_ignored, name, cs):
                    pairs.append(left_col(name))
                if names_contain(self.right_ignored, name, cs):
                    pairs.append(right_col(name))
            return pairs
        if mode == DiffMode.SideBySide:
            return (
                [left_col(n) for n in self.value_columns]
                + [left_col(n) for n in self.left_ignored]
                + [right_col(n) for n in self.value_columns]
                + [right_col(n) for n in self.right_ignored]
            )
        if mode == DiffMode.LeftSide:
            return [left_col(n, prefixed=False) for n in self.value_columns + self.left_ignored]
        if mode == DiffMode.RightSide:
            return [right_col(n, prefixed=False) for n in self.value_columns + self.right_ignored]
        raise ValueError(f"Unsupported diff mode: {mode}")

    # -- plan ---------------------------------------------------------------

    def _action_column(self) -> Column:
        opts = self.options
        changed = ~reduce(
            Column.__and__,
            [
                cmp.equiv(self._side(c, True), self._side(c, False))
                for c, cmp in self.value_comparators
            ],
            F.lit(True),
        )
        return (
            F.when(F.col(self._lex).isNull(), F.lit(opts.insert_diff_value))
            .when(F.col(self._rex).isNull(), F.lit(opts.delete_diff_value))
            .when(changed, F.lit(opts.change_diff_value))
            .otherwise(F.lit(opts.nochange_diff_value))
            .alias(opts.diff_column)
        )

    def _change_column(self) -> Optional[Column]:
        opts = self.options
        if opts.change_column is None:
            return None
        changed_names = F.concat(
            *[
                F.when(cmp.equiv(self._side(c, True), self._side(c, False)), F.array())
                .otherwise(F.array(F.lit(c)))
                for c, cmp in self.value_comparators
            ]
        ) if self.value_comparators else F.array().cast(T.ArrayType(T.StringType(), False))
        return (
            F.when(F.col(self._lex).isNull() | F.col(self._rex).isNull(), F.lit(None))
            .otherwise(changed_names)
            .alias(opts.change_column)
        )

    def plan(self) -> DataFrame:
        left = self.left.select(
            *[F.col(backticks(c)).alias(self._lp + c) for c in self.left.columns],
            F.lit(1).alias(self._lex),
        )
        right = self.right.select(
            *[F.col(backticks(c)).alias(self._rp + c) for c in self.right.columns],
            F.lit(1).alias(self._rex),
        )

        join_on = reduce(
            Column.__and__,
            [self._side(c, True).eqNullSafe(self._side(c, False)) for c in self.id_columns],
        )
        ids = [
            F.coalesce(self._side(c, True), self._side(c, False)).alias(c)
            for c in self.id_columns
        ]
        action = self._action_column()
        change = self._change_column()
        values = [col for _, col in self._value_projection()]

        projection = [action] + ([change] if change is not None else []) + ids + values
        return left.join(right, join_on, "fullouter").select(*projection)


class Differ:
    """Differ bound to a :class:`DiffOptions` (reference ``Differ``)."""

    def __init__(self, options: Optional[DiffOptions] = None) -> None:
        self.options = options or DiffOptions()

    def _resolve(
        self,
        left: DataFrame,
        right: DataFrame,
        id_columns: Sequence[str],
        ignore_columns: Sequence[str],
    ) -> _ResolvedDiff:
        resolved = _ResolvedDiff(left, right, id_columns, ignore_columns, self.options)
        resolved.validate()
        return resolved

    def diff(
        self,
        left: DataFrame,
        right: DataFrame,
        *id_columns: Union[str, Iterable[str]],
        ignore_columns: Optional[Iterable[str]] = None,
    ) -> DataFrame:
        ids, ignores = _normalize_columns(id_columns, ignore_columns)
        return self._resolve(left, right, ids, ignores).plan()

    def diff_with(
        self,
        left: DataFrame,
        right: DataFrame,
        *id_columns: Union[str, Iterable[str]],
        ignore_columns: Optional[Iterable[str]] = None,
    ) -> DataFrame:
        """Diff as ``(diff, left struct, right struct)`` — struct is null
        for the missing side (Diff.scala:599-667)."""
        ids, ignores = _normalize_columns(id_columns, ignore_columns)
        resolved = self._resolve(left, right, ids, ignores)
        opts = self.options
        plain = Differ(
            DiffOptions(
                diff_column=opts.diff_column,
                insert_diff_value=opts.insert_diff_value,
                change_diff_value=opts.change_diff_value,
                delete_diff_value=opts.delete_diff_value,
                nochange_diff_value=opts.nochange_diff_value,
                diff_mode=DiffMode.SideBySide,
                left_column_prefix=opts.left_column_prefix,
                right_column_prefix=opts.right_column_prefix,
                default_comparator=opts.default_comparator,
                data_type_comparators=opts.data_type_comparators,
                column_name_comparators=opts.column_name_comparators,
            )
        )
        wide = plain.diff(left, right, ids, ignore_columns=ignores)
        diff_col = F.col(backticks(opts.diff_column))
        left_fields = [
            F.col(backticks(f"{opts.left_column_prefix}_{c}")).alias(c)
            for c in resolved.value_columns + resolved.left_ignored
        ]
        right_fields = [
            F.col(backticks(f"{opts.right_column_prefix}_{c}")).alias(c)
            for c in resolved.value_columns + resolved.right_ignored
        ]
        id_cols = [F.col(backticks(c)) for c in resolved.id_columns]
        left_struct = (
            F.when(diff_col == opts.insert_diff_value, F.lit(None))
            .otherwise(F.struct(*(id_cols + left_fields)))
            .alias(opts.left_column_prefix)
        )
        right_struct = (
            F.when(diff_col == opts.delete_diff_value, F.lit(None))
            .otherwise(F.struct(*(id_cols + right_fields)))
            .alias(opts.right_column_prefix)
        )
        return wide.select(diff_col, left_struct, right_struct)


def _normalize_columns(
    id_columns: Tuple[Union[str, Iterable[str]], ...],
    ignore_columns: Optional[Iterable[str]],
) -> Tuple[List[str], List[str]]:
    """Accept ``diff(l, r, "a", "b")`` or ``diff(l, r, ["a"], ["x"])``."""
    ids: List[str] = []
    ignores: List[str] = list(ignore_columns) if ignore_columns is not None else []
    seq_args = [a for a in id_columns if not isinstance(a, str)]
    str_args = [a for a in id_columns if isinstance(a, str)]
    if seq_args and str_args:
        raise ValueError("Mixing str and iterable id column arguments is not supported")
    if seq_args:
        if len(seq_args) > 2 or (len(seq_args) == 2 and ignore_columns is not None):
            raise ValueError("Expected at most (id_columns, ignore_columns) iterables")
        ids = list(seq_args[0])
        if len(seq_args) == 2:
            ignores = list(seq_args[1])
    else:
        ids = str_args
    return ids, ignores


def diff(
    left: DataFrame,
    right: DataFrame,
    *id_columns: Union[str, Iterable[str]],
    options: Optional[DiffOptions] = None,
    ignore_columns: Optional[Iterable[str]] = None,
) -> DataFrame:
    """Diff ``left`` against ``right`` on ``id_columns``.

    With no id columns, all non-ignored columns form the key (set-diff
    semantics: only I/D/N actions are possible).
    """
    return Differ(options).diff(left, right, *id_columns, ignore_columns=ignore_columns)


def diff_with(
    left: DataFrame,
    right: DataFrame,
    *id_columns: Union[str, Iterable[str]],
    options: Optional[DiffOptions] = None,
    ignore_columns: Optional[Iterable[str]] = None,
) -> DataFrame:
    """Like :func:`diff`, but packs each side into a struct column:
    the result is ``(diff, left struct, right struct)`` — the Python
    shape of the reference's ``diffWith`` (diff/__init__.py:403-446)."""
    return Differ(options).diff_with(left, right, *id_columns, ignore_columns=ignore_columns)
