"""Oracle portability audit: the physical DuckDB result type of every
oracle_sql() column, flagged where the type itself is a portability
hazard across DuckDB builds / fetch paths.

Why this exists (round 8): both driver-red hash mismatches
(`char_entropy_documents`, `dup_ngram_fraction_documents`) turned out
to emit columns whose DuckDB type is HUGEINT (int128) — DuckDB widens
``SUM`` over integers to HUGEINT, and ``COALESCE(HUGEINT, BIGINT)``
stays HUGEINT.  The local gate mirror (`check_oracle.py`) fetches via
the native Python API, where HUGEINT arrives as a plain ``int`` and is
indistinguishable from BIGINT; a harness that fetches via
pandas/arrow instead can materialize HUGEINT as float64 (``15.0`` vs
``15``) and hash-diverge on numerically identical values.  The
discipline is therefore: **no oracle output column may be HUGEINT,
UHUGEINT, or DECIMAL** — cast to BIGINT/DOUBLE at the outermost
SELECT.  This script enforces it.

Usage: python scripts/audit_oracle_types.py [--sf DIR] [--deep]
Exit 1 if any oracle emits a flagged type.

``--deep`` additionally executes every oracle twice — once through the
native ``fetchall()`` path and once through the pandas ``.df()`` path —
and compares the stringified cell values (floats by ``repr``, NULL/NaN
treated as equivalent since every fetch path has *some* null spelling).
The type scan catches the hazard classes we know about (HUGEINT,
DECIMAL); the deep scan catches any future type whose pandas
materialization stringifies differently from its native one, which is
the exact failure mode the type rule was distilled from.

One widening is deliberately NOT flagged: an integer column that
contains NULLs materializes as float64 through *any* pandas path —
DuckDB ``.df()`` and Spark ``toPandas()`` alike — because pandas has
no NULL-able int64.  That widening is **symmetric** (both sides of the
driver's compare see ``147.0``), which is why the nullable columns of
``diff`` / ``asof_join`` / ``scd2_merge`` have always been
driver-hash-green.  The HUGEINT hazard was the *asymmetric* case: the
column widened to float64 with **no** NULLs in it, purely because of
its 128-bit type, while Spark's BIGINT stayed int64.  So the deep scan
permits ``147.0 == 147`` only for columns whose native fetch contains
at least one NULL, and is strict otherwise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Types that are safe to ship across any DuckDB fetch path: they map
# 1:1 onto Arrow/pandas/native-Python representations that agree with
# Spark's (long, double, string, bool, date/timestamp, and lists/
# structs thereof).
_FLAGGED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def flagged_columns(columns, types):
    """(column, type) pairs whose type contains a non-portable DuckDB
    type — substring match, so a HUGEINT/DECIMAL nested inside a
    LIST/STRUCT/MAP type string is flagged too (a nested value
    materializes just as fetch-path-dependently as a top-level one)."""
    return [
        (c, t)
        for c, t in zip(columns, (str(t) for t in types))
        if any(f in t.upper() for f in _FLAGGED)
    ]


def _cell(v, squash_integral_floats=False):
    """Canonical string for one fetched cell; floats by repr, any null
    spelling (None / NaN / NaT) collapses to one token.

    ``squash_integral_floats`` maps ``147.0`` to ``147`` — used only
    for columns where the native fetch proves NULLs are present, i.e.
    where the int→float widening is pandas' symmetric NULL handling
    rather than an asymmetric type hazard (see module docstring)."""
    import math

    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if squash_integral_floats and v.is_integer() and abs(v) < 2**53:
            return str(int(v))
        # coerce numpy.float64 (a float subclass) to plain float before
        # repr: numpy>=2.0 reprs scalars as 'np.float64(1.5)', which
        # would false-flag every DOUBLE column against the native
        # fetch's '1.5' even though the values are bit-identical
        return repr(float(v))
    # numpy scalars stringify like their Python values; pandas NaT has
    # no common base class, so catch it via its own NaN-ness
    s = str(v)
    return "<null>" if s in ("NaT", "nan", "<NA>") else s


def _fetch_mismatch(con, sql):
    """Columns whose stringified values differ between the native and
    pandas fetch paths (order-insensitive multiset compare per column)."""
    from collections import Counter

    native = con.execute(sql)
    cols = [d[0] for d in native.description]
    native_rows = native.fetchall()
    pdf = con.execute(sql).df()
    diffs = []
    for i, c in enumerate(cols):
        # A NULL-bearing column widens to float64 through every pandas
        # path (Spark's included) — symmetric, so integral floats
        # compare equal to their ints there.  A NULL-free column must
        # match strictly: widening without NULLs is the HUGEINT-class
        # asymmetry this scan exists to catch.
        squash = any(r[i] is None for r in native_rows)
        a = Counter(_cell(r[i], squash) for r in native_rows)
        # positional access: duplicated column labels collapse in a
        # name-indexed lookup
        b = Counter(_cell(v, squash) for v in pdf.iloc[:, i])
        if a != b:
            example = next(iter((a - b) or (b - a)))
            diffs.append((c, example))
    return diffs


def main() -> int:
    sf = "/root/testdata/sf0.001"
    argv = sys.argv[1:]
    deep = "--deep" in argv
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            print("usage: audit_oracle_types.py [--sf DIR] [--deep]")
            return 2
        sf = argv[i + 1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = 0
    for name, sql in entry.oracle_sql().items():
        try:
            rel = con.sql(sql)
            flagged = flagged_columns(rel.columns, rel.types)
            if deep:
                flagged += [
                    (c, f"fetch-path divergence, e.g. {ex}")
                    for c, ex in _fetch_mismatch(con, sql)
                ]
        except Exception as e:  # footer oracles read absolute paths; surface, don't die
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        if flagged:
            bad += 1
            print(f"{name}: FLAGGED {flagged}")
    mode = "deep-audited" if deep else "audited"
    print(f"{mode} {len(entry.oracle_sql())} oracles, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
