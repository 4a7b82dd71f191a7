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

Usage: python scripts/audit_oracle_types.py [--sf DIR]
Exit 1 if any oracle emits a flagged type.
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


def main() -> int:
    sf = "/root/testdata/sf0.001"
    argv = sys.argv[1:]
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            print("usage: audit_oracle_types.py [--sf DIR]")
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
        except Exception as e:  # footer oracles read absolute paths; surface, don't die
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        if flagged:
            bad += 1
            print(f"{name}: FLAGGED {flagged}")
    print(f"audited {len(entry.oracle_sql())} oracles, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
