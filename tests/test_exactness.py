"""Regression pins for the cross-engine float-exactness discipline
(EXACTNESS.md).  These encode the round-5 empirical findings about
Spark ↔ DuckDB primitive asymmetries as tests, so an engine upgrade
that shifts a rounding mode or cast path fails loudly here instead of
surfacing as an unexplained oracle-gate hash mismatch.
"""

from __future__ import annotations

import decimal
import random

import duckdb
import pytest
from pyspark.sql import functions as F

# float32-exact dyadic values that are exact scale-12 decimal ties
# (x = odd/2^13): the case where the engines' double->decimal cast
# rounding modes differ (Spark HALF_UP vs DuckDB CAST half-even)
TIES_13 = [1625 / 2**13, 3 / 2**13, -1625 / 2**13, 8191 / 2**13]
# odd/2^16 values: exact scale-15 ties (and squares of odd/2^8)
TIES_16 = [5 / 2**16, 65535 / 2**16, -32769 / 2**16]


def half_up(x: float, scale: int) -> decimal.Decimal:
    """Reference: Spark's double->decimal cast semantics (BigDecimal
    HALF_UP on the exact binary expansion of the double)."""
    return decimal.Decimal(x).quantize(
        decimal.Decimal(1).scaleb(-scale), rounding=decimal.ROUND_HALF_UP
    )


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


class TestDoubleToDecimalCast:
    def test_spark_cast_is_half_up(self, spark):
        """Spark CAST(double AS decimal) == BigDecimal HALF_UP — the
        reference semantics every oracle must reproduce."""
        vals = TIES_13 + [random.Random(3).uniform(-1, 1) for _ in range(200)]
        rows = (
            spark.createDataFrame([(v,) for v in vals], "x double")
            .select(F.col("x").cast("decimal(38,12)").cast("string"))
            .collect()
        )
        for v, (got,) in zip(vals, rows):
            assert decimal.Decimal(got) == half_up(v, 12), v

    def test_duckdb_direct_cast_breaks_on_ties(self, duck):
        """DuckDB CAST is half-to-even: on exact dyadic ties it differs
        from Spark.  Documents WHY oracles must not use the direct cast
        on float32-origin columns; if an upgrade makes this pass, the
        round() workaround can be retired."""
        diffs = 0
        for v in TIES_13:
            (got,) = duck.execute(
                "SELECT CAST(CAST(? AS DOUBLE) AS DECIMAL(38,12))", [v]
            ).fetchone()
            diffs += got != half_up(v, 12)
        assert diffs > 0

    def test_duckdb_round_then_cast_matches_spark(self, duck):
        """The oracle idiom CAST(round(x, s) AS DECIMAL(38,s)):
        DuckDB round() is half-away-from-zero, which agrees with
        HALF_UP on every tie and on random values."""
        rnd = random.Random(7)
        vals = TIES_13 + [rnd.uniform(-1, 1) for _ in range(2000)]
        for v in vals:
            (got,) = duck.execute(
                "SELECT CAST(round(CAST(? AS DOUBLE), 12) AS DECIMAL(38,12))",
                [v],
            ).fetchone()
            assert got == half_up(v, 12), v
        for v in TIES_16:
            (got,) = duck.execute(
                "SELECT CAST(round(CAST(? AS DOUBLE), 15) AS DECIMAL(38,15))",
                [v],
            ).fetchone()
            assert got == half_up(v, 15), v

    def test_square_of_float32_ties_at_scale_15(self):
        """x = odd/2^8 (reachable in float32) ⇒ x² = odd/2^16, an exact
        scale-15 tie — the embedding_stats case.  Pure math pin."""
        x = 51 / 2**8
        assert x * x == 2601 / 2**16
        d = decimal.Decimal(x * x)
        tail = d - d.quantize(
            decimal.Decimal(1).scaleb(-15), rounding=decimal.ROUND_DOWN
        )
        assert tail == decimal.Decimal(1).scaleb(-16) * 5


class TestDecimalToDoubleCast:
    def test_duckdb_varchar_route_is_correctly_rounded(self, duck):
        """CAST(CAST(dec AS VARCHAR) AS DOUBLE) == Python float(str)
        (correctly rounded) — the oracle idiom; the direct cast is
        last-ulp off on some mantissas (probed below, documented in
        EXACTNESS.md)."""
        cases = [
            "98765.432109876543210987",
            "123456789012345.678901234567",
            "0.000000000001",
            "314159265358979.323846264338",
        ]
        direct_diffs = 0
        for s in cases:
            via, direct = duck.execute(
                "SELECT CAST(CAST(CAST(? AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE),"
                "       CAST(CAST(? AS DECIMAL(38,12)) AS DOUBLE)",
                [s, s],
            ).fetchone()
            want = float(
                str(
                    decimal.Decimal(s).quantize(
                        decimal.Decimal(1).scaleb(-12),
                        rounding=decimal.ROUND_HALF_UP,
                    )
                )
            )
            assert via == want, s
            direct_diffs += direct != want
        assert direct_diffs > 0  # the direct cast really is lossy

    def test_spark_cast_is_correctly_rounded(self, spark):
        s = "98765.432109876543210987"
        (got,) = (
            spark.createDataFrame([(s,)], "s string")
            .select(F.col("s").cast("decimal(38,12)").cast("double"))
            .collect()[0]
        )
        want = float(
            str(
                decimal.Decimal(s).quantize(
                    decimal.Decimal(1).scaleb(-12),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )
        )
        assert got == want


class TestDecimalFoldPrecision:
    def test_38_12_fold_loses_a_scale_digit(self, spark):
        """decimal(38,12) + decimal(38,12) widens past the precision
        cap and Spark drops to scale 11 — the group_centroids bug.
        Pins the Spark behavior the decimal(36,12)+decimal(30,12)
        accumulator works around."""
        out = spark.range(1).select(
            (
                F.lit("0.000000000001").cast("decimal(38,12)")
                + F.lit("0.000000000001").cast("decimal(38,12)")
            ).alias("x")
        )
        assert out.schema["x"].dataType.simpleString() == "decimal(38,11)"
        assert out.collect()[0]["x"] == decimal.Decimal("0")  # rounded away

    def test_36_12_fold_is_exact(self, spark):
        out = spark.range(1).select(
            (
                F.lit("0.000000000001").cast("decimal(36,12)")
                + F.lit("0.000000000001").cast("decimal(30,12)")
            ).alias("x")
        )
        assert out.schema["x"].dataType.simpleString() == "decimal(37,12)"
        assert out.collect()[0]["x"] == decimal.Decimal("2E-12")

    def test_group_centroids_cosine_matches_plain_decimal_sum(self, spark):
        """End-to-end: the fold-based dot product equals an explode +
        decimal groupBy sum of the same products (the scale-exact
        formulation), not a scale-11 approximation."""
        from spark_extension_spark.operators.similarity import group_centroids

        rng = random.Random(5)
        rows = [
            (g, [rng.uniform(-0.05, 0.05) for _ in range(16)])
            for g in (0, 1)
            for _ in range(20)
        ]
        df = spark.createDataFrame(rows, "label int, embedding array<double>")
        got = {
            r["label"]: r["avg_cosine"]
            for r in group_centroids(df, "embedding", by=["label"]).collect()
        }
        # reference: python Decimal replication of the documented algebra
        import collections

        by_label = collections.defaultdict(list)
        for g, v in rows:
            by_label[g].append(v)
        for g, vecs in by_label.items():
            dims = len(vecs[0])
            cent = []
            for d in range(dims):
                s = sum((half_up(v[d], 12) for v in vecs), decimal.Decimal(0))
                cent.append(float(s) / len(vecs))
            cnorm_sq = sum(
                (half_up(m * m, 12) for m in cent), decimal.Decimal(0)
            )
            cnorm = float(str(cnorm_sq)) ** 0.5
            coses = []
            for v in vecs:
                dot = float(
                    str(
                        sum(
                            (half_up(a * b, 12) for a, b in zip(v, cent)),
                            decimal.Decimal(0),
                        )
                    )
                )
                vv = float(
                    str(
                        sum((half_up(a * a, 12) for a in v), decimal.Decimal(0))
                    )
                )
                coses.append(dot / ((vv**0.5) * cnorm))
            avg = float(
                str(sum((half_up(c, 12) for c in coses), decimal.Decimal(0)))
            ) / len(coses)
            assert got[g] == pytest.approx(avg, abs=5e-13), g


class TestMadOracleNullParity:
    def test_mad_outliers_matches_oracle_on_null_bearing_data(
        self, spark, duck, tmp_path
    ):
        """The gate testdata has no NULL event values or keys, so the
        driver hash cannot exercise the NULL paths — pin operator/oracle
        parity on them directly (round-8 review finding: the oracle
        ranked NULL values into the quantile index while the operator's
        group_quantiles excludes them, a latent hash red the moment the
        testdata grows a NULL)."""
        import os

        from spark_extension_spark.operators.features import mad_outliers
        from spark_extension_spark.registry import ORACLES

        rows = [
            (1, "a", 1.0), (2, "a", 2.0), (3, "a", None),   # mixed NULL value
            (4, "b", None), (5, "b", None),                 # all-NULL group
            (6, None, 5.0), (7, None, 5.2), (8, None, 50.0),  # NULL group key
            (9, "c", 1.0), (10, "c", 1.1), (11, "c", 99.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        pq = os.path.join(str(tmp_path), "events.parquet")
        df.coalesce(1).write.parquet(pq)
        got = sorted(
            tuple(r)
            for r in mad_outliers(
                df, "value", by=["event_type"], k=3.0, tiebreak=["event_id"]
            )
            .select(
                "event_id", "event_type", "value",
                "group_median", "group_mad", "is_outlier",
            )
            .collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}/*.parquet')"
        )
        want = sorted(con.execute(ORACLES["mad_outliers_events"]).fetchall())
        assert got == want
