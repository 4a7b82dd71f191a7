"""Ticks conversions and scalar helpers (reference SparkSuite:548-760)."""

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from spark_extension_spark import (
    backticks,
    count_null,
    distinct_prefix_for,
    dotnet_ticks_to_timestamp,
    dotnet_ticks_to_unix_epoch,
    dotnet_ticks_to_unix_epoch_nanos,
    timestamp_to_dotnet_ticks,
    unix_epoch_to_dotnet_ticks,
    unix_epoch_nanos_to_dotnet_ticks,
)

# 2023-03-29 09:56:14.89765/43 UTC in ticks (reference SparkSuite golden value family)
TICKS = 638156805748976543


def test_ticks_to_timestamp(spark):
    df = spark.createDataFrame([(TICKS,)], ["ticks"])
    ts = df.select(dotnet_ticks_to_timestamp("ticks").alias("ts")).collect()[0]["ts"]
    assert ts == datetime.datetime(2023, 3, 29, 9, 56, 14, 897654)


def test_ticks_to_unix_epoch(spark):
    df = spark.createDataFrame([(TICKS,)], ["ticks"])
    seconds = df.select(dotnet_ticks_to_unix_epoch("ticks").alias("s")).collect()[0]["s"]
    assert seconds == Decimal("1680083774.8976543")


def test_ticks_to_unix_epoch_nanos(spark):
    df = spark.createDataFrame([(TICKS,), (713589688368547759,)], ["ticks"])
    rows = df.select(dotnet_ticks_to_unix_epoch_nanos("ticks").alias("ns")).collect()
    assert rows[0]["ns"] == 1680083774897654300
    assert rows[1]["ns"] is None  # beyond long-overflow bound


def test_timestamp_to_ticks_round_trip(spark):
    df = spark.createDataFrame([(TICKS,)], ["ticks"])
    result = df.select(
        timestamp_to_dotnet_ticks(dotnet_ticks_to_timestamp("ticks")).alias("t")
    ).collect()[0]["t"]
    # µs truncation: round trip loses the sub-µs tick digits
    assert result == (TICKS // 10) * 10


def test_unix_epoch_to_ticks(spark):
    df = spark.createDataFrame([(1680083774.8976543,)], ["s"])
    t = df.select(unix_epoch_to_dotnet_ticks("s").alias("t")).collect()[0]["t"]
    assert abs(t - TICKS) <= 10  # double input: 100ns-scale rounding


def test_unix_epoch_nanos_to_ticks(spark):
    # ...654300 ns = ...6543 ticks exactly (100 ns resolution preserved)
    df = spark.createDataFrame([(1680083774897654300,)], ["ns"])
    t = df.select(unix_epoch_nanos_to_dotnet_ticks("ns").alias("t")).collect()[0]["t"]
    assert t == TICKS


def test_count_null(spark):
    df = spark.createDataFrame([(1,), (None,), (3,), (None,)], "v int")
    row = df.select(
        count_null("v").alias("nulls"), F.count("v").alias("set")
    ).collect()[0]
    assert row["nulls"] == 2 and row["set"] == 2


def test_backticks():
    assert backticks("col") == "col"
    assert backticks("a.column") == "`a.column`"
    assert backticks("a.column", "a.field") == "`a.column`.`a.field`"
    assert backticks("some`col") == "`some``col`"
    assert backticks("a", "b", "c") == "a.b.c"


def test_distinct_prefix_for():
    assert distinct_prefix_for(["a", "b"]) == "_"
    assert distinct_prefix_for(["a", "_b", "__c"]) == "___"
    assert distinct_prefix_for([]) == "_"


def test_session_shuffle_partitions_fallback(spark):
    from spark_extension_spark.utils import session_shuffle_partitions

    # integer conf (the normal path)
    assert session_shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    # platforms can hold a non-integer here (e.g. "auto" under
    # Databricks auto-optimized shuffle): must fall back to the
    # cluster default instead of crashing the operator at plan time.
    # OSS Spark type-checks conf.set, so the vendor value is modeled
    # with a stub session
    class _Conf:
        def get(self, key, default=None):
            return "auto"

    class _SC:
        defaultParallelism = 7

    class _Spark:
        conf = _Conf()
        sparkContext = _SC()

    assert session_shuffle_partitions(_Spark()) == 7


def test_safe_union_dotted_and_mixed_case_columns(spark):
    from spark_extension_spark.utils import safe_union

    a = spark.createDataFrame([(1, 2)], ["ID", "a.b"])
    b = spark.createDataFrame([(3, 4)], ["id", "a.b"])
    out = safe_union([a, b])
    # case-insensitive resolution: ID/id are ONE column, not half-NULL twins
    assert len(out.columns) == 2 and out.columns[0] == "ID"
    assert sorted(r["ID"] for r in out.collect()) == [1, 3]
    assert sorted(r["a.b"] for r in out.collect()) == [2, 4]


def test_patch_restores_shadowed_attribute(spark):
    from pyspark.sql import DataFrame

    from spark_extension_spark import patch

    sentinel = lambda self: "original"  # noqa: E731
    DataFrame.histogram = sentinel
    try:
        patch.install()
        assert DataFrame.histogram is not sentinel
        patch.uninstall()
        assert DataFrame.__dict__.get("histogram") is sentinel
    finally:
        if DataFrame.__dict__.get("histogram") is sentinel:
            delattr(DataFrame, "histogram")


def test_patch_uninstall_retains_stash_when_repatched(spark):
    # third-party code re-patches the slot after install(): uninstall()
    # must leave the foreign attribute alone AND keep the stashed
    # original, so a later cycle can still restore it (round-8 fix:
    # the stash used to be popped unconditionally, permanently
    # discarding the genuine pre-install attribute)
    import warnings

    from pyspark.sql import DataFrame

    from spark_extension_spark import patch

    original = lambda self: "original"  # noqa: E731
    foreign = lambda self: "foreign"  # noqa: E731
    DataFrame.histogram = original
    try:
        patch.install()
        DataFrame.histogram = foreign  # third-party re-patch
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            patch.uninstall()
        assert any("re-patched" in str(w.message) for w in caught)
        assert DataFrame.__dict__.get("histogram") is foreign  # untouched
        # foreign patch goes away; the next cycle restores the original
        delattr(DataFrame, "histogram")
        patch.install()  # must NOT re-stash over the retained original
        patch.uninstall()
        assert DataFrame.__dict__.get("histogram") is original
    finally:
        patch._installed.clear()
        patch._shadowed.clear()
        if DataFrame.__dict__.get("histogram") in (original, foreign):
            delattr(DataFrame, "histogram")


def test_patch_reinstall_over_live_foreign_patch_warns(spark):
    # install() while a foreign patch still holds the slot (after a
    # stash-retaining uninstall) cannot preserve both the foreign code
    # and the genuine original — it overwrites the foreign patch, but
    # must do so loudly, and the original must still win the next cycle
    import warnings

    from pyspark.sql import DataFrame

    from spark_extension_spark import patch

    original = lambda self: "original"  # noqa: E731
    foreign = lambda self: "foreign"  # noqa: E731
    DataFrame.histogram = original
    try:
        patch.install()
        DataFrame.histogram = foreign
        with warnings.catch_warnings(record=True):
            warnings.simplefilter("always")
            patch.uninstall()  # retains stash, leaves foreign
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            patch.install()  # foreign still live: overwrite + warn
        assert any("third party" in str(w.message) for w in caught)
        patch.uninstall()
        assert DataFrame.__dict__.get("histogram") is original
    finally:
        patch._installed.clear()
        patch._shadowed.clear()
        if DataFrame.__dict__.get("histogram") in (original, foreign):
            delattr(DataFrame, "histogram")


def test_spark_version_parses_prerelease_suffixes(monkeypatch):
    import pyspark

    from spark_extension_spark import version as V

    cases = {
        "4.1.2": (4, 1, 2),
        "3.5.0rc1": (3, 5, 0),       # rc digits must NOT concatenate
        "4.1.0-preview2": (4, 1, 0),
        "4.0.1+custom.3": (4, 0, 1),
        "4.1": (4, 1, 0),
    }
    for raw, want in cases.items():
        monkeypatch.setattr(pyspark, "__version__", raw)
        assert V.spark_version() == want, raw


def test_operators_all_covers_public_surface():
    import spark_extension_spark.operators as ops

    public = sorted(
        n for n in dir(ops) if not n.startswith("_") and callable(getattr(ops, n))
    )
    missing = [n for n in public if n not in ops.__all__]
    dangling = [n for n in ops.__all__ if not hasattr(ops, n)]
    assert missing == [] and dangling == []
