"""Stats-based file pruning (data skipping)."""

import glob

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.sources.skipping import (
    _fold_stats,
    file_column_ranges,
    prune_files,
    read_pruned,
)


class _FakeStats:
    def __init__(self, mn, mx, has_min_max=True):
        self.min, self.max, self.has_min_max = mn, mx, has_min_max


class _FakeMeta:
    """Duck-typed pyarrow FileMetaData: one column, given per-group stats."""

    def __init__(self, stats_per_group):
        self._stats = stats_per_group
        self.num_row_groups = len(stats_per_group)

    def row_group(self, g):
        meta, st = self, self._stats[g]

        class _G:
            def column(self, idx):
                class _C:
                    statistics = st

                return _C()

        return _G()


def test_fold_stats_normal_fold():
    md = _FakeMeta([_FakeStats(3.0, 7.0), _FakeStats(1.0, 5.0)])
    assert _fold_stats(md, 0) == (True, 1.0, 7.0)


def test_fold_stats_missing_group_stats_degrade():
    md = _FakeMeta([_FakeStats(1.0, 2.0), None])
    assert _fold_stats(md, 0) == (False, None, None)
    md = _FakeMeta([_FakeStats(1.0, 2.0, has_min_max=False)])
    assert _fold_stats(md, 0) == (False, None, None)


def test_fold_stats_zero_row_groups_has_no_stats():
    # an empty file (zero row groups) must report has_stats=False: the
    # former (True, None, None) return made prune_files' keep
    # expression NULL — the file was skipped only because an empty file
    # trivially holds no matching rows, an invariant this pins down
    assert _fold_stats(_FakeMeta([]), 0) == (False, None, None)


def test_fold_stats_nan_degrades_to_no_stats():
    # a nonconforming writer's NaN min/max must NOT silently prune the
    # file: NaN compares false against every bound, so without the
    # guard prune_files would skip a file that may hold matching rows
    nan = float("nan")
    for stats in (
        [_FakeStats(nan, 5.0)],
        [_FakeStats(1.0, nan)],
        [_FakeStats(1.0, 5.0), _FakeStats(nan, nan)],
    ):
        assert _fold_stats(_FakeMeta(stats), 0) == (False, None, None)


@pytest.fixture(scope="module")
def clustered(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("skip") / "orders")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .repartitionByRange(6, "o_totalprice")
        .write.parquet(base)
    )
    return sorted(glob.glob(f"{base}/*.parquet"))


def test_file_ranges_cover_and_order(spark, clustered):
    rows = file_column_ranges(spark, *clustered, column="o_totalprice").collect()
    assert len(rows) == len(clustered)
    assert all(r["has_stats"] for r in rows)
    assert all(r["min_value"] <= r["max_value"] for r in rows)
    # range layout: file ranges are (near-)disjoint, so sorted mins are
    # dominated by the previous file's max
    ordered = sorted(rows, key=lambda r: r["min_value"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["max_value"] <= b["min_value"]


def test_prune_skips_but_never_loses_rows(spark, clustered):
    lo, hi = 100000.0, 200000.0
    kept, skipped = prune_files(
        spark, *clustered, column="o_totalprice", lo=lo, hi=hi
    )
    assert skipped, "clustered layout must allow skipping"
    assert set(kept) | set(skipped) == set(clustered)
    pruned = read_pruned(
        spark, *clustered, column="o_totalprice", lo=lo, hi=hi
    ).collect()
    full = (
        spark.read.parquet(*clustered)
        .where(F.col("o_totalprice").between(lo, hi))
        .collect()
    )
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))


def test_prune_open_bounds(spark, clustered):
    kept_lo, _ = prune_files(spark, *clustered, column="o_totalprice", lo=1e9)
    assert kept_lo == []  # nothing can reach that minimum
    kept_all, skipped_all = prune_files(spark, *clustered, column="o_totalprice")
    assert set(kept_all) == set(clustered) and skipped_all == []


def test_read_pruned_empty_match_keeps_schema(spark, clustered):
    out = read_pruned(spark, *clustered, column="o_totalprice", lo=1e9)
    assert out.count() == 0
    assert set(out.columns) == {"o_orderkey", "o_totalprice"}


def test_unknown_column_raises(spark, clustered):
    with pytest.raises(Exception, match="not found"):
        file_column_ranges(spark, *clustered, column="nope").collect()
