"""The bench's one-time ingest repack (bench._repack) must be a pure
re-layout: same rows, same arrow schema (including the INT64 timestamp
physical types the events table ships with), just more row groups.
Pure-pyarrow tests — no Spark session needed."""

import math
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _repack

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01") if os.path.isdir(d)]


@pytest.mark.parametrize("src", SF_DIRS)
def test_repack_preserves_schema_and_rows(tmp_path, src):
    dst = str(tmp_path / os.path.basename(src))
    _repack(src, dst)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        a = pq.ParquetFile(os.path.join(src, fname))
        b = pq.ParquetFile(os.path.join(dst, fname))
        assert b.schema_arrow.equals(a.schema_arrow), fname
        assert b.metadata.num_rows == a.metadata.num_rows, fname
        # value-identical under the source row order
        assert b.read().equals(a.read()), fname


def test_repack_splits_large_tables(tmp_path):
    src = "/root/testdata/sf0.01"
    if not os.path.isdir(src):
        pytest.skip("sf0.01 testdata absent")
    dst = str(tmp_path / "sf0.01")
    _repack(src, dst)
    li = pq.ParquetFile(os.path.join(dst, "lineitem.parquet"))
    rows = li.metadata.num_rows
    expect = math.ceil(rows / max(32, math.ceil(rows / 32)))
    assert li.metadata.num_row_groups == expect
    assert li.metadata.num_row_groups > 1  # the point of the exercise


# ---------------------------------------------------------------------------
# contamination-aware run selection (pure functions, no Spark)
# ---------------------------------------------------------------------------

def _load(steals):
    return [{"la1": 0.0, "busy": 0, "steal": s} for s in steals]


def test_quiet_triple_keeps_historical_median():
    from bench import _needs_rerun, _select_median

    runs = [1.2, 1.0, 1.1]
    ql = _load([0, 3, 1])
    assert not _needs_rerun(runs, ql)
    med, picked = _select_median(runs, ql, extras=0)
    assert med == 1.1 and picked is None


def test_stolen_run_triggers_and_selection_prefers_clean():
    from bench import _needs_rerun, _select_median

    runs = [1.0, 4.0, 1.1]          # run 2 stolen and slow
    ql = _load([0, 900, 2])
    assert _needs_rerun(runs, ql)   # only 2 clean runs
    runs.append(1.05)               # the re-run
    ql.append({"la1": 0.0, "busy": 0, "steal": 1})
    assert not _needs_rerun(runs, ql)
    med, picked = _select_median(runs, ql, extras=1)
    # median over the three clean runs (1.0, 1.05, 1.1); stolen run out
    assert med == 1.05 and 1 not in picked


def test_spread_triggers_without_steal_and_selects_low_wall():
    from bench import _needs_rerun, _select_median

    # the round-11 in-VM reclaim signature: 9.4/5.0/3.4 on a ~1.6s
    # query, steal flat — must trigger despite zero stolen runs
    runs = [9.4, 5.0, 3.4]
    ql = _load([52, 72, 16])
    assert _needs_rerun(runs, ql)
    runs += [1.7, 1.6]
    ql += _load([2, 1])
    assert not _needs_rerun(runs, ql)  # best3 = 1.6/1.7/3.4: 2.1x < 2.5x ratio
    med, picked = _select_median(runs, ql, extras=2)
    # three lowest-wall runs are 1.6, 1.7, 3.4 -> median 1.7
    assert med == 1.7 and picked == [2, 3, 4]


def test_small_absolute_spread_never_triggers():
    from bench import _needs_rerun

    # sub-second queries routinely spread 3x in wall with no
    # contamination (scheduler jitter); the absolute floor gates that
    assert not _needs_rerun([0.05, 0.12, 0.14], _load([0, 0, 0]))


# ---------------------------------------------------------------------------
# floor-comparison re-run trigger (round 12 — pure functions, no Spark)
# ---------------------------------------------------------------------------

def test_floor_suspects_ratio_and_abs_gates():
    from bench import _floor_suspects

    floor = {"a": 4.0, "b": 0.4, "c": 2.0, "d": 1.0}
    timings = {
        "a": 6.4,   # 1.6x and +2.4s -> suspect
        "b": 0.6,   # 1.5x but only +0.2s < FLOOR_ABS -> jitter, not a suspect
        "c": 2.3,   # +0.3s but 1.15x < FLOOR_RATIO -> not a suspect
        "d": 1.6,   # 1.6x and +0.6s -> suspect
        "e": 9.0,   # no committed floor -> cannot adjudicate
    }
    # worst absolute excess first: a (+2.4) before d (+0.6)
    assert _floor_suspects(timings, floor) == ["a", "d"]


def test_floor_suspects_empty_without_floor():
    from bench import _floor_suspects

    assert _floor_suspects({"a": 9.9}, {}) == []


def test_latest_floor_picks_highest_round(tmp_path):
    import json

    from bench import _latest_floor

    for n, val in ((9, {"x": 1.0}), (11, {"x": 2.0})):
        with open(tmp_path / f"BENCH_FLOOR_r{n:02d}.json", "w") as f:
            json.dump({"queries": val}, f)
    q, fname = _latest_floor(str(tmp_path))
    assert q == {"x": 2.0} and fname == "BENCH_FLOOR_r11.json"


def test_latest_floor_absent_dir_is_empty(tmp_path):
    from bench import _latest_floor

    assert _latest_floor(str(tmp_path)) == ({}, None)


def test_qkeys_compact_and_truncated():
    from bench import _qkeys

    keys = {f"q{i}": f"name{i}" for i in range(30)}
    assert _qkeys({"name3": 1, "name7": 1}, keys) == "q3,q7"
    assert _qkeys({}, keys) == ""
    all_flagged = _qkeys({f"name{i}": 1 for i in range(30)}, keys)
    assert all_flagged.endswith(",+10") and all_flagged.count(",") == 20
