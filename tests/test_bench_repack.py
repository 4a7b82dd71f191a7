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
