"""Integration test: the composed end-to-end pipeline example."""

import sys

sys.path.insert(0, "/root/repo/examples")


def test_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from pipeline import run_pipeline

    stats = run_pipeline(spark, sf_dir, str(tmp_path / "corpus"))
    assert stats["raw"] > 0
    assert stats["raw"] >= stats["kept"] >= stats["unique"] >= stats["deduped"]
    assert stats["written"] == stats["deduped"]
    assert stats["partitions"] >= 1
    # every raw doc is accounted for: kept (N/C) or dropped (D)
    assert sum(stats["drift"].values()) >= stats["raw"]
    assert "D" in stats["drift"] or stats["written"] == stats["raw"]
