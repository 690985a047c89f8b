"""End-to-end pipeline composition (scripts/pipeline_demo.py): crawl ->
sniff -> validate -> near-dup sweep -> batch pack -> WARC export. Each
stage is unit/oracle-tested elsewhere; this pins that they COMPOSE."""

from __future__ import annotations

import sys


def test_pipeline_composes(spark, tmp_path):
    sys.path.insert(0, "/root/repo/scripts")
    try:
        from pipeline_demo import run_pipeline
    finally:
        sys.path.pop(0)
    out = run_pipeline(spark, n_pages=50, n_hosts=4, batch_size=4,
                       workdir=str(tmp_path))
    assert out["fetched"] > 0 and out["assets"] == out["fetched"]
    assert out["sniff_mismatches"] == 0
    assert out["validated_ok"] == out["assets"]
    assert out["near_dupes_removed"] == 1  # exactly the planted clone
    assert out["survivors"] == out["assets"]
    assert out["warc_reread"] == out["assets"]
    assert out["batches"] >= 1
