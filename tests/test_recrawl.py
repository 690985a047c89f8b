"""Recrawl scheduling (operators/recrawl.py) and ranged-read planning
(sources/cdx.py::plan_ranged_reads)."""

from __future__ import annotations

from crawlee_spark.operators.recrawl import change_history, recrawl_priority
from crawlee_spark.sources.cdx import plan_ranged_reads


def test_change_history_sorts_and_counts(spark):
    rows = [
        # emitted out of order; sorted by ts the digests go a,a,b,a:
        # 2 changes (a->b and the REVERT b->a both count)
        ("u1", "20240101000000", "a"),
        ("u1", "20220101000000", "a"),
        ("u1", "20230101000000", "b"),
        ("u1", "20210101000000", "a"),
        # single observation: 0 changes, no neighbor to compare
        ("u2", "20260601000000", "z"),
    ]
    df = spark.createDataFrame(rows, "url string, ts string, digest string")
    got = {r["url"]: r for r in change_history(df).collect()}
    assert got["u1"]["n_obs"] == 4 and got["u1"]["n_changes"] == 2
    assert got["u1"]["first_ts"] == "20210101000000"
    assert got["u1"]["last_ts"] == "20240101000000"
    assert got["u2"]["n_obs"] == 1 and got["u2"]["n_changes"] == 0


def test_recrawl_priority_weights_change_rate_by_staleness(spark):
    rows = [
        ("hot-stale", "20260101000000", "a"), ("hot-stale", "20260201000000", "b"),
        ("hot-fresh", "20260101000000", "a"), ("hot-fresh", "20261230000000", "b"),
        ("cold-stale", "20260101000000", "a"), ("cold-stale", "20260201000000", "a"),
    ]
    df = spark.createDataFrame(rows, "url string, ts string, digest string")
    out = recrawl_priority(change_history(df), now="20261231")
    got = {r["url"]: r for r in out.collect()}
    # changing + stale outranks changing + fresh outranks never-changing
    assert got["hot-stale"]["priority"] > got["hot-fresh"]["priority"] > 0
    assert got["cold-stale"]["priority"] == 0
    assert got["hot-fresh"]["age_days"] == 1


def test_plan_ranged_reads_coalesces_within_gap(spark):
    rows = [
        # f1: three records, first two within gap, third far away
        ("f1", 0, 800), ("f1", 1000, 500), ("f1", 100_000, 400),
        # f2: single record
        ("f2", 50, 100),
    ]
    df = spark.createDataFrame(rows, "filename string, offset long, length long")
    out = plan_ranged_reads(df, gap_bytes=16384)
    got = sorted((r["filename"], r["range_start"], r["range_end"],
                  r["n_records"], r["waste_bytes"]) for r in out.collect())
    assert got == [
        ("f1", 0, 1500, 2, 200),       # 0..800 + 1000..1500, 200 B hole
        ("f1", 100_000, 100_400, 1, 0),
        ("f2", 50, 150, 1, 0),
    ]


def test_plan_ranged_reads_gap_boundary(spark):
    # next record starting EXACTLY at prev_end + gap still coalesces
    # (strict > starts a new group)
    rows = [("f", 0, 100), ("f", 100 + 64, 10), ("f", 100 + 64 + 10 + 65, 10)]
    df = spark.createDataFrame(rows, "filename string, offset long, length long")
    out = plan_ranged_reads(df, gap_bytes=64).collect()
    by_start = sorted((r["range_start"], r["n_records"]) for r in out)
    assert by_start == [(0, 2), (239, 1)]
