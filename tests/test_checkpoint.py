"""Resume-from-ANY-checkpoint (north_rule): snapshot rollback on the store
tables + engine-level rollback_to/resume(at_step) that re-runs to the exact
same crawl order and URL-seen set as an uninterrupted run."""

from __future__ import annotations

import pytest

from crawlee_spark import datagen
from crawlee_spark.engine import CrawlConfig, CrawlEngine
from crawlee_spark.simulator import SimConfig, simulate
from crawlee_spark.store.snapshot_table import AppendTable, SnapshotTable


def _df(spark, vals, step):
    return spark.createDataFrame(
        [(v, step, v % 4) for v in vals], "v int, step int, bucket int"
    )


def test_snapshot_rollback_time_travel_and_fresh_ids(spark, tmp_path):
    root = str(tmp_path / "t")
    t = SnapshotTable.create(spark, root, _df(spark, [1, 2, 3, 4], 0), num_buckets=4)
    t.commit_buckets(_df(spark, [10, 11], 1), "s1", {"step": 1})     # buckets 2,3
    t.commit_buckets(_df(spark, [20, 21, 22], 2), "s2", {"step": 2})
    as_of_1 = sorted(r["v"] for r in t.read(snapshot_id=1).collect())

    t.rollback(1)
    assert t.current_snapshot_id() == 1
    assert sorted(r["v"] for r in t.read().collect()) == as_of_1
    # a commit on the rolled-back timeline takes a FRESH id — never reuses
    # the abandoned snapshot 2's id (whose data dir other manifests may name)
    sid = t.commit_buckets(_df(spark, [30], 3), "s3", {"step": 3})
    assert sid == 3
    assert t.manifest(sid)["parent"] == 1
    # abandoned snapshot 2 still time-travel readable until expired
    assert 22 in {r["v"] for r in t.read(snapshot_id=2).collect()}
    with pytest.raises(FileNotFoundError):
        t.rollback(99)


def test_append_rollback_truncates_and_rechains(spark, tmp_path):
    log = AppendTable(spark, str(tmp_path / "log"))
    log.append(_df(spark, [1], 1), {"step": 1})
    log.append(_df(spark, [2], 2), {"step": 2})
    log.append(_df(spark, [3], 3), {"step": 3})
    log.rollback(1)  # keep steps 1..2
    assert sorted(r["v"] for r in log.read().collect()) == [1, 2]
    sid = log.append(_df(spark, [4], 3), {"step": 3})
    assert sid == 3 and log.manifest(sid)["parent"] == 1
    assert sorted(r["v"] for r in log.read().collect()) == [1, 2, 4]
    assert [m["id"] for m in log.history()] == [0, 1, 3]
    # rollback to "before the first append": table reads as empty/absent
    log.rollback(None)
    assert not log.exists()
    log.append(_df(spark, [9], 1), {"step": 1})
    assert [r["v"] for r in log.read().collect()] == [9]


def test_engine_resume_from_any_checkpoint(spark, tmp_path):
    rows = list(datagen.gen_corpus_rows(40, 3, seed=9, with_bytes=False))
    corpus_py = {r["url"]: {"html": r["html"]} for r in rows}
    seeds_py = datagen.gen_seed_rows(40, 3, seed=9, n_seeds=4)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows], "url string, html string"
    )
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string"
    )
    sim = simulate(corpus_py, seeds_py, SimConfig())

    wdir = str(tmp_path / "crawl")
    cfg = CrawlConfig(num_buckets=4)
    eng = CrawlEngine(spark, wdir, cfg)
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    full_order = eng.crawl_order()
    assert full_order == sim.crawl_order
    ckpts = eng.checkpoints()
    assert 0 in ckpts and len(ckpts) >= 3

    # resume from a MID-crawl checkpoint: the re-run must reproduce the
    # same crawl order and URL-seen set (deterministic superstep replay)
    mid = ckpts[len(ckpts) // 2]
    eng2 = CrawlEngine.resume(spark, wdir, cfg, at_step=mid)
    assert eng2.step == mid
    # the fetch log is truncated to the checkpoint: nothing beyond `mid`
    assert all(s <= mid for (s, _) in eng2.crawl_order())
    eng2.run(corpus_df)
    assert eng2.crawl_order() == sim.crawl_order
    assert eng2.url_seen() == sim.url_seen

    # resume from the SEEDS-ONLY checkpoint (step 0) replays the whole crawl
    eng3 = CrawlEngine.resume(spark, wdir, cfg, at_step=0)
    assert eng3.crawl_order() == []
    eng3.run(corpus_df)
    assert eng3.crawl_order() == sim.crawl_order

    with pytest.raises(FileNotFoundError):
        CrawlEngine.resume(spark, wdir, cfg, at_step=999)


def test_rollback_across_rebucket_guards_bucket_space(spark, tmp_path):
    """rollback_to that crosses a rebucket boundary must refresh the bucket
    count from the rolled-back lineage and refuse a now-stale config —
    otherwise new MERGEs would key rows with the post-rebucket N over
    pre-rebucket data (silent duplicates)."""
    rows = list(datagen.gen_corpus_rows(20, 2, seed=3, with_bytes=False))
    seeds_py = datagen.gen_seed_rows(20, 2, seed=3, n_seeds=2)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows],
        "url string, html string")
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string")

    wdir = str(tmp_path / "crawl")
    eng = CrawlEngine(spark, wdir, CrawlConfig(num_buckets=4))
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    mid = eng.checkpoints()[1]

    eng.frontier.rebucket(8)
    eng2 = CrawlEngine(spark, wdir, CrawlConfig(num_buckets=8))  # guard ok
    with pytest.raises(ValueError, match="rebucket"):
        eng2.rollback_to(mid)  # pre-rebucket snapshot: stored N=4 != cfg 8
    # the refused rollback must not have flipped anything (checked BEFORE)
    assert eng2.frontier.stored_num_buckets() == 8

    # with the target-matching config the rollback lands + refreshes
    eng2.cfg.num_buckets = 4   # simulate the operator updating the config
    eng2.rollback_to(mid)
    assert eng2.frontier.num_buckets == 4
    assert eng2.frontier.stored_num_buckets() == 4


def test_resume_heals_torn_superstep(spark, tmp_path):
    """Crash between the frontier commit and the crawl_state save leaves
    the frontier AHEAD of the saved step; resume must detect it, roll
    back to the checkpoint, and re-run to the exact simulator outcome."""
    import json
    import os
    import shutil

    rows = list(datagen.gen_corpus_rows(40, 3, seed=9, with_bytes=False))
    corpus_py = {r["url"]: {"html": r["html"]} for r in rows}
    seeds_py = datagen.gen_seed_rows(40, 3, seed=9, n_seeds=4)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows],
        "url string, html string")
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string")
    sim = simulate(corpus_py, seeds_py, SimConfig())

    wdir = str(tmp_path / "crawl")
    cfg = CrawlConfig(num_buckets=4)
    eng = CrawlEngine(spark, wdir, cfg)
    eng.add_seeds(seeds_df)
    for _ in range(3):
        eng.run_superstep(corpus_df)
    assert eng.step == 3

    # simulate the torn window: frontier (and logs) are at step 3, but the
    # scalar state reverts to the step-2 checkpoint as if _save_state
    # never ran
    shutil.copyfile(os.path.join(wdir, "state_history", "step-2.json"),
                    os.path.join(wdir, "crawl_state.json"))

    eng2 = CrawlEngine.resume(spark, wdir, cfg)
    assert eng2.step == 2                       # healed to the checkpoint
    assert eng2._frontier_max_step() <= 2       # frontier rolled back too
    eng2.run(corpus_df)
    assert eng2.crawl_order() == sim.crawl_order
    assert eng2.url_seen() == sim.url_seen
