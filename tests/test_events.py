"""EventManager facade (crawlee_spark/events.py; event_manager.ts:42-46):
bus semantics, the run loop's persistState/migrating/aborting/exit wiring,
and the headline guarantee — a listener-driven mid-crawl interrupt resumes
to a run bit-identical with the uninterrupted one (the torn-superstep heal
contract extended to the event path)."""

from __future__ import annotations

from crawlee_spark import datagen
from crawlee_spark.engine import CrawlConfig, CrawlEngine
from crawlee_spark.events import EventManager
from crawlee_spark.simulator import SimConfig, simulate


def test_bus_on_off_emit():
    bus = EventManager()
    seen: list[tuple[str, dict]] = []
    a = lambda p: seen.append(("a", p))  # noqa: E731
    b = lambda p: seen.append(("b", p))  # noqa: E731
    bus.on("persistState", a)
    bus.on("persistState", b)
    assert bus.listener_count("persistState") == 2
    bus.emit("persistState", {"step": 1})
    assert seen == [("a", {"step": 1}), ("b", {"step": 1})]
    bus.off("persistState", a)
    bus.emit("persistState", {"step": 2})
    assert seen[-1] == ("b", {"step": 2})
    bus.off("persistState")  # off(None) removes all (event_manager.ts)
    assert bus.listener_count("persistState") == 0
    bus.emit("persistState", {"step": 3})  # no listeners: only recorded
    assert bus.emitted[-1] == ("persistState", {"step": 3})


def test_interrupt_kind_validated(spark, tmp_path):
    eng = CrawlEngine(spark, str(tmp_path / "x"), CrawlConfig(num_buckets=4))
    import pytest

    with pytest.raises(ValueError):
        eng.request_interrupt("rebooting")


def _fixture(spark, seed=21):
    rows = list(datagen.gen_corpus_rows(50, 4, seed=seed, with_bytes=False))
    corpus_py = {r["url"]: {"html": r["html"]} for r in rows}
    seeds_py = datagen.gen_seed_rows(50, 4, seed=seed, n_seeds=4)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows],
        "url string, html string")
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string")
    return corpus_py, seeds_py, corpus_df, seeds_df


def test_migrating_event_interrupts_and_resume_matches_uninterrupted(
        spark, tmp_path):
    """A persistState listener requests migration at step 2; the loop emits
    `migrating` ONCE after that superstep's commit and stops. Resuming
    finishes the crawl; crawl order + URL-seen equal the simulator's
    uninterrupted run."""
    corpus_py, seeds_py, corpus_df, seeds_df = _fixture(spark)
    sim = simulate(corpus_py, seeds_py, SimConfig())

    bus = EventManager()
    wd = str(tmp_path / "crawl")
    eng = CrawlEngine(spark, wd, CrawlConfig(num_buckets=4, events=bus))

    def on_persist(payload):
        if payload["step"] >= 2:
            eng.request_interrupt("migrating")

    bus.on("persistState", on_persist)
    eng.add_seeds(seeds_df)
    totals = eng.run(corpus_df)
    assert totals["interrupted"] == "migrating"
    assert eng.step == 2
    names = [e for e, _ in bus.emitted]
    assert names.count("migrating") == 1
    assert names[-1] == "exit" and names[-2] == "migrating"
    # the interrupt was requested DURING the persistState emit, so that
    # tick's payload had already reported isMigrating False (the flag shows
    # True only for interrupts pending before the tick — see below)
    per = [p for e, p in bus.emitted if e == "persistState"]
    assert all(p["isMigrating"] is False for p in per)

    # resume from the committed checkpoint and finish
    bus2 = EventManager()
    eng2 = CrawlEngine.resume(spark, wd,
                              CrawlConfig(num_buckets=4, events=bus2))
    eng2.run(corpus_df)
    assert eng2.crawl_order() == sim.crawl_order
    assert eng2.url_seen() == sim.url_seen
    assert ("exit", {"step": eng2.step}) in bus2.emitted


def test_aborting_event_shape(spark, tmp_path):
    """request_interrupt('aborting') emits `aborting` (not migrating) and
    persistState reports isMigrating False throughout."""
    _, _, corpus_df, seeds_df = _fixture(spark, seed=5)
    bus = EventManager()
    eng = CrawlEngine(spark, str(tmp_path / "ab"),
                      CrawlConfig(num_buckets=4, events=bus))
    bus.on("persistState", lambda p: eng.request_interrupt("aborting"))
    eng.add_seeds(seeds_df)
    totals = eng.run(corpus_df)
    assert totals["interrupted"] == "aborting"
    assert [e for e, _ in bus.emitted].count("aborting") == 1
    assert all(not p["isMigrating"]
               for e, p in bus.emitted if e == "persistState")


def test_pre_pending_interrupt_reports_is_migrating(spark, tmp_path):
    """An interrupt already pending when the tick fires (requested outside
    the listener) is visible as isMigrating=True in that persistState."""
    _, _, corpus_df, seeds_df = _fixture(spark, seed=6)
    bus = EventManager()
    eng = CrawlEngine(spark, str(tmp_path / "pre"),
                      CrawlConfig(num_buckets=4, events=bus))
    eng.add_seeds(seeds_df)
    eng.request_interrupt("migrating")
    totals = eng.run(corpus_df)
    per = [p for e, p in bus.emitted if e == "persistState"]
    assert per and per[0]["isMigrating"] is True
    assert totals["interrupted"] == "migrating" and totals["supersteps"] == 1


def test_system_info_emitted_per_superstep(spark, tmp_path):
    """systemInfo (event_manager.ts enum) fires once per superstep with the
    committed load counters — the Snapshotter's feed."""
    _, _, corpus_df, seeds_df = _fixture(spark, seed=9)
    bus = EventManager()
    eng = CrawlEngine(spark, str(tmp_path / "si"),
                      CrawlConfig(num_buckets=4, events=bus))
    eng.add_seeds(seeds_df)
    totals = eng.run(corpus_df)
    si = [p for e, p in bus.emitted if e == "systemInfo"]
    # one per run_superstep call: every counted superstep, plus possibly
    # the final empty-frontier probe that ends the crawl
    assert totals["supersteps"] <= len(si) <= totals["supersteps"] + 1
    assert sum(p["handled"] for p in si) == totals["handled"]
    assert all(set(p) == {"step", "fetched", "handled", "failed", "retried"}
               for p in si)


def test_interrupt_on_empty_tick_still_emitted_and_cleared(spark, tmp_path):
    """Regression (review r3 #4): an interrupt requested on the tick whose
    superstep came back EMPTY must still emit, be recorded in totals, and
    be cleared (not left stale for a later run())."""
    _, _, corpus_df, seeds_df = _fixture(spark, seed=3)
    bus = EventManager()
    eng = CrawlEngine(spark, str(tmp_path / "emp"),
                      CrawlConfig(num_buckets=4, events=bus))
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)  # drain fully: next superstep is empty

    bus.emitted.clear()
    bus.on("persistState", lambda p: eng.request_interrupt("migrating"))
    totals = eng.run(corpus_df)  # first superstep is empty
    assert totals["interrupted"] == "migrating"
    assert [e for e, _ in bus.emitted].count("migrating") == 1
    assert eng._interrupt is None
