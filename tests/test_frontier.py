"""Frontier queue operator tests.

Protocol pins mirrored from the reference suite
(test/core/storages/request_queue.test.ts:33-191, 277-336):
add → fetch-order → reclaim(forefront) → handled invariants, dedup on add.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawlee_spark.operators import frontier as fr


@pytest.fixture
def ft(spark, tmp_path):
    return fr.FrontierTable.create(spark, str(tmp_path / "frontier"), num_buckets=8)


def _urls(spark, urls, **kw):
    rows = []
    for u in urls:
        rows.append((u, kw.get("forefront", False), kw.get("depth", 0)))
    return spark.createDataFrame(rows, "url string, forefront boolean, depth int")


def test_add_dedups_on_canonical_key(spark, ft):
    batch = _urls(
        spark,
        [
            "https://example.com/1",
            "https://example.com/1#same",  # same uniqueKey (fragment strip)
            "HTTP://EXAMPLE.com/2/",
            "http://example.com/2",
            "https://other.net/a?b=2&a=1",
            "https://other.net/a?a=1&b=2",  # same after param sort
        ],
    )
    stats = ft.add_requests(batch, step=0)
    assert stats == {"added": 3, "already_present": 3}

    # re-adding is a no-op (wasAlreadyPresent)
    stats2 = ft.add_requests(batch, step=1)
    assert stats2 == {"added": 0, "already_present": 6}  # per input item
    assert ft.counters() == {"total": 3, "handled": 0, "pending": 3}


def test_order_no_priority_and_forefront(spark, ft):
    ft.add_requests(_urls(spark, ["https://a.com/1", "https://a.com/2"]), step=0)
    ft.add_requests(_urls(spark, ["https://a.com/3"]), step=1)
    ft.add_requests(_urls(spark, ["https://a.com/ff"], forefront=True), step=2)
    ft.add_requests(_urls(spark, ["https://a.com/ff2"], forefront=True), step=3)

    got = [
        r["unique_key"]
        for r in ft.pending().orderBy(*fr.ORDER_COLS).select("unique_key").collect()
    ]
    # forefront first, LIFO among themselves (request-queue.ts:554-560, :178)
    assert got[0] == "https://a.com/ff2"
    assert got[1] == "https://a.com/ff"
    # then FIFO by step; /1 and /2 share a step -> url_hash tie-break
    from crawlee_spark.functions.hashing import xxhash64_str

    step0 = sorted(["https://a.com/1", "https://a.com/2"], key=xxhash64_str)
    assert got[2:] == step0 + ["https://a.com/3"]


def test_mark_handled_and_reclaim(spark, ft):
    ft.add_requests(_urls(spark, ["https://a.com/1", "https://a.com/2"]), step=0)
    df = ft.read()
    h1 = df.filter(F.col("unique_key") == "https://a.com/1").select("url_hash")

    updated = fr.apply_handled(df, h1, step=1)
    row = updated.filter(F.col("unique_key") == "https://a.com/1").first()
    assert row["handled_step"] == 1 and row["order_no"] is None
    other = updated.filter(F.col("unique_key") == "https://a.com/2").first()
    assert other["handled_step"] is None and other["order_no"] is not None

    # reclaim the other with forefront: retry_count bumps, order_no negative
    r2 = updated.filter(F.col("unique_key") == "https://a.com/2").select("url_hash")
    reclaimed = fr.apply_reclaim(updated, r2, step=2, forefront=True)
    row2 = reclaimed.filter(F.col("unique_key") == "https://a.com/2").first()
    assert row2["retry_count"] == 1
    assert row2["order_no"] < 0

    ft.table.commit_buckets(reclaimed, "test")
    assert ft.counters() == {"total": 2, "handled": 1, "pending": 1}


def test_apply_dead(spark, ft):
    ft.add_requests(_urls(spark, ["https://a.com/x"]), step=0)
    df = ft.read()
    dead = df.select("url_hash").withColumn("error", F.lit("boom"))
    out = fr.apply_dead(df, dead, step=3)
    row = out.first()
    assert row["handled_step"] == 3 and row["order_no"] is None and row["error"] == "boom"


def test_explicit_unique_key_and_keep_dupes(spark, ft):
    rows = [("https://a.com/x", "k1"), ("https://a.com/x", "k2")]
    batch = spark.createDataFrame(rows, "url string, unique_key string")
    stats = ft.add_requests(batch, step=0)
    assert stats["added"] == 2  # distinct explicit keys -> both kept


def test_deterministic_order_within_batch(spark, ft):
    # depth breaks ties first, then url_hash — stable across runs
    rows = [("https://a.com/d2", 2), ("https://a.com/d0", 0), ("https://a.com/d1", 1)]
    batch = spark.createDataFrame(rows, "url string, depth int")
    ft.add_requests(batch, step=0)
    got = [
        r["depth"]
        for r in ft.pending().orderBy(*fr.ORDER_COLS).select("depth").collect()
    ]
    assert got == [0, 1, 2]


def test_delete_requests(spark, ft):
    ft.add_requests(
        _urls(spark, [f"https://h{i % 3}.com/p/{i}" for i in range(12)]), step=0
    )
    assert ft.counters()["total"] == 12
    victims = ft.read().filter(F.col("url").contains("h0.com")).select("url_hash")
    n_victims = victims.count()
    assert ft.delete_requests(victims) == n_victims
    assert ft.counters()["total"] == 12 - n_victims
    assert ft.read().filter(F.col("url").contains("h0.com")).count() == 0
    # lineage records the operation; deleting again is a no-op
    assert ft.table.history()[-1]["operation"] == "delete_requests"
    assert ft.delete_requests(victims) == 0
    # a deleted URL may be re-enqueued (it left the URL-seen set)
    stats = ft.add_requests(_urls(spark, ["https://h0.com/p/0"]), step=1)
    assert stats["added"] == 1


def test_reprioritize_promotes_by_numeric_priority(spark, ft):
    ft.add_requests(
        _urls(spark, [f"https://h{i % 2}.com/p/{i}" for i in range(6)]), step=0
    )
    rows = {r["url"]: r for r in ft.read().collect()}
    # mark one row handled so the dim must skip it
    handled_hash = rows["https://h0.com/p/0"]["url_hash"]
    from crawlee_spark.operators.frontier import apply_handled

    ft.table.commit_buckets(
        apply_handled(ft.read(), spark.createDataFrame(
            [(handled_hash,)], "url_hash long"), step=0),
        "mark", {},
    )
    prio = spark.createDataFrame(
        [
            (rows["https://h0.com/p/2"]["url_hash"], 5),
            (rows["https://h1.com/p/3"]["url_hash"], 9),
            (handled_hash, 100),  # handled: must NOT resurface
            (12345678901234, 7),  # unknown hash: no-op
        ],
        "url_hash long, priority long",
    )
    assert ft.reprioritize(prio, step=1) == 2
    head = [
        r["url"]
        for r in ft.pending().orderBy("order_no", "depth", "url_hash").collect()
    ]
    # priority 9 first, then 5, then normal FIFO; handled row absent
    assert head[:2] == ["https://h1.com/p/3", "https://h0.com/p/2"]
    assert "https://h0.com/p/0" not in head
    assert len(head) == 5
    assert ft.table.history()[-1]["operation"] == "reprioritize"
    # counters unchanged by a pure reorder
    assert ft.counters()["total"] == 6 and ft.counters()["pending"] == 5
    # a second dim supersedes: boost a FIFO row above everything
    prio2 = spark.createDataFrame(
        [(rows["https://h1.com/p/5"]["url_hash"], 1000)], "url_hash long, priority long"
    )
    assert ft.reprioritize(prio2, step=2) == 1
    head2 = [
        r["url"]
        for r in ft.pending().orderBy("order_no", "depth", "url_hash").collect()
    ]
    assert head2[0] == "https://h1.com/p/5"
    # a negative priority clamps to 0: stays inside its step band (still
    # promoted, but never colliding with another step's encoding)
    prio3 = spark.createDataFrame(
        [(rows["https://h0.com/p/4"]["url_hash"], -50)], "url_hash long, priority long"
    )
    assert ft.reprioritize(prio3, step=3) == 1
    from crawlee_spark.operators.frontier import STEP_SHIFT

    promoted = ft.pending().filter(
        F.col("url") == "https://h0.com/p/4").collect()[0]
    assert promoted["order_no"] == -((3 + 1) << STEP_SHIFT)
    # step-3 band beats the step-2 band (later reprioritize wins the head)
    head3 = [
        r["url"]
        for r in ft.pending().orderBy("order_no", "depth", "url_hash").collect()
    ]
    assert head3[0] == "https://h0.com/p/4"


def test_add_requests_same_step_batches_count_independently(spark, ft):
    """Two batches at the SAME step (two seed frames, streamed batches
    between supersteps): each must report its own added/already_present,
    not the step's cumulative rows."""
    b1 = _urls(spark, [f"https://s.com/p/{i}" for i in range(3)])
    assert ft.add_requests(b1, step=0) == {"added": 3, "already_present": 0}
    # identical re-add at the same step: nothing new
    assert ft.add_requests(b1, step=0) == {"added": 0, "already_present": 3}
    # fully-new batch at the same step: no negative already_present
    b2 = _urls(spark, [f"https://s.com/q/{i}" for i in range(2)])
    assert ft.add_requests(b2, step=0) == {"added": 2, "already_present": 0}
    assert ft.counters()["total"] == 5


def test_mutator_dims_with_duplicate_keys_keep_pk_invariant(spark, ft):
    """Duplicate url_hash rows in a mutation dim (e.g. two revisit signals
    unioned) must not fan out the frontier left join into duplicate rows."""
    ft.add_requests(_urls(spark, [f"https://d.com/p/{i}" for i in range(3)]), step=0)
    rows = {r["url"]: r for r in ft.read().collect()}
    h = rows["https://d.com/p/1"]["url_hash"]
    dup_prio = spark.createDataFrame(
        [(h, 5), (h, 9)], "url_hash long, priority long")
    assert ft.reprioritize(dup_prio, step=1) == 1
    assert ft.read().count() == 3  # PK invariant holds
    # max priority wins for the promoted row
    from crawlee_spark.operators.frontier import STEP_SHIFT

    got = ft.pending().filter(F.col("url_hash") == h).collect()[0]
    assert got["order_no"] == -(((1 + 1) << STEP_SHIFT) + 9)


def test_rebucket_preserves_rows_and_updates_authority(spark, tmp_path):
    """rebucket recomputes every row's bucket for the new count, stamps the
    count into lineage (fresh handles adopt it), keeps all rows, and the
    engine refuses a config that disagrees."""
    import pytest

    from crawlee_spark.engine import CrawlConfig, CrawlEngine
    from crawlee_spark.functions.hashing import host_bucket_py

    root = str(tmp_path / "fr")
    ft = fr.FrontierTable.create(spark, root, num_buckets=4)
    urls = [(f"https://h{i}.example.com/p/{i}",) for i in range(40)]
    ft.add_requests(spark.createDataFrame(urls, "url string"), step=0)
    before = {(r["url_hash"], r["order_no"]) for r in ft.pending().collect()}

    sid = ft.rebucket(16)
    assert ft.num_buckets == 16
    rows = ft.pending().collect()
    assert {(r["url_hash"], r["order_no"]) for r in rows} == before
    for r in rows:  # buckets really derive from the NEW count
        assert r["bucket"] == host_bucket_py(r["host"], 16)
    assert ft.table.manifest(sid)["operation"] == "rebucket"

    # a fresh handle adopts the stored count even with a stale ctor arg
    fresh = fr.FrontierTable(spark, root, num_buckets=4)
    assert fresh.num_buckets == 16
    # MERGE after rebucket dedups against existing rows (same canonical key)
    res = fresh.add_requests(
        spark.createDataFrame(urls[:5] + [("https://h99.example.com/x",)],
                              "url string"), step=1)
    assert res == {"added": 1, "already_present": 5}

    # engine guard: stale cfg raises, updated cfg works
    import os
    wdir = str(tmp_path / "crawl")
    fr.FrontierTable.create(spark, os.path.join(wdir, "frontier"),
                            num_buckets=4).rebucket(8)
    with pytest.raises(ValueError, match="rebucketed"):
        CrawlEngine(spark, wdir, CrawlConfig(num_buckets=4))
    CrawlEngine(spark, wdir, CrawlConfig(num_buckets=8))  # adopts fine


def test_had_multiple_clients_flags_foreign_writer(spark, ft):
    """hadMultipleClients analog (request-queue.ts:493-507): every
    engine-path commit is client-stamped; a raw SnapshotTable commit (a
    second writer) trips the flag."""
    ft.add_requests(_urls(spark, ["http://a.test/1", "http://b.test/2"]),
                    step=0)
    assert ft.had_multiple_clients() is False
    assert ft.get_info()["had_multiple_clients"] is False
    # second writer: raw commit bypassing FrontierTable (no client stamp)
    ft.table.commit_buckets(
        ft.read().limit(0), "external-touch", {"who": "other-tool"})
    assert ft.had_multiple_clients() is True
    assert ft.get_info()["had_multiple_clients"] is True


def test_resume_refuses_foreign_writer_unless_allowed(spark, tmp_path):
    """Engine resume must surface the single-writer violation (refuse),
    and adopt the queue only with allow_foreign_writers=True."""
    import os

    from crawlee_spark import datagen
    from crawlee_spark.engine import CrawlConfig, CrawlEngine

    rows = list(datagen.gen_corpus_rows(20, 3, seed=9, with_bytes=False))
    seeds = datagen.gen_seed_rows(20, 3, seed=9, n_seeds=3)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows],
        "url string, html string")
    seeds_df = spark.createDataFrame(
        seeds, "url string, forefront boolean, depth int, label string")
    wd = str(tmp_path / "crawl")
    eng = CrawlEngine(spark, wd, CrawlConfig(num_buckets=4))
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    # clean lineage resumes fine
    CrawlEngine.resume(spark, wd, CrawlConfig(num_buckets=4))
    # a second writer touches the frontier directly
    ft = fr.FrontierTable(spark, os.path.join(wd, "frontier"))
    ft.table.commit_buckets(ft.read().limit(0), "external", {})
    with pytest.raises(ValueError, match="another writer"):
        CrawlEngine.resume(spark, wd, CrawlConfig(num_buckets=4))
    eng2 = CrawlEngine.resume(
        spark, wd, CrawlConfig(num_buckets=4, allow_foreign_writers=True))
    assert eng2.frontier.had_multiple_clients() is True


def test_maintenance_commits_are_not_foreign(spark, ft):
    """SnapshotTable's own compact() writes no client stamp; it must not
    trip had_multiple_clients (review r3 #2)."""
    ft.add_requests(_urls(spark, ["http://a.test/1", "http://b.test/2"]),
                    step=0)
    ft.table.compact()
    assert ft.had_multiple_clients() is False
    # a genuinely foreign non-maintenance commit still trips
    ft.table.commit_buckets(ft.read().limit(0), "external", {})
    assert ft.had_multiple_clients() is True
