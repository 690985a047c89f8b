"""Structured Streaming surface: seed stream -> foreachBatch supersteps,
windowed fetch rate (keepAlive analog, SURVEY.md §2.9)."""

from __future__ import annotations

import os

from crawlee_spark import datagen
from crawlee_spark.engine import CrawlConfig
from crawlee_spark.simulator import SimConfig, simulate
from crawlee_spark.streaming import StreamingCrawl, windowed_fetch_rate


def test_streaming_crawl_drains_to_same_url_seen(spark, tmp_path):
    rows = list(datagen.gen_corpus_rows(40, 4, seed=9, with_bytes=False))
    corpus_py = {r["url"]: {"html": r["html"]} for r in rows}
    seeds_py = datagen.gen_seed_rows(40, 4, seed=9, n_seeds=4)
    sim = simulate(corpus_py, seeds_py, SimConfig())

    corpus = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows], "url string, html string"
    )
    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    # two seed files -> two micro-batches (dynamic producer analog)
    half = len(seeds_py) // 2
    (seed_dir / "a.txt").write_text("\n".join(s["url"] for s in seeds_py[:half]))
    (seed_dir / "b.txt").write_text("\n".join(s["url"] for s in seeds_py[half:]))

    sc = StreamingCrawl(spark, str(tmp_path / "crawl"), corpus,
                        CrawlConfig(num_buckets=4))
    batches = sc.drain(str(seed_dir), str(tmp_path / "ckpt"), timeout_secs=240)
    assert len(batches) >= 2

    # URL-seen converges to the batch engine / simulator set (crawl ORDER
    # differs: seeds arrived over two steps — dedup semantics must not)
    assert sc.engine.url_seen() == sim.url_seen
    # forefront flag lost in text files -> compare keys only
    assert {k for _, k in sc.engine.crawl_order()} == {k for _, k in sim.crawl_order}


def test_windowed_fetch_rate_batch_mode(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    log = spark.createDataFrame(
        [(t0 + dt.timedelta(seconds=s),) for s in (0, 10, 50, 70, 130)],
        "ts timestamp",
    )
    out = windowed_fetch_rate(log, window="60 seconds", slide="60 seconds").collect()
    by_start = {r["window_start"].second + 60 * r["window_start"].minute: r["fetches"]
                for r in out}
    assert by_start == {0: 3, 60: 1, 120: 1}


def test_streaming_url_seen_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark path: canonical-equal variants inside
    the watermark collapse to one row; the batch twin produces the same
    survivor key set."""
    import json

    from crawlee_spark.streaming.stream_crawl import streaming_url_seen

    rows = [
        {"ts": "2024-01-01T00:00:00", "url": "https://A.example.com/x/"},
        {"ts": "2024-01-01T00:00:10", "url": "https://a.example.com/x"},
        {"ts": "2024-01-01T00:00:20", "url": "https://a.example.com/x#frag"},
        {"ts": "2024-01-01T00:00:30", "url": "https://b.example.com/y?b=2&a=1"},
        {"ts": "2024-01-01T00:00:40", "url": "https://b.example.com/y?a=1&b=2"},
        {"ts": "2024-01-01T00:00:50", "url": "not a url"},
    ]
    src = tmp_path / "urls"
    src.mkdir()
    (src / "batch.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("ts timestamp, url string")
        .json(str(src))
    )
    q = (
        streaming_url_seen(stream, watermark="10 minutes")
        .writeStream.format("memory").queryName("seen_mem")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    got = {r["url_hash"] for r in spark.sql("select * from seen_mem").collect()}

    batch = spark.createDataFrame(
        [(r["url"],) for r in rows], "url string"
    )
    want = {r["url_hash"] for r in streaming_url_seen(batch).collect()}
    assert got == want
    assert len(got) == 2  # one key per canonical URL, invalid row dropped


def test_streaming_dedup_in_batch_and_cross_batch(spark, tmp_path):
    """Two micro-batches: an in-batch duplicate drops before admission, a
    cross-batch duplicate matches the persisted corpus signatures, and only
    survivors' signatures accumulate."""
    import json

    from crawlee_spark.streaming import StreamingDedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    uniq1 = "spark shuffles partition data across executors during wide stages"
    uniq2 = "iceberg snapshots give copy on write tables time travel reads"
    doc_dir = tmp_path / "docs"
    doc_dir.mkdir()
    (doc_dir / "a.json").write_text("\n".join(
        json.dumps(d) for d in [
            {"doc_id": 10, "text": base},
            {"doc_id": 11, "text": uniq1},
            {"doc_id": 12, "text": base},       # in-batch dup of 10
        ]
    ))
    # second file written AFTER the first so maxFilesPerTrigger=1 orders it
    (doc_dir / "b.json").write_text("\n".join(
        json.dumps(d) for d in [
            {"doc_id": 20, "text": base},       # dup of corpus doc 10
            {"doc_id": 21, "text": uniq2},
        ]
    ))

    sd = StreamingDedup(spark, str(tmp_path / "dd"))
    batches = sd.drain(str(doc_dir), str(tmp_path / "ckpt"), timeout_secs=240)
    assert [b["batch_id"] for b in batches] == [0, 1]
    assert sd.corpus_ids() == {10, 11, 21}

    dec = {
        r["doc_id"]: (r["action"], r["first_match"])
        for r in sd.decisions.read().collect()
    }
    assert dec[12] == ("dup-in-batch", None)
    assert dec[20] == ("dup-of-corpus", 10)
    assert dec[10][0] == dec[11][0] == dec[21][0] == "admitted"

    # restart replay: re-processing an already-committed batch id is a no-op
    sd._process_batch(
        spark.createDataFrame([(10, base)], "doc_id long, text string"), 0
    )
    assert sd.corpus_ids() == {10, 11, 21}


def test_streaming_cdx_ingest_selects_and_enqueues(spark, tmp_path):
    """Two index shards landing in sequence: only 200 image captures
    enqueue; a cross-shard re-capture of the same URL dedups through the
    frontier MERGE; a restart replay adds nothing."""
    from crawlee_spark.streaming.stream_cdx import StreamingCdxIngest

    def line(surt, ts, url, status="200", mime="image/jpeg"):
        return (f'{surt} {ts} {{"url": "{url}", "mime": "{mime}", '
                f'"status": "{status}", "digest": "d-{url}", "length": "10", '
                f'"offset": "0", "filename": "f.warc.gz"}}')

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    (shard_dir / "cdx-000.txt").write_text("\n".join([
        line("com,a)/1.jpg", "20260101000000", "https://a.com/1.jpg"),
        line("com,a)/2.jpg", "20260101000000", "https://a.com/2.jpg"),
        line("com,a)/3.html", "20260101000000", "https://a.com/3.html",
             mime="text/html"),            # wrong mime: filtered
        line("com,a)/4.jpg", "20260101000000", "https://a.com/4.jpg",
             status="404"),                # failed capture: filtered
        "corrupt line {",                  # malformed: dropped, not fatal
    ]))
    (shard_dir / "cdx-001.txt").write_text("\n".join([
        line("com,a)/1.jpg", "20260201000000", "https://a.com/1.jpg"),  # re-capture
        line("com,b)/5.jpg", "20260101000000", "https://b.com/5.jpg"),
    ]))

    ing = StreamingCdxIngest(spark, str(tmp_path / "ingest"))
    batches = ing.drain(str(shard_dir), str(tmp_path / "ckpt"), timeout_secs=240)
    assert [b["batch_id"] for b in batches] == [0, 1]
    assert batches[0]["added"] == 2                  # 1.jpg, 2.jpg
    assert batches[1]["added"] == 1                  # 5.jpg; 1.jpg deduped
    assert batches[1]["already_present"] == 1
    urls = {r["url"] for r in ing.frontier.pending().collect()}
    assert urls == {"https://a.com/1.jpg", "https://a.com/2.jpg",
                    "https://b.com/5.jpg"}

    # restart with the same checkpoint: foreachBatch replays are skipped
    ing2 = StreamingCdxIngest(spark, str(tmp_path / "ingest"))
    again = ing2.drain(str(shard_dir), str(tmp_path / "ckpt"), timeout_secs=240)
    assert again == []
    assert ing2.frontier.counters()["total"] == 3


def test_streaming_dedup_replay_after_sig_commit_crash(spark, tmp_path):
    """The crash window between the sigs append and the decisions stamp:
    the replay must recompute decisions WITHOUT flipping already-admitted
    docs to dup-of-corpus (self-match exclusion) and WITHOUT duplicating
    signature rows."""
    import json

    from crawlee_spark.streaming import StreamingDedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    uniq2 = "iceberg snapshots give copy on write tables time travel reads"
    doc_dir = tmp_path / "docs"
    doc_dir.mkdir()
    (doc_dir / "a.json").write_text(json.dumps({"doc_id": 10, "text": base}))
    (doc_dir / "b.json").write_text("\n".join(
        json.dumps(d) for d in [
            {"doc_id": 20, "text": base},   # dup of corpus doc 10
            {"doc_id": 21, "text": uniq2},
        ]
    ))
    sd = StreamingDedup(spark, str(tmp_path / "dd"))
    sd.drain(str(doc_dir), str(tmp_path / "ckpt"), timeout_secs=240)
    assert sd.corpus_ids() == {10, 21}

    # simulate the crash: batch 1's sigs landed, its decisions stamp did not
    dec_hist = sd.decisions.history()
    sd.decisions.rollback(int(dec_hist[-2]["id"]))
    assert 1 not in sd._committed_batches()
    assert 1 in sd._sig_batches()

    replay = spark.createDataFrame(
        [(20, base), (21, uniq2)], "doc_id long, text string")
    sd._process_batch(replay, 1)
    # no duplicate signature rows, corpus unchanged
    assert sd.sigs.read().count() == 2
    assert sd.corpus_ids() == {10, 21}
    dec = {
        r["doc_id"]: (r["action"], r["first_match"])
        for r in sd.decisions.read().filter("batch_id = 1").collect()
    }
    # 21 is already in the corpus, but it must NOT self-match
    assert dec[21] == ("admitted", None)
    assert dec[20] == ("dup-of-corpus", 10)


def test_streaming_cdx_fresh_checkpoint_does_not_skip_new_shards(spark, tmp_path):
    """Batch ids restart at 0 under a rebuilt checkpoint; the replay stamp
    is (checkpoint, batch), so a fresh checkpoint re-reads everything —
    old shards MERGE as already-present, NEW shards still enqueue."""
    from crawlee_spark.streaming.stream_cdx import StreamingCdxIngest

    def line(surt, url):
        return (f'{surt} 20260101000000 {{"url": "{url}", '
                f'"mime": "image/jpeg", "status": "200", "digest": "d-{url}",'
                f' "length": "10", "offset": "0", "filename": "f.warc.gz"}}')

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    (shard_dir / "cdx-000.txt").write_text(line("com,a)/1.jpg",
                                                "https://a.com/1.jpg"))
    ing = StreamingCdxIngest(spark, str(tmp_path / "ingest"))
    ing.drain(str(shard_dir), str(tmp_path / "ckptA"), timeout_secs=240)
    assert ing.frontier.counters()["total"] == 1

    # checkpoint lost + a new shard lands; the rebuilt stream renumbers
    # batches from 0 — the old run also committed a batch 0
    (shard_dir / "cdx-001.txt").write_text(line("com,b)/2.jpg",
                                                "https://b.com/2.jpg"))
    ing2 = StreamingCdxIngest(spark, str(tmp_path / "ingest"))
    batches = ing2.drain(str(shard_dir), str(tmp_path / "ckptB"), timeout_secs=240)
    assert len(batches) == 2  # nothing skipped under the fresh checkpoint
    urls = {r["url"] for r in ing2.frontier.pending().collect()}
    assert urls == {"https://a.com/1.jpg", "https://b.com/2.jpg"}


def test_streaming_curate_verdicts_and_replay(spark, tmp_path):
    """Gate-stack micro-batches over frozen dims: parity with the batch
    curation stages on identical docs; batch-id replay is a no-op."""
    import json

    from crawlee_spark.streaming import StreamingCurate

    good = ("the data of a crawl must be that clean and it should have "
            "tokens with plain words " * 3)
    ref_rows = [(i, (good + f" extra{i}") if i % 3 else "short junk")
                for i in range(30)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")

    doc_dir = tmp_path / "docs"
    doc_dir.mkdir()
    (doc_dir / "a.json").write_text("\n".join(json.dumps(d) for d in [
        {"doc_id": 100, "text": good + " streamed one"},
        {"doc_id": 101, "text": "tiny"},                      # gopher reject
    ]))
    (doc_dir / "b.json").write_text("\n".join(json.dumps(d) for d in [
        {"doc_id": 102, "text": good + " streamed two"},
    ]))

    sc_ = StreamingCurate(spark, str(tmp_path / "cur"), ref)
    batches = sc_.drain(str(doc_dir), str(tmp_path / "ckpt"), timeout_secs=240)
    assert [b["batch_id"] for b in batches] == [0, 1]

    dec = {r["doc_id"]: (r["reject_stage"], r["kept"], r["batch_id"])
           for r in sc_.decisions.read().collect()}
    assert set(dec) == {100, 101, 102}
    assert dec[101][0] == "gopher" and dec[101][1] is False
    # batch-shape verdicts agree with the streamed decisions row-for-row
    all_docs = spark.createDataFrame(
        [(100, good + " streamed one"), (101, "tiny"),
         (102, good + " streamed two")], "doc_id long, text string")
    batch_v = {r["doc_id"]: (r["reject_stage"], r["kept"])
               for r in sc_.verdicts(all_docs).collect()}
    for d, (stage, kept, _b) in dec.items():
        assert batch_v[d] == (stage, kept)

    # replaying a stamped batch id appends nothing
    before = sc_.decisions.read().count()
    sc_._process_batch(all_docs.limit(1), 0)
    assert sc_.decisions.read().count() == before
