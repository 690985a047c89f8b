"""errorHandler / failedRequestHandler UDF surface
(``basic-crawler.ts:151-167``): the error handler may rewrite ``user_data``
on retried requests before they re-enter the frontier; the failed-request
handler's output lands in the dead-letter table. Neither affects crawl
ordering (parity-neutral), so these are pinned by direct engine assertions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlee_spark import datagen
from crawlee_spark.engine import CrawlConfig, CrawlEngine, FailureModelConf


@pytest.fixture(scope="module")
def corpus(spark):
    rows = list(datagen.gen_corpus_rows(40, 4, seed=11, with_bytes=False))
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows],
        "url string, html string",
    )
    seeds = datagen.gen_seed_rows(40, 4, seed=11, n_seeds=4)
    seeds_df = spark.createDataFrame(
        seeds, "url string, forefront boolean, depth int, label string"
    )
    return corpus_df, seeds_df


def test_error_and_failed_handlers(spark, tmp_path, corpus):
    corpus_df, seeds_df = corpus
    seen_retry_errors: list[str] = []

    def on_error(df):
        # tag every retried request; tags must survive into the frontier row
        prior = F.map_filter(
            F.coalesce(F.col("user_data"),
                       F.create_map().cast("map<string,string>")),
            lambda k, _: k != "last_error",  # second retry overwrites the tag
        )
        return df.withColumn(
            "user_data",
            F.map_concat(prior,
                         F.create_map(F.lit("last_error"), F.col("error"))),
        )

    def on_failed(df):
        return df.select("step", "url", "error", "retry_count")

    cfg = CrawlConfig(
        num_buckets=4,
        failures=FailureModelConf(fail_mod=3, fail_attempts=1, dead_mod=7),
        max_retries=2,
        error_handler=on_error,
        failed_request_handler=on_failed,
    )
    eng = CrawlEngine(spark, str(tmp_path / "crawl"), cfg)
    eng.add_seeds(seeds_df)
    totals = eng.run(corpus_df)
    assert totals["retried"] > 0 and totals["failed"] > 0

    # errorHandler tags persisted into the frontier rows of retried requests
    tagged = (
        eng.frontier.read()
        .filter(F.col("retry_count") > 0)
        .select("user_data", "error")
        .collect()
    )
    assert tagged, "failure model must produce retried rows"
    # every retried row carries the tag, and it matches the row's last error
    # (404 links and failure-model rows both retry)
    assert all(
        r["user_data"] and r["user_data"].get("last_error") == r["error"]
        for r in tagged
    )

    # failedRequestHandler output == the engine's dead-letter set (rows
    # whose error is set and that never eventually fetched ok — retried-
    # then-handled rows KEEP their last error, so subtract the ok set)
    dead_letter = {r["url"] for r in eng.failed_requests.read().collect()}
    ok_urls = {
        r["url"]
        for r in eng.fetch_log.read()
        .filter(F.col("status") == "ok").select("url").collect()
    }
    frontier_dead = {
        r["url"]
        for r in eng.frontier.read()
        .filter(F.col("error").isNotNull()
                & (F.col("error") != "robots-disallowed"))
        .collect()
    } - ok_urls
    assert dead_letter == frontier_dead and len(dead_letter) == totals["failed"]

    # handlers off -> no dead-letter table, same crawl otherwise
    eng2 = CrawlEngine(
        spark, str(tmp_path / "plain"),
        CrawlConfig(num_buckets=4,
                    failures=FailureModelConf(fail_mod=3, fail_attempts=1,
                                              dead_mod=7),
                    max_retries=2),
    )
    eng2.add_seeds(seeds_df)
    eng2.run(corpus_df)
    assert not eng2.failed_requests.exists()
    assert eng2.crawl_order() == eng.crawl_order()


def test_is_finished_function_stops_crawl(spark, tmp_path, corpus):
    """isFinishedFunction (autoscaled_pool.ts:20-37): a True return ends the
    crawl before max_steps / frontier exhaustion."""
    corpus_df, seeds_df = corpus
    eng = CrawlEngine(
        spark, str(tmp_path / "fin"),
        CrawlConfig(num_buckets=8,
                    is_finished_function=lambda e: e.step >= 2),
    )
    eng.add_seeds(seeds_df)
    totals = eng.run(corpus_df)
    assert totals["steps"] == 2
    # without the hook the same crawl runs further
    eng2 = CrawlEngine(spark, str(tmp_path / "fin2"), CrawlConfig(num_buckets=8))
    eng2.add_seeds(seeds_df)
    assert eng2.run(corpus_df)["steps"] > 2


def test_create_session_function_shapes_pool(spark, tmp_path, corpus):
    """createSessionFunction (session_pool.ts:50): the hook's initial pool
    rows are what the tracker evolves from."""
    corpus_df, seeds_df = corpus

    def factory(pool):
        # custom identity: sessions start with a prior error_score of 0.5
        return pool.withColumn("error_score", F.lit(0.5))

    eng = CrawlEngine(
        spark, str(tmp_path / "sess"),
        CrawlConfig(num_buckets=8, track_sessions=True,
                    create_session_function=factory,
                    is_finished_function=lambda e: e.step >= 1),
    )
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    state = eng.session_state()
    assert state, "pool should be tracked"
    # every UNUSED session must still carry the factory's prior 0.5 (the
    # default pool starts at 0.0), proving the hook's rows seeded the tracker
    unused = [s for s in state if s["usage_count"] == 0]
    assert unused and all(s["error_score"] == 0.5 for s in unused)


def test_statistics_calculate_and_persist(spark, tmp_path):
    """Statistics.calculate analog (statistics.ts:222-266) on the step
    clock: finished/failed splits, final-retry histogram, attempt
    averages, and the SDK_CRAWLER_STATISTICS persistState contract."""
    import os

    from crawlee_spark import datagen
    from crawlee_spark.engine import CrawlConfig, CrawlEngine, FailureModelConf
    from crawlee_spark.store.dataset import KeyValueStore

    rows = list(datagen.gen_corpus_rows(40, 4, seed=17, with_bytes=False))
    seeds = datagen.gen_seed_rows(40, 4, seed=17, n_seeds=4)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows],
        "url string, html string")
    seeds_df = spark.createDataFrame(
        seeds, "url string, forefront boolean, depth int, label string")
    eng = CrawlEngine(
        spark, str(tmp_path / "stats"),
        CrawlConfig(num_buckets=4,
                    failures=FailureModelConf(fail_mod=5, fail_attempts=2,
                                              dead_mod=17)))
    eng.add_seeds(seeds_df)
    totals = eng.run(corpus_df)
    st = eng.statistics(persist=True)

    assert st["requests_finished"] == totals["handled"]
    assert st["requests_failed"] == totals["failed"]
    assert st["requests_total"] == totals["handled"] + totals["failed"]
    assert sum(st["retry_histogram"]) == st["requests_total"]
    # the failure model retries transients twice -> histogram has tail mass
    assert len(st["retry_histogram"]) >= 2 and st["retry_histogram"][0] > 0
    assert st["request_avg_finished_attempts"] >= 1.0
    assert st["crawler_runtime_steps"] == eng.step
    # persistState contract: round-trips through the workdir KVS
    kvs = KeyValueStore(os.path.join(str(tmp_path / "stats"),
                                     "key_value_store"))
    assert kvs.get_value("SDK_CRAWLER_STATISTICS_0") == st


def test_send_request_context_helper(spark, tmp_path, corpus):
    """sendRequest analog (engine.send_request; basic-crawler.ts:1206-1224):
    a router handler fires corpus-keyed side requests; they resolve through
    the same canonical-hash join as navigation, land in the fetch log with
    order_no NULL (skip_navigation-style non-navigation exchanges), do NOT
    enqueue anything, and leave crawl ordering bit-identical to the same
    crawl without the handler."""
    from crawlee_spark.operators.router import Router

    corpus_df, seeds_df = corpus

    # baseline crawl: no router
    base = CrawlEngine(spark, str(tmp_path / "base"), CrawlConfig(num_buckets=4))
    base.add_seeds(seeds_df)
    base.run(corpus_df)
    base_order = base.crawl_order()
    base_seen = base.url_seen()

    engine_box = {}
    router = Router()
    responses = []

    def default(df):
        # mid-handler side request: re-fetch each handled page's URL plus
        # one URL that is NOT in the corpus (404 path)
        eng = engine_box["eng"]
        reqs = df.select("url").unionByName(
            df.sparkSession.createDataFrame(
                [("https://nowhere.invalid/missing",)], "url string"))
        got = eng.send_request(reqs)
        responses.append(got.collect())
        return df.select("url")

    router.add_default_handler(default)

    eng = CrawlEngine(spark, str(tmp_path / "sr"),
                      CrawlConfig(num_buckets=4, router=router))
    engine_box["eng"] = eng
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)

    # 1. parity-neutral: ordering and seen set unchanged by the helper
    assert eng.crawl_order() == base_order
    assert eng.url_seen() == base_seen

    # 2. responses resolved through the corpus join: every handled url got
    # its html back, the out-of-corpus url got the 404 path
    assert responses
    flat = [r for batch in responses for r in batch]
    miss = [r for r in flat if r["url"] == "https://nowhere.invalid/missing"]
    assert miss and all(r["status"] == "404-not-found" and r["html"] is None
                        and r["status_code"] == 0 for r in miss)
    hits = [r for r in flat if r["url"] != "https://nowhere.invalid/missing"]
    assert hits and all(r["status"] == "ok" and r["html"] is not None
                        for r in hits)

    # 3. logged as non-navigation exchanges: order_no NULL rows in the
    # fetch log, one per side request, never enqueued to the frontier
    log = eng.fetch_log.read()
    side = log.filter(F.col("order_no").isNull())
    nav = log.filter(F.col("order_no").isNotNull())
    assert side.count() == len(flat)
    assert nav.filter(F.col("status") == "ok").count() == len(base_order)
    fr = eng.frontier.read().select("unique_key").collect()
    assert all("nowhere.invalid" not in r["unique_key"] for r in fr)
