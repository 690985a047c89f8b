"""Anti-starvation selection boost (CrawlConfig.starvation_boost_steps):
under a 1-fetch-per-host politeness budget, a continuous forefront stream
starves normal-band rows forever (forefront always sorts first); with the
boost, rows pending longer than the threshold are lifted above the
forefront band — oldest first — at selection time only."""

from __future__ import annotations

from crawlee_spark.engine import CrawlConfig, CrawlEngine
from crawlee_spark.operators.politeness import PolitenessConfig


def _setup(spark, tmp_path, name, boost):
    # one host, same-domain delay 1 step => exactly 1 fetch per superstep
    # corpus pages carry no links, so enqueue_links is a natural no-op
    cfg = CrawlConfig(
        num_buckets=4,
        politeness=PolitenessConfig(same_domain_delay_secs=1.0, step_secs=1.0),
        starvation_boost_steps=boost,
    )
    eng = CrawlEngine(spark, str(tmp_path / name), cfg)
    seeds = spark.createDataFrame(
        [("https://h0.test/slow", False, 0, None)],
        "url string, forefront boolean, depth int, label string")
    eng.add_seeds(seeds)
    corpus_rows = [(f"https://h0.test/{p}", "<html><body>x</body></html>")
                   for p in ["slow"] + [f"ff{i}" for i in range(10)]]
    corpus = spark.createDataFrame(corpus_rows, "url string, html string")
    return eng, corpus


def _drive(spark, eng, corpus, steps):
    fetched_urls = []
    for i in range(steps):
        # a fresh FOREFRONT request arrives every superstep
        eng.add_seeds(spark.createDataFrame(
            [(f"https://h0.test/ff{i}", True, 0, None)],
            "url string, forefront boolean, depth int, label string"))
        eng.run_superstep(corpus)
    log = eng.fetch_log.read().filter("status = 'ok'") \
        .select("step", "url").collect()
    return {r["url"]: r["step"] for r in log}


def test_forefront_flood_starves_without_boost(spark, tmp_path):
    eng, corpus = _setup(spark, tmp_path, "nb", boost=None)
    got = _drive(spark, eng, corpus, steps=5)
    assert "https://h0.test/slow" not in got, got
    assert len(got) == 5  # one forefront fetch per superstep


def test_boost_lifts_starved_row_over_forefront(spark, tmp_path):
    eng, corpus = _setup(spark, tmp_path, "wb", boost=2)
    got = _drive(spark, eng, corpus, steps=5)
    # pending since step 0; age = step - enqueued_step > 2 first holds at
    # superstep 3 (supersteps are 1-based)
    assert got.get("https://h0.test/slow") == 3, got
    # budget still respected: exactly one fetch per superstep
    assert sorted(
        eng.fetch_log.read().filter("status='ok'")
        .groupBy("step").count().select("count").toPandas()["count"]
    ) == [1, 1, 1, 1, 1]


def test_boost_survives_domain_keyed_politeness(spark, tmp_path):
    """Regression (review r3 #1): with key_by_domain politeness the
    candidate frame is rebuilt with the PSL domain attached — the boost's
    order_no rewrite must survive that step."""
    from crawlee_spark.engine import CrawlConfig, CrawlEngine

    cfg = CrawlConfig(
        num_buckets=4,
        politeness=PolitenessConfig(same_domain_delay_secs=1.0,
                                    step_secs=1.0, key_by_domain=True),
        starvation_boost_steps=2,
    )
    eng = CrawlEngine(spark, str(tmp_path / "dom"), cfg)
    seeds = spark.createDataFrame(
        [("https://h0.test/slow", False, 0, None)],
        "url string, forefront boolean, depth int, label string")
    eng.add_seeds(seeds)
    corpus_rows = [(f"https://h0.test/{p}", "<html><body>x</body></html>")
                   for p in ["slow"] + [f"ff{i}" for i in range(10)]]
    corpus = spark.createDataFrame(corpus_rows, "url string, html string")
    got = _drive(spark, eng, corpus, steps=5)
    assert got.get("https://h0.test/slow") == 3, got
