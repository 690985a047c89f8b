"""THE correctness gate for the crawl engine: Spark engine == pure-Python
reference simulator on crawl order, URL-seen set, and dead letters, across
politeness / budget / failure / robots configurations (BASELINE.json: "must
reproduce the reference crawler's crawl ordering and final URL-seen set under
the same seed list and politeness budget")."""

from __future__ import annotations

import pytest

from crawlee_spark import datagen
from crawlee_spark.engine import CrawlConfig, CrawlEngine, FailureModelConf
from crawlee_spark.operators.politeness import PolitenessConfig
from crawlee_spark.simulator import FailureModel, SimConfig, simulate

N_PAGES, N_HOSTS, N_SEEDS = 60, 5, 5


@pytest.fixture(scope="module")
def corpus_fixture(spark):
    rows = list(datagen.gen_corpus_rows(N_PAGES, N_HOSTS, seed=42, with_bytes=False))
    corpus_py = {r["url"]: {"html": r["html"]} for r in rows}
    seeds_py = datagen.gen_seed_rows(N_PAGES, N_HOSTS, seed=42, n_seeds=N_SEEDS)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows], "url string, html string"
    )
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string"
    )
    return corpus_py, seeds_py, corpus_df, seeds_df


def _assert_parity(spark, tmp_path, corpus_fixture, cfg, sim_cfg, robots=False):
    corpus_py, seeds_py, corpus_df, seeds_df = corpus_fixture
    robots_rows = datagen.gen_robots_rows(N_HOSTS) if robots else None
    robots_df = datagen.robots_df(spark, N_HOSTS) if robots else None

    sim = simulate(corpus_py, seeds_py, sim_cfg, robots_rows=robots_rows)
    eng = CrawlEngine(spark, str(tmp_path / "crawl"), cfg)
    eng.add_seeds(seeds_df)
    eng.run(corpus_df, robots=robots_df)

    assert eng.crawl_order() == sim.crawl_order
    assert eng.url_seen() == sim.url_seen
    assert len(sim.crawl_order) > 0


def test_parity_default(spark, tmp_path, corpus_fixture):
    _assert_parity(spark, tmp_path, corpus_fixture,
                   CrawlConfig(num_buckets=8), SimConfig())


def test_parity_rate_budget(spark, tmp_path, corpus_fixture):
    p = PolitenessConfig(max_requests_per_minute=5, step_secs=60.0)
    _assert_parity(spark, tmp_path, corpus_fixture,
                   CrawlConfig(num_buckets=8, politeness=p), SimConfig(politeness=p))


def test_parity_failures(spark, tmp_path, corpus_fixture):
    _assert_parity(
        spark, tmp_path, corpus_fixture,
        CrawlConfig(num_buckets=8,
                    failures=FailureModelConf(fail_mod=7, fail_attempts=2, dead_mod=31)),
        SimConfig(failures=FailureModel(fail_mod=7, fail_attempts=2, dead_mod=31)),
    )


def test_parity_max_crawl(spark, tmp_path, corpus_fixture):
    p = PolitenessConfig(max_requests_per_crawl=20)
    _assert_parity(spark, tmp_path, corpus_fixture,
                   CrawlConfig(num_buckets=8, politeness=p), SimConfig(politeness=p))


def test_parity_robots(spark, tmp_path, corpus_fixture):
    _assert_parity(spark, tmp_path, corpus_fixture,
                   CrawlConfig(num_buckets=8), SimConfig(), robots=True)


def test_parity_with_bloom(spark, tmp_path, corpus_fixture):
    """Bloom prefilter must be a semantic no-op (exact anti-join backstop)."""
    _assert_parity(
        spark, tmp_path, corpus_fixture,
        CrawlConfig(num_buckets=8, use_bloom=True, bloom_expected_per_bucket=1000),
        SimConfig(),
    )


def test_parity_with_cuckoo(spark, tmp_path, corpus_fixture):
    """Cuckoo prefilter must be a semantic no-op too (same exact backstop)."""
    _assert_parity(
        spark, tmp_path, corpus_fixture,
        CrawlConfig(num_buckets=8, use_bloom=True, urlseen_kind="cuckoo"),
        SimConfig(),
    )


def test_sessions_tracking_parity_neutral(spark, tmp_path, corpus_fixture):
    """Session-pool tracking is observability state: crawl order and
    URL-seen must be identical to the untracked run, and the pool must
    record usage after the crawl."""
    corpus_py, seeds_py, corpus_df, seeds_df = corpus_fixture
    sim = simulate(corpus_py, seeds_py, SimConfig())
    eng = CrawlEngine(spark, str(tmp_path / "crawl"),
                      CrawlConfig(num_buckets=8, track_sessions=True,
                                  sessions_per_bucket=2))
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    assert eng.crawl_order() == sim.crawl_order
    assert eng.url_seen() == sim.url_seen
    state = eng.session_state()
    assert state and all(s["error_score"] >= 0 for s in state)
    assert sum(s["usage_count"] for s in state) > 0
    # resume restores the pool
    eng2 = CrawlEngine.resume(spark, str(tmp_path / "crawl"),
                              CrawlConfig(num_buckets=8, track_sessions=True,
                                          sessions_per_bucket=2))
    assert eng2.session_state() == state


def test_parity_blocked_and_salted(spark, tmp_path):
    """retryOnBlocked content heuristic + hot-host parse salting: blocked
    pages go retry→dead identically in engine and simulator; salting the
    stateless parse stage must not perturb ordering."""
    rows = list(datagen.gen_corpus_rows(N_PAGES, N_HOSTS, seed=42, with_bytes=False))
    for r in rows:
        i = int(r["image_id"].split("-")[1])
        if i % 11 == 0:  # plant bot-wall markers on a slice of pages
            r["html"] = r["html"].replace(
                "</body>", '<div class="cf-challenge-running"></div></body>'
            )
    corpus_py = {r["url"]: {"html": r["html"]} for r in rows}
    seeds_py = datagen.gen_seed_rows(N_PAGES, N_HOSTS, seed=42, n_seeds=N_SEEDS)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows], "url string, html string"
    )
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string"
    )

    sim = simulate(corpus_py, seeds_py, SimConfig(detect_blocked=True))
    eng = CrawlEngine(spark, str(tmp_path / "crawl"),
                      CrawlConfig(num_buckets=8, detect_blocked=True, parse_salt=4))
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)

    assert eng.crawl_order() == sim.crawl_order
    assert eng.url_seen() == sim.url_seen
    assert any(v == "session-blocked" for v in sim.dead.values())


def test_parity_domain_keyed_politeness(spark, tmp_path):
    """key_by_domain: the base sameDomainDelay serializes per PSL
    registrable domain (delayRequest via getDomain,
    basic-crawler.ts:1111-1138); subdomains of one domain share a delay
    window. Small corpus — the delay stretches the crawl over ~33
    supersteps."""
    rows = list(datagen.gen_corpus_rows(20, 4, seed=42, with_bytes=False))
    corpus_py = {r["url"]: {"html": r["html"]} for r in rows}
    seeds_py = datagen.gen_seed_rows(20, 4, seed=42, n_seeds=4)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows], "url string, html string"
    )
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string"
    )
    p = PolitenessConfig(same_domain_delay_secs=1.0, step_secs=1.0,
                         key_by_domain=True)
    sim = simulate(corpus_py, seeds_py, SimConfig(politeness=p))
    assert len({r["host"] for r in rows}) > len(
        {d for d in ("example.com", "other.net", "images.org", "crawl.co.uk")}
    ) - 2  # corpus really has multiple hosts per domain
    eng = CrawlEngine(spark, str(tmp_path / "crawl"),
                      CrawlConfig(num_buckets=8, politeness=p))
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    assert eng.crawl_order() == sim.crawl_order
    assert eng.url_seen() == sim.url_seen
    assert len(sim.crawl_order) > 0


def test_parity_redirects(spark, tmp_path):
    """loadedUrl model: redirect pages serve the target's html, relative
    hrefs resolve against the POST-redirect URL, and same-domain base
    resolution drops links when the redirect crossed registrable domains
    (enqueue_links.ts:394-430)."""
    from crawlee_spark.operators.enqueue_links import EnqueueLinksOptions

    rows = list(datagen.gen_corpus_rows(N_PAGES, N_HOSTS, seed=42,
                                        with_bytes=False, redirect_every=6))
    assert any(r["redirect_to"] for r in rows)
    corpus_py = {r["url"]: {"html": r["html"], "redirect_to": r["redirect_to"]}
                 for r in rows}
    seeds_py = datagen.gen_seed_rows(N_PAGES, N_HOSTS, seed=42, n_seeds=N_SEEDS)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"], "redirect_to": r["redirect_to"]}
         for r in rows],
        "url string, html string, redirect_to string",
    )
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string"
    )
    for strategy in ("same-domain", "same-hostname"):
        eo = EnqueueLinksOptions(strategy=strategy)
        sim = simulate(corpus_py, seeds_py, SimConfig(enqueue=eo))
        eng = CrawlEngine(spark, str(tmp_path / f"crawl_{strategy}"),
                          CrawlConfig(num_buckets=8, enqueue=eo))
        eng.add_seeds(seeds_df)
        eng.run(corpus_df)
        assert eng.crawl_order() == sim.crawl_order, strategy
        assert eng.url_seen() == sim.url_seen, strategy
    # fetch log records post-redirect loaded_url
    log = eng.fetch_log.read()
    redirected = log.filter("loaded_url <> url and status = 'ok'")
    assert redirected.count() > 0


def test_parity_extended_unique_key(spark, tmp_path, corpus_fixture):
    """POST seeds with distinct payloads dedup separately under
    useExtendedUniqueKey (request.ts:361-384) — end-to-end, not just the
    standalone expression."""
    corpus_py, seeds_py, corpus_df, _ = corpus_fixture
    url0 = seeds_py[0]["url"]
    seeds2 = [dict(s) for s in seeds_py] + [
        {"url": url0, "forefront": False, "depth": 0, "label": None,
         "method": "POST", "payload": b"body-A"},
        {"url": url0, "forefront": False, "depth": 0, "label": None,
         "method": "POST", "payload": b"body-B"},
    ]
    seeds_df2 = spark.createDataFrame(
        [(s["url"], s["forefront"], s["depth"], s.get("label"),
          s.get("method", "GET"), s.get("payload")) for s in seeds2],
        "url string, forefront boolean, depth int, label string, "
        "method string, payload binary",
    )
    sim = simulate(corpus_py, seeds2, SimConfig(use_extended_unique_key=True))
    eng = CrawlEngine(spark, str(tmp_path / "crawl"),
                      CrawlConfig(num_buckets=8, use_extended_unique_key=True))
    eng.add_seeds(seeds_df2)
    eng.run(corpus_df)
    assert eng.crawl_order() == sim.crawl_order
    assert eng.url_seen() == sim.url_seen
    # all three variants of url0 exist as separate frontier entries
    posts = [k for k in sim.url_seen if k.startswith("POST(")]
    assert len(posts) == 2
    assert any(k.startswith("GET():") for k in sim.url_seen)


def test_parity_status_classes(spark, tmp_path, corpus_fixture):
    """HTTP status table: 5xx retried on the retry budget, 429 retried on
    the ROTATION budget (rotation-exhaustion death), 406 no-retry dead, 404
    passes to the handler (http-crawler.ts:643-667, 789-808;
    basic-crawler.ts:1435-1452)."""
    from crawlee_spark.engine import StatusModelConf

    sm = StatusModelConf(status_mods={503: 13, 429: 11, 406: 17, 404: 7},
                         max_session_rotations=2)
    corpus_py, seeds_py, corpus_df, seeds_df = corpus_fixture
    sim = simulate(corpus_py, seeds_py, SimConfig(status=sm))
    eng = CrawlEngine(spark, str(tmp_path / "crawl"),
                      CrawlConfig(num_buckets=8, status=sm))
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    assert eng.crawl_order() == sim.crawl_order
    assert eng.url_seen() == sim.url_seen
    errs = set(sim.dead.values())
    # the corpus is big enough that every class occurs
    assert "http-5xx" in errs or "session-blocked" in errs \
        or "unsupported-content-type" in errs
    # 404 pages are HANDLED (they ran the handler), never dead
    log = eng.fetch_log.read()
    ok404 = log.filter("status = 'ok' and status_code = 404")
    assert ok404.count() > 0


def test_parity_navigation_hooks(spark, tmp_path, corpus_fixture):
    """pre/post-navigation hooks (http-crawler.ts:96-120, 299-300): a pre
    hook sets skipNavigation on a hash-derived subset (request.ts — handled
    without a fetch, no link extraction), a post hook appends a link to every
    real navigation's HTML (extraction must see the rewrite; the appended
    target is outside the corpus so it 404s to dead)."""
    from pyspark.sql import functions as F

    hooked = '<a href="/hooked-by-post-nav">x</a>'

    def eng_pre(df):
        return df.withColumn(
            "skip_navigation", F.pmod(F.col("url_hash"), F.lit(5)) == 0)

    def eng_post(df):
        return df.withColumn(
            "_html",
            F.when(F.col("_html").isNotNull() & ~F.col("skip_navigation"),
                   F.concat(F.col("_html"), F.lit(hooked)))
            .otherwise(F.col("_html")))

    sim_cfg = SimConfig(
        pre_navigation_hooks=[lambda r: r.url_hash % 5 == 0],
        post_navigation_hooks=[lambda r, html, loaded: (html + hooked, loaded)],
    )
    cfg = CrawlConfig(num_buckets=8, pre_navigation_hooks=[eng_pre],
                      post_navigation_hooks=[eng_post])

    corpus_py, seeds_py, corpus_df, seeds_df = corpus_fixture
    sim = simulate(corpus_py, seeds_py, sim_cfg)
    eng = CrawlEngine(spark, str(tmp_path / "crawl"), cfg)
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    assert eng.crawl_order() == sim.crawl_order
    assert eng.url_seen() == sim.url_seen
    # the post hook's injected link entered the frontier and died as 404
    assert any("hooked-by-post-nav" in k for k in sim.url_seen)
    assert any("hooked-by-post-nav" in k and e == "404-not-found"
               for k, e in sim.dead.items())
    # at least one request actually skipped navigation (status ok, code 0,
    # never extracted): it appears in crawl_order yet contributed no links
    skipped = [k for (s, k) in sim.crawl_order
               if (__import__("crawlee_spark.functions.hashing",
                              fromlist=["xxhash64_str"]).xxhash64_str(k)) % 5 == 0]
    assert skipped


def test_parity_keep_fragment_fetches_fragmentless_resource(spark, tmp_path):
    """Fragments are dedup identity under keep_fragment=True but are NEVER
    sent to the server: a fragment-bearing request must fetch the
    fragment-less corpus page (RFC 3986 §3.5), in engine AND simulator."""
    corpus_py = {
        "https://a.test/page": {"html": "<html><body>plain page</body></html>"},
        "https://a.test/other": {"html": "<html><body>other</body></html>"},
    }
    seeds_py = [
        {"url": "https://a.test/page", "forefront": False, "depth": 0,
         "label": None},
        {"url": "https://a.test/page#section", "forefront": False, "depth": 0,
         "label": None},
        {"url": "https://a.test/other#x", "forefront": False, "depth": 0,
         "label": None},
    ]
    corpus_df = spark.createDataFrame(
        [{"url": u, "html": v["html"]} for u, v in corpus_py.items()],
        "url string, html string")
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string")

    sim = simulate(corpus_py, seeds_py, SimConfig(keep_fragment=True))
    eng = CrawlEngine(spark, str(tmp_path / "crawl"),
                      CrawlConfig(num_buckets=4, keep_fragment=True))
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)

    assert eng.crawl_order() == sim.crawl_order
    assert eng.url_seen() == sim.url_seen
    # all three dedup identities are distinct AND all three fetches hit
    assert len(sim.url_seen) == 3
    assert len([s for s in sim.crawl_order]) == 3
    statuses = {r["unique_key"]: r["status"]
                for r in eng.fetch_log.read().collect()}
    assert all(v == "ok" for v in statuses.values()), statuses
