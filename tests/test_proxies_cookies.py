"""Proxy rotation/tiering (proxy_configuration.ts) and cookie merge/scoping
(cookie_utils.ts) semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlee_spark.functions.cookies import (
    Cookie,
    cookie_header,
    merge_cookies,
    parse_set_cookie,
)
from crawlee_spark.operators.proxies import ProxyConfiguration


def test_proxy_flat_rotation_spark_matches_py(spark):
    cfg = ProxyConfiguration(proxy_urls=[f"http://p{i}:8000" for i in range(3)])
    df = spark.createDataFrame([(i,) for i in range(10)], "k long")
    got = {r["k"]: r["p"] for r in df.select(
        "k", cfg.proxy_col(F.col("k")).alias("p")).collect()}
    for k in range(10):
        assert got[k] == cfg.new_url_py(k)
    # session-sticky: same key -> same proxy
    assert got[1] == got[4] == got[7]


def test_proxy_tiers_escalate_on_retry(spark):
    cfg = ProxyConfiguration(tiered_proxy_urls=[
        ["http://cheap:1"], ["http://datacenter:2"], ["http://residential:3"],
    ])
    df = spark.createDataFrame([(5, rc) for rc in range(5)], "k long, rc int")
    got = [r["p"] for r in df.select(
        cfg.proxy_col(F.col("k"), F.col("rc")).alias("p")).collect()]
    assert got == ["http://cheap:1", "http://datacenter:2",
                   "http://residential:3", "http://residential:3",
                   "http://residential:3"]
    assert cfg.new_url_py(5, 0) == "http://cheap:1"
    assert cfg.new_url_py(5, 9) == "http://residential:3"


def test_proxy_requires_urls():
    with pytest.raises(ValueError):
        ProxyConfiguration()


def test_engine_logs_proxy_and_stays_parity_neutral(spark, tmp_path):
    from crawlee_spark import datagen, simulator
    from crawlee_spark.engine import CrawlConfig, CrawlEngine

    rows = list(datagen.gen_corpus_rows(20, 4, seed=42, with_bytes=False))
    seeds = datagen.gen_seed_rows(20, 4, seed=42, n_seeds=4)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows], "url string, html string"
    )
    seeds_df = spark.createDataFrame(
        seeds, "url string, forefront boolean, depth int, label string"
    )
    cfg = CrawlConfig(num_buckets=4, proxies=ProxyConfiguration(
        proxy_urls=["http://p0:1", "http://p1:1"]))
    eng = CrawlEngine(spark, str(tmp_path / "c"), cfg)
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    sim = simulator.simulate({r["url"]: {"html": r["html"]} for r in rows},
                             seeds, simulator.SimConfig())
    assert eng.crawl_order() == sim.crawl_order  # proxy column is pure observability
    log = eng.fetch_log.read()
    assert log.filter("proxy_url is null").count() == 0
    assert set(r["proxy_url"] for r in log.select("proxy_url").distinct().collect()) \
        <= {"http://p0:1", "http://p1:1"}


def test_parse_set_cookie():
    c = parse_set_cookie("sid=abc123; Domain=.Example.COM; Path=/app; Secure",
                         default_domain="x.example.com")
    assert c == Cookie("sid", "abc123", "example.com", "/app", None, True)
    assert parse_set_cookie("=novalue") is None
    assert parse_set_cookie("garbage") is None
    c2 = parse_set_cookie("a=b", default_domain="h.com")
    assert c2.domain == "h.com" and c2.path == "/"


def test_merge_replaces_on_name_domain_path():
    jar = [Cookie("a", "1", "h.com"), Cookie("b", "2", "h.com")]
    merged = merge_cookies(jar, [Cookie("a", "NEW", "h.com"),
                                 Cookie("a", "other-domain", "g.com")])
    assert merged == [Cookie("a", "NEW", "h.com"), Cookie("b", "2", "h.com"),
                      Cookie("a", "other-domain", "g.com")]


def test_cookie_header_scoping():
    jar = [
        Cookie("a", "1", "example.com"),
        Cookie("sub", "2", "sub.example.com"),
        Cookie("p", "3", "example.com", "/app"),
        Cookie("sec", "4", "example.com", "/", None, True),
        Cookie("gone", "5", "example.com", "/", expires=10.0),
        Cookie("other", "6", "other.net"),
    ]
    # http page on a subdomain: parent-domain cookies match, secure dropped
    hdr = cookie_header(jar, "http://sub.example.com/app/x", now=100.0)
    assert hdr == "a=1; sub=2; p=3"
    # https root path: secure included, /app-scoped and subdomain-only not
    hdr2 = cookie_header(jar, "https://example.com/", now=100.0)
    assert hdr2 == "a=1; sec=4"
    # path prefix must break on a segment boundary
    assert "p=3" not in cookie_header(jar, "http://example.com/application", now=0)


def test_parse_set_cookie_expires_and_max_age_precedence():
    """RFC 6265 §5.3: a date-expired cookie must be droppable via Expires,
    and Max-Age wins over Expires when both appear (either order)."""
    c = parse_set_cookie(
        "sid=x; Domain=a.test; Expires=Thu, 01 Jan 1970 00:00:10 GMT",
        default_domain="a.test",
    )
    assert c.expires == 10.0
    # expired vs the caller clock -> excluded from the request header
    assert cookie_header([c], "http://a.test/", now=11.0) == ""
    assert cookie_header([c], "http://a.test/", now=9.0) == "sid=x"

    both = parse_set_cookie(
        "sid=x; Max-Age=100; Expires=Thu, 01 Jan 1970 00:00:10 GMT",
        default_domain="a.test", now=5.0,
    )
    assert both.expires == 105.0  # Max-Age + now, Expires ignored
    rev = parse_set_cookie(
        "sid=x; Expires=Thu, 01 Jan 1970 00:00:10 GMT; Max-Age=100",
        default_domain="a.test", now=5.0,
    )
    assert rev.expires == 105.0


def test_cookie_rfc6265_domain_scoping():
    # no Domain attribute -> host-only: exact origin only, never subdomains
    c = parse_set_cookie("sid=x", default_domain="shop.example.com")
    assert c.host_only and c.domain == "shop.example.com"
    jar = [c]
    assert cookie_header(jar, "http://shop.example.com/") == "sid=x"
    assert cookie_header(jar, "http://deep.shop.example.com/") == ""
    assert cookie_header(jar, "http://example.com/") == ""
    # Domain attribute: sent to the domain and its subdomains
    c2 = parse_set_cookie("t=1; Domain=example.com",
                          default_domain="shop.example.com")
    assert not c2.host_only
    assert cookie_header([c2], "http://deep.shop.example.com/") == "t=1"
    # public-suffix supercookie ignored (RFC 6265 section 5.3 step 5)
    assert parse_set_cookie("e=1; Domain=com",
                            default_domain="evil.example.com") is None
    assert parse_set_cookie("e=1; Domain=github.io",
                            default_domain="a.github.io") is None
    # cross-site Domain the origin doesn't match: ignored (step 6)
    assert parse_set_cookie("e=1; Domain=other.net",
                            default_domain="evil.example.com") is None
    # a no-origin jar (default_domain omitted) keeps the cookie but it can
    # never match a host
    c3 = parse_set_cookie("a=b")
    assert c3.host_only and c3.domain == ""
    assert cookie_header([c3], "http://example.com/") == ""


# -- header identity (got-scraping analog, functions/headers.py) ------------


def test_header_profile_cols_match_python_twin(spark):
    from crawlee_spark.functions.headers import (
        PROFILES,
        header_profile_cols,
        header_profile_py,
    )

    df = spark.createDataFrame([(k,) for k in range(25)], "k long")
    cols = header_profile_cols(F.col("k"))
    got = {r["k"]: r for r in df.select(
        "k", *[c.alias(n) for n, c in cols.items()]).collect()}
    for k in range(25):
        p = header_profile_py(k)
        assert got[k]["header_profile_id"] == k % len(PROFILES)
        assert got[k]["user_agent"] == p.user_agent
        assert got[k]["accept_language"] == p.accept_language
        assert got[k]["sec_ch_ua"] == p.sec_ch_ua
    # deterministic + session-sticky: same key, same fingerprint
    assert got[3]["user_agent"] == got[3 + len(PROFILES)]["user_agent"]
    # a rotation (key+1) always redraws the profile
    assert got[3]["user_agent"] != got[4]["user_agent"]


def test_engine_header_identity_sticky_on_retry_rotates_on_block(spark, tmp_path):
    """The fetch log's header identity must be FIXED across plain retries
    (same session key) and redrawn on session rotation (429 SessionError),
    while staying parity-neutral — the got-scraping per-session
    fingerprint contract (http-crawler.ts:560-600)."""
    from crawlee_spark import datagen, simulator
    from crawlee_spark.engine import (
        CrawlConfig,
        CrawlEngine,
        FailureModelConf,
        StatusModelConf,
    )
    from crawlee_spark.simulator import FailureModel, SimConfig, simulate

    rows = list(datagen.gen_corpus_rows(60, 4, seed=11, with_bytes=False))
    seeds = datagen.gen_seed_rows(60, 4, seed=11, n_seeds=4)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows],
        "url string, html string")
    seeds_df = spark.createDataFrame(
        seeds, "url string, forefront boolean, depth int, label string")
    sm = StatusModelConf(status_mods={429: 5}, max_session_rotations=3)
    fm = FailureModelConf(fail_mod=7, fail_attempts=2)
    eng = CrawlEngine(spark, str(tmp_path / "hdr"),
                      CrawlConfig(num_buckets=4, status=sm, failures=fm))
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    sim = simulate({r["url"]: {"html": r["html"]} for r in rows}, seeds,
                   SimConfig(status=sm, failures=FailureModel(
                       fail_mod=7, fail_attempts=2)))
    assert eng.crawl_order() == sim.crawl_order  # observability-neutral

    log = eng.fetch_log.read()
    assert log.filter("header_profile_id is null or user_agent is null") \
        .count() == 0
    # plain retries (fetch-failed rows): rotation_count stays 0 -> one
    # profile per url across all its attempts
    per_url = (
        log.filter("status = 'fetch-failed'")
        .groupBy("url_hash")
        .agg(F.countDistinct("header_profile_id").alias("n_prof"),
             F.count("*").alias("n_rows"))
    )
    multi = per_url.filter("n_rows >= 2")
    assert multi.count() > 0, "failure model should produce retries"
    assert multi.filter("n_prof != 1").count() == 0
    # session-blocked attempts: each rotation draws a NEW profile
    rot = (
        log.filter("status = 'session-blocked'")
        .groupBy("url_hash")
        .agg(F.countDistinct("header_profile_id").alias("n_prof"),
             F.count("*").alias("n_rows"))
        .filter("n_rows >= 2")
    )
    assert rot.count() > 0, "status model should produce rotations"
    assert rot.filter("n_prof != n_rows").count() == 0
