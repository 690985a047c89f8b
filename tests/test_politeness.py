"""Fetch-set selection: per-host budget, domain-delay serialization, global
rate budget, maxRequestsPerCrawl trimming (SURVEY.md §2.6 pins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.operators.politeness import (
    PolitenessConfig,
    advance_politeness,
    requests_per_minute,
    select_fetch_set,
)


def _pending(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, host string, bucket int, url_hash long, order_no long, depth int",
    )


def _rows(n_per_host, hosts):
    rows = []
    i = 0
    for h in hosts:
        for k in range(n_per_host):
            rows.append({
                "url": f"https://{h}/p/{k}", "host": h, "bucket": 0,
                "url_hash": i, "order_no": (1 << 32) + k, "depth": 0,
            })
            i += 1
    return rows


def test_per_host_budget_and_canonical_order(spark):
    pending = _pending(spark, _rows(5, ["a.com", "b.com"]))
    cfg = PolitenessConfig(max_per_host_per_step=2)
    got = select_fetch_set(pending, 1, cfg).collect()
    assert len(got) == 4
    per_host = {}
    for r in got:
        per_host.setdefault(r["host"], []).append(r["order_no"])
    # lowest order_no rows win within each host
    assert sorted(per_host["a.com"]) == [(1 << 32), (1 << 32) + 1]
    assert sorted(per_host["b.com"]) == [(1 << 32), (1 << 32) + 1]


def test_domain_delay_serializes_host(spark):
    pending = _pending(spark, _rows(5, ["a.com"]))
    cfg = PolitenessConfig(same_domain_delay_secs=2.0, step_secs=1.0)
    got = select_fetch_set(pending, 1, cfg).collect()
    assert len(got) == 1  # delay forces one per host per step


def test_politeness_state_blocks_host(spark):
    pending = _pending(spark, _rows(2, ["a.com", "b.com"]))
    state = spark.createDataFrame(
        [("a.com", 5)], "host string, next_allowed_step int"
    )
    cfg = PolitenessConfig()
    got = select_fetch_set(pending, 3, cfg, politeness_state=state).collect()
    assert {r["host"] for r in got} == {"b.com"}
    got5 = select_fetch_set(pending, 5, cfg, politeness_state=state).collect()
    assert {r["host"] for r in got5} == {"a.com", "b.com"}


def test_global_rate_budget(spark):
    pending = _pending(spark, _rows(10, ["a.com", "b.com"]))
    # maxRequestsPerMinute=2 at 60 s supersteps -> 2 per step, best order wins
    cfg = PolitenessConfig(max_requests_per_minute=2, step_secs=60.0)
    got = select_fetch_set(pending, 1, cfg).collect()
    assert len(got) == 2
    assert all(r["order_no"] == (1 << 32) for r in got)  # the two rank-1 rows


def test_rate_limit_pin_one_per_minute(spark):
    """Behavioral pin (test/e2e/autoscaling-max-tasks-per-minute): at
    maxTasksPerMinute=1, exactly one task per 60 s window."""
    pending = _pending(spark, _rows(3, ["a.com"]))
    cfg = PolitenessConfig(max_requests_per_minute=1, step_secs=60.0)
    got = select_fetch_set(pending, 1, cfg).collect()
    assert len(got) == 1


def test_max_requests_per_crawl_trims_final_batch(spark):
    pending = _pending(spark, _rows(10, ["a.com"]))
    cfg = PolitenessConfig(max_requests_per_crawl=7)
    got = select_fetch_set(pending, 1, cfg, handled_so_far=5).collect()
    assert len(got) == 2
    got0 = select_fetch_set(pending, 1, cfg, handled_so_far=7).collect()
    assert got0 == []


def test_advance_politeness_state(spark):
    fetched = spark.createDataFrame(
        [("a.com", None), ("b.com", 3.0)], "host string, crawl_delay double"
    )
    cfg = PolitenessConfig(same_domain_delay_secs=1.0, step_secs=1.0)
    state = advance_politeness(None, fetched, step=4, cfg=cfg)
    got = {r["host"]: r["next_allowed_step"] for r in state.collect()}
    # a.com: base delay 1 step -> 5; b.com: max(3s robots, 1s base)=3 steps -> 7
    assert got == {"a.com": 5, "b.com": 7}


def test_requests_per_minute_window(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    log = spark.createDataFrame(
        [(t0 + dt.timedelta(seconds=s),) for s in (0, 10, 50, 59, 61, 130)],
        "ts timestamp",
    )
    got = [r["rpm"] for r in requests_per_minute(log).orderBy("ts").collect()]
    # windows: [t-59, t] inclusive; at t=61 the window [2,61] holds 10/50/59/61
    assert got == [1, 2, 3, 4, 4, 1]


def test_requests_per_minute_blocked_matches_explode(spark):
    """Blocked prefix-sum variant == explode variant on a randomized log
    (several window sizes incl. W=1; spreads crossing many blocks)."""
    import random

    from crawlee_spark.operators.politeness import requests_per_minute_blocked

    random.seed(7)
    for n, spread, w in ((400, 300, 60), (400, 5000, 60), (200, 40, 7), (200, 500, 1)):
        rows = [(i, float(random.randint(0, spread))) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, ts double")
        a = {r["id"]: r["rpm"] for r in requests_per_minute(df, window_secs=w).collect()}
        b = {r["id"]: r["rpm"]
             for r in requests_per_minute_blocked(df, window_secs=w).collect()}
        assert a == b


def test_apex_host_robots_delay_does_not_stall_domain(spark):
    """Under key_by_domain, an APEX host's (host == registrable domain)
    robots Crawl-delay must serialize only that HOST — sibling subdomains of
    the same registrable domain stay eligible once the (short) base domain
    delay passes. Regression: host and domain politeness keys used to share
    one namespace, so the groupBy-max merged the 60-step robots delay into
    the domain key and stalled every sibling."""
    cfg = PolitenessConfig(same_domain_delay_secs=1.0, key_by_domain=True)
    fetched = spark.createDataFrame(
        [("example.com", 60.0, "example.com")],
        "host string, crawl_delay double, _domain string",
    )
    state = advance_politeness(None, fetched, step=1, cfg=cfg, domain_col="_domain")
    got = {r["host"]: r["next_allowed_step"] for r in state.collect()}
    # host key carries the robots delay; the d:-prefixed domain key only the
    # 1-step base delay
    assert got == {"example.com": 61, "d:example.com": 2}

    pend = _pending(spark, [
        {"url": "https://a.example.com/x", "host": "a.example.com",
         "bucket": 0, "url_hash": 1, "order_no": 1, "depth": 0},
        {"url": "https://example.com/y", "host": "example.com",
         "bucket": 0, "url_hash": 2, "order_no": 2, "depth": 0},
    ]).withColumn("_domain", F.lit("example.com"))
    picked = select_fetch_set(pend, step=2, cfg=cfg, politeness_state=state,
                              domain_col="_domain")
    hosts = {r["host"] for r in picked.collect()}
    # step 2: domain delay expired -> the subdomain is eligible; the apex
    # host is still serving its robots delay
    assert hosts == {"a.example.com"}
