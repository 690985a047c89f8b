"""Crawler-trap detection + adaptive backoff (operators/traps.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.operators.politeness import PolitenessConfig, select_fetch_set
from crawlee_spark.operators.traps import adaptive_delays, detect_traps, url_template


def test_url_template_pins(spark):
    rows = spark.createDataFrame(
        [
            ("/s/deadbeef0badcafe/p/42",),
            ("/a/2024/05/12",),
            ("/about",),
            ("/u/12345678/x",),  # 8+ digits: hex-shaped, collapses to X
        ],
        "p string",
    ).select(url_template(F.col("p")).alias("t"))
    assert [r["t"] for r in rows.collect()] == [
        "/s/X/p/N", "/a/N/N/N", "/about", "/u/X/x",
    ]


def _urls(spark, host, n, template_of, content_of):
    rows = [(host, template_of(i), content_of(i)) for i in range(n)]
    return spark.createDataFrame(rows, "host string, path string, content_key string")


def test_detect_traps_requires_both_conditions(spark):
    # trap: 30 urls, 1 template, 3 distinct contents
    trap = _urls(spark, "trap.com", 30,
                 lambda i: f"/s/{i:016x}aaaaaaaa/p/{i}",
                 lambda i: f"c{i % 3}")
    # archive: same URL explosion, but every page is distinct content
    news = _urls(spark, "news.com", 30,
                 lambda i: f"/article/{i}",
                 lambda i: f"n{i}")
    # small: trap-shaped but below min_urls
    small = _urls(spark, "small.com", 5,
                  lambda i: f"/s/{i:016x}bbbbbbbb/p/{i}",
                  lambda i: "same")
    got = {r["host"]: r for r in
           detect_traps(trap.union(news).union(small)).collect()}
    assert got["trap.com"]["is_trap"] is True
    assert got["trap.com"]["n_templates"] == 1
    assert got["trap.com"]["n_content"] == 3
    assert got["news.com"]["is_trap"] is False  # content diversity saves it
    assert got["small.com"]["is_trap"] is False  # min_urls evidence bar


def _log(spark, host, total, blocked, code=429):
    rows = [(host, code if i < blocked else 200) for i in range(total)]
    return spark.createDataFrame(rows, "host string, status_code int")


def test_adaptive_delay_tiers_and_boundaries(spark):
    log = (
        _log(spark, "a.com", 10, 5)        # 50% -> 8x
        .union(_log(spark, "b.com", 10, 2))  # 20% boundary -> 4x
        .union(_log(spark, "c.com", 20, 1, code=403))  # 5% boundary -> 2x
        .union(_log(spark, "d.com", 100, 4))  # 4% -> no row
        .union(_log(spark, "e.com", 10, 0))   # clean -> no row
    )
    got = {r["host"]: r["crawl_delay"]
           for r in adaptive_delays(log, base_delay_secs=1.5).collect()}
    assert got == {"a.com": 12.0, "b.com": 6.0, "c.com": 3.0}


def test_adaptive_delays_compose_with_select_fetch_set(spark):
    # the dim plugs straight into the politeness selection: the backed-off
    # host serializes (one row this step), the clean host keeps its budget
    log = _log(spark, "hot.com", 10, 5)
    delays = adaptive_delays(log, base_delay_secs=2.0)  # hot.com -> 16s
    pending = spark.createDataFrame(
        [
            (f"https://{h}/p/{k}", h, 0, i * 7 + 1, (1 << 32) + k, 0)
            for i, (h, k) in enumerate(
                [(h, k) for h in ("hot.com", "cool.com") for k in range(3)]
            )
        ],
        "url string, host string, bucket int, url_hash long, order_no long, depth int",
    )
    cfg = PolitenessConfig(max_per_host_per_step=3, step_secs=1.0)
    got = select_fetch_set(pending, 1, cfg, host_delays=delays).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r["url"])
    assert len(by_host["hot.com"]) == 1     # crawl_delay serializes
    assert len(by_host["cool.com"]) == 3    # no dim row, full budget
