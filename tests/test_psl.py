"""Full-PSL registrable-domain: python matcher pins + Spark join-path parity.

Reference consumer: same-domain strategy via tldts getDomain
(``packages/core/src/enqueue_links/enqueue_links.ts:177-209``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.functions.psl import (
    attach_registrable_domain,
    registrable_domain_psl_py,
    rules,
)

CASES = {
    # plain 2-label
    "example.com": "example.com",
    "a.example.com": "example.com",
    "deep.a.example.com": "example.com",
    # multi-label ICANN suffixes
    "a.co.uk": "a.co.uk",
    "b.a.co.uk": "a.co.uk",
    "x.pref.aichi.jp": "pref.aichi.jp",  # 'aichi.jp' is the exact rule
    "x.takahama.aichi.jp": "x.takahama.aichi.jp",  # 3-label rule beats 'aichi.jp'
    "a.x.nagoya.jp": "a.x.nagoya.jp",          # wildcard *.nagoya.jp
    "sub.city.nagoya.jp": "city.nagoya.jp",    # exception !city.nagoya.jp
    # PRIVATE section: github.io tenants are distinct registrable domains
    "a.github.io": "a.github.io",
    "deep.a.github.io": "a.github.io",
    "b.github.io": "b.github.io",
    # wildcard rule *.ck
    "shop.x.ck": "shop.x.ck",
    "deep.shop.x.ck": "shop.x.ck",
    # exception rule !www.ck
    "www.ck": "www.ck",
    "sub.www.ck": "www.ck",
    # host IS a public suffix -> itself
    "com": "com",
    "co.uk": "co.uk",
    "github.io": "github.io",
}


def test_full_list_loaded():
    r = rules()
    assert len(r.exact) > 9000
    assert "github.io" in r.exact          # private section included
    assert "ck" in r.wildcard_parents
    assert "www.ck" in r.exceptions


def test_python_matcher_pins():
    for host, want in CASES.items():
        assert registrable_domain_psl_py(host) == want, host


def test_github_io_tenants_distinct():
    assert registrable_domain_psl_py("a.github.io") != registrable_domain_psl_py("b.github.io")


def test_spark_join_path_matches_python(spark):
    hosts = list(CASES) + ["x.amazonaws.com", "a.blogspot.com", "b.noexist-tld-zz"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["rd"]
        for r in attach_registrable_domain(df, "host", "rd").collect()
    }
    for h in hosts:
        assert got[h] == registrable_domain_psl_py(h), h


def test_spark_null_host(spark):
    df = spark.createDataFrame([(None,), ("a.example.com",)], "host string")
    rows = attach_registrable_domain(df, "host", "rd").collect()
    by = {r["host"]: r["rd"] for r in rows}
    assert by[None] is None
    assert by["a.example.com"] == "example.com"


def test_no_shuffle_in_plan(spark):
    df = spark.createDataFrame([("a.github.io",)], "host string")
    plan = attach_registrable_domain(df, "host", "rd")._jdf.queryExecution(
    ).executedPlan().toString()
    # all rule joins must be broadcast (map-side); any shuffle here would
    # re-partition the frontier-sized input on a dim join
    assert "BroadcastHashJoin" in plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
