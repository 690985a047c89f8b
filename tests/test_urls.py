"""Canonicalization pins + Spark/Python parity.

Reference pins:
- request.ts:400-401 documented example
- test/core/request_list.test.ts:48-67 fragment dedup
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.functions import urls
from crawlee_spark.functions.hashing import xxhash64_long, xxhash64_str

CASES = [
    # (input, expected canonical)
    ("HTTP://www.EXAMPLE.com/something/", "http://www.example.com/something"),  # request.ts:400-401
    ("https://example.com/1", "https://example.com/1"),
    ("https://example.com/1#same", "https://example.com/1"),  # request_list.test.ts:48-67
    ("https://example.com/1#other", "https://example.com/1"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    ("  https://example.com/x  ", "https://example.com/x"),
    ("https://EXAMPLE.com:443/x", "https://example.com/x"),
    ("http://example.com:80/x", "http://example.com/x"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com/x?b=2&a=1", "https://example.com/x?a=1&b=2"),
    ("https://example.com/x?b=2&a=1&utm_source=tw", "https://example.com/x?a=1&b=2"),
    ("https://example.com/x?UTM_campaign=z&a=1", "https://example.com/x?a=1"),
    ("https://example.com/x?", "https://example.com/x"),
    ("https://example.com/x?a=1&&b=2", "https://example.com/x?a=1&b=2"),
    ("https://user:pw@example.com/x", "https://example.com/x"),
    ("https://example.com/a/b/c///", "https://example.com/a/b/c"),
    ("not a url", None),
    ("mailto:foo@bar.com", None),
]


def test_canonicalize_python_cases():
    for raw, want in CASES:
        assert urls.canonicalize_py(raw) == want, raw


def test_canonicalize_spark_matches_python(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], ["url"])
    got = df.select(urls.canonicalize(F.col("url")).alias("c")).collect()
    for (raw, want), row in zip(CASES, got):
        assert row["c"] == want, raw


def test_keep_fragment():
    assert (
        urls.canonicalize_py("https://example.com/1#same", keep_fragment=True)
        == "https://example.com/1#same"
    )


def test_keep_fragment_spark(spark):
    df = spark.createDataFrame([("https://example.com/1#same",)], ["url"])
    row = df.select(urls.canonicalize(F.col("url"), keep_fragment=True).alias("c")).first()
    assert row["c"] == "https://example.com/1#same"


def test_unique_key_fallback_py():
    # normalization fails -> raw (trimmed) url is the key (request.ts:361-375)
    assert urls.unique_key_py(" weird:key ") == "weird:key"
    assert urls.unique_key_py("https://a.com/x", explicit="override") == "override"


def test_host_of_spark_parity(spark):
    cases = [
        "HTTPS://Sub.Example.CO.UK:8443/p?x=1",
        "http://a.com/x",
        "not a url at all",  # no scheme -> NULL (drive.py regression)
        "mailto:x@y.z",
        "https://user:pw@h.com/x",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["url"])
    got = df.select(urls.host_of(F.col("url")).alias("h")).collect()
    for c, row in zip(cases, got):
        assert row["h"] == urls.host_of_py(c), c


def test_host_and_domain():
    assert urls.host_of_py("HTTPS://Sub.Example.CO.UK:8443/p?x=1") == "sub.example.co.uk"
    assert urls.registrable_domain_py("sub.example.co.uk") == "example.co.uk"
    assert urls.registrable_domain_py("a.b.example.com") == "example.com"
    assert urls.registrable_domain_py("example.com") == "example.com"
    assert urls.registrable_domain_py("localhost") == "localhost"


def test_host_and_domain_spark_parity(spark):
    hosts = ["sub.example.co.uk", "a.b.example.com", "example.com", "localhost", "x.com.au"]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    got = df.select(urls.registrable_domain(F.col("host")).alias("d")).collect()
    for h, row in zip(hosts, got):
        assert row["d"] == urls.registrable_domain_py(h), h


def test_xxhash64_parity_with_spark(spark):
    keys = [c[1] for c in CASES if c[1]] + ["", "a", "crawlee", "x" * 100]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = df.select(F.xxhash64(F.col("k")).alias("h")).collect()
    for k, row in zip(keys, got):
        assert row["h"] == xxhash64_str(k), k


def test_xxhash64_long_parity_with_spark(spark):
    vals = [0, 1, -1, 42, 2**40, -(2**40), 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    got = df.select(F.xxhash64(F.col("v")).alias("h")).collect()
    for v, row in zip(vals, got):
        assert row["h"] == xxhash64_long(v), v


def test_resolve_href():
    assert urls.resolve_href_py("https://a.com/p/x", "b") == "https://a.com/p/b"
    assert urls.resolve_href_py("https://a.com/p/x", "/b") == "https://a.com/b"
    assert urls.resolve_href_py("https://a.com/p/x", "https://c.net/z") == "https://c.net/z"
    assert urls.resolve_href_py("https://a.com/p/x", "mailto:x@y.z") is None
    assert urls.resolve_href_py("https://a.com/p/x", "") is None
    assert urls.resolve_href_py("https://a.com/p/x", "#frag") == "https://a.com/p/x#frag"
