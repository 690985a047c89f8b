"""enqueueLinks pipeline: glob compilation, strategy scoping, include/exclude
(reference matrix ``test/core/enqueue_links/enqueue_links.test.ts:89-996``),
plus Spark-vs-pure-Python parity on the synthetic corpus."""

from __future__ import annotations

from crawlee_spark import datagen
from crawlee_spark.operators.enqueue_links import (
    STRATEGY_ALL,
    STRATEGY_SAME_DOMAIN,
    STRATEGY_SAME_HOSTNAME,
    STRATEGY_SAME_ORIGIN,
    EnqueueLinksOptions,
    enqueue_links,
    enqueue_links_py,
    glob_to_regex,
)

import re

import pyspark.sql.functions as F

PAGE = "https://a.example.com/p/1"
HTML = (
    '<a href="/p/2">same host</a>'
    '<a href="https://b.example.com/p/3">same domain</a>'
    '<a href="http://a.example.com/p/4">same host http</a>'
    '<a href="https://other.net/p/5">foreign</a>'
    '<a href="mailto:x@y.z">drop</a>'
)


def _urls(opt):
    return [r["url"] for r in enqueue_links_py(PAGE, HTML, 0, opt)]


def test_glob_to_regex():
    rx = glob_to_regex("https://example.com/**")
    assert re.match(rx, "https://example.com/a/b/c")
    rx2 = glob_to_regex("https://example.com/*")
    assert re.match(rx2, "https://example.com/a")
    assert not re.match(rx2, "https://example.com/a/b")
    rx3 = glob_to_regex("https://?.example.com/p/*")
    assert re.match(rx3, "https://a.example.com/p/9")


def test_strategy_same_hostname_default():
    # default strategy ignores scheme (http{s,} widening, enqueue_links.ts:445-447)
    assert _urls(EnqueueLinksOptions()) == [
        "https://a.example.com/p/2",
        "http://a.example.com/p/4",
    ]


def test_strategy_same_domain():
    assert _urls(EnqueueLinksOptions(strategy=STRATEGY_SAME_DOMAIN)) == [
        "https://a.example.com/p/2",
        "https://b.example.com/p/3",
        "http://a.example.com/p/4",
    ]


def test_strategy_same_origin():
    assert _urls(EnqueueLinksOptions(strategy=STRATEGY_SAME_ORIGIN)) == [
        "https://a.example.com/p/2",
    ]


def test_strategy_all():
    assert _urls(EnqueueLinksOptions(strategy=STRATEGY_ALL)) == [
        "https://a.example.com/p/2",
        "https://b.example.com/p/3",
        "http://a.example.com/p/4",
        "https://other.net/p/5",
    ]


def test_user_globs_override_default_strategy():
    # explicit patterns replace the default same-hostname scoping
    opt = EnqueueLinksOptions(globs=["**other.net/**"])
    assert _urls(opt) == ["https://other.net/p/5"]


def test_exclude_before_include():
    opt = EnqueueLinksOptions(
        strategy=STRATEGY_ALL, exclude_globs=["**example.com/**"]
    )
    assert _urls(opt) == ["https://other.net/p/5"]


def test_limit():
    assert len(_urls(EnqueueLinksOptions(strategy=STRATEGY_ALL, limit=2))) == 2


def test_explicit_strategy_ands_with_patterns():
    # reference (enqueue_links.ts:366-376): an EXPLICITLY-set strategy —
    # including same-hostname — ANDs with user include patterns; only the
    # implicit default is replaced by patterns (:314-316)
    opt = EnqueueLinksOptions(globs=["**example.com/**", "**other.net/**"],
                              strategy=STRATEGY_SAME_HOSTNAME)
    assert _urls(opt) == [
        "https://a.example.com/p/2",
        "http://a.example.com/p/4",
    ]
    # unset strategy + patterns: no scope filter at all
    opt2 = EnqueueLinksOptions(globs=["**other.net/**"])
    assert _urls(opt2) == ["https://other.net/p/5"]


def test_limit_is_per_page_in_document_order(spark):
    # two pages, each with 3 links; limit=2 must keep the FIRST 2 links of
    # EACH page (document order), not 2 arbitrary rows globally
    html = lambda h: (
        f'<a href="https://{h}/l/1">1</a>'
        f'<a href="https://{h}/l/2">2</a>'
        f'<a href="https://{h}/l/3">3</a>'
    )
    fetched = spark.createDataFrame(
        [{"url": f"https://{h}/", "html": html(h), "depth": 0} for h in ("x.com", "y.com")],
        "url string, html string, depth int",
    )
    opt = EnqueueLinksOptions(limit=2)
    got = sorted(r["url"] for r in enqueue_links(fetched, opt).collect())
    assert got == ["https://x.com/l/1", "https://x.com/l/2",
                   "https://y.com/l/1", "https://y.com/l/2"]
    # py mirror agrees per page
    for h in ("x.com", "y.com"):
        assert [o["url"] for o in enqueue_links_py(f"https://{h}/", html(h), 0, opt)] == [
            f"https://{h}/l/1", f"https://{h}/l/2"
        ]


def test_spark_py_parity(spark):
    """The Spark pipeline and the simulator mirror must produce identical
    (url, depth) multisets for every strategy over the synthetic corpus."""
    rows = list(datagen.gen_corpus_rows(40, 4, seed=42, with_bytes=False))
    fetched = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"], "depth": 1} for r in rows],
        "url string, html string, depth int",
    )
    for strategy in (STRATEGY_SAME_HOSTNAME, STRATEGY_SAME_DOMAIN,
                     STRATEGY_SAME_ORIGIN, STRATEGY_ALL):
        opt = EnqueueLinksOptions(strategy=strategy)
        got = sorted(
            (r["url"], r["depth"]) for r in enqueue_links(fetched, opt).collect()
        )
        want = sorted(
            (o["url"], o["depth"])
            for r in rows
            for o in enqueue_links_py(r["url"], r["html"], 1, opt)
        )
        assert got == want, f"strategy={strategy}"


def test_spark_patterns_parity(spark):
    rows = list(datagen.gen_corpus_rows(30, 4, seed=7, with_bytes=False))
    fetched = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"], "depth": 0} for r in rows],
        "url string, html string, depth int",
    )
    opt = EnqueueLinksOptions(
        globs=["**example.com/**"], exclude_regexps=[r"/p/1\d$"], forefront=True,
        label="lbl",
    )
    got = sorted(
        (r["url"], r["forefront"], r["label"]) for r in enqueue_links(fetched, opt).collect()
    )
    want = sorted(
        (o["url"], o["forefront"], o["label"])
        for r in rows
        for o in enqueue_links_py(r["url"], r["html"], 0, opt)
    )
    assert got == want


def test_transform_runs_before_patterns_and_strategy(spark):
    # reference order (enqueue_links.ts:362-375): transformRequestFunction
    # rewrites candidates BEFORE excludes/includes/strategy, so filters
    # always test the FINAL url
    html = ('<a href="https://x.com/keep">k</a>'
            '<a href="https://x.com/rewrite-me">r</a>')
    fetched = spark.createDataFrame(
        [{"url": "https://x.com/", "html": html, "depth": 0}],
        "url string, html string, depth int",
    )

    def to_mirror(df):
        return df.withColumn(
            "url",
            F.regexp_replace("url", "x\\.com/rewrite-me", "mirror.org/moved"),
        )

    # exclude targets the REWRITTEN form: it must fire
    opt = EnqueueLinksOptions(transform=to_mirror,
                              exclude_regexps=[r"mirror\.org"])
    got = sorted(r["url"] for r in enqueue_links(fetched, opt).collect())
    assert got == ["https://x.com/keep"]

    # default same-hostname strategy scopes on the rewritten url too
    opt2 = EnqueueLinksOptions(transform=to_mirror)
    got2 = sorted(r["url"] for r in enqueue_links(fetched, opt2).collect())
    assert got2 == ["https://x.com/keep"]  # mirror.org fails same-hostname
