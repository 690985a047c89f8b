"""Property-based parity for the enqueueLinks pipeline: the Spark filter
chain (operators/enqueue_links.py::enqueue_links — rlike patterns, strategy
scope joins, per-page limit window) must equal the pure-Python mirror
(enqueue_links_py — the simulator's spec) for random pages × random option
surfaces (globs with metacharacters, regexps, excludes, every strategy,
explicit-vs-default strategy composition, limits)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlee_spark.operators.enqueue_links import (
    EnqueueLinksOptions,
    enqueue_links,
    enqueue_links_py,
)

_HREFS = st.lists(
    st.sampled_from([
        "/a", "/a/", "/b?x=1", "p/rel", "../up", "#frag", "",
        "https://same.example.com/z", "https://other.example.com/z",
        "https://sub.same.example.com/w", "http://same.example.com:8080/q",
        "mailto:x@y.z", "javascript:void(0)", "HTTPS://SAME.example.com/C",
    ]),
    min_size=0, max_size=10,
)

_OPTS = st.builds(
    EnqueueLinksOptions,
    strategy=st.sampled_from([None, "all", "same-hostname", "same-domain",
                              "same-origin"]),
    globs=st.lists(st.sampled_from([
        "https://same.example.com/**", "**/z", "*/a", "https://*.example.com/**",
    ]), max_size=2),
    regexps=st.lists(st.sampled_from([r"/[ab]$", r"\?x=", r"example\.com"]),
                     max_size=2),
    exclude_globs=st.lists(st.sampled_from(["**/z", "*/b?x=1"]), max_size=1),
    limit=st.sampled_from([None, 1, 3]),
)


def _key(d):
    return (d["url"], d["depth"], d["forefront"], d["label"])


@settings(max_examples=8, deadline=None)
@given(_HREFS, _OPTS, st.booleans())
def test_enqueue_links_spark_equals_py(spark, hrefs, opts, redirected):
    page = "https://same.example.com/dir/page"
    loaded = "https://loaded.example.com/base/" if redirected else page
    html = "".join(f'<a href="{h}">x</a>' for h in hrefs)

    fetched = spark.createDataFrame(
        [(page, loaded, html, 0)], "url string, loaded_url string, html string, depth int"
    )
    got = sorted(
        (_key(r.asDict()) for r in enqueue_links(fetched, opts).collect())
    )
    want = sorted(
        _key(d) for d in enqueue_links_py(page, html, 0, opts, loaded_url=loaded)
    )
    assert got == want, (hrefs, opts, redirected)
