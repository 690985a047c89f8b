"""Property-based parity for the SURT key transform: the Spark column
expression (sources/cdx.py::surt_key) must equal an INDEPENDENT pure-Python
derivation on arbitrary URL-ish inputs — the DuckDB oracle mirror is only
as strong as this equivalence. Each hypothesis example is a BATCH evaluated
in one Spark job (per-row jobs would be two orders of magnitude slower)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlee_spark.sources.cdx import surt_key

_HOST_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)")
_REST_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)")


def surt_py(url: str) -> str:
    """Python twin of the Spark/DuckDB surt expressions — same anchored
    patterns run through CPython's `re` (a third regex engine: catches
    Java/RE2/`re` behavior drift), same empty-match fallbacks as Spark's
    regexp_extract (no match -> ''). Non-default ports are kept
    pywb-style after the labels; 80/443 are stripped."""
    m = _HOST_RE.match(url)
    hostport = (m.group(1) if m else "").lower()
    pm = re.search(r":(\d+)$", hostport)
    port = pm.group(1) if pm else ""
    host = re.sub(r":\d+$", "", hostport)
    host = re.sub(r"^www\.", "", host)
    sfx = f":{port}" if port not in ("", "80", "443") else ""
    m = _REST_RE.match(url)
    rest = (m.group(1) if m else "").lower() or "/"
    return ",".join(reversed(host.split("."))) + sfx + ")" + rest


_URLISH = st.builds(
    lambda scheme, www, host, port, path, q, frag: (
        f"{scheme}{www}{host}{port}{path}{q}{frag}"
    ),
    st.sampled_from(["http://", "https://", "HTTPS://", "a+b-c://", "",
                     "1bad://", "http:/"]),
    st.sampled_from(["", "www.", "WWW.", "wwww.", "www", "www2."]),
    st.sampled_from(["Example.COM", "a.b.C.test", "x", "127.0.0.1",
                     "img-3.Cdn.net", ""]),
    st.sampled_from(["", ":80", ":8080", ":", ":8x"]),
    st.sampled_from(["", "/", "/A/b.JPG", "/p%20q", "//x"]),
    st.sampled_from(["", "?", "?B=2&a=1", "?q=WWW."]),
    st.sampled_from(["", "#", "#Frag/with?stuff"]),
)

_NOISE = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30
)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.one_of(_URLISH, _NOISE), min_size=1, max_size=60))
def test_surt_spark_equals_py(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(surt_key("url")).collect()]
    want = [surt_py(u) for u in urls]
    # a no-scheme input yields host='' on both sides (never NULL): the
    # Spark regexp_extract returns '' which still concats
    assert got == want
