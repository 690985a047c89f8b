"""Property-based parity: the Spark canonicalizer must equal the pure-Python
mirror (simulator semantics) on ARBITRARY inputs, not just curated examples
— the engine/simulator bit-for-bit parity tests are only as strong as this
equivalence. Hypothesis composes adversarial URLs (degenerate schemes,
userinfo, default/odd ports, repeated slashes, utm params, duplicate query
tokens, fragments, whitespace padding) plus raw printable-ASCII noise;
each example is a BATCH evaluated in one Spark job (per-row jobs would be
two orders of magnitude slower)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlee_spark.functions import urls as U

_PAD = st.text(alphabet=" \t\n\r", max_size=3)

_STRUCTURED = st.builds(
    lambda pad1, scheme, user, host, port, path, slashes, q, frag, pad2: (
        f"{pad1}{scheme}{user}{host}{port}{path}{slashes}{q}{frag}{pad2}"
    ),
    _PAD,
    st.sampled_from(["http://", "https://", "HTTP://", "ftp://", "a+b-c://",
                     "1bad://", "", "http:/", "://"]),
    st.sampled_from(["", "user@", "u:pw@", "@"]),
    st.sampled_from(["Example.COM", "sub.Ex.co.uk", "x.com", "127.0.0.1",
                     "xn--bcher-kva.ch", ""]),
    st.sampled_from(["", ":80", ":443", ":8080", ":0443", ":", ":443x"]),
    st.sampled_from(["", "/", "/A/b", "/p%20q", "/a?x", "/:8080"]),
    st.sampled_from(["", "/", "//", "///"]),
    st.sampled_from(["", "?", "?b=2&a=1", "?utm_source=x&a=1", "?a=1&a=1",
                     "?&&a=1", "?UTM_x=1&z", "?a=%26"]),
    st.sampled_from(["", "#", "#frag", "#a#b"]),
    _PAD,
)

_NOISE = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)

_URL = st.one_of(_STRUCTURED, _NOISE)


@settings(max_examples=8, deadline=None)
@given(st.lists(_URL, min_size=1, max_size=80))
def test_canonicalize_spark_equals_py(spark, urls):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        U.canonicalize(F.col("url")).alias("c"),
        U.canonicalize(F.col("url"), keep_fragment=True).alias("cf"),
        U.unique_key(F.col("url")).alias("k"),
    ).collect()
    for u, row in zip(urls, got):
        assert row["c"] == U.canonicalize_py(u), repr(u)
        assert row["cf"] == U.canonicalize_py(u, keep_fragment=True), repr(u)
        assert row["k"] == U.unique_key_py(u), repr(u)
