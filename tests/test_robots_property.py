"""Property-based parity for the RFC 9309 matcher: the Spark path
(rules_dim broadcast + higher-order longest-match fold, operators/robots.py
::filter_allowed) must agree with the pure-Python matcher
(compile_rules/is_allowed_py — the simulator's spec) on random rule sets:
regex metacharacters in patterns (escaping differences between Java and
Python regex engines are the risk), mid-pattern '$', wildcard runs,
allow/disallow ties, UA-group selection, and delay-only rows."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlee_spark.operators.robots import (
    compile_rules,
    is_allowed_py,
)

_HOSTS = ["a.com", "b.com"]

_PATTERN = st.text(
    alphabet="/ab1*.$?()[]{}^+|\\-_%", max_size=8
)

_RULE = st.builds(
    lambda host, ua, allow, pat, delay_only: {
        "host": host,
        "user_agent": ua,
        "rule": None if delay_only else ("allow" if allow else "disallow"),
        "path_pattern": None if delay_only else pat,
        "crawl_delay": 2.0 if delay_only else None,
    },
    st.sampled_from(_HOSTS),
    st.sampled_from(["*", "spark-bot", "other-bot"]),
    st.booleans(),
    _PATTERN,
    st.booleans(),
)

_PATH = st.builds(
    lambda segs: "/" + "/".join(segs),
    st.lists(st.text(alphabet="ab1.x", min_size=0, max_size=4), max_size=3),
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(_RULE, min_size=0, max_size=12),
    st.lists(st.tuples(st.sampled_from(_HOSTS), _PATH), min_size=1, max_size=30),
)
def test_robots_matcher_spark_equals_py(spark, rules, probes):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )

    from crawlee_spark.operators.robots import filter_allowed

    schema = StructType([
        StructField("host", StringType()),
        StructField("user_agent", StringType()),
        StructField("rule", StringType()),
        StructField("path_pattern", StringType()),
        StructField("crawl_delay", DoubleType()),
    ])
    robots = spark.createDataFrame(
        [(r["host"], r["user_agent"], r["rule"], r["path_pattern"],
          r["crawl_delay"]) for r in rules],
        schema,
    )
    cands = spark.createDataFrame(
        [(f"http://{h}{p}", h, i) for i, (h, p) in enumerate(probes)],
        "url string, host string, i long",
    )
    allowed, disallowed = filter_allowed(cands, robots, user_agent="spark-bot")
    got_allowed = {r["i"] for r in allowed.select("i").collect()}
    got_dis = {r["i"] for r in disallowed.select("i").collect()}
    assert got_allowed | got_dis == set(range(len(probes)))
    assert not (got_allowed & got_dis)

    compiled = compile_rules(rules, user_agent="spark-bot")
    for i, (h, p) in enumerate(probes):
        want = is_allowed_py(compiled, h, p)
        assert (i in got_allowed) == want, (h, p, rules)
