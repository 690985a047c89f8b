"""RFC 9309 robots semantics: longest-match, allow-on-tie, UA group pick,
and Spark filter parity with the pure-Python matcher."""

from __future__ import annotations

from crawlee_spark.operators.robots import (
    compile_rules,
    crawl_delays_py,
    filter_allowed,
    is_allowed_py,
    pattern_to_regex_py,
)


def _rules(rows):
    return compile_rules(rows)


def test_longest_match_wins():
    rows = [
        {"host": "h", "user_agent": "*", "rule": "disallow", "path_pattern": "/p/1"},
        {"host": "h", "user_agent": "*", "rule": "allow", "path_pattern": "/p/12"},
    ]
    r = _rules(rows)
    assert not is_allowed_py(r, "h", "/p/1")
    assert not is_allowed_py(r, "h", "/p/10")
    assert is_allowed_py(r, "h", "/p/12")
    assert is_allowed_py(r, "h", "/p/123")  # longest match is the allow
    assert is_allowed_py(r, "h", "/q")      # no match -> allowed


def test_tie_allow_wins_and_wildcards():
    rows = [
        {"host": "h", "user_agent": "*", "rule": "disallow", "path_pattern": "/a*z"},
        {"host": "h", "user_agent": "*", "rule": "allow", "path_pattern": "/a*b"},
    ]
    r = _rules(rows)
    assert not is_allowed_py(r, "h", "/aXz")
    # /a...zb matches both patterns (same length 4) -> allow wins on tie
    assert is_allowed_py(r, "h", "/azb")


def test_end_anchor():
    rows = [{"host": "h", "user_agent": "*", "rule": "disallow", "path_pattern": "/x$"}]
    r = _rules(rows)
    assert not is_allowed_py(r, "h", "/x")
    assert is_allowed_py(r, "h", "/xy")
    assert pattern_to_regex_py("/x$") == "^/x$"


def test_ua_group_selection():
    rows = [
        {"host": "h", "user_agent": "*", "rule": "disallow", "path_pattern": "/"},
        {"host": "h", "user_agent": "mybot", "rule": "allow", "path_pattern": "/"},
    ]
    assert not is_allowed_py(compile_rules(rows, "otherbot"), "h", "/p")
    assert is_allowed_py(compile_rules(rows, "mybot"), "h", "/p")


def test_unknown_host_allowed():
    assert is_allowed_py(_rules([]), "nowhere", "/")


def test_crawl_delays():
    rows = [
        {"host": "h", "user_agent": "*", "rule": "allow", "path_pattern": "/", "crawl_delay": 2.0},
        {"host": "h", "user_agent": "*", "rule": "allow", "path_pattern": "/x", "crawl_delay": 5.0},
        {"host": "g", "user_agent": "*", "rule": "allow", "path_pattern": "/", "crawl_delay": None},
    ]
    assert crawl_delays_py(rows) == {"h": 5.0}


def test_parse_robots_txt():
    from crawlee_spark.operators.robots import parse_robots_txt

    text = """
# comment line
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2

User-agent: mybot
User-agent: otherbot
Disallow:

Unknown-directive: x
Disallow: /ignored-no-group-reopen
"""
    rows = parse_robots_txt("h.com", text)
    star = [r for r in rows if r["user_agent"] == "*"]
    assert {(r["rule"], r["path_pattern"]) for r in star} >= {
        ("disallow", "/private/"), ("allow", "/private/ok")
    }
    assert any(r["crawl_delay"] == 2.0 for r in star)
    # empty Disallow = allow-all for both listed agents
    for ua in ("mybot", "otherbot"):
        assert {"host": "h.com", "user_agent": ua, "rule": "allow",
                "path_pattern": "/", "crawl_delay": None} in rows
    # the orphan Disallow after the closed group attaches to mybot/otherbot
    # (group stays current until a new User-agent block), per RFC grouping
    compiled = compile_rules(rows)
    assert not is_allowed_py(compiled, "h.com", "/private/x")
    assert is_allowed_py(compiled, "h.com", "/private/ok")


def test_crawl_delay_is_not_a_match_rule():
    # Regression: 'Disallow: /' + 'Crawl-delay: 5' must stay fully
    # disallowed — the delay line is NOT an allow-/ rule that would tie at
    # length 1 and win under allow-on-tie.
    from crawlee_spark.operators.robots import parse_robots_txt

    rows = parse_robots_txt("h", "User-agent: *\nDisallow: /\nCrawl-delay: 5\n")
    compiled = compile_rules(rows)
    assert not is_allowed_py(compiled, "h", "/")
    assert not is_allowed_py(compiled, "h", "/anything")
    assert crawl_delays_py(rows) == {"h": 5.0}


def test_crawl_delay_not_match_rule_spark(spark):
    from crawlee_spark.operators.robots import parse_robots_txt

    rows = parse_robots_txt("h", "User-agent: *\nDisallow: /\nCrawl-delay: 5\n")
    robots = spark.createDataFrame(
        rows, "host string, user_agent string, rule string, path_pattern string, crawl_delay double"
    )
    cand = spark.createDataFrame([("https://h/x", "h")], "url string, host string")
    allowed, disallowed = filter_allowed(cand, robots)
    assert allowed.count() == 0
    assert disallowed.count() == 1


def test_parse_then_filter_end_to_end(spark):
    from crawlee_spark.operators.robots import parse_robots_txt

    rows = parse_robots_txt("a.com", "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n")
    robots = spark.createDataFrame(
        rows, "host string, user_agent string, rule string, path_pattern string, crawl_delay double"
    )
    cand = spark.createDataFrame(
        [("https://a.com/p/1", "a.com"), ("https://a.com/p/123", "a.com")],
        "url string, host string",
    )
    allowed, disallowed = filter_allowed(cand, robots)
    assert {r["url"] for r in allowed.collect()} == {"https://a.com/p/123"}
    assert {r["url"] for r in disallowed.collect()} == {"https://a.com/p/1"}


def test_spark_filter_parity(spark):
    rows = [
        {"host": "a.com", "user_agent": "*", "rule": "disallow", "path_pattern": "/p/1", "crawl_delay": None},
        {"host": "a.com", "user_agent": "*", "rule": "allow", "path_pattern": "/p/12", "crawl_delay": None},
        {"host": "b.com", "user_agent": "*", "rule": "disallow", "path_pattern": "/", "crawl_delay": None},
        {"host": "b.com", "user_agent": "mybot", "rule": "allow", "path_pattern": "/ok", "crawl_delay": None},
    ]
    robots = spark.createDataFrame(
        rows, "host string, user_agent string, rule string, path_pattern string, crawl_delay double"
    )
    urls = [
        "https://a.com/p/1", "https://a.com/p/10", "https://a.com/p/12",
        "https://a.com/p/123", "https://a.com/q", "https://b.com/ok",
        "https://b.com/no", "https://c.com/any", "https://a.com",
    ]
    cand = spark.createDataFrame(
        [{"url": u, "host": u.split("/")[2]} for u in urls], "url string, host string"
    )
    for ua in ("*", "mybot"):
        allowed, disallowed = filter_allowed(cand, robots, ua)
        got_allowed = {r["url"] for r in allowed.collect()}
        rules = compile_rules(rows, ua)
        import re as _re

        def path_of(u):
            m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]*", u)
            p = u[m.end():]
            return p or "/"

        want_allowed = {u for u in urls if is_allowed_py(rules, u.split("/")[2], path_of(u))}
        assert got_allowed == want_allowed, f"ua={ua}"
        assert {r["url"] for r in disallowed.collect()} == set(urls) - want_allowed


def test_crawl_delays_dim_matches_py(spark):
    """Distributed (host, crawl_delay) dim == crawl_delays_py on every group
    shape: max-over-group, exact-UA group shadowing '*' (even when the exact
    group carries NO delay line), delay-only rows, hosts with no delay."""
    from crawlee_spark.operators.robots import crawl_delays_dim, crawl_delays_py

    rows = [
        # h: two '*' delay lines -> max
        {"host": "h", "user_agent": "*", "rule": "allow", "path_pattern": "/", "crawl_delay": 2.0},
        {"host": "h", "user_agent": "*", "rule": "allow", "path_pattern": "/x", "crawl_delay": 5.0},
        # g: exact-UA group exists WITHOUT a delay; '*' has one -> exact
        # group wins selection, so NO delay for mybot (and 7.0 for others)
        {"host": "g", "user_agent": "mybot", "rule": "allow", "path_pattern": "/", "crawl_delay": None},
        {"host": "g", "user_agent": "*", "rule": "disallow", "path_pattern": "/p", "crawl_delay": 7.0},
        # k: delay-only row (rule None, per the crawl-delay-leak regression)
        {"host": "k", "user_agent": "mybot", "rule": None, "path_pattern": None, "crawl_delay": 3.0},
        # z: no delay anywhere
        {"host": "z", "user_agent": "*", "rule": "disallow", "path_pattern": "/q", "crawl_delay": None},
    ]
    schema = ("host string, user_agent string, rule string, "
              "path_pattern string, crawl_delay double")
    df = spark.createDataFrame(
        [(r["host"], r["user_agent"], r["rule"], r["path_pattern"], r["crawl_delay"])
         for r in rows], schema)
    for ua in ("mybot", "otherbot", "*"):
        expected = crawl_delays_py(rows, ua)
        got = {r["host"]: r["crawl_delay"]
               for r in crawl_delays_dim(df, ua).collect()}
        assert got == expected, ua
