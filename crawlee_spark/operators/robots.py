"""robots.txt compliance (RFC 9309) as a frontier filter.

The reference snapshot (Crawlee 3.6.2) has NO robots implementation —
``RobotsFile`` arrived in 3.8 (SURVEY.md scope note). Semantics here come
from the public spec (RFC 9309) + Googlebot documented extensions:

- rules grouped per (host, user-agent); the most specific matching UA group
  applies, ``*`` as fallback (we model the already-selected group: the rules
  table carries a ``user_agent`` column and the engine picks its agent's
  group per host, else ``*``);
- path matching: byte-wise prefix with ``*`` wildcard and ``$`` end anchor;
- precedence: LONGEST pattern wins; tie -> allow wins (RFC 9309 §2.2.2);
- no matching group / no matching rule -> allowed;
- ``crawl-delay`` (de-facto extension) feeds the politeness operator
  (max(crawl_delay, sameDomainDelaySecs) per host).

Implementation: rules are typically few per host; the engine matches them
JVM-side by joining candidates to a (host -> rules array) broadcast-able dim
and evaluating longest-match with higher-order array functions — no Python
in the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# -- robots.txt parsing (RFC 9309 §2.1-2.2) ---------------------------------


def parse_robots_txt(host: str, text: str) -> list[dict]:
    """Parse a robots.txt body into rule rows for the rules table.

    RFC 9309 grammar: groups start with one or more ``User-agent`` lines;
    ``Allow``/``Disallow``/``Crawl-delay`` lines attach to the CURRENT
    group's agents; ``#`` starts a comment; unknown directives are ignored;
    an empty Disallow value means "allow all" (recorded as an allow-/ rule
    so longest-match semantics stay uniform). Line endings/case per spec
    (directives case-insensitive, patterns case-sensitive).
    """
    rows: list[dict] = []
    agents: list[str] = []
    group_open = False  # False once a rule line closed the UA block
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        directive, _, value = line.partition(":")
        directive = directive.strip().lower()
        value = value.strip()
        if directive == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            agents.append(value.lower())
        elif directive in ("allow", "disallow", "crawl-delay"):
            group_open = False
            if not agents:
                continue  # rule before any user-agent line: ignored
            for ua in agents:
                if directive == "crawl-delay":
                    try:
                        d = float(value)
                    except ValueError:
                        continue
                    # Delay-only row: rule/path are None so it can NEVER act
                    # as a path match rule. (A 'Disallow: /' + 'Crawl-delay:'
                    # pair must stay disallowed — an allow-/ row here would
                    # tie at length 1 and allow-wins would open the host.)
                    rows.append({"host": host, "user_agent": ua, "rule": None,
                                 "path_pattern": None, "crawl_delay": d})
                elif directive == "disallow" and value == "":
                    rows.append({"host": host, "user_agent": ua, "rule": "allow",
                                 "path_pattern": "/", "crawl_delay": None})
                else:
                    rows.append({"host": host, "user_agent": ua,
                                 "rule": "allow" if directive == "allow" else "disallow",
                                 "path_pattern": value, "crawl_delay": None})
    return rows


# -- pattern compilation ----------------------------------------------------


def pattern_to_regex_py(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored regex: ``*`` -> ``.*``, trailing
    ``$`` -> end anchor, everything else literal; match is prefix-based."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for c in body:
        if c == "*":
            out.append(".*")
        elif c in ".^$+{}()|[]\\?":
            out.append("\\" + c)
        else:
            out.append(c)
    return "^" + "".join(out) + ("$" if anchored else "")


def compile_rules(rules_rows: list[dict], user_agent: str = "*") -> dict[str, list[tuple[int, bool, re.Pattern]]]:
    """host -> [(pattern_len, is_allow, compiled)] for the effective UA group.

    Group selection per RFC 9309 §2.2.1: if any rule exists for the specific
    ``user_agent`` on a host, that group applies; otherwise the ``*`` group.
    """
    by_host_ua: dict[str, dict[str, list[dict]]] = {}
    for r in rules_rows:
        by_host_ua.setdefault(r["host"], {}).setdefault(r["user_agent"], []).append(r)
    out: dict[str, list[tuple[int, bool, re.Pattern]]] = {}
    for host, groups in by_host_ua.items():
        group = groups.get(user_agent) or groups.get("*") or []
        compiled = []
        for r in group:
            if r.get("rule") is None:  # delay-only row: not a match rule
                continue
            pat = r["path_pattern"] or ""
            compiled.append((len(pat), r["rule"] == "allow", re.compile(pattern_to_regex_py(pat))))
        out[host] = compiled
    return out


def is_allowed_py(rules: dict[str, list[tuple[int, bool, re.Pattern]]], host: str, path: str) -> bool:
    """Longest-match decision; tie -> allow; no rule -> allow (RFC 9309 §2.2.2)."""
    group = rules.get(host)
    if not group:
        return True
    best_len = -1
    best_allow = True
    for plen, is_allow, pat in group:
        if pat.match(path):
            if plen > best_len or (plen == best_len and is_allow and not best_allow):
                best_len, best_allow = plen, is_allow
    return best_allow


def crawl_delays_py(rules_rows: list[dict], user_agent: str = "*") -> dict[str, float]:
    """host -> effective crawl_delay (max over the applicable group)."""
    out: dict[str, float] = {}
    by_host_ua: dict[str, dict[str, list[dict]]] = {}
    for r in rules_rows:
        by_host_ua.setdefault(r["host"], {}).setdefault(r["user_agent"], []).append(r)
    for host, groups in by_host_ua.items():
        group = groups.get(user_agent) or groups.get("*") or []
        delays = [r["crawl_delay"] for r in group if r.get("crawl_delay") is not None]
        if delays:
            out[host] = max(delays)
    return out


def sitemap_urls_py(text: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body, in file order.

    Per sitemaps.org (and RFC 9309 §2.2.4 "other records"), Sitemap lines
    are group-INDEPENDENT: they apply regardless of surrounding User-agent
    blocks, so this parses the raw text, not the grouped rule rows. The
    value is an absolute URL; comments strip at the first ``#`` — the same
    rule ``parse_robots_txt`` applies (canonicalization strips fragments
    from the URL later anyway).

    Spark mirror: ``sources/sitemap.py::sitemaps_from_robots`` (one
    multiline regex, whole-stage codegen).
    """
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        directive, sep, value = line.partition(":")
        if sep and directive.strip().lower() == "sitemap":
            value = value.strip()
            if value:
                out.append(value)
    return out


# -- Spark-side filter ------------------------------------------------------


def rules_dim(robots: DataFrame, user_agent: str = "*") -> DataFrame:
    """Per-host effective rule group as an array column (broadcast-able dim).

    Output: host, rules: array<struct<plen:int, allow:boolean, rx:string>>.
    Group selection (specific UA else ``*``) is done set-based: rank groups
    per host with the specific agent preferred.
    """
    ua_rank = F.when(F.col("user_agent") == user_agent, 0).otherwise(
        F.when(F.col("user_agent") == "*", 1).otherwise(2)
    )
    ranked = robots.withColumn("_uarank", ua_rank).filter(F.col("_uarank") < 2)
    best = ranked.groupBy("host").agg(F.min("_uarank").alias("_best"))
    effective = ranked.join(best, "host").filter(F.col("_uarank") == F.col("_best"))
    # delay-only rows (rule IS NULL) participate in group selection above but
    # must never act as path match rules (mirrors compile_rules)
    effective = effective.filter(F.col("rule").isNotNull())

    # compile patterns driver-side? No — pattern_to_regex is a tiny string
    # transform; express it as SQL so the dim build stays distributed.
    anchored = F.col("path_pattern").endswith("$")
    body = F.when(anchored, F.expr("substring(path_pattern, 1, length(path_pattern)-1)")).otherwise(
        F.col("path_pattern")
    )
    # escape regex metachars, then expand \* back to .*
    escaped = F.regexp_replace(body, r"([.^$+{}()|\[\]\\?*])", r"\\$1")
    expanded = F.regexp_replace(escaped, r"\\\*", ".*")
    rx = F.concat(F.lit("^"), expanded, F.when(anchored, F.lit("$")).otherwise(F.lit("")))

    compiled = effective.select(
        "host",
        F.struct(
            F.length("path_pattern").alias("plen"),
            (F.col("rule") == "allow").alias("allow"),
            rx.alias("rx"),
        ).alias("r"),
    )
    return compiled.groupBy("host").agg(F.collect_list("r").alias("rules"))


def crawl_delays_dim(robots: DataFrame, user_agent: str = "*") -> DataFrame:
    """(host, crawl_delay) dim — distributed twin of ``crawl_delays_py``.

    Group selection per RFC 9309: the exact user-agent group when the host
    has ANY row for it (delay-bearing or not), else the ``*`` group; the
    effective delay is ``max()`` over the chosen group's Crawl-delay lines;
    hosts without one drop out. Stays a DataFrame end-to-end so the engine
    never collects per-host delay rows (at 10^6+ hosts the py dict would be
    driver-resident state); the py twin remains the simulator's spec.
    """
    grp = robots.filter(F.col("user_agent").isin([user_agent, "*"]))
    per_ua = grp.groupBy("host", "user_agent").agg(
        F.max("crawl_delay").alias("crawl_delay")
    )
    w = Window.partitionBy("host").orderBy(
        F.when(F.col("user_agent") == user_agent, 0).otherwise(1)
    )
    return (
        per_ua.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & F.col("crawl_delay").isNotNull())
        .select("host", F.col("crawl_delay").cast("double").alias("crawl_delay"))
    )


def filter_allowed(candidates: DataFrame, robots: DataFrame, user_agent: str = "*") -> DataFrame:
    """Split candidates into (allowed, disallowed) by RFC 9309 longest-match.

    Join is broadcast (rules dim is tiny relative to the frontier); the
    longest-match scan is a higher-order ``aggregate`` over the rules array —
    pure JVM, no UDF. Candidates need ``url`` and ``host`` columns.
    """
    dim = rules_dim(robots, user_agent)
    path_raw = F.regexp_replace(
        F.regexp_replace(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]*", ""),
        r"[#].*$",
        "",
    )
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)

    joined = candidates.join(F.broadcast(dim), on="host", how="left").withColumn("_path", path)
    # fold rules: track (best_len, best_allow); tie -> allow wins
    verdict = F.when(F.col("rules").isNull(), F.lit(True)).otherwise(
        F.aggregate(
            F.col("rules"),
            F.struct(F.lit(-1).alias("blen"), F.lit(True).alias("ballow")),
            lambda acc, r: F.when(
                F.regexp_like(F.col("_path"), r["rx"])
                & (
                    (r["plen"] > acc["blen"])
                    | ((r["plen"] == acc["blen"]) & r["allow"] & ~acc["ballow"])
                ),
                F.struct(r["plen"].alias("blen"), r["allow"].alias("ballow")),
            ).otherwise(acc),
            lambda acc: acc["ballow"],
        )
    )
    marked = joined.withColumn("_allowed", verdict).drop("rules", "_path")
    allowed = marked.filter(F.col("_allowed")).drop("_allowed")
    disallowed = marked.filter(~F.col("_allowed")).drop("_allowed")
    return allowed, disallowed
