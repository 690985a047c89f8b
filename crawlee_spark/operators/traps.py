"""Crawler-trap detection + block-rate-adaptive politeness backoff.

Two crawl-scheduling signals a production frontier layers on top of the
reference's static politeness (the reference has neither — it crawls
whatever enqueueLinks emits at a fixed per-host rate):

- ``detect_traps``: flag hosts whose URL space is exploding — unboundedly
  many distinct URLs that collapse to a handful of PATH TEMPLATES with
  little distinct content. Calendar pages, session-id links and
  faceted-search grids (the classic "spider trap", Heydon & Najork,
  Mercator, WWW'99) all look exactly like this: high URL-per-template
  ratio AND low content diversity. Both conditions are required — a news
  site serving ``/article/<N>`` also has one template, but every article
  is distinct content, so it never trips the content test. The output
  feeds the enqueue blocklist / ``domain_cap``.

- ``adaptive_delays``: per-host crawl-delay escalation from observed
  block rates (429/403 share of fetch attempts) — the multiplicative
  backoff real crawlers run on top of static ``sameDomainDelaySecs``.
  The output is a ``(host, crawl_delay)`` dim in exactly the shape
  ``politeness.select_fetch_set(host_delays=...)`` and the engine's
  robots crawl-delay dim use, so it composes with the existing superstep
  machinery unchanged: derive it from the fetch log between supersteps
  (or crawls) and pass it in.

Scale shape: each is ONE grouped aggregate over a log/frontier frame —
map-side combine, shuffle on host only. ``detect_traps`` uses three
exact count-distincts in one agg (an Expand of 3x before partial
aggregation — the standard plan; per-host group state stays scalar).
All decisions are integer arithmetic (rate thresholds as cross-multiplied
integer comparisons, never float division), so both operators are
hash-exact under the DuckDB oracles (plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hex runs FIRST (a digit-only run of >= 8 chars is still hex-shaped and
# must collapse the same way on both engines), then any remaining digits
_HEX_RUN = "[0-9a-f]{8,}"
_DIGIT_RUN = "[0-9]+"


def url_template(path: Column) -> Column:
    """Collapse a URL path to its template: long hex runs (session ids,
    content hashes) -> ``X``, digit runs (dates, pagination, ids) -> ``N``.
    ``/s/deadbeef0badcafe/p/42`` -> ``/s/X/p/N``."""
    return F.regexp_replace(
        F.regexp_replace(path, _HEX_RUN, "X"), _DIGIT_RUN, "N"
    )


def detect_traps(
    urls: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    content_col: str = "content_key",
    min_urls: int = 20,
    expand_ratio: int = 10,
    dup_ratio: int = 5,
) -> DataFrame:
    """Per-host trap statistics + verdict.

    A host is a trap when ALL of:
      - ``n_urls >= min_urls`` (small hosts never have enough evidence);
      - ``n_urls >= expand_ratio * n_templates`` (URL space explodes
        relative to its structural templates);
      - ``n_urls >= dup_ratio * n_content`` (the exploding URLs serve
        mostly repeated content).

    Output: (host, n_urls, n_templates, n_content, is_trap).
    """
    t = urls.select(
        F.col(host_col).alias("host"),
        F.col(path_col).alias("_p"),
        url_template(F.col(path_col)).alias("_tpl"),
        F.col(content_col).alias("_c"),
    )
    agg = t.groupBy("host").agg(
        F.count_distinct("_p").alias("n_urls"),
        F.count_distinct("_tpl").alias("n_templates"),
        F.count_distinct("_c").alias("n_content"),
    )
    n = F.col("n_urls")
    return agg.select(
        "host",
        "n_urls",
        "n_templates",
        "n_content",
        (
            (n >= F.lit(min_urls))
            & (n >= F.lit(expand_ratio) * F.col("n_templates"))
            & (n >= F.lit(dup_ratio) * F.col("n_content"))
        ).alias("is_trap"),
    )


def adaptive_delays(
    log: DataFrame,
    base_delay_secs: float = 1.0,
    blocked_codes: tuple[int, ...] = (429, 403),
    host_col: str = "host",
    status_col: str = "status_code",
) -> DataFrame:
    """(host, crawl_delay) dim from observed per-host block rates.

    Multiplier over ``base_delay_secs`` by the blocked share of attempts
    (cross-multiplied integers — no float rates):

      - ``5*blocked >= 2*total``  (>= 40%) -> 8x
      - ``5*blocked >= total``    (>= 20%) -> 4x
      - ``20*blocked >= total``   (>=  5%) -> 2x
      - below 5% -> no row (well-behaved hosts stay out of the dim, so
        the broadcast side stays O(misbehaving hosts), not O(hosts)).

    Drop-in for ``select_fetch_set(host_delays=...)`` / the engine's
    robots-delay dim (same columns, same semantics: the politeness
    operator turns crawl_delay seconds into steps via ``step_secs``).
    """
    blocked = F.when(F.col(status_col).isin(list(blocked_codes)), 1).otherwise(0)
    agg = log.select(F.col(host_col).alias("host"), blocked.alias("_b")).groupBy(
        "host"
    ).agg(F.count(F.lit(1)).alias("_t"), F.sum("_b").alias("_bl"))
    t, b = F.col("_t"), F.col("_bl")
    mult = (
        F.when(5 * b >= 2 * t, F.lit(8))
        .when(5 * b >= t, F.lit(4))
        .when(20 * b >= t, F.lit(2))
        .otherwise(F.lit(1))
    )
    return (
        agg.select("host", mult.alias("_m"))
        .filter(F.col("_m") > 1)
        .select(
            "host",
            (F.col("_m") * F.lit(float(base_delay_secs))).cast("double").alias(
                "crawl_delay"
            ),
        )
    )
