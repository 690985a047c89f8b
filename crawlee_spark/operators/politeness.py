"""Politeness + budget: fetch-set selection for one superstep (SURVEY.md §2.6).

Reference semantics reproduced:

- ``sameDomainDelaySecs`` (``basic-crawler.ts:232-235, 1111-1138``): per
  registrable-domain spacing — a domain fetched at t is not eligible again
  until t + delay. In the BSP engine, logical time is the superstep counter;
  a delay of d seconds with superstep duration s maps to ``ceil(d / s)``
  supersteps. State: ``politeness(host, next_allowed_step)``.
- ``maxRequestsPerMinute`` (``autoscaled_pool.ts:126, 689-703``): sliding
  60x1s-bucket global budget -> per-superstep global cap
  ``max_per_step = maxPerMinute * step_secs / 60``.
- ``maxRequestsPerCrawl`` (``basic-crawler.ts:247-251``): stop dispatch once
  handled count reaches the cap; the final superstep batch is trimmed.
- per-host concurrency (AutoscaledPool substitute): ``max_per_host_per_step``
  rows per host per superstep — with a positive domain delay this is forced
  to 1 per delay window, mirroring the serialized per-domain execution of
  ``delayRequest``.

Selection is deterministic: rank by the canonical frontier order
(order_no, depth, url_hash) within each host partition, take per-host budget,
then take the global budget by the same total order.

Scale: per-host ranking is ``Window.partitionBy(host)`` — shuffles only the
*pending candidate* rows (already bucket-pruned), never the full frontier.
The global cap is a TakeOrdered (no single-partition window). Politeness
state is tiny (one row per active host) and broadcast into the selection.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlee_spark.operators.frontier import ORDER_COLS


@dataclass
class PolitenessConfig:
    same_domain_delay_secs: float = 0.0
    max_requests_per_minute: float | None = None
    max_requests_per_crawl: int | None = None
    max_per_host_per_step: int = 2**31 - 1
    step_secs: float = 1.0  # logical superstep duration
    # key the delay state by registrable domain (full PSL) instead of host —
    # the reference keys delayRequest by tldts getDomain
    # (``basic-crawler.ts:1111-1138``), so a.x.com and b.x.com share one
    # delay window; host keying is the cheaper default (no PSL join on the
    # pending set) and is what the round-1 engine shipped
    key_by_domain: bool = False

    def delay_steps(self, crawl_delay_secs: float | None = None) -> int:
        """Effective per-host spacing in supersteps (max of config and
        robots crawl-delay, per BASELINE.md politeness row)."""
        d = self.same_domain_delay_secs
        if crawl_delay_secs:
            d = max(d, crawl_delay_secs)
        return math.ceil(d / self.step_secs) if d > 0 else 0

    def host_budget(self, crawl_delay_secs: float | None = None) -> int:
        if self.delay_steps(crawl_delay_secs) > 0:
            return 1  # serialized per-domain execution under a delay
        return self.max_per_host_per_step

    def global_budget(self) -> int | None:
        if self.max_requests_per_minute is None:
            return None
        return max(1, int(self.max_requests_per_minute * self.step_secs / 60.0))


# registrable-domain politeness keys live in the same state table as host
# keys, namespaced by this prefix (':' cannot occur in a parsed host)
DOMAIN_KEY_PREFIX = "d:"


def _order_cols():
    return [F.col(c).asc() for c in ORDER_COLS]


def select_fetch_set(
    pending: DataFrame,
    step: int,
    cfg: PolitenessConfig,
    politeness_state: DataFrame | None = None,
    host_delays: DataFrame | None = None,
    handled_so_far: int = 0,
    domain_col: str | None = None,
) -> DataFrame:
    """The superstep's fetch set under politeness + budgets.

    ``pending``: frontier rows with order_no IS NOT NULL.
    ``politeness_state``: (host, next_allowed_step) or None — 'host' is the
    politeness KEY: a hostname, or (for the base same-domain delay under
    ``key_by_domain``) a registrable domain.
    ``host_delays``: (host, crawl_delay) from robots, or None — robots
    delays are always HOST-scoped (robots.txt is per host).
    ``domain_col``: when set (engine attaches the PSL registrable domain
    under this column), the base delay serializes per DOMAIN — delayRequest
    keys by tldts getDomain (``basic-crawler.ts:1111-1138``) — while robots
    crawl-delays keep serializing per host.
    Returns rows of ``pending`` (all columns) selected for this superstep.
    """
    c = pending
    # 1. eligibility by politeness state (host key; plus the domain key
    # when domain keying is on)
    if politeness_state is not None:
        ps = politeness_state.select("host", "next_allowed_step")
        c = c.join(F.broadcast(ps), on="host", how="left").filter(
            F.col("next_allowed_step").isNull() | (F.col("next_allowed_step") <= step)
        ).drop("next_allowed_step")
        if domain_col is not None:
            psd = politeness_state.select(
                F.col("host").alias("_dkey"), F.col("next_allowed_step").alias("_dnext")
            )
            dkey = F.concat(F.lit(DOMAIN_KEY_PREFIX), c[domain_col])
            c = c.join(F.broadcast(psd), dkey == F.col("_dkey"), "left").filter(
                F.col("_dnext").isNull() | (F.col("_dnext") <= step)
            ).drop("_dkey", "_dnext")

    # 2. per-host budget (robots crawl-delay forces budget 1; the base
    # delay forces it too ONLY under host keying)
    base_serializes_host = cfg.delay_steps() > 0 and domain_col is None
    if host_delays is not None:
        c = c.join(F.broadcast(host_delays.select("host", "crawl_delay")), on="host", how="left")
        budget_col = F.when(
            (F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0))
            | F.lit(base_serializes_host),
            F.lit(1),
        ).otherwise(F.lit(cfg.max_per_host_per_step))
    else:
        budget_col = F.lit(1 if base_serializes_host else cfg.max_per_host_per_step)
        c = c.withColumn("crawl_delay", F.lit(None).cast("double"))

    w = Window.partitionBy("host").orderBy(*_order_cols())
    c = (
        c.withColumn("_hrank", F.row_number().over(w))
        .filter(F.col("_hrank") <= budget_col)
        .drop("_hrank", "crawl_delay")
    )

    # 2b. domain serialization window (base delay under domain keying):
    # one request per registrable domain per delay window
    if domain_col is not None and cfg.delay_steps() > 0:
        wd = Window.partitionBy(domain_col).orderBy(*_order_cols())
        c = (
            c.withColumn("_drank", F.row_number().over(wd))
            .filter(F.col("_drank") <= 1)
            .drop("_drank")
        )

    # 3. global budgets: rate cap + remaining crawl cap, by canonical order
    caps = []
    g = cfg.global_budget()
    if g is not None:
        caps.append(g)
    if cfg.max_requests_per_crawl is not None:
        caps.append(max(0, cfg.max_requests_per_crawl - handled_so_far))
    if caps:
        k = min(caps)
        if k == 0:
            return c.filter(F.lit(False))
        # TakeOrderedAndProject — scalable global top-k, no 1-partition window
        c = c.orderBy(*_order_cols()).limit(k)
    return c


def advance_politeness(
    state: DataFrame | None,
    fetched_hosts: DataFrame,
    step: int,
    cfg: PolitenessConfig,
    spark=None,
    domain_col: str | None = None,
) -> DataFrame:
    """New politeness state after fetching ``fetched_hosts`` (host,
    crawl_delay?[, domain]) at ``step``: next_allowed_step = step + delay.

    Host keying (default): one row per host, delay = max(robots crawl_delay,
    base same-domain delay). Domain keying (``domain_col`` set): HOST rows
    carry only the robots crawl-delay, DOMAIN rows carry the base delay and
    are stored under ``DOMAIN_KEY_PREFIX + domain`` — hosts cannot contain
    ':' (ports are stripped at parse), so the namespaces never collide. An
    APEX host (host == its registrable domain, e.g. example.com) with a
    robots Crawl-delay would otherwise merge into the domain key via the
    groupBy-max and block every sibling subdomain for the robots delay,
    while the contract is that robots delays serialize per HOST only. Keys
    with zero delay carry no state row (keeps the dim tiny:
    O(keys-with-delay), broadcastable at any scale)."""
    fh = fetched_hosts
    if "crawl_delay" not in fh.columns:
        fh = fh.withColumn("crawl_delay", F.lit(None).cast("double"))
    base_delay = F.lit(float(cfg.same_domain_delay_secs))
    step_secs = F.lit(float(cfg.step_secs))
    if domain_col is None:
        eff = F.greatest(F.coalesce(F.col("crawl_delay"), F.lit(0.0)), base_delay)
        steps = F.ceil(eff / step_secs).cast("int")
        keyed = fh.select("host", steps.alias("_d"))
    else:
        host_steps = F.ceil(
            F.coalesce(F.col("crawl_delay"), F.lit(0.0)) / step_secs
        ).cast("int")
        dom_steps = F.ceil(base_delay / step_secs).cast("int")
        keyed = fh.select("host", host_steps.alias("_d")).unionByName(
            # a null domain (PSL lookup miss) must not persist a junk
            # null-key state row that gets rewritten every superstep
            fh.filter(F.col(domain_col).isNotNull()).select(
                F.concat(F.lit(DOMAIN_KEY_PREFIX), F.col(domain_col)).alias("host"),
                dom_steps.alias("_d"),
            )
        )
    new_rows = (
        keyed.filter(F.col("_d") > 0)
        .groupBy("host")
        .agg(F.max("_d").alias("_d"))
        .select("host", (F.lit(step) + F.col("_d")).alias("next_allowed_step"))
    )
    if state is None:
        return new_rows
    kept = state.join(new_rows.select("host"), on="host", how="left_anti").filter(
        F.col("next_allowed_step") > step  # expire stale rows
    )
    return kept.unionByName(new_rows)


# -- observability: the sliding 60 s rate window over a fetch log -----------


def _epoch_secs(fetch_log: DataFrame, ts_col: str):
    """Epoch-seconds column for a numeric OR timestamp(_ntz) ts column
    (TIMESTAMP_NTZ refuses a direct BIGINT cast)."""
    dtype = dict(fetch_log.dtypes).get(ts_col, "")
    if dtype.startswith("timestamp"):
        return F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    return F.col(ts_col).cast("long")


def requests_per_minute(fetch_log: DataFrame, ts_col: str = "ts",
                        window_secs: int = 60) -> DataFrame:
    """Sliding 60 s request-rate over a wall-clock fetch log
    (``autoscaled_pool.ts:689-703`` analog).

    Computed WITHOUT a global window (``Window.orderBy(ts)`` with no
    partitionBy shuffles every event into ONE task — the single-partition
    WindowExec anti-pattern): per-second counts -> each second's count
    contributes to the ``window_secs`` target seconds it covers (explode of
    a 60-element sequence over the much smaller per-second table) -> sum
    per target second -> hash-join back to events. Every exchange is
    partitioned by the second key; work scales with distinct seconds, not
    events, and the event-side join is a plain shuffle join.
    """
    ev = fetch_log.withColumn("_sec", _epoch_secs(fetch_log, ts_col))
    per_sec = ev.groupBy("_sec").agg(F.count("*").alias("_cnt"))
    contrib = per_sec.select(
        F.explode(
            F.sequence(F.col("_sec"), F.col("_sec") + F.lit(window_secs - 1))
        ).alias("_tsec"),
        "_cnt",
    )
    win = contrib.groupBy("_tsec").agg(F.sum("_cnt").alias("rpm"))
    return (
        ev.join(win, ev["_sec"] == win["_tsec"], "left")
        .drop("_tsec", "_sec")
    )


def requests_per_minute_blocked(fetch_log: DataFrame, ts_col: str = "ts",
                                window_secs: int = 60) -> DataFrame:
    """Sliding rate via per-block prefix sums + previous-block carry-in.

    The explode variant above shuffles ``window_secs ×`` the per-second
    table; this one shuffles it ~2× regardless of window size (the round-1
    review's suggested shape: bucket by coarse time, in-bucket prefix
    counts, carry-in from the previous bucket):

    - blocks of ``window_secs``; in-block inclusive prefix ``P`` via a
      window partitioned BY BLOCK (≤ window_secs rows per partition, never
      global) + per-block totals ``T``.
    - for a second ``t`` in block ``b``, the trailing window ``[t-W+1, t]``
      = in-block prefix ``P(t)`` + the previous block's suffix
      ``T(b-1) − P(last second ≤ t−W in b−1)``.
    - the sparse "last second ≤ t−W" lookup is an as-of resolved by
      unioning probe rows into the block frame and taking
      ``last(P, ignorenulls)`` over the same block window — probes sort
      after a real row at the same key so the prefix is inclusive.
    """
    W = window_secs
    ev = fetch_log.withColumn("_sec", _epoch_secs(fetch_log, ts_col))
    per_sec = ev.groupBy("_sec").agg(F.count("*").alias("_cnt"))
    blk_of = lambda c: F.floor(c / W).cast("long")  # noqa: E731
    wp = (
        Window.partitionBy("_blk").orderBy("_k", "_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    real = per_sec.select(
        blk_of(F.col("_sec")).alias("_blk"),
        F.col("_sec").alias("_k"),
        F.lit(0).alias("_probe"),
        F.col("_cnt"),
        F.lit(None).cast("long").alias("_t"),
    )
    probes = per_sec.select(
        blk_of(F.col("_sec") - W).alias("_blk"),
        (F.col("_sec") - W).alias("_k"),
        F.lit(1).alias("_probe"),
        F.lit(None).cast("long").alias("_cnt"),
        F.col("_sec").alias("_t"),
    )
    both = real.unionByName(probes).withColumn("_pre", F.sum("_cnt").over(wp))
    pref = both.filter(F.col("_probe") == 0).select(
        F.col("_k").alias("_sec"), "_blk", "_pre"
    )
    asof = both.filter(F.col("_probe") == 1).select(
        F.col("_t"), F.col("_blk").alias("_pblk"),
        F.coalesce(F.col("_pre"), F.lit(0)).alias("_pasof"),
    )
    tot = per_sec.groupBy(blk_of(F.col("_sec")).alias("_tblk")).agg(
        F.sum("_cnt").alias("_tot")
    )
    win = (
        pref.join(asof, pref["_sec"] == asof["_t"])
        .join(tot, F.col("_pblk") == F.col("_tblk"), "left")
        .select(
            F.col("_sec").alias("_tsec"),
            (F.col("_pre") + F.coalesce(F.col("_tot"), F.lit(0))
             - F.col("_pasof")).alias("rpm"),
        )
    )
    return (
        ev.join(win, ev["_sec"] == win["_tsec"], "left")
        .drop("_tsec", "_sec")
    )
