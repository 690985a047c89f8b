"""Freshness-driven recrawl scheduling from capture history.

A crawler that revisits every URL equally wastes its politeness budget on
pages that never change. The classic policy (Cho & Garcia-Molina,
"Effective Page Refresh Policies for Web Crawlers", TODS 2003) estimates
each page's change rate from its observed capture history and prioritizes
revisits by expected staleness. Crawlee itself has no revisit scheduler
(it crawls a frontier once); this is a task-brief training-pipeline
addition (SURVEY.md §2.11) that feeds our frontier's priority column —
the output's ``priority`` maps onto ``Request.priority`` / forefront
semantics (reference `packages/core/src/request.ts:79-130`).

Scale shape: one hash exchange on url; per-group state is the capture
list, bounded by captures-per-URL (the index holds ~1-2 dozen captures
per URL per year), so the sorted-array fold is O(dozens) per group and
there is no per-URL sort shuffle beyond the group-by itself. Integer
outputs only (counts, day ages, products) — no float accumulation, so
results are partition-order independent and oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def change_history(
    caps: DataFrame,
    key: str = "url",
    ts: str = "ts",
    digest: str = "digest",
) -> DataFrame:
    """Per-URL change statistics from (key, ts, digest) capture rows.

    Captures may arrive in ANY order (index shards are merged from many
    crawls); the fold sorts the in-group capture list by timestamp first.
    A "change" is a digest differing from the previous capture's digest —
    reverts count as changes, matching how an index consumer sees it.

    Output: key, n_obs, n_changes, first_ts, last_ts (all exact)."""
    h = F.sort_array(F.collect_list(F.struct(F.col(ts).alias("t"),
                                             F.col(digest).alias("d"))))
    hist = caps.groupBy(key).agg(h.alias("h"))
    arr = F.col("h")
    changes = F.aggregate(
        F.transform(
            F.sequence(F.lit(2), F.size(arr)),
            lambda i: F.when(
                F.element_at(arr, i)["d"] != F.element_at(arr, i - 1)["d"],
                F.lit(1),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return hist.select(
        key,
        F.size(arr).alias("n_obs"),
        F.when(F.size(arr) > 1, changes).otherwise(F.lit(0)).alias("n_changes"),
        F.element_at(arr, 1)["t"].alias("first_ts"),
        F.element_at(arr, -1)["t"].alias("last_ts"),
    )


def recrawl_priority(history: DataFrame, now: str) -> DataFrame:
    """Staleness-weighted revisit priority: ``n_changes * age_days``.

    ``now`` is an explicit 'yyyyMMdd' literal (determinism: no wall
    clock). age_days counts from the LAST capture; a page observed to
    change often and not visited recently outranks both stable pages and
    recently-refreshed ones — the integer-arithmetic core of the Cho &
    Garcia-Molina frequency-weighted policy (their λ estimate is
    n_changes/(n_obs-1); we keep the numerator and age in integers and
    let the consumer divide, so the column is hash-exact)."""
    age = F.datediff(
        F.to_date(F.lit(now), "yyyyMMdd"),
        F.to_date(F.substring("last_ts", 1, 8), "yyyyMMdd"),
    )
    return history.select(
        "*",
        age.alias("age_days"),
        (F.col("n_changes") * age).alias("priority"),
    )


def conditional_fetch_plan(due: DataFrame, prior: DataFrame) -> DataFrame:
    """HTTP revalidation planning: split the due fetch set into full
    downloads vs conditional requests and budget the expected bytes.

    A recrawl that re-downloads every body wastes bandwidth on unchanged
    pages; HTTP conditional requests (If-None-Match / If-Modified-Since,
    RFC 9110 §13) cost ~a header exchange when the origin answers 304.
    Given the capture history's per-URL change statistics, the expected
    body bytes of a conditional fetch are
    ``est_bytes * n_changes / (n_obs - 1)`` — the observed change
    ratio as the 304 probability model (Cho & Garcia-Molina's estimator
    family; integer division keeps it engine-exact).

    Inputs: ``due(url, host, est_bytes)`` — this superstep's fetch set
    with a size estimate (prior content length or a default);
    ``prior(url, n_obs, n_changes)`` — `change_history` output for
    URLs captured before. URLs without history (or with a single capture,
    where no change ratio exists) are FULL fetches.

    Output, one row per host (the politeness/budget unit):

      n_full, n_cond       — fetch-mode counts
      bytes_naive          — everything fetched full
      bytes_expected       — full + conditional·change-ratio (integer div)
      saved_pct            — round(100·(naive−expected)/naive, 2)

    Plan: one url-keyed equi-join (the history dim is Heaps-bounded and
    usually broadcastable) + one host-keyed map-side-combining aggregate.
    """
    j = due.join(
        prior.select("url", "n_obs", "n_changes"), "url", "left")
    cond = F.col("n_obs").isNotNull() & (F.col("n_obs") >= 2)
    # SQL `div` is exact int64 division (Column has no floordiv operator)
    exp_bytes = F.when(
        cond,
        F.expr("(cast(est_bytes as bigint) * n_changes) "
               "div greatest(n_obs - 1, 1)"),
    ).otherwise(F.col("est_bytes")).cast("long")
    per = j.select(
        "host",
        cond.cast("int").alias("is_cond"),
        F.col("est_bytes").cast("long").alias("b_naive"),
        exp_bytes.alias("b_exp"),
    )
    agg = per.groupBy("host").agg(
        F.sum(1 - F.col("is_cond")).cast("long").alias("n_full"),
        F.sum("is_cond").cast("long").alias("n_cond"),
        F.sum("b_naive").cast("long").alias("bytes_naive"),
        F.sum("b_exp").cast("long").alias("bytes_expected"),
    )
    return agg.withColumn(
        "saved_pct",
        F.round(100.0 * (F.col("bytes_naive") - F.col("bytes_expected"))
                / F.greatest(F.col("bytes_naive"), F.lit(1)), 2),
    )
