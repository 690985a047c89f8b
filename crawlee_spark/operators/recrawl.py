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
