"""Crawl-budget apportionment: split a global fetch budget across hosts.

A politeness-bounded crawler schedules a fixed number of fetches per
superstep (`maxRequestsPerMinute` × window); WHICH hosts get them is the
planner's lever — weight by trust/PageRank mass and spam farms starve,
weight by pending counts and backlogs drain evenly. The apportionment
itself is the classic largest-remainder (Hamilton) method: exact integer
quotas, then the leftover seats go to the largest fractional remainders —
deterministic, total preserved, zero floating point.

No reference analog (Crawlee schedules purely by queue order); crawl-
scheduling addendum op, same family as `operators/recrawl.py`.

Scale shape: the naive form ranks ALL hosts by remainder in one global
window — a single-partition sort over an O(hosts) dim (10^6-10^7 rows at
web scale). This implementation replaces it with the distributed
order-statistic construction:

  1. per-host ``base = total*w div W`` and ``rem = total*w mod W`` —
     pure column math over the dim (one broadcast of the 1-row total);
  2. the leftover seat count ``K = total − Σ base`` — 1-row agg;
  3. a remainder HISTOGRAM (``groupBy(rem).count()``) — cardinality ≤
     distinct remainders — ranked by a window over the histogram (dim of
     DISTINCT remainder values, orders of magnitude smaller than hosts);
     the running count picks the threshold ``t``: every host with
     ``rem > t`` gets a seat, and the seats left at exactly ``t`` go to
     the first hosts in key order — ranked by a window PARTITIONED BY
     rem (only the single tied partition does any work).

So no window ever spans the host dim; the largest partition touched is
the tie group at the threshold remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apportion_budget(
    weights: DataFrame,
    total: int,
    key_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """(key, weight, base, extra, budget) with ``Σ budget == total``
    (when ``Σ weight > 0``; all-zero weights yield all-zero budgets).

    ``weights``: one row per key, integer ``weight_col`` ≥ 0. Hamilton:
    ``base = total·w div W``; the ``K = total − Σ base`` leftover seats
    go to the K largest remainders ``total·w mod W``, ties broken by
    ascending key.
    """
    w = weights.select(F.col(key_col).alias("key"),
                       F.col(weight_col).cast("long").alias("weight"))
    tot = w.agg(F.coalesce(F.sum("weight"), F.lit(0)).cast("long")
                .alias("_tw"))
    # W == 0: Hamilton is undefined — every budget is 0 (base and rem both
    # 0 below, and K is forced to 0 so no extra seats are dealt); keeps the
    # Spark operator and the Python twin in exact agreement on the edge
    q = w.crossJoin(F.broadcast(tot)).select(
        "key", "weight", "_tw",
        F.when(F.col("_tw") > 0,
               F.expr(f"CAST({int(total)} AS BIGINT) * weight div _tw"))
        .otherwise(F.lit(0)).cast("long").alias("base"),
        F.when(F.col("_tw") > 0,
               F.lit(int(total)).cast("long") * F.col("weight")
               % F.col("_tw"))
        .otherwise(F.lit(0)).cast("long").alias("rem"),
    )
    used = q.agg(
        F.when(F.max("_tw") > 0,
               F.lit(int(total)).cast("long") - F.sum("base"))
        .otherwise(F.lit(0)).cast("long").alias("_k"))
    q = q.drop("_tw")
    # threshold from the remainder histogram: smallest t with
    # count(rem > t) <= K — i.e. rank remainders desc, running count
    hist = q.groupBy("rem").agg(F.count(F.lit(1)).alias("n"))
    hw = Window.orderBy(F.col("rem").desc())
    cum = hist.select(
        "rem", "n",
        (F.sum("n").over(hw) - F.col("n")).alias("n_above"),  # hosts with rem > this
    )
    thresh = (
        cum.crossJoin(F.broadcast(used))
        .filter((F.col("n_above") < F.col("_k"))
                & (F.col("n_above") + F.col("n") >= F.col("_k")))
        .select(F.col("rem").alias("_t"),
                (F.col("_k") - F.col("n_above")).alias("_at_t"))
    )
    # K == 0: no threshold row — the left join below yields NULL _t and
    # nobody matches either branch, which is exactly "no extras"
    tw2 = Window.partitionBy("rem").orderBy("key")
    # join on a TRUE condition, not crossJoin: thresh is EMPTY when K == 0
    # and a cross join would wrongly drop every host row
    ranked = q.join(F.broadcast(thresh), F.lit(True), "left") \
        .withColumn("_rk_in_rem", F.row_number().over(tw2))
    extra = (
        F.when(F.col("rem") > F.col("_t"), F.lit(1))
        .when((F.col("rem") == F.col("_t"))
              & (F.col("_rk_in_rem") <= F.col("_at_t")), F.lit(1))
        .otherwise(F.lit(0))
    )
    return ranked.select(
        F.col("key").alias(key_col), "weight", "base",
        F.coalesce(extra, F.lit(0)).cast("long").alias("extra"),
    ).withColumn("budget", F.col("base") + F.col("extra"))


def apportion_budget_py(weights: dict, total: int) -> dict:
    """Python twin for tests: key -> budget."""
    tw = sum(weights.values())
    if tw <= 0:
        return {k: 0 for k in weights}  # undefined quotas: all-zero
    base = {k: total * w // tw for k, w in weights.items()}
    rem = {k: (total * w) % tw for k, w in weights.items()}
    k_left = total - sum(base.values())
    order = sorted(weights, key=lambda k: (-rem[k], k))
    out = dict(base)
    for k in order[:k_left]:
        out[k] += 1
    return out
