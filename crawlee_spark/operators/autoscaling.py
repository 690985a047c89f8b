"""SystemStatus / Snapshotter analog: time-weighted overload ratios.

Reference: ``packages/core/src/autoscaling/system_status.ts:100-150`` — the
system is overloaded when, per resource, the TIME-WEIGHTED fraction of
overloaded snapshots in the window exceeds that resource's ratio limit
(mem 0.2, event-loop 0.6, cpu 0.4, client 0.3); weights are the intervals
between consecutive snapshots (``weightedAvg``, ``utils general.ts:46``).
The Snapshotter's sampling loop itself is the cluster manager's job in
Spark (SURVEY.md §2.6) — what remains engine-side is this aggregation over
any (resource, ts, value) sample stream, e.g. the metrics table or an
external monitoring feed.

Scale: one partitioned window (lag per resource) + one hash aggregation —
both keyed by resource, no global ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# reference per-resource overload ratio limits (system_status.ts:140-150)
DEFAULT_LIMITS = {
    "memory": 0.2,
    "event_loop": 0.6,
    "cpu": 0.4,
    "client": 0.3,
}


def system_status(
    samples: DataFrame,
    threshold: float,
    ratio_limit: float = 0.4,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """(resource, weighted_ratio, is_overloaded) per resource type.

    weight of a sample = seconds since the previous sample of the SAME
    resource (the first sample has weight 0 and thus drops out of both
    sums — mirrors weightedAvg over inter-snapshot intervals);
    weighted_ratio = sum(weight * [value > threshold]) / sum(weight).
    """
    w = Window.partitionBy(type_col).orderBy(ts_col, id_col)
    sec = F.unix_timestamp(F.col(ts_col))
    # INTEGER weights (whole seconds) so the partial sums are exact — a
    # double sum's value depends on partition order and would flap the
    # 6-dp rounding against the sequential oracle
    weight = (sec - F.lag(sec, 1).over(w)).cast("long")
    over = F.when(F.col(value_col) > threshold, F.lit(1).cast("long")) \
        .otherwise(F.lit(0).cast("long"))
    weighted = samples.select(
        F.col(type_col).alias("resource"),
        F.coalesce(weight, F.lit(0).cast("long")).alias("_w"),
        over.alias("_over"),
    )
    agg = weighted.groupBy("resource").agg(
        F.sum(F.col("_w") * F.col("_over")).alias("_num"),
        F.sum("_w").alias("_den"),
    )
    ratio = F.when(
        F.col("_den") > 0,
        F.round(F.col("_num").cast("double") / F.col("_den").cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "resource",
        ratio.alias("weighted_ratio"),
        (ratio > ratio_limit).alias("is_overloaded"),
    )
