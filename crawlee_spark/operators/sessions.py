"""Session pool + error tracking as set-based state (SURVEY.md §2.7).

Reference semantics being reproduced:

- ``Session``: errorScore (+1 on markBad, −0.5 on markGood while > 0),
  blocked at errorScore >= maxErrorScore=3, retired immediately on a
  blocked HTTP status, usable while usageCount < maxUsageCount=50 and not
  expired (``packages/core/src/session_pool/session.ts:135-162, 170-198,
  284-287``).
- ``SessionPool``: <= 1000 sessions, create when below capacity, pick
  deterministically when full (the reference picks randomly,
  ``session_pool.ts:159-169, 272-291``; this engine uses
  ``pmod(url_hash, pool_size)`` so runs are reproducible — noted
  ordering-equivalence deviation).
- Session-blocked status codes [401, 403, 429] retire the session and retry
  the request (``session_pool.ts:164``).
- ``ErrorTracker``: dedup errors by normalized signature and count
  (``packages/utils/src/internals/error_tracker.ts:1-376`` — the signature
  here is the reference's "message with numbers/uuids/quotes collapsed"
  normalization, reduced to its portable core).

State model: one row per (bucket, session_id) in a SnapshotTable — sessions
are per-host-partition (a "session" at cluster scale is a fetch identity
bound to an executor's host partition), updated once per superstep from the
fetch results with pure column logic. No Python state objects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "bucket int, session_id int, error_score double, usage_count long, "
    "created_step int, retired boolean"
)

MAX_ERROR_SCORE = 3.0       # session.ts:141
ERROR_SCORE_DECREMENT = 0.5  # session.ts:144
MAX_USAGE_COUNT = 50        # session.ts:150
BLOCKED_CODES = (401, 403, 429)  # session_pool.ts:164


def create_pool(spark: SparkSession, num_buckets: int, per_bucket: int = 4) -> DataFrame:
    """Initial pool: ``per_bucket`` sessions per host-bucket."""
    return spark.range(num_buckets * per_bucket).select(
        (F.col("id") % num_buckets).cast("int").alias("bucket"),
        F.floor(F.col("id") / num_buckets).cast("int").alias("session_id"),
        F.lit(0.0).alias("error_score"),
        F.lit(0).cast("long").alias("usage_count"),
        F.lit(0).cast("int").alias("created_step"),
        F.lit(False).alias("retired"),
    )


def assign_sessions(fetch_set: DataFrame, pool: DataFrame, per_bucket: int = 4) -> DataFrame:
    """Deterministic session pick per request: usable sessions only,
    ``session_id = pmod(url_hash, usable_count)``-th usable session of the
    request's bucket (replaces the reference's random pick for
    reproducibility). Adds a ``session_id`` column to the fetch set."""
    usable = usable_sessions(pool)
    ranked = usable.withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("bucket").orderBy("session_id")) - 1,
    )
    counts = ranked.groupBy("bucket").agg(F.count("*").alias("_n"))
    fs = fetch_set.join(F.broadcast(counts), on="bucket", how="left")
    fs = fs.withColumn(
        "_pick", F.when(F.col("_n").isNull(), F.lit(None)).otherwise(
            F.pmod(F.col("url_hash"), F.col("_n"))
        )
    )
    out = fs.join(
        F.broadcast(ranked.select("bucket", "session_id", F.col("_rk"))),
        on=["bucket"], how="left",
    ).filter(
        (F.col("_pick").isNull() & F.col("_rk").isNull()) | (F.col("_pick") == F.col("_rk"))
    )
    return out.drop("_n", "_pick", "_rk")


def usable_sessions(pool: DataFrame) -> DataFrame:
    """usable = not retired ∧ errorScore < 3 ∧ usage < 50 (session.ts:170-198)."""
    return pool.filter(
        (~F.col("retired"))
        & (F.col("error_score") < MAX_ERROR_SCORE)
        & (F.col("usage_count") < MAX_USAGE_COUNT)
    )


def update_pool(
    pool: DataFrame,
    fetch_results: DataFrame,
    step: int,
    per_bucket: int = 4,
) -> DataFrame:
    """Fold one superstep's fetch results into the pool.

    ``fetch_results`` needs (bucket, session_id, status_code). Per session:
    usage += uses; markGood per success (score −0.5, floored at 0); markBad
    per failure (+1); any blocked code (401/403/429) retires outright
    (session.ts:284-287). Exhausted/blocked sessions are replaced with fresh
    ones (same id, reset scores — the pool's create-when-space behavior,
    session_pool.ts:272-291)."""
    agg = fetch_results.groupBy("bucket", "session_id").agg(
        F.count("*").alias("_uses"),
        F.sum(
            F.when(F.col("status_code").isin(*BLOCKED_CODES), 1).otherwise(0)
        ).alias("_blocked"),
        F.sum(F.when(F.col("status_code") < 400, 1).otherwise(0)).alias("_good"),
        F.sum(
            F.when(
                (F.col("status_code") >= 400)
                & ~F.col("status_code").isin(*BLOCKED_CODES), 1
            ).otherwise(0)
        ).alias("_bad"),
    )
    joined = pool.join(agg, on=["bucket", "session_id"], how="left").fillna(
        {"_uses": 0, "_blocked": 0, "_good": 0, "_bad": 0}
    )
    score = F.greatest(
        F.lit(0.0),
        F.col("error_score") + F.col("_bad") - ERROR_SCORE_DECREMENT * F.col("_good"),
    )
    updated = joined.select(
        "bucket", "session_id",
        score.alias("error_score"),
        (F.col("usage_count") + F.col("_uses")).alias("usage_count"),
        "created_step",
        (F.col("retired") | (F.col("_blocked") > 0)).alias("retired"),
    )
    # replace dead sessions with fresh ones (new created_step, zero scores)
    dead = (
        F.col("retired")
        | (F.col("error_score") >= MAX_ERROR_SCORE)
        | (F.col("usage_count") >= MAX_USAGE_COUNT)
    )
    return updated.select(
        "bucket", "session_id",
        F.when(dead, F.lit(0.0)).otherwise(F.col("error_score")).alias("error_score"),
        F.when(dead, F.lit(0).cast("long")).otherwise(F.col("usage_count")).alias("usage_count"),
        F.when(dead, F.lit(step)).otherwise(F.col("created_step")).cast("int").alias("created_step"),
        F.lit(False).alias("retired"),
    )


# -- ErrorTracker ------------------------------------------------------------


def error_signature(error_col) -> "F.Column":
    """Normalized error signature: numbers → #, hex/uuid-ish runs → #,
    quoted strings → "...", whitespace collapsed — the portable core of
    ``error_tracker.ts`` message normalization."""
    sig = F.lower(error_col)
    sig = F.regexp_replace(sig, r"'[^']*'", "'...'")
    sig = F.regexp_replace(sig, r'"[^"]*"', '"..."')
    sig = F.regexp_replace(sig, r"\b[0-9a-f]{8,}\b", "#")
    sig = F.regexp_replace(sig, r"\d+", "#")
    sig = F.regexp_replace(sig, r"\s+", " ")
    return F.trim(sig)


def error_report(errors: DataFrame, error_col: str = "error") -> DataFrame:
    """groupBy(signature).count() sorted desc — the ErrorTracker summary the
    reference prints at crawl end (``statistics.ts`` error analysis)."""
    return (
        errors.filter(F.col(error_col).isNotNull())
        .select(error_signature(F.col(error_col)).alias("signature"))
        .groupBy("signature")
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), F.col("signature"))
    )
