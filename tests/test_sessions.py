"""Session pool state + error tracker (SURVEY.md §2.7 pins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.operators.sessions import (
    BLOCKED_CODES,
    assign_sessions,
    create_pool,
    error_report,
    update_pool,
    usable_sessions,
)


def test_create_pool_shape(spark):
    pool = create_pool(spark, num_buckets=4, per_bucket=3)
    assert pool.count() == 12
    per = pool.groupBy("bucket").count().collect()
    assert all(r["count"] == 3 for r in per)


def test_assign_deterministic(spark):
    pool = create_pool(spark, num_buckets=2, per_bucket=4)
    fs = spark.createDataFrame(
        [(0, 100), (0, 101), (1, 102)], "bucket int, url_hash long"
    )
    a1 = sorted((r["url_hash"], r["session_id"]) for r in assign_sessions(fs, pool).collect())
    a2 = sorted((r["url_hash"], r["session_id"]) for r in assign_sessions(fs, pool).collect())
    assert a1 == a2  # reproducible pick (reference picks randomly)
    assert len(a1) == 3
    assert all(0 <= s < 4 for _, s in a1)


def test_update_pool_scores_and_retire(spark):
    pool = create_pool(spark, num_buckets=1, per_bucket=3)
    # session 0: 2 good; session 1: 4 bad; session 2: one blocked 403
    results = spark.createDataFrame(
        [(0, 0, 200), (0, 0, 200),
         (0, 1, 500), (0, 1, 500), (0, 1, 500), (0, 1, 500),
         (0, 2, 403)],
        "bucket int, session_id int, status_code int",
    )
    new = {r["session_id"]: r for r in update_pool(pool, results, step=5).collect()}
    assert new[0]["error_score"] == 0.0 and new[0]["usage_count"] == 2
    # 4 bad -> score 4 >= 3 -> replaced with a fresh session at step 5
    assert new[1]["error_score"] == 0.0 and new[1]["usage_count"] == 0
    assert new[1]["created_step"] == 5
    # blocked code retires immediately (session.ts:284-287) -> fresh
    assert new[2]["created_step"] == 5


def test_markgood_decrements(spark):
    pool = create_pool(spark, num_buckets=1, per_bucket=1)
    bad2 = spark.createDataFrame([(0, 0, 500), (0, 0, 500)],
                                 "bucket int, session_id int, status_code int")
    p1 = update_pool(pool, bad2, step=1)
    assert p1.first()["error_score"] == 2.0
    good1 = spark.createDataFrame([(0, 0, 200)],
                                  "bucket int, session_id int, status_code int")
    p2 = update_pool(p1, good1, step=2)
    # markGood: -0.5 while > 0 (session.ts:170-198)
    assert p2.first()["error_score"] == 1.5


def test_usable_filter(spark):
    pool = create_pool(spark, num_buckets=1, per_bucket=2)
    heavy = spark.createDataFrame(
        [(0, 0, 200)] * 50, "bucket int, session_id int, status_code int"
    )
    p1 = update_pool(pool, heavy, step=1)
    # 50 uses -> maxUsageCount reached -> replaced fresh, all usable again
    assert usable_sessions(p1).count() == 2
    assert p1.filter(F.col("session_id") == 0).first()["usage_count"] == 0


def test_error_report_signatures(spark):
    errs = spark.createDataFrame(
        [("Timeout after 3000 ms",), ("Timeout after 5000 ms",),
         ("ECONNRESET at 10.0.0.7",), (None,)],
        "error string",
    )
    rows = error_report(errs).collect()
    sigs = {r["signature"]: r["occurrences"] for r in rows}
    # numbers collapse -> the two timeouts share one signature
    assert sigs["timeout after # ms"] == 2
    assert len(sigs) == 2
