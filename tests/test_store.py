from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.store import AppendTable, SnapshotTable


def _mk(spark, n=100, buckets=8):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % buckets).cast("int").alias("bucket"),
        (F.col("id") * 10).alias("v"),
    )


def test_create_read_roundtrip(spark, tmp_path):
    df = _mk(spark)
    t = SnapshotTable.create(spark, str(tmp_path / "t"), df)
    got = t.read()
    assert got.count() == 100
    assert set(got.columns) == {"id", "bucket", "v"}
    assert got.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_cow_commit_touches_only_written_buckets(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _mk(spark))
    # rewrite bucket 3 only: double v
    b3 = t.read(buckets=[3]).withColumn("v", F.col("v") * 2)
    sid = t.commit_buckets(b3, "update-b3")
    m = t.manifest(sid)
    owners = set(m["buckets"].values())
    assert f"snap-{sid}" in owners and "snap-0" in owners  # inheritance by ref
    assert m["buckets"]["3"] == f"snap-{sid}"
    assert m["buckets"]["2"] == "snap-0"
    got = t.read()
    assert got.count() == 100
    assert got.filter("bucket = 3").agg(F.sum("v")).first()[0] == sum(
        i * 20 for i in range(100) if i % 8 == 3
    )
    assert got.filter("bucket = 2").agg(F.sum("v")).first()[0] == sum(
        i * 10 for i in range(100) if i % 8 == 2
    )


def test_time_travel_and_lineage(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _mk(spark, n=16))
    t.commit_buckets(t.read(buckets=[0]).withColumn("v", F.lit(0).cast("long")), "zero-b0")
    old = t.read(snapshot_id=0)
    new = t.read()
    assert old.filter("bucket = 0").agg(F.sum("v")).first()[0] > 0
    assert new.filter("bucket = 0").agg(F.sum("v")).first()[0] == 0
    hist = t.history()
    assert [m["id"] for m in hist] == [0, 1]
    assert hist[1]["operation"] == "zero-b0"


def test_bucket_pruned_read(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _mk(spark))
    got = t.read(buckets=[1, 5])
    assert set(r["bucket"] for r in got.select("bucket").distinct().collect()) == {1, 5}


def test_resume_reopen(spark, tmp_path):
    root = str(tmp_path / "t")
    SnapshotTable.create(spark, root, _mk(spark))
    t2 = SnapshotTable(spark, root)
    assert t2.exists() and t2.read().count() == 100


def test_append_table(spark, tmp_path):
    t = AppendTable(spark, str(tmp_path / "log"))
    t.append(spark.range(5).select(F.col("id"), F.lit(1).alias("step")))
    t.append(spark.range(3).select(F.col("id"), F.lit(2).alias("step")))
    df = t.read()
    assert df.count() == 8
    assert t.read(snapshot_id=0).count() == 5


def test_snapshot_diff_incremental_read(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _mk(spark, n=32))
    a = t.current_snapshot_id()
    # rewrite bucket 3 only: drop id=3, add id=1003
    b3 = t.read(buckets=[3]).filter("id <> 3").unionByName(
        spark.createDataFrame([(1003, 3, 10030)], "id long, bucket int, v long"))
    t.commit_buckets(b3, "update-b3")
    d = t.diff(a).collect()
    got = {(r["id"], r["_change"]) for r in d}
    assert got == {(1003, "added"), (3, "removed")}
    # untouched buckets contribute nothing even though their rows differ
    # from NO snapshot (sanity: no false positives)
    assert all(r["bucket"] == 3 for r in d)
    # identical snapshots diff to empty without reading any bucket, with
    # the same column order as the non-empty path
    empty = t.diff(a, a)
    assert empty.count() == 0
    assert empty.columns == t.diff(a).columns


def test_snapshot_diff_full_row_keys_detect_updates(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), _mk(spark, n=16))
    a = t.current_snapshot_id()
    b2 = t.read(buckets=[2]).withColumn("v", F.col("v") + 1)
    t.commit_buckets(b2, "bump-b2")
    # full-row diff: an updated row appears as added (new value) + removed
    # (old value) — the change-data-capture view
    d = t.diff(a)
    assert d.filter("_change = 'added'").count() == 2
    assert d.filter("_change = 'removed'").count() == 2
    assert d.filter("bucket <> 2").count() == 0


def test_snapshot_diff_multiset_counts_duplicates(spark, tmp_path):
    # exceptAll semantics: dropping ONE of two identical rows is a change
    dup = spark.createDataFrame(
        [(7, 3, 70), (7, 3, 70), (8, 3, 80)], "id long, bucket int, v long")
    t = SnapshotTable.create(spark, str(tmp_path / "t"), dup)
    a = t.current_snapshot_id()
    t.commit_buckets(t.read(buckets=[3]).dropDuplicates(), "dedup-b3")
    d = t.diff(a).collect()
    assert [(r["id"], r["_change"]) for r in d] == [(7, "removed")]
