"""Cuckoo-filter URL-seen shards: no false negatives, deletion, saturation
degradation, distributed build parity, persistence round-trip, and the
merge path's exactness against the plain anti-join MERGE."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawlee_spark.operators import cuckoo as C
from crawlee_spark.operators.frontier import make_requests, merge_new_requests


def _keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)


def test_no_false_negatives_and_low_fpp():
    keys = _keys(50_000, seed=1)
    shard = C.CuckooShard.sized_for(len(keys))
    assert shard.insert_many(keys)
    assert shard.contains_vec(keys).all(), "inserted key reported absent"
    probes = _keys(50_000, seed=2)
    fresh = probes[~np.isin(probes, keys)]
    fpp = shard.contains_vec(fresh).mean()
    assert fpp < 0.01, f"fpp {fpp} too high for 16-bit fingerprints"


def test_delete_removes_only_target():
    keys = _keys(10_000, seed=3)
    shard = C.CuckooShard.sized_for(len(keys))
    assert shard.insert_many(keys)
    dead, alive = keys[:1000], keys[1000:]
    assert shard.delete_many(dead) == 1000
    # survivors keep the no-false-negative guarantee
    assert shard.contains_vec(alive).all()
    # deleted keys mostly gone (a few may alias another key's fingerprint)
    assert shard.contains_vec(dead).mean() < 0.01


def test_saturation_degrades_to_all_maybe():
    # a tiny shard force-fed far past capacity must saturate, not lie
    shard = C.CuckooShard(np.zeros((16, C.SLOTS), dtype=np.uint16))
    keys = _keys(5_000, seed=4)
    assert not shard.insert_many(keys)
    assert shard.saturated
    assert shard.contains_vec(_keys(100, seed=5)).all()


def test_distributed_build_matches_local(spark):
    df = spark.range(0, 20_000).select(
        F.pmod(F.col("id"), F.lit(8)).cast("int").alias("bucket"),
        F.xxhash64(F.col("id")).alias("url_hash"),
    )
    shards = C.build_cuckoo_shards(df)
    assert set(shards) == set(range(8))
    rows = df.collect()
    buckets = np.array([r["bucket"] for r in rows])
    keys = np.array([r["url_hash"] for r in rows], dtype=np.int64)
    got = C.CuckooShardSet(shards).might_contain(buckets, keys)
    assert got.all(), "distributed build dropped keys"


def test_merge_with_cuckoo_equals_exact_merge(spark, tmp_path):
    existing = make_requests(
        spark.range(0, 3000).select(
            F.concat(F.lit("https://h"), F.pmod("id", F.lit(40)).cast("string"),
                     F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url")
        ), step=0, num_buckets=8)
    # batch overlaps half of existing
    batch = make_requests(
        spark.range(1500, 4500).select(
            F.concat(F.lit("https://h"), F.pmod("id", F.lit(40)).cast("string"),
                     F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url")
        ), step=1, num_buckets=8)
    shards = C.build_cuckoo_shards(existing.select("bucket", "url_hash"))
    got = sorted(
        r["url_hash"]
        for r in C.merge_with_cuckoo(existing, batch, shards).select("url_hash").collect()
    )
    want = sorted(
        r["url_hash"]
        for r in merge_new_requests(existing, batch).select("url_hash").collect()
    )
    assert got == want


def test_persistence_roundtrip_and_deltas(spark, tmp_path):
    seen = C.CuckooUrlSeen(str(tmp_path / "cuckoo"))
    df = spark.range(0, 5000).select(
        F.pmod(F.col("id"), F.lit(4)).cast("int").alias("bucket"),
        F.xxhash64(F.col("id")).alias("url_hash"),
    )
    seen.rebuild(df, frontier_snapshot=7)

    again = C.CuckooUrlSeen(str(tmp_path / "cuckoo"))
    assert again.load()
    assert again.frontier_snapshot == 7
    rows = df.collect()
    buckets = np.array([r["bucket"] for r in rows])
    keys = np.array([r["url_hash"] for r in rows], dtype=np.int64)
    assert C.CuckooShardSet(again.shards).might_contain(buckets, keys).all()

    # delta delete: key leaves the filter without a rebuild (Bloom can't)
    victim = [(int(buckets[0]), int(keys[0]))]
    assert again.delete_keys(victim, frontier_snapshot=8) == 1
    assert not C.CuckooShardSet(again.shards).might_contain(
        buckets[:1], keys[:1]
    )[0]
    # delta insert: it comes back
    again.insert_keys(victim, frontier_snapshot=9)
    assert C.CuckooShardSet(again.shards).might_contain(buckets[:1], keys[:1])[0]
    assert again.frontier_snapshot == 9


@pytest.mark.parametrize("n", [0, 1, 3])
def test_tiny_and_empty_shards(n):
    keys = _keys(n, seed=6) if n else np.array([], dtype=np.int64)
    shard = C.CuckooShard.sized_for(max(n, 1))
    assert shard.insert_many(keys)
    if n:
        assert shard.contains_vec(keys).all()
    assert shard.contains_vec(np.array([], dtype=np.int64)).shape == (0,)


def test_insert_into_unreadable_known_bucket_saturates(spark, tmp_path):
    """insert_keys on a previously-known bucket whose file is unreadable
    must NOT restart from a delta-only filter (its old keys would test
    definitely-unseen -> false negatives); it saturates the bucket so every
    membership answer degrades to the exact anti-join backstop."""
    import os

    import numpy as np
    from pyspark.sql import functions as F

    seen = C.CuckooUrlSeen(str(tmp_path / "cuckoo"))
    df = spark.range(0, 2000).select(
        F.pmod(F.col("id"), F.lit(4)).cast("int").alias("bucket"),
        F.xxhash64(F.col("id")).alias("url_hash"),
    )
    seen.rebuild(df, frontier_snapshot=1)
    os.remove(seen.shard_path(2))

    seen.insert_keys([(2, 123456789)], frontier_snapshot=2)
    assert seen._meta[2]["saturated"] is True
    # the bucket's OLD keys must still answer maybe-seen via the store split
    old = df.filter(F.col("bucket") == 2)
    unseen, maybe = seen.split(old)
    assert unseen.count() == 0
    assert maybe.count() == old.count()
