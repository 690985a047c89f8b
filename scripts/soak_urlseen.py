"""URL-seen store soak: split and refresh cost follow the TOUCHED buckets,
not the total shard-set size (docs/SCALE.md §url_seen — the round-4
bucket-partitioned store claim, measured).

Protocol: two Bloom shard stores over B=64 and B=640 buckets, ~30k keys
per bucket either way, so the 640-bucket store is a ~10x bigger shard set
on disk. The measured work is confined to buckets 0..3 and IDENTICAL at
both sizes:

  refresh — ``refresh_buckets`` over the 4 touched buckets' keys
            (REPS timed reps; per-bucket content identical across levels)
  split   — a 200k-row probe batch (half present / half absent) through
            ``store.split``, both branches counted (REPS reps, absent-key
            content varied per rep so no plan/result cache serves a
            repeat; persisted mark blocks are dropped between reps)

The round-3 design (driver shard dict, whole-set closure ship to every
executor, all-bucket npz rewrite per save) scales both operations with B;
the bucket-partitioned store must be FLAT — per-rep ratio 640/64 ≈ 1.

Appends one JSON line (kind=urlseen_soak) to BENCH/scaling_runs.jsonl.
Usage: PYTHONPATH=/root/repo python scripts/soak_urlseen.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from crawlee_spark.operators.urlseen import UrlSeenShards  # noqa: E402
from crawlee_spark.session import get_spark  # noqa: E402

LEVELS = [64, 640]
KEYS_PER_BUCKET = 30_000
TOUCH = 4
PROBE_ROWS = 200_000
REPS = 3


def release_blocks(spark) -> None:
    import gc

    gc.collect()
    spark.catalog.clearCache()
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist()


def touched_keys(spark):
    """Buckets 0..3, KEYS_PER_BUCKET each — identical at every level."""
    n = TOUCH * KEYS_PER_BUCKET
    return spark.range(n).select(
        F.pmod(F.col("id"), F.lit(TOUCH)).cast("int").alias("bucket"),
        F.xxhash64(F.col("id")).alias("url_hash"),
    )


def filler_keys(spark, num_buckets: int):
    """Buckets TOUCH..num_buckets-1, KEYS_PER_BUCKET each."""
    n = (num_buckets - TOUCH) * KEYS_PER_BUCKET
    return spark.range(n).select(
        (F.lit(TOUCH) + F.pmod(F.col("id"), F.lit(num_buckets - TOUCH)))
        .cast("int").alias("bucket"),
        F.xxhash64(-F.col("id") - 1).alias("url_hash"),
    )


def probe_batch(spark, rep: int):
    """Half present (seeded hashes), half absent (rep-varied), buckets 0..3."""
    present = spark.range(PROBE_ROWS // 2).select(
        F.pmod(F.col("id"), F.lit(TOUCH)).cast("int").alias("bucket"),
        F.xxhash64(F.pmod(F.col("id"), F.lit(TOUCH * KEYS_PER_BUCKET)))
        .alias("url_hash"),
    )
    absent = spark.range(PROBE_ROWS // 2).select(
        F.pmod(F.col("id"), F.lit(TOUCH)).cast("int").alias("bucket"),
        F.xxhash64(F.col("id") * 2654435761 + F.lit(rep * 1_000_003 + 7))
        .alias("url_hash"),
    )
    return present.unionByName(absent)


def main() -> None:
    spark = get_spark("urlseen_soak", master="local[32]",
                      shuffle_partitions=32)
    out: dict[str, dict] = {}
    for nb in LEVELS:
        root = tempfile.mkdtemp(prefix=f"useen_soak_{nb}_")
        store = UrlSeenShards(root, expected_per_bucket=KEYS_PER_BUCKET,
                              fpp=0.03)
        keys = touched_keys(spark).unionByName(filler_keys(spark, nb))
        t0 = time.time()
        store.rebuild(keys, frontier_snapshot=1)
        seed_s = time.time() - t0
        store_bytes = sum(
            os.path.getsize(os.path.join(store.shards_dir, f))
            for f in os.listdir(store.shards_dir))

        refresh_s = []
        for _ in range(REPS):
            t0 = time.time()
            store.refresh_buckets(touched_keys(spark), frontier_snapshot=1)
            refresh_s.append(round(time.time() - t0, 3))

        split_s = []
        for rep in range(REPS):
            batch = probe_batch(spark, rep)
            t0 = time.time()
            unseen, maybe = store.split(batch)
            n = unseen.count() + maybe.count()
            split_s.append(round(time.time() - t0, 3))
            assert n == PROBE_ROWS
            release_blocks(spark)

        out[str(nb)] = {
            "buckets": nb, "seed_s": round(seed_s, 2),
            "store_mb": round(store_bytes / 1e6, 1),
            "refresh_s": refresh_s, "split_s": split_s,
        }
        print(json.dumps({nb: out[str(nb)]}), flush=True)
        shutil.rmtree(root, ignore_errors=True)

    lo, hi = out[str(LEVELS[0])], out[str(LEVELS[1])]
    ratios = {
        "refresh": [round(h / l, 2) for h, l in zip(hi["refresh_s"],
                                                    lo["refresh_s"])],
        "split": [round(h / l, 2) for h, l in zip(hi["split_s"],
                                                  lo["split_s"])],
    }
    rec = {"kind": "urlseen_soak", "levels": out, "ratios_640_over_64": ratios,
           "keys_per_bucket": KEYS_PER_BUCKET, "touch": TOUCH,
           "probe_rows": PROBE_ROWS}
    print(json.dumps(rec))
    with open(os.path.join(REPO, "BENCH", "scaling_runs.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
