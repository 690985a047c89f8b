"""URL-seen at scale: partitioned Bloom prefilter + exact anti-join backstop.

north_rule: "URL-seen deduplication uses a partitioned Bloom/cuckoo filter
keyed on canonicalized URL (…) hashed with xxhash64, sharded by host-hash to
localize politeness state and avoid shuffle skew from hot domains".

Reference analog: the 1M/2M-entry uniqueKey LRU caches
(``packages/core/src/storages/request_provider.ts:46-47, 489-497``,
``request_queue.ts:20``, ``request_queue_v2.ts:14``) that short-circuit
storage round-trips. Those caches are best-effort; correctness comes from the
storage PK check. Same discipline here (SURVEY.md §7 hard part (b)):

- a Bloom shard per bucket answers "definitely-unseen" with ZERO false
  negatives, so definitely-unseen rows skip the anti-join against the
  frontier key set (at 10^10 URLs that key set is ~80 GB of parquet longs —
  the shards are ~10 bits/key and each executor only needs its buckets');
- "maybe-seen" rows (Bloom positives) still pass through the exact
  ``left_anti`` join — a false positive costs work, never drops an unseen URL.

Spark 4.1.2 does not register ``bloom_filter_agg``/``might_contain`` in SQL,
so the filter is built natively and scalably:

- BUILD: probe positions are computed JVM-side (``xxhash64(url_hash, i)``,
  whole-stage codegen), packed to (bucket, word_index, bit_mask) and reduced
  with ``bit_or`` — a map-side-combined aggregation whose output is exactly
  the set bit-words (sparse). No driver pass over the keys.
- MEMBERSHIP: a vectorized numpy XXH64 inside an Arrow-batched pandas UDF
  tests k probes per key against the broadcast shard (numpy bit ops over the
  whole batch; no per-row Python).
"""

from __future__ import annotations

import json
import math
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlee_spark.store.snapshot_table import _atomic_write

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
SPARK_SEED = 42


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def xxhash64_long_vec(values: np.ndarray, seed) -> np.ndarray:
    """Vectorized XXH64 of int64 values — bit-identical to Spark's
    ``xxhash64(bigint)`` (XxHash64Function.hashLong) and to
    functions.hashing.xxhash64_long. ``seed`` may be a scalar or array."""
    with np.errstate(over="ignore"):
        v = values.astype(np.int64).view(np.uint64)
        seed = np.asarray(seed).astype(np.uint64)
        h = seed + _P5 + np.uint64(8)
        k1 = _rotl64(v * _P2, 31) * _P1
        h ^= k1
        h = _rotl64(h, 27) * _P1 + _P4
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
        return h.view(np.int64)


def optimal_bits(n: int, fpp: float) -> int:
    """m = -n ln p / (ln 2)^2, rounded up to a multiple of 64."""
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    return (m + 63) // 64 * 64


def optimal_hashes(n: int, m: int) -> int:
    return max(1, round(m / n * math.log(2)))


class BloomShard:
    """Dense numpy bit array + k; serializable; vectorized membership."""

    def __init__(self, bits: np.ndarray, k: int):
        self.bits = bits  # uint64 words
        self.k = k

    @property
    def m(self) -> int:
        return len(self.bits) * 64


def probe_positions(key_col, i: int, m: int):
    """JVM-side probe position i via the double-hash scheme
    ``pos_i = (pmod(h1, m) + i * pmod(h2, m)) mod m`` with
    ``h1 = xxhash64(key)`` and ``h2 = xxhash64(key, key)`` — both native
    Spark expressions (whole-stage codegen), mirrored exactly in numpy for
    membership. Reducing each hash mod m BEFORE combining keeps the
    arithmetic far from int64 overflow (ANSI mode would throw on wrap)."""
    h1 = F.pmod(F.xxhash64(key_col), F.lit(m))
    h2 = F.pmod(F.xxhash64(key_col, key_col), F.lit(m))
    return F.pmod(h1 + F.lit(i) * h2, F.lit(m))


class _ShardSet:
    """bucket -> BloomShard, with vectorized batch membership."""

    def __init__(self, shards: dict[int, BloomShard]):
        self.shards = shards

    def might_contain(self, buckets: np.ndarray, keys: np.ndarray) -> np.ndarray:
        out = np.zeros(len(keys), dtype=bool)
        for b in np.unique(buckets):
            sel = buckets == b
            shard = self.shards.get(int(b))
            if shard is None:
                continue  # no shard -> definitely unseen
            sub = keys[sel]
            res = np.ones(len(sub), dtype=bool)
            m = np.int64(shard.m)
            with np.errstate(over="ignore"):
                h1 = np.mod(xxhash64_long_vec(sub, SPARK_SEED), m)  # pmod
                h2c = xxhash64_long_vec(
                    sub, xxhash64_long_vec(sub, SPARK_SEED).view(np.uint64)
                )
                h2 = np.mod(h2c, m)
                for i in range(shard.k):
                    pos = np.mod(h1 + np.int64(i) * h2, m).astype(np.uint64)
                    word = (pos >> np.uint64(6)).astype(np.int64)
                    mask = np.uint64(1) << (pos & np.uint64(63))
                    res &= (shard.bits[word] & mask) != 0
            out[sel] = res
        return out


def build_shards(
    frontier_keys: DataFrame,
    expected_per_bucket: int = 1_000_000,
    fpp: float = 0.03,
) -> dict[int, BloomShard]:
    """Distributed build: explode k probes per key -> (bucket, word, mask)
    -> ``bit_or`` aggregation -> sparse words assembled into dense arrays.

    The aggregation is map-side combined; the driver receives only the SET
    words (<= m/64 per bucket), not the keys.
    """
    m = optimal_bits(expected_per_bucket, fpp)
    k = optimal_hashes(expected_per_bucket, m)
    src = frontier_keys.select("bucket", "url_hash")
    probes = None
    for i in range(k):
        p = (
            src.withColumn("_pos", probe_positions(F.col("url_hash"), i, m))
            .select(
                "bucket",
                F.floor(F.col("_pos") / F.lit(64)).cast("long").alias("word"),
                F.expr("shiftleft(1L, CAST(pmod(_pos, 64) AS INT))").alias("mask"),
            )
        )
        probes = p if probes is None else probes.unionAll(p)
    words = (
        probes.groupBy("bucket", "word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    out: dict[int, BloomShard] = {}
    for r in words:
        b = int(r["bucket"])
        if b not in out:
            out[b] = BloomShard(np.zeros(m // 64, dtype=np.uint64), k)
        out[b].bits[int(r["word"])] = np.uint64(int(r["bits"]) & 0xFFFFFFFFFFFFFFFF)
    return out


def split_by_filter(batch: DataFrame, shard_set) -> tuple[DataFrame, DataFrame]:
    """Split (definitely_unseen, maybe_seen) with a vectorized Arrow UDF,
    over ANY shard set exposing ``might_contain(buckets, keys) -> bool
    ndarray`` — the protocol both Bloom (``_ShardSet``) and cuckoo
    (``cuckoo.CuckooShardSet``) implement, so the mark pass and the split
    live in exactly one place.

    numpy bit-tests over the whole batch; shards ship once per executor via
    closure serialization (Spark broadcast of the pickled UDF)."""

    def mark(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            maybe = shard_set.might_contain(
                pdf["bucket"].to_numpy(), pdf["url_hash"].to_numpy(dtype=np.int64)
            )
            pdf = pdf.copy()
            pdf["_maybe"] = maybe
            yield pdf

    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(list(batch.schema.fields) + [StructField("_maybe", BooleanType())])
    marked = batch.mapInPandas(mark, schema)
    return (
        marked.filter(~F.col("_maybe")).drop("_maybe"),
        marked.filter(F.col("_maybe")).drop("_maybe"),
    )


def merge_with_filter(existing: DataFrame, batch: DataFrame,
                      shard_set) -> DataFrame:
    """Filter-accelerated MERGE-NOT-MATCHED over any might_contain shard
    set: the exact anti-join runs only on filter positives;
    definitely-unseen rows bypass it. Semantically identical to
    ``frontier.merge_new_requests`` (the backstop join guarantees
    exactness); the filter prunes the join's left side."""
    unseen, maybe = split_by_filter(batch, shard_set)
    really_new = maybe.join(
        existing.select("url_hash"), on="url_hash", how="left_anti"
    )
    return unseen.unionByName(really_new)


def prefilter_batch(
    batch: DataFrame, shards: dict[int, BloomShard]
) -> tuple[DataFrame, DataFrame]:
    """Bloom split — see ``split_by_filter``."""
    if not shards:
        return batch, batch.filter(F.lit(False))
    return split_by_filter(batch, _ShardSet(shards))


def merge_with_bloom(
    existing: DataFrame, batch: DataFrame, shards: dict[int, BloomShard]
) -> DataFrame:
    """Bloom-accelerated MERGE-NOT-MATCHED — see ``merge_with_filter``.
    No shards -> plain exact merge: nothing to prune with, so skip the
    Arrow mark pass entirely (and keep the anti-join backstop)."""
    if not shards:
        from crawlee_spark.operators.frontier import merge_new_requests

        return merge_new_requests(existing, batch)
    return merge_with_filter(existing, batch, _ShardSet(shards))


class UrlSeenShards:
    """Persisted per-bucket Bloom shards with resume — the durable analog of
    the reference's in-process LRU, rebuilt from the frontier on resume
    (SURVEY.md §2.3 'rebuilt from Iceberg url-seen table on resume')."""

    def __init__(self, root: str, expected_per_bucket: int = 1_000_000, fpp: float = 0.03):
        self.root = root
        self.expected = expected_per_bucket
        self.fpp = fpp
        self.shards: dict[int, BloomShard] = {}
        # frontier snapshot id the persisted shards reflect. A crash between
        # the frontier commit and the shard save leaves this stale; callers
        # (engine) compare it against the live snapshot id on resume and
        # rebuild on mismatch — stale shards would route just-committed keys
        # through the 'definitely unseen' fast path, skipping the exact
        # anti-join backstop and breaking the no-false-negative guarantee.
        self.frontier_snapshot: int | None = None

    def load(self) -> bool:
        """False (-> caller rebuilds) on missing OR unreadable state: a
        crash mid-save may leave a truncated npz or a json referencing
        shards the npz doesn't carry — both must route to the rebuild
        path, never crash the resume."""
        path = os.path.join(self.root, "shards.npz")
        meta_path = os.path.join(self.root, "shards.json")
        if not (os.path.exists(path) and os.path.exists(meta_path)):
            return False
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            data = np.load(path)
            self.shards = {
                int(b): BloomShard(data[f"b{b}"], meta["k"][str(b)])
                for b in meta["buckets"]
            }
        except Exception:
            # visible signal: a PERSISTENT load failure (numpy format
            # drift, permissions, …) silently costs a full-frontier shard
            # rebuild on EVERY resume if nobody notices
            import logging

            logging.getLogger(__name__).warning(
                "url-seen shard state at %s is unreadable; resume will "
                "rebuild shards from the frontier", self.root, exc_info=True)
            self.shards = {}
            self.frontier_snapshot = None
            return False
        self.frontier_snapshot = meta.get("frontier_snapshot")
        return True

    def save(self, frontier_snapshot: int | None = None) -> None:
        if frontier_snapshot is not None:
            self.frontier_snapshot = frontier_snapshot
        os.makedirs(self.root, exist_ok=True)
        # npz via tmp + rename BEFORE the json: the json is the commit
        # point (load() reads it first), so a crash between the two leaves
        # an old-json/new-npz pair, which load() resolves (extra npz keys
        # are ignored; missing ones fail -> rebuild)
        npz_path = os.path.join(self.root, "shards.npz")
        tmp = npz_path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f, **{f"b{b}": s.bits for b, s in self.shards.items()})
        os.replace(tmp, npz_path)
        _atomic_write(
            os.path.join(self.root, "shards.json"),
            json.dumps({
                "buckets": sorted(self.shards),
                "k": {str(b): s.k for b, s in self.shards.items()},
                "frontier_snapshot": self.frontier_snapshot,
            }),
        )

    def rebuild(self, frontier_keys: DataFrame,
                frontier_snapshot: int | None = None) -> None:
        self.shards = build_shards(frontier_keys, self.expected, self.fpp)
        self.save(frontier_snapshot)

    def refresh_buckets(self, touched_keys: DataFrame,
                        frontier_snapshot: int | None = None) -> None:
        """Re-aggregate only the touched buckets (touched_keys must be the
        FULL key set of those buckets); untouched shards are kept."""
        new = build_shards(touched_keys, self.expected, self.fpp)
        self.shards.update(new)
        self.save(frontier_snapshot)
