"""Partitioned cuckoo-filter URL-seen shards — the deletable twin of the
Bloom shards in ``operators/urlseen.py``.

north_rule: "URL-seen deduplication uses a partitioned Bloom/cuckoo filter
keyed on canonicalized URL (…) hashed with xxhash64, sharded by host-hash".
This module is the *cuckoo* half of that alternative. Same correctness
discipline as the Bloom path (SURVEY.md §7 hard part (b)): the filter only
answers "definitely unseen" with zero false negatives; "maybe seen" rows
still pass the exact ``left_anti`` backstop join, so a false positive costs
work, never drops an unseen URL.

Why a second filter kind: a cuckoo filter (Fan, Andersen, Kaminsky,
Mitzenmacher — "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014)
supports DELETION of a previously-inserted key. The reference's storage
client exposes ``deleteRequest(id)`` (``packages/types/src/storages.ts:297``)
and drops/purges queues (``request_provider.ts``); with Bloom shards any
delete forces a full shard rebuild, while cuckoo shards remove the one
fingerprint and stay exact-in-sync with the frontier key set
(``FrontierTable.delete_requests``).

Layout per shard (one shard per host-hash bucket, like the Bloom shards):
a ``(rows, 4)`` uint16 table — 4 slots per row, 16-bit fingerprints,
fingerprint 0 reserved for "empty". ``rows`` is a power of two sized for
~84% max load (the 4-way/16-bit design point from the paper; observed FPP
≈ 2·4/2^16 ≈ 0.012%). Candidate rows for key k:

    fp  = xxhash64(k, FP_SEED) & 0xFFFF   (0 remapped to 1)
    i1  = xxhash64(k, SPARK_SEED) & (rows-1)
    i2  = i1 XOR (xxhash64(fp, ALT_SEED) & (rows-1))   — involutive,
                                                         so alt(i2)=i1

MEMBERSHIP is fully vectorized numpy (gather both candidate rows for the
whole batch, compare against the broadcast fingerprint column) inside the
same Arrow-batched ``mapInPandas`` split as the Bloom path. BUILD is
per-bucket *distributed*: ``applyInPandas`` over ``groupBy(bucket)`` builds
each shard where its keys live and ships only the filter bytes (~2.4
bytes/key) to the driver — never the keys. Insert inside a shard is the
classic sequential kick loop (relocation chains are inherently ordered); a
shard that overflows its kick budget is marked SATURATED and answers
might_contain=True for everything — degrading to the exact backstop join,
never to a false negative.

DELETE safety: removing a key that was never inserted can strip another
key's identical fingerprint (the standard cuckoo caveat). All callers here
delete only keys verified present in the frontier table (the
``delete_requests`` join), which the paper's deletion guarantee requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlee_spark.operators.urlseen import (
    SPARK_SEED,
    ShardStoreBase,
    xxhash64_long_vec,
)

FP_SEED = 7919          # fingerprint hash seed
ALT_SEED = 104729       # alt-row hash seed (hashes the fingerprint)
SLOTS = 4               # slots per row (the paper's b=4 design point)
MAX_KICKS = 500         # relocation budget before declaring saturation
TARGET_LOAD = 0.84      # size shards so expected load stays under this


def _next_pow2(n: int) -> int:
    return 1 << max(4, (int(n) - 1).bit_length())


def rows_for(n_keys: int) -> int:
    """Power-of-two row count holding ``n_keys`` at <= TARGET_LOAD."""
    need = max(1, int(np.ceil(n_keys / (SLOTS * TARGET_LOAD))))
    return _next_pow2(need)


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints of int64 keys (vectorized xxhash64)."""
    fp = (xxhash64_long_vec(keys, FP_SEED).view(np.uint64)
          & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _row1(keys: np.ndarray, rows: int) -> np.ndarray:
    h = xxhash64_long_vec(keys, SPARK_SEED).view(np.uint64)
    return (h & np.uint64(rows - 1)).astype(np.int64)


def _alt_rows(i: np.ndarray, fp: np.ndarray, rows: int) -> np.ndarray:
    """alt(i, fp) = i XOR (H(fp) & mask) — involutive by XOR."""
    hfp = xxhash64_long_vec(fp.astype(np.int64), ALT_SEED).view(np.uint64)
    return (i.astype(np.uint64) ^ (hfp & np.uint64(rows - 1))).astype(np.int64)


class CuckooShard:
    """One bucket's filter: (rows, SLOTS) uint16 table + saturation flag."""

    def __init__(self, table: np.ndarray, saturated: bool = False):
        assert table.dtype == np.uint16 and table.ndim == 2
        self.table = table
        self.saturated = saturated
        self._kick_rotor = 0  # deterministic victim-slot rotation

    @classmethod
    def sized_for(cls, n_keys: int) -> "CuckooShard":
        return cls(np.zeros((rows_for(n_keys), SLOTS), dtype=np.uint16))

    @property
    def rows(self) -> int:
        return self.table.shape[0]

    def _positions(self, keys: np.ndarray):
        fp = _fingerprints(keys)
        i1 = _row1(keys, self.rows)
        i2 = _alt_rows(i1, fp, self.rows)
        return fp, i1, i2

    # ---- membership (vectorized over the whole batch) ----

    def contains_vec(self, keys: np.ndarray) -> np.ndarray:
        if self.saturated:
            return np.ones(len(keys), dtype=bool)
        fp, i1, i2 = self._positions(keys)
        col = fp[:, None]
        return ((self.table[i1] == col).any(axis=1)
                | (self.table[i2] == col).any(axis=1))

    # ---- mutation (sequential kick loop; hashes precomputed vectorized) ----

    def insert_many(self, keys: np.ndarray) -> bool:
        """Insert all keys; returns False (and flips ``saturated``) when a
        relocation chain exceeds MAX_KICKS. Saturation keeps correctness
        (everything routes to the exact backstop) at the cost of pruning."""
        fp_a, i1_a, i2_a = self._positions(keys)
        t = self.table
        for n in range(len(keys)):
            fp, i1, i2 = fp_a[n], int(i1_a[n]), int(i2_a[n])
            placed = False
            for i in (i1, i2):
                empty = np.flatnonzero(t[i] == 0)
                if len(empty):
                    t[i, empty[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            # kick loop: evict a rotating victim slot, move it to its alt row
            i, cur = i1, fp
            for _ in range(MAX_KICKS):
                s = self._kick_rotor % SLOTS
                self._kick_rotor += 1
                cur, t[i, s] = int(t[i, s]), np.uint16(cur)
                i = int(_alt_rows(np.array([i]), np.array([cur], dtype=np.uint16),
                                  self.rows)[0])
                empty = np.flatnonzero(t[i] == 0)
                if len(empty):
                    t[i, empty[0]] = np.uint16(cur)
                    break
            else:
                self.saturated = True
                return False
        return True

    def delete_many(self, keys: np.ndarray) -> int:
        """Remove ONE matching fingerprint per key (keys must have been
        inserted — see module docstring). Returns how many were removed."""
        fp_a, i1_a, i2_a = self._positions(keys)
        t = self.table
        removed = 0
        for n in range(len(keys)):
            fp = fp_a[n]
            for i in (int(i1_a[n]), int(i2_a[n])):
                hit = np.flatnonzero(t[i] == fp)
                if len(hit):
                    t[i, hit[0]] = 0
                    removed += 1
                    break
        return removed


# the in-memory shard-set protocol is shared with the Bloom path
from crawlee_spark.operators.urlseen import InMemoryShardSet as CuckooShardSet  # noqa: E402


def build_cuckoo_shards_to_store(
    frontier_keys: DataFrame, root: str, gen: str = ""
) -> dict[int, dict]:
    """Distributed per-bucket build straight into the shard store: each
    bucket's keys stay where Spark groups them; the task builds the filter
    AND writes ``b{bucket}.npy`` executor-side (shared filesystem, same
    assumption as the SnapshotTable). Only per-bucket scalars (rows,
    saturated, byte size) come back to the driver — never the table, never
    the keys. Keys are sorted before insertion so retried tasks write
    byte-identical files."""
    from crawlee_spark.operators.urlseen import write_shard_file

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        keys = np.sort(pdf["url_hash"].to_numpy(dtype=np.int64))
        shard = CuckooShard.sized_for(len(keys))
        shard.insert_many(keys)
        size = write_shard_file(root, b, shard.table, gen)
        return pd.DataFrame({
            "bucket": [b],
            "nrows": [shard.rows],
            "saturated": [shard.saturated],
            "nbytes": [size],
        })

    rows = (
        frontier_keys.select("bucket", "url_hash")
        .groupBy("bucket")
        .applyInPandas(_build, "bucket int, nrows long, saturated boolean, nbytes long")
        .collect()
    )
    return {
        int(r["bucket"]): {"saturated": bool(r["saturated"]),
                           "nbytes": int(r["nbytes"]), "gen": gen}
        for r in rows
    }


def build_cuckoo_shards(frontier_keys: DataFrame) -> dict[int, CuckooShard]:
    """In-memory per-bucket build — for BOUNDED key sets (tests, small
    dims); the engine path is ``build_cuckoo_shards_to_store``, which
    leaves each table in the store instead of a driver dict."""
    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = np.sort(pdf["url_hash"].to_numpy(dtype=np.int64))
        shard = CuckooShard.sized_for(len(keys))
        shard.insert_many(keys)
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "nrows": [shard.rows],
            "saturated": [shard.saturated],
            "blob": [shard.table.tobytes()],
        })

    rows = (
        frontier_keys.select("bucket", "url_hash")
        .groupBy("bucket")
        .applyInPandas(_build, "bucket int, nrows long, saturated boolean, blob binary")
        .collect()
    )
    out: dict[int, CuckooShard] = {}
    for r in rows:
        table = np.frombuffer(r["blob"], dtype=np.uint16).reshape(
            int(r["nrows"]), SLOTS
        ).copy()
        out[int(r["bucket"])] = CuckooShard(table, saturated=bool(r["saturated"]))
    return out


def prefilter_batch_cuckoo(
    batch: DataFrame, shards: dict[int, CuckooShard]
) -> tuple[DataFrame, DataFrame]:
    """Cuckoo split — shares ``urlseen.split_by_filter`` with the Bloom
    path (both shard sets speak the same might_contain protocol)."""
    from crawlee_spark.operators.urlseen import split_by_filter

    if not shards:
        return batch, batch.filter(F.lit(False))
    return split_by_filter(batch, CuckooShardSet(shards))


def merge_with_cuckoo(
    existing: DataFrame, batch: DataFrame, shards: dict[int, CuckooShard]
) -> DataFrame:
    """Cuckoo-accelerated MERGE-NOT-MATCHED — shares
    ``urlseen.merge_with_filter`` (semantics identical to
    ``frontier.merge_new_requests``; the exact anti-join backstop runs only
    on filter positives). No shards -> plain exact merge (no mark pass)."""
    from crawlee_spark.operators.urlseen import merge_with_filter

    if not shards:
        from crawlee_spark.operators.frontier import merge_new_requests

        return merge_new_requests(existing, batch)
    return merge_with_filter(existing, batch, CuckooShardSet(shards))


class CuckooUrlSeen(ShardStoreBase):
    """Persisted per-bucket cuckoo shards — drop-in for ``UrlSeenShards``
    (same load/save/rebuild/refresh/split/merge/frontier_snapshot surface
    via ``ShardStoreBase``, engine picks via ``CrawlConfig.urlseen_kind``)
    plus ``insert``/``delete`` deltas that Bloom cannot do without a
    rebuild. The delta ops touch only the DELTA's buckets (read-modify-
    write of those files), so their driver-side footprint is bounded by
    the batch, not the frontier."""

    kind = "cuckoo"
    meta_filename = "cuckoo.json"

    def __init__(self, root: str, **_ignored):
        super().__init__(root)

    def _decode_entry(self, info: dict) -> dict:
        return {"saturated": bool(info["saturated"]),
                "nbytes": int(info["nbytes"]),
                "gen": str(info.get("gen", ""))}

    def _build_to_store(self, keys: DataFrame, gen: str) -> dict[int, dict]:
        return build_cuckoo_shards_to_store(keys, self.shards_dir, gen)

    # ---- the deltas Bloom can't do ----

    def _load_one(self, b: int) -> CuckooShard | None:
        try:
            return self.ref().load_shard(b)
        except Exception:
            return None

    def _store_one(self, b: int, shard: CuckooShard) -> None:
        # fresh generation per delta write (driver-side, no task-zombie
        # risk, but keeps the one-filename-per-write invariant uniform);
        # the superseded file is swept by the caller's save + gc
        from crawlee_spark.operators.urlseen import write_shard_file

        gen = self._new_gen()
        size = write_shard_file(self.shards_dir, b, shard.table, gen)
        self._meta[b] = {"saturated": shard.saturated, "nbytes": size,
                         "gen": gen}

    def insert_keys(self, pairs: list[tuple[int, int]],
                    frontier_snapshot: int | None = None) -> None:
        """Insert (bucket, url_hash) deltas via read-modify-write of ONLY
        the touched bucket files. A bucket with no shard yet gets one sized
        for its delta; a PREVIOUSLY-KNOWN bucket whose file is unreadable
        gets a SATURATED placeholder — never a delta-only fresh filter,
        which would answer definitely-unseen for the bucket's older keys
        (false negatives); saturation degrades the whole bucket to the
        exact anti-join backstop instead. An overflowing shard saturates
        the same way."""
        by_bucket: dict[int, list[int]] = {}
        for b, k in pairs:
            by_bucket.setdefault(int(b), []).append(int(k))
        for b, ks in by_bucket.items():
            if b in self._meta:
                shard = self._load_one(b)
                if shard is None:
                    shard = CuckooShard.sized_for(max(1024, len(ks)))
                    shard.saturated = True
            else:
                shard = CuckooShard.sized_for(max(1024, len(ks)))
            shard.insert_many(np.array(ks, dtype=np.int64))
            self._store_one(b, shard)
        self.save(frontier_snapshot)
        self._gc_unreferenced()

    def delete_keys(self, pairs: list[tuple[int, int]],
                    frontier_snapshot: int | None = None) -> int:
        """Delete (bucket, url_hash) deltas in place — only for keys known
        present (see module docstring). Returns fingerprints removed."""
        removed = 0
        by_bucket: dict[int, list[int]] = {}
        for b, k in pairs:
            by_bucket.setdefault(int(b), []).append(int(k))
        for b, ks in by_bucket.items():
            if b not in self._meta or self._meta[b]["saturated"]:
                continue
            shard = self._load_one(b)
            if shard is None or shard.saturated:
                continue
            removed += shard.delete_many(np.array(ks, dtype=np.int64))
            self._store_one(b, shard)
        self.save(frontier_snapshot)
        self._gc_unreferenced()
        return removed
