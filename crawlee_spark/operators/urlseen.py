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
  the shards are ~10 bits/key);
- "maybe-seen" rows (Bloom positives) still pass through the exact
  ``left_anti`` join — a false positive costs work, never drops an unseen URL.

Spark 4.1.2 does not register ``bloom_filter_agg``/``might_contain`` in SQL,
so the filter is built natively and scalably:

- BUILD: probe positions are computed JVM-side (``xxhash64(url_hash, i)``,
  whole-stage codegen), packed to (bucket, word_index, bit_mask) and reduced
  with ``bit_or`` — a map-side-combined aggregation whose output is exactly
  the set bit-words (sparse). The dense shard arrays are then assembled and
  written PER BUCKET by the executors (``applyInPandas`` over
  ``groupBy(bucket)`` → one ``b{bucket}.npy`` file each in the shard store,
  which lives on the same shared filesystem as the SnapshotTable); the
  driver receives only per-bucket scalars (bucket id, byte size) for the
  meta json. No shard bits ever sit on the driver.
- MEMBERSHIP: the batch is repartitioned by bucket and marked by an
  Arrow-batched ``mapInPandas`` whose closure carries only a
  ``StoreShardRef`` (store path + per-bucket scalar meta). Each task lazily
  ``np.load``s exactly the bucket files its slice of the batch touches, so
  each executor holds only its buckets' shards (SCALE.md §url_seen) — at
  10^10 URLs the ~12 GB shard set is spread across the cluster, never
  resident on any single node. The probe math is a vectorized numpy XXH64
  mirror of the JVM build (numpy bit ops over the whole batch; no per-row
  Python). An unreadable shard file degrades that bucket to "maybe seen"
  (the exact join decides) — never to a false negative.

The dict-based helpers (``build_shards``/``prefilter_batch``/
``merge_with_bloom``) remain as the in-memory variant for bounded dims and
unit tests of the probe math; the engine path is the store-partitioned one
(``UrlSeenShards.merge``).
"""

from __future__ import annotations

import json
import math
import os
import uuid
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

    def contains_vec(self, keys: np.ndarray) -> np.ndarray:
        """Batch membership — the numpy mirror of ``probe_positions``."""
        res = np.ones(len(keys), dtype=bool)
        m = np.int64(self.m)
        with np.errstate(over="ignore"):
            h1 = np.mod(xxhash64_long_vec(keys, SPARK_SEED), m)  # pmod
            h2c = xxhash64_long_vec(
                keys, xxhash64_long_vec(keys, SPARK_SEED).view(np.uint64)
            )
            h2 = np.mod(h2c, m)
            for i in range(self.k):
                pos = np.mod(h1 + np.int64(i) * h2, m).astype(np.uint64)
                word = (pos >> np.uint64(6)).astype(np.int64)
                mask = np.uint64(1) << (pos & np.uint64(63))
                res &= (self.bits[word] & mask) != 0
        return res


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


class InMemoryShardSet:
    """bucket -> shard (anything with ``contains_vec``), with vectorized
    batch membership. Bloom and cuckoo shards share this surface; a missing
    shard means "definitely unseen" (the build saw no keys for it)."""

    def __init__(self, shards: dict):
        self.shards = shards

    def might_contain(self, buckets: np.ndarray, keys: np.ndarray) -> np.ndarray:
        out = np.zeros(len(keys), dtype=bool)
        for b in np.unique(buckets):
            shard = self.shards.get(int(b))
            if shard is None:
                continue  # no shard -> definitely unseen
            sel = buckets == b
            out[sel] = shard.contains_vec(keys[sel].astype(np.int64))
        return out


# backward-compatible name (the Bloom-side alias; cuckoo.py re-exports too)
_ShardSet = InMemoryShardSet


# ---------------------------------------------------------------------------
# bucket-partitioned shard store (the engine / at-scale path)
# ---------------------------------------------------------------------------


class StoreShardRef:
    """Lightweight picklable handle to a bucket-partitioned shard store.

    THIS is what ships in the mark-UDF closure — a directory path plus
    per-bucket scalars (k / saturated / byte size), a few bytes per bucket.
    The bit arrays stay in the store; each task loads only the bucket files
    its batch slice touches."""

    __slots__ = ("kind", "root", "meta")

    def __init__(self, kind: str, root: str, meta: dict[int, dict]):
        self.kind = kind  # "bloom" | "cuckoo"
        self.root = root
        self.meta = meta

    def load_shard(self, bucket: int):
        """np.load ONE bucket's file (raises on missing/corrupt — callers
        degrade that bucket to maybe-seen)."""
        info = self.meta[bucket]
        arr = np.load(os.path.join(
            self.root, shard_filename(bucket, info.get("gen", ""))))
        if self.kind == "bloom":
            return BloomShard(arr, int(info["k"]))
        from crawlee_spark.operators.cuckoo import CuckooShard

        return CuckooShard(arr.copy(), saturated=bool(info["saturated"]))


def shard_filename(bucket: int, gen: str = "") -> str:
    """Per-bucket shard file name. ``gen`` is a per-BUILD token (random hex,
    minted once per rebuild/refresh and referenced from the json commit
    point): two builds never share a filename, so a zombie/speculative task
    attempt from an OLDER build can never ``os.replace`` over a NEWER
    committed generation — the stale-bits clobber that a size check cannot
    detect on size-constant Bloom files. Empty ``gen`` = the legacy
    un-suffixed name (pre-generation stores stay loadable)."""
    return f"b{bucket}.{gen}.npy" if gen else f"b{bucket}.npy"


def write_shard_file(root: str, bucket: int, arr: np.ndarray,
                     gen: str = "") -> int:
    """Atomic per-bucket array write (tmp + rename); returns byte size.
    Runs on EXECUTORS during builds — the store root is on the shared
    filesystem, same assumption the SnapshotTable makes. Task retries get a
    unique tmp name and converge by last-rename-wins WITHIN a build; across
    builds the generation-suffixed name makes clobbering impossible."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, shard_filename(bucket, gen))
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:12]}"
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)
    return os.path.getsize(path)


def split_by_filter_store(
    batch: DataFrame, ref: StoreShardRef
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split (definitely_unseen, maybe_seen) against a store-resident shard
    set. The batch is repartitioned by bucket first, so each task — and
    therefore each executor — loads only its own buckets' shard files
    (lazily, cached per partition). The closure carries ``ref`` (path +
    per-bucket scalars), never the arrays.

    Degradation is always toward the exact join: a bucket absent from the
    meta is definitely unseen (its build saw no keys); a bucket whose file
    cannot be read marks its rows maybe-seen so the anti-join backstop
    decides."""

    def mark(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, object] = {}

        def shard_for(b: int):
            if b not in cache:
                try:
                    cache[b] = ref.load_shard(b)
                except Exception:
                    cache[b] = None  # unreadable -> conservative maybe-seen
            return cache[b]

        for pdf in batches:
            buckets = pdf["bucket"].to_numpy()
            keys = pdf["url_hash"].to_numpy(dtype=np.int64)
            maybe = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(buckets):
                ib = int(b)
                if ib not in ref.meta:
                    continue  # no shard -> definitely unseen
                sel = buckets == b
                shard = shard_for(ib)
                if shard is None:
                    maybe[sel] = True
                else:
                    maybe[sel] = shard.contains_vec(keys[sel])
            pdf = pdf.copy()
            pdf["_maybe"] = maybe
            yield pdf

    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(list(batch.schema.fields) + [StructField("_maybe", BooleanType())])
    # persist: both returned branches (and merge's union of them) filter
    # this same subtree, and only the exchange BELOW the UDF is reused by
    # Spark — unpersisted, the mark UDF would evaluate twice per merge and
    # every task would re-np.load its buckets' shard files twice per
    # superstep (real shared-FS I/O at the 10^10-URL shard-set size).
    # The persisted handle is RETURNED (third element) so the caller can
    # unpersist once its consumers are evaluated — without that, every
    # superstep leaks one cached DataFrame for the life of the app
    # (ShardStoreBase.split stashes it; the engine releases it in the
    # superstep's finally block).
    marked = batch.repartition("bucket").mapInPandas(mark, schema).persist()
    return (
        marked.filter(~F.col("_maybe")).drop("_maybe"),
        marked.filter(F.col("_maybe")).drop("_maybe"),
        marked,
    )


def build_shards_to_store(
    frontier_keys: DataFrame,
    root: str,
    expected_per_bucket: int = 1_000_000,
    fpp: float = 0.03,
    gen: str = "",
) -> dict[int, dict]:
    """Distributed Bloom build straight into the shard store: explode k
    probes per key -> (bucket, word, mask) -> ``bit_or`` aggregation
    (map-side combined) -> per-bucket dense assembly + file write ON THE
    EXECUTORS (``applyInPandas`` over ``groupBy(bucket)``). The driver
    receives one scalar row per bucket — never bits, never keys. ``gen``
    is the build's generation token (``shard_filename``)."""
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
    words = probes.groupBy("bucket", "word").agg(F.expr("bit_or(mask)").alias("bits"))

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        arr = np.zeros(m // 64, dtype=np.uint64)
        idx = pdf["word"].to_numpy(dtype=np.int64)
        arr[idx] = pdf["bits"].to_numpy(dtype=np.int64).view(np.uint64)
        size = write_shard_file(root, b, arr, gen)
        return pd.DataFrame({"bucket": [b], "nbytes": [size]})

    rows = (
        words.groupBy("bucket")
        .applyInPandas(assemble, "bucket int, nbytes long")
        .collect()
    )
    return {int(r["bucket"]): {"k": k, "nbytes": int(r["nbytes"]), "gen": gen}
            for r in rows}


# ---------------------------------------------------------------------------
# in-memory variant (bounded dims / unit tests of the probe math)
# ---------------------------------------------------------------------------


def build_shards(
    frontier_keys: DataFrame,
    expected_per_bucket: int = 1_000_000,
    fpp: float = 0.03,
) -> dict[int, BloomShard]:
    """In-memory Bloom build: the same probe/bit_or pipeline as
    ``build_shards_to_store``, collected to a driver dict. For BOUNDED key
    sets (tests, small dims) only — the engine path writes per-bucket files
    via the store build instead."""
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
    """In-memory split over ANY shard set exposing
    ``might_contain(buckets, keys) -> bool ndarray`` — the protocol both
    Bloom and cuckoo ``InMemoryShardSet`` wrap. The shard set ships via
    closure, so this variant is for BOUNDED sets (tests, small dims); the
    engine path is ``split_by_filter_store``."""

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
    return split_by_filter(batch, InMemoryShardSet(shards))


def merge_with_bloom(
    existing: DataFrame, batch: DataFrame, shards: dict[int, BloomShard]
) -> DataFrame:
    """Bloom-accelerated MERGE-NOT-MATCHED — see ``merge_with_filter``.
    No shards -> plain exact merge: nothing to prune with, so skip the
    Arrow mark pass entirely (and keep the anti-join backstop)."""
    if not shards:
        from crawlee_spark.operators.frontier import merge_new_requests

        return merge_new_requests(existing, batch)
    return merge_with_filter(existing, batch, InMemoryShardSet(shards))


class ShardStoreBase:
    """Shared plumbing for the bucket-partitioned URL-seen shard stores
    (Bloom subclass below; cuckoo subclass in ``operators/cuckoo.py``).

    Store layout under ``root``:

      shards/b{bucket}.npy    one array per bucket, written by the
                              executors during builds
      {meta_filename}         the COMMIT POINT (written last, atomically):
                              per-bucket scalars (+ byte size, re-checked
                              on load) and the frontier snapshot the
                              shards reflect

    The driver holds only the json-sized meta; splits ship a
    ``StoreShardRef`` and each executor task loads just its buckets' files
    (``split_by_filter_store``).

    Coverage invariant: a NON-EMPTY meta always covers every bucket that
    has frontier keys — it starts from a full ``rebuild`` and each
    ``refresh_buckets`` only adds/replaces buckets. Callers must NOT
    ``refresh_buckets`` over an empty meta (e.g. after a failed ``load``):
    stamping a partial set as fresh would route the uncovered buckets'
    keys down the definitely-unseen fast path, skipping the exact
    anti-join backstop. The engine rebuilds from the full frontier in that
    state (``engine.py`` post-commit shard maintenance)."""

    kind: str = ""
    meta_filename: str = ""

    def __init__(self, root: str):
        self.root = root
        self._meta: dict[int, dict] = {}
        # persisted marked frames from split() awaiting release (engine
        # unpersists after the frontier commit via release_pinned())
        self._pinned: list[DataFrame] = []
        # frontier snapshot id the persisted shards reflect. A crash between
        # the frontier commit and the shard save leaves this stale; callers
        # (engine) compare it against the live snapshot id on resume and
        # rebuild on mismatch — stale shards would route just-committed keys
        # through the 'definitely unseen' fast path, skipping the exact
        # anti-join backstop and breaking the no-false-negative guarantee.
        self.frontier_snapshot: int | None = None

    # -- subclass hooks -----------------------------------------------------

    def _decode_entry(self, info: dict) -> dict:
        """Validate + normalize one per-bucket meta entry (raises on any
        missing/invalid field -> load() routes to rebuild)."""
        raise NotImplementedError

    def _build_to_store(self, keys: DataFrame, gen: str) -> dict[int, dict]:
        """Distributed build into ``shards_dir`` under generation ``gen``;
        returns per-bucket meta (each entry carrying that ``gen``)."""
        raise NotImplementedError

    # -- shared surface -----------------------------------------------------

    @property
    def shards_dir(self) -> str:
        return os.path.join(self.root, "shards")

    def has_shards(self) -> bool:
        return bool(self._meta)

    def shard_path(self, bucket: int) -> str:
        """Current on-disk path of a bucket's shard file (generation-aware;
        introspection/tests)."""
        return os.path.join(
            self.shards_dir,
            shard_filename(bucket, self._meta[bucket].get("gen", "")))

    def ref(self) -> StoreShardRef:
        return StoreShardRef(self.kind, self.shards_dir, dict(self._meta))

    @property
    def shards(self) -> dict:
        """Driver-side materialization of EVERY shard — introspection and
        tests only. The engine path never calls this; it ships a
        ``StoreShardRef`` so arrays stay executor-local."""
        return {b: self.ref().load_shard(b) for b in self._meta}

    def load(self) -> bool:
        """False (-> caller rebuilds) on missing OR inconsistent state: a
        crash mid-save may leave bucket files whose sizes disagree with the
        json (the commit point), or an older npz-era layout — all route to
        the rebuild path, never crash the resume."""
        meta_path = os.path.join(self.root, self.meta_filename)
        if not os.path.exists(meta_path):
            return False
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            per_bucket = meta["per_bucket"]  # npz-era json lacks this -> rebuild
            loaded = {}
            for b, info in per_bucket.items():
                entry = self._decode_entry(info)
                path = os.path.join(
                    self.shards_dir,
                    shard_filename(int(b), entry.get("gen", "")))
                if os.path.getsize(path) != entry["nbytes"]:
                    raise OSError(f"shard {path} size mismatch")
                loaded[int(b)] = entry
        except Exception:
            # visible signal: a PERSISTENT load failure (format drift,
            # permissions, truncation, …) silently costs a full-frontier
            # shard rebuild on EVERY resume if nobody notices
            import logging

            logging.getLogger(__name__).warning(
                "%s url-seen shard state at %s is unreadable; resume will "
                "rebuild shards from the frontier", self.kind, self.root,
                exc_info=True)
            self._meta = {}
            self.frontier_snapshot = None
            return False
        self._meta = loaded
        self.frontier_snapshot = meta.get("frontier_snapshot")
        return True

    def save(self, frontier_snapshot: int | None = None) -> None:
        """Write the json commit point. Bucket files are already in place
        (builds write them executor-side); the json goes last, atomically,
        so a crash mid-build leaves the old json pointing at the old state
        (extra new files are ignored; sizes re-checked on load)."""
        if frontier_snapshot is not None:
            self.frontier_snapshot = frontier_snapshot
        os.makedirs(self.root, exist_ok=True)
        _atomic_write(
            os.path.join(self.root, self.meta_filename),
            json.dumps({
                "per_bucket": {str(b): info for b, info in sorted(self._meta.items())},
                "frontier_snapshot": self.frontier_snapshot,
            }),
        )

    @staticmethod
    def _new_gen() -> str:
        """Fresh per-build generation token (``shard_filename``): random,
        so no two builds — including builds after a lost/corrupt meta,
        where a counter would restart — ever share a filename."""
        return uuid.uuid4().hex[:12]

    def _gc_unreferenced(self) -> None:
        """Drop shard files the CURRENT meta does not reference: buckets a
        rebuild no longer covers and superseded generations. A zombie task
        writing its (old-generation) file after this sweep leaves an orphan
        that is never loaded and is removed by the next build's sweep."""
        referenced = {shard_filename(b, e.get("gen", ""))
                      for b, e in self._meta.items()}
        try:
            for name in os.listdir(self.shards_dir):
                if (name.startswith("b") and name.endswith(".npy")
                        and name not in referenced):
                    os.remove(os.path.join(self.shards_dir, name))
        except OSError:
            pass

    def rebuild(self, frontier_keys: DataFrame,
                frontier_snapshot: int | None = None) -> None:
        self._meta = self._build_to_store(frontier_keys, self._new_gen())
        self.save(frontier_snapshot)
        self._gc_unreferenced()

    def refresh_buckets(self, touched_keys: DataFrame,
                        frontier_snapshot: int | None = None) -> None:
        """Re-build only the touched buckets' files (touched_keys must be
        the FULL key set of those buckets); untouched shards are kept —
        O(touched buckets) work and I/O. See the class docstring's coverage
        invariant: only valid over a non-empty meta."""
        new = self._build_to_store(touched_keys, self._new_gen())
        self._meta.update(new)
        self.save(frontier_snapshot)
        self._gc_unreferenced()

    def split(self, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(definitely_unseen, maybe_seen) via the store-partitioned split.
        The underlying marked frame is persisted (one mark-UDF pass per
        merge) and stashed; call :meth:`release_pinned` once the consumers
        have evaluated (the engine does, after each frontier commit)."""
        if not self._meta:
            return batch, batch.filter(F.lit(False))
        unseen, maybe, marked = split_by_filter_store(batch, self.ref())
        self._pinned.append(marked)
        return unseen, maybe

    def release_pinned(self) -> None:
        """Unpersist the marked frames stashed by :meth:`split`. Safe to
        call any time after their consumers evaluated; idempotent."""
        pinned, self._pinned = self._pinned, []
        for df in pinned:
            try:
                df.unpersist()
            except Exception:
                pass

    def merge(self, existing: DataFrame, batch: DataFrame) -> DataFrame:
        """Filter-accelerated MERGE-NOT-MATCHED (engine path): exact
        anti-join runs only on maybe-seen rows. Semantics identical to
        ``frontier.merge_new_requests``."""
        if not self._meta:
            from crawlee_spark.operators.frontier import merge_new_requests

            return merge_new_requests(existing, batch)
        unseen, maybe = self.split(batch)
        really_new = maybe.join(
            existing.select("url_hash"), on="url_hash", how="left_anti")
        return unseen.unionByName(really_new)


class UrlSeenShards(ShardStoreBase):
    """Persisted per-bucket Bloom shards with resume — the durable analog of
    the reference's in-process LRU, rebuilt from the frontier on resume
    (SURVEY.md §2.3 'rebuilt from Iceberg url-seen table on resume').
    Store layout + invariants: ``ShardStoreBase``."""

    kind = "bloom"
    meta_filename = "shards.json"

    def __init__(self, root: str, expected_per_bucket: int = 1_000_000, fpp: float = 0.03):
        super().__init__(root)
        self.expected = expected_per_bucket
        self.fpp = fpp

    def _decode_entry(self, info: dict) -> dict:
        return {"k": int(info["k"]), "nbytes": int(info["nbytes"]),
                "gen": str(info.get("gen", ""))}

    def _build_to_store(self, keys: DataFrame, gen: str) -> dict[int, dict]:
        return build_shards_to_store(keys, self.shards_dir, self.expected,
                                     self.fpp, gen)
