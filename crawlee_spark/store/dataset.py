"""Dataset + KeyValueStore: the reference's result sinks, Spark-first.

Reference semantics (SURVEY.md §2.2, §2.10):

- ``Dataset.pushData`` appends JSON rows to an append-only store
  (``packages/core/src/storages/dataset.ts:262-281``); ``getData`` reads with
  offset/limit/desc/fields/clean (``dataset.ts:262-302``);
  ``exportToJSON/CSV`` dumps the whole table (``dataset.ts:332-392``);
  ``map/reduce/forEach`` iterate rows (``dataset.ts:443-518``).
- ``KeyValueStore.get/setValue`` upserts named records, content-type aware
  (``key_value_store.ts:151-352``).

Spark mapping: Dataset = AppendTable of parquet segments (columnar, splittable
— the JSON-file-per-item store collapses into segment appends);
``getData(desc, offset, limit)`` is an ORDER BY + OFFSET/LIMIT over an
explicit ``seq`` column (the reference's insertion index); ``map/reduce`` are
``select``/``agg`` — exposed here only as thin wrappers so reference code
ports 1:1. KeyValueStore = one JSON file per key with atomic replace (driver
metadata scale, not data scale — matching the reference's usage for state
blobs like SDK_CRAWLER_STATISTICS, ``statistics.ts:288-297``).

Scale: a Dataset append writes only the new segment; ``getData`` at
offset/limit N reads only the manifest-pruned segments whose seq ranges
overlap (segment seq bounds are recorded in each manifest summary).
"""

from __future__ import annotations

import contextlib
import json
import os
import uuid
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlee_spark.store.snapshot_table import AppendTable, _atomic_write


class Dataset:
    """Append-only results table with insertion-order reads."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.table = AppendTable(spark, root)

    def item_count(self) -> int:
        if not self.table.exists():
            return 0
        return int(self.table.manifest()["summary"].get("item_count", 0))

    def push_data(self, df: DataFrame) -> int:
        """pushData: append rows; a ``seq`` column records global insertion
        order (per-batch dense, start = previous item_count — the reference's
        array index semantics without a global shuffle).

        The dense index is assigned ALL-JVM: per-partition row counts (one
        tiny job, #partitions rows on the driver) → cumulative start offsets
        broadcast back → ``row_number()`` over per-partition windows ordered
        by ``monotonically_increasing_id()`` (monotone within a partition by
        construction). No global sort, no row ever crosses into Python —
        the previous ``rdd.zipWithIndex`` implementation deserialized every
        result row through the Python worker, a per-row crossing in a sink
        whose volume grows with corpus size."""
        from pyspark.sql import Window

        start = self.item_count()
        # persist: the frame is evaluated twice (counts job + the append
        # write) and the per-partition ids MUST agree between the two — an
        # un-pinned nondeterministic input (limit/sample/AQE re-coalescing)
        # could land rows in a _pid absent from the offset dim, and the
        # inner join below would silently drop them while the manifest
        # counters came from the first evaluation
        staged = (
            df.withColumn("_pid", F.spark_partition_id())
            .withColumn("_mid", F.monotonically_increasing_id())
        ).persist()
        counts = staged.groupBy("_pid").count().collect()
        acc = start
        offs = []
        for r in sorted(counts, key=lambda r: r["_pid"]):
            offs.append((int(r["_pid"]), acc))
            acc += int(r["count"])
        n = acc - start
        off_df = self.spark.createDataFrame(offs or [(0, start)],
                                            "_pid int, _off long")
        w = Window.partitionBy("_pid").orderBy("_mid")
        with_seq = (
            staged.join(F.broadcast(off_df), "_pid")
            .withColumn("seq",
                        (F.col("_off") + F.row_number().over(w) - 1)
                        .cast("long"))
            .drop("_pid", "_mid", "_off")
        )
        # cumulative per-segment seq bounds (aligned with the manifest's
        # cumulative ``segments`` list): get_data's pruning reads ONE
        # manifest instead of walking the whole history per call
        prev = (self.table.manifest()["summary"].get("seq_bounds", [])
                if self.table.exists() else [])
        try:
            self.table.append(with_seq, {"item_count": start + n,
                                         "seq_min": start,
                                         "seq_max": start + n - 1,
                                         "seq_bounds": prev + [[start, start + n - 1]]})
        finally:
            staged.unpersist()
        return n

    def get_data(
        self,
        offset: int = 0,
        limit: int | None = None,
        desc: bool = False,
        fields: list[str] | None = None,
    ) -> DataFrame:
        """getData with the reference's offset/limit/desc/fields options
        (``dataset.ts:262-302``).

        ``seq`` is a DENSE global insertion index (push_data starts each
        batch at the previous item_count), so offset/limit translate
        EXACTLY into a seq range — which prunes at the segment level via
        the per-append (seq_min, seq_max) manifest summaries: a
        getData(offset, limit) over a large dataset reads only the
        overlapping segments, never the whole table."""
        total = self.item_count()
        if desc:
            hi = total - offset                       # exclusive
            lo = hi - limit if limit is not None else 0
        else:
            lo = offset
            hi = lo + limit if limit is not None else total
        lo = max(lo, 0)
        df = self._read_seq_range(lo, hi)
        df = df.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        df = df.orderBy(F.col("seq").desc() if desc else F.col("seq").asc())
        if fields:
            df = df.select(*fields)
        else:
            df = df.drop("seq")
        return df

    def _read_seq_range(self, lo: int, hi: int) -> DataFrame:
        """Read only the segments whose (seq_min, seq_max) overlap [lo, hi),
        from the LATEST manifest's cumulative ``seq_bounds`` (one metadata
        read, not an O(appends) history walk). A table written before
        seq_bounds existed falls back to reading everything — never prune
        blindly on unknown bounds."""
        import os as _os

        m = self.table.manifest()
        segments = m.get("segments", [])
        bounds = m.get("summary", {}).get("seq_bounds")
        if bounds is None or len(bounds) != len(segments):
            keep = list(segments)
        else:
            keep = [seg for seg, (smin, smax) in zip(segments, bounds)
                    if smax >= lo and smin < hi]
        if not keep:
            return self.spark.createDataFrame([], m["schema_ddl"])
        paths = [_os.path.join(self.table.data_dir, s) for s in keep]
        return self.spark.read.parquet(*paths)

    def export_to_json(self, path: str) -> None:
        """exportToJSON (``dataset.ts:332-360``) — single ordered file, same
        bytes as ``json.dumps(rows, indent=2)``.

        Memory bound: rows are STREAMED through ``toLocalIterator()`` (the
        driver holds one partition at a time, never the table — the
        reference's export is also single-file, ``dataset.ts:332-392``, so
        single-writer is the semantics; the distributed scale path is
        ``export_distributed``)."""
        with _atomic_stream(path) as f:
            first = True
            for row in self.table.read().orderBy("seq").toLocalIterator():
                d = row.asDict(recursive=True)
                d.pop("seq", None)
                item = json.dumps(d, indent=2, default=str)
                head = "[\n" if first else ",\n"
                f.write(head + "\n".join("  " + ln for ln in item.splitlines()))
                first = False
            f.write("[]" if first else "\n]")

    def export_to_csv(self, path: str) -> None:
        """exportToCSV (``dataset.ts:362-392``; header + rows). Streamed via
        ``toLocalIterator()`` — bounded driver memory (one partition at a
        time), single ordered file."""
        df = self.table.read().orderBy("seq").drop("seq")
        cols = df.columns
        with _atomic_stream(path) as f:
            f.write(",".join(cols) + "\n")
            for r in df.toLocalIterator():
                f.write(",".join(_csv_cell(r[c]) for c in cols) + "\n")

    def export_distributed(self, path: str, fmt: str = "json") -> None:
        """Scale-path export: multi-part ``df.write.json/csv`` keyed by seq
        (one file per partition, executors write in parallel — the variant
        to use when the table is too large for any single-file export)."""
        df = self.table.read().repartitionByRange("seq").sortWithinPartitions("seq")
        writer = df.write.mode("overwrite")
        if fmt == "json":
            writer.json(path)
        elif fmt == "csv":
            writer.option("header", True).csv(path)
        else:
            raise ValueError(f"unsupported export format: {fmt}")

    # map/reduce surface (``dataset.ts:443-518``) — thin DataFrame wrappers
    def map(self, fn: Callable[[DataFrame], DataFrame]) -> DataFrame:
        return fn(self.get_data())

    def reduce(self, agg_exprs: list) -> dict[str, Any]:
        row = self.get_data().agg(*agg_exprs).first()
        return row.asDict() if row else {}


@contextlib.contextmanager
def _atomic_stream(path: str):
    """Streaming counterpart of ``_atomic_write``: write to a tmp file,
    ``os.replace`` into place on clean exit (readers never see a torn
    export), clean up the tmp on failure."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:12]}"
    try:
        with open(tmp, "w") as f:
            yield f
            # flush+fsync BEFORE the rename (same contract as
            # _atomic_write): otherwise a crash can persist the rename but
            # not the data blocks — a truncated export in place of the old
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        with contextlib.suppress(OSError):
            os.remove(tmp)


def _csv_cell(v: Any) -> str:
    if v is None:
        return ""
    s = str(v)
    # \r included: RFC 4180 readers treat a bare CR as a record break
    if any(c in s for c in ",\"\n\r"):
        s = '"' + s.replace('"', '""') + '"'
    return s


class KeyValueStore:
    """Named small-record store: one JSON file per key, atomic replace.

    The reference stores arbitrary content-typed buffers; here values are
    JSON-serializable Python objects (the reference's main uses — INPUT,
    crawl statistics, useState dicts — are all JSON,
    ``key_value_store.ts:151-352``, ``storages/utils.ts:87-94``)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        # reversible percent-encoding (quote of EVERY non-alnum/-/. char,
        # including '_' so it can't collide with an encoded byte): distinct
        # keys never map to one file, and keys() can decode exactly
        from urllib.parse import quote

        safe = quote(key, safe="-.").replace("_", "%5F")
        return os.path.join(self.root, f"{safe}.json")

    def _legacy_path(self, key: str) -> str:
        # pre-encoding scheme (non-alnum -> '_'): kept as a read fallback so
        # stores written by older versions don't silently read as missing
        safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in key)
        return os.path.join(self.root, f"{safe}.json")

    def _resolve(self, key: str) -> str:
        """Path for ``key``, migrating a legacy-named file in place the
        first time the key is touched under the new scheme."""
        p = self._path(key)
        if not os.path.exists(p):
            old = self._legacy_path(key)
            if old != p and os.path.exists(old):
                os.replace(old, p)
        return p

    def set_value(self, key: str, value: Any) -> None:
        if value is None:
            self.delete_value(key)
            return
        _atomic_write(self._resolve(key), json.dumps(value, default=str))

    def get_value(self, key: str, default: Any = None) -> Any:
        p = self._resolve(key)
        if not os.path.exists(p):
            return default
        with open(p) as f:
            return json.load(f)

    def delete_value(self, key: str) -> None:
        p = self._resolve(key)
        if os.path.exists(p):
            os.remove(p)

    def keys(self) -> list[str]:
        from urllib.parse import unquote

        return sorted(
            unquote(f[: -len(".json")])
            for f in os.listdir(self.root) if f.endswith(".json")
        )


# ---------------------------------------------------------------------------
# Configuration-bound open() (dataset.ts:605-616, key_value_store.ts:680-690)
# ---------------------------------------------------------------------------

# The reference purges the DEFAULT (unnamed) storages once per process when
# purgeOnStart is set (storages/utils.ts::purgeDefaultStorages); named
# storages are never purged. Same contract here.
_PURGED_ROOTS: set[str] = set()


def _resolve_root(kind: str, storage_id: str | None, default_key: str,
                  config) -> str:
    from crawlee_spark.configuration import Configuration

    cfg = config or Configuration.get_global_configuration()
    is_default = storage_id is None
    sid = storage_id if storage_id is not None else cfg.get(default_key)
    root = cfg.storage_path(kind, sid)
    if is_default and cfg.get("purge_on_start") and root not in _PURGED_ROOTS:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    _PURGED_ROOTS.add(root)
    return root


def open_dataset(spark: SparkSession, dataset_id: str | None = None,
                 config=None) -> Dataset:
    """``Dataset.open`` analog: resolve the root from the Configuration
    (``CRAWLEE_STORAGE_DIR``/``CRAWLEE_DEFAULT_DATASET_ID``); the unnamed
    default dataset is purged once per process under ``purge_on_start``."""
    return Dataset(spark,
                   _resolve_root("datasets", dataset_id,
                                 "default_dataset_id", config))


def open_key_value_store(store_id: str | None = None,
                         config=None) -> KeyValueStore:
    """``KeyValueStore.open`` analog (same resolution/purge contract)."""
    return KeyValueStore(
        _resolve_root("key_value_stores", store_id,
                      "default_key_value_store_id", config))


def get_input(config=None) -> Any:
    """``KeyValueStore.getInput()``: the ``input_key`` record of the default
    store (``key_value_store.ts:69-82``)."""
    from crawlee_spark.configuration import Configuration

    cfg = config or Configuration.get_global_configuration()
    return open_key_value_store(config=cfg).get_value(cfg.get("input_key"))


def open_request_queue(spark: SparkSession, queue_id: str | None = None,
                       config=None, num_buckets: int = 32):
    """``RequestQueue.open`` analog: a ``FrontierTable`` rooted at
    ``{storage_dir}/request_queues/{id}`` (``CRAWLEE_DEFAULT_REQUEST_QUEUE_ID``
    resolves the unnamed default; same purge contract as the other stores).
    Creates the empty table when absent — the reference's ``open`` creates
    the storage, and a bare handle would FileNotFoundError on first use.
    ``num_buckets`` applies only at creation (an existing table's stored
    bucket count is the authority)."""
    from crawlee_spark.operators.frontier import FrontierTable

    root = _resolve_root("request_queues", queue_id,
                         "default_request_queue_id", config)
    ft = FrontierTable(spark, root, num_buckets)
    if not ft.exists():
        return FrontierTable.create(spark, root, num_buckets)
    return ft
