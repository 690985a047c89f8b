"""Copy-on-write snapshot tables over parquet (Iceberg stand-in).

Replaces the reference's file-per-request JSON storage
(``packages/memory-storage/src/fs/request-queue/fs.ts:13-84``: one JSON file
per request, per-file locks, background metadata writes) with set-based
atomic commits:

- data lives under ``<root>/data/snap-<n>/bucket=<b>/*.parquet``;
- a manifest ``<root>/manifests/snap-<n>.json`` maps every bucket to the
  snapshot that last rewrote it (per-partition lineage) plus summary stats;
- ``<root>/_CURRENT`` names the live snapshot; it is flipped atomically via
  ``os.replace`` — a crash mid-commit leaves the previous snapshot intact
  (the reference needs per-file locks + consistency sleeps for this,
  ``storages/utils.ts:126-142``; snapshot isolation makes them unnecessary).

Scale notes (100 TB / 1000 executors): a commit touches only the buckets the
superstep wrote; untouched buckets are inherited by reference, so commit cost
is O(changed data), not O(table). Reads prune to requested buckets before
parquet listing. Real Iceberg adds file-level pruning and a catalog; the
engine's call sites are MERGE-shaped so the swap is mechanical.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _atomic_write(path: str, text: str) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class SnapshotTable:
    """Bucketed copy-on-write table with atomic snapshot commits."""

    def __init__(self, spark: SparkSession, root: str, bucket_col: str = "bucket"):
        self.spark = spark
        self.root = root
        self.bucket_col = bucket_col
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "manifests")
        self.current_path = os.path.join(root, "_CURRENT")

    # -- lifecycle ----------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        bucket_col: str = "bucket",
        num_buckets: int = 32,
        summary: dict[str, Any] | None = None,
    ) -> "SnapshotTable":
        """Create the table from an initial DataFrame (must carry bucket_col)."""
        t = cls(spark, root, bucket_col)
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.manifest_dir, exist_ok=True)
        t._commit_full(df, num_buckets, operation="create", summary=summary or {})
        return t

    def exists(self) -> bool:
        return os.path.exists(self.current_path)

    def current_snapshot_id(self) -> int:
        with open(self.current_path) as f:
            return int(f.read().strip())

    def manifest(self, snapshot_id: int | None = None) -> dict[str, Any]:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        with open(os.path.join(self.manifest_dir, f"snap-{sid}.json")) as f:
            return json.load(f)

    def history(self) -> list[dict[str, Any]]:
        """Lineage chain, oldest first."""
        out = []
        sid: int | None = self.current_snapshot_id()
        while sid is not None and sid >= 0:
            m = self.manifest(sid)
            out.append(m)
            sid = m.get("parent")
        return list(reversed(out))

    # -- read ---------------------------------------------------------------

    def read(
        self, snapshot_id: int | None = None, buckets: list[int] | None = None
    ) -> DataFrame:
        """Read the (current or time-travel) snapshot, optionally bucket-pruned.

        Bucket pruning happens at path level — a politeness/scheduling scan
        over a few host buckets never lists the rest of the table.
        """
        m = self.manifest(snapshot_id)
        owners: dict[str, list[str]] = {}
        for b, owner in m["buckets"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            owners.setdefault(owner, []).append(b)
        df: DataFrame | None = None
        # the manifest's stored DDL (which includes the partition column)
        # skips per-read schema inference — without it every spark.read
        # eagerly opens parquet footers at DataFrame CONSTRUCTION time
        # (~0.1 s per owner dir on this box), a cost that grows with the
        # snapshot-owner count as a crawl ages (round-5 profile)
        ddl = m["schema_ddl"]
        for owner, bs in sorted(owners.items()):
            base = os.path.join(self.data_dir, owner)
            paths = [os.path.join(base, f"{self.bucket_col}={b}") for b in sorted(bs, key=int)]
            part = self.spark.read.schema(ddl).option("basePath", base).parquet(*paths)
            df = part if df is None else df.unionByName(part)
        if df is None:
            # empty table: synthesize from stored schema
            return self.spark.createDataFrame([], m["schema_ddl"])
        # the stored DDL types the bucket col — cast kept for snapshots
        # written before the DDL carried it
        return df.withColumn(self.bucket_col, F.col(self.bucket_col).cast("int"))

    # -- write --------------------------------------------------------------

    def _next_id(self) -> int:
        # max over ALL manifests, not current+1: after a rollback the current
        # snapshot is older than abandoned-timeline ids, and reusing one of
        # those ids would clobber data dirs other manifests still reference
        return _max_manifest_id(self.manifest_dir) + 1

    def _write_buckets(self, df: DataFrame, snap_name: str) -> list[int]:
        out = os.path.join(self.data_dir, snap_name)
        df.write.partitionBy(self.bucket_col).mode("overwrite").parquet(out)
        written = []
        for entry in os.listdir(out):
            if entry.startswith(f"{self.bucket_col}="):
                written.append(int(entry.split("=", 1)[1]))
        return written

    def _finish(
        self,
        sid: int,
        parent: int | None,
        buckets: dict[str, str],
        operation: str,
        summary: dict[str, Any],
        schema_ddl: str,
    ) -> int:
        manifest = {
            "id": sid,
            "parent": parent,
            "operation": operation,
            "committed_at": time.time(),
            "buckets": buckets,
            "schema_ddl": schema_ddl,
            "summary": summary,
        }
        _atomic_write(
            os.path.join(self.manifest_dir, f"snap-{sid}.json"), json.dumps(manifest)
        )
        _atomic_write(self.current_path, str(sid))
        return sid

    def _commit_full(
        self, df: DataFrame, num_buckets: int, operation: str, summary: dict[str, Any]
    ) -> int:
        sid = self._next_id()
        parent = self.current_snapshot_id() if self.exists() else None
        snap_name = f"snap-{sid}"
        written = self._write_buckets(df, snap_name)
        buckets = {str(b): snap_name for b in written}
        # buckets with no rows simply have no files; record only written ones
        return self._finish(sid, parent, buckets, operation, summary, _schema_ddl(df))

    def commit_buckets(
        self, df: DataFrame, operation: str, summary: dict[str, Any] | None = None,
        touched: list[int] | None = None,
    ) -> int:
        """Copy-on-write commit: ``df`` holds the NEW full content of the
        buckets it contains; all other buckets are inherited from the parent.

        ``touched`` widens the rewrite set: a touched bucket with NO rows in
        ``df`` (e.g. a delete emptied it) is dropped from the manifest —
        without it such a bucket would silently inherit its old rows, since
        the written set is derived from ``df``'s content.
        """
        sid = self._next_id()
        parent = self.current_snapshot_id()
        snap_name = f"snap-{sid}"
        written = self._write_buckets(df, snap_name)
        buckets = dict(self.manifest()["buckets"])
        for b in touched or []:
            buckets.pop(str(b), None)  # emptied unless re-written below
        for b in written:
            buckets[str(b)] = snap_name
        schema_ddl = self.manifest()["schema_ddl"]
        return self._finish(sid, parent, buckets, operation, summary or {}, schema_ddl)

    def rollback(self, snapshot_id: int) -> None:
        """Flip ``_CURRENT`` back to an earlier snapshot (Iceberg
        ``rollback_to_snapshot``). Later snapshots become an abandoned
        timeline: their manifests/data stay on disk (audit) until
        ``expire_snapshots`` drops what the new chain can't reach; new
        commits take FRESH ids (``_next_id`` scans all manifests), so no
        abandoned data dir is ever overwritten."""
        if not os.path.exists(os.path.join(self.manifest_dir, f"snap-{snapshot_id}.json")):
            raise FileNotFoundError(f"no snapshot {snapshot_id} at {self.root}")
        # the manifest may outlive its data (expire_snapshots removes data
        # dirs, manifests stay for audit): verify every referenced owner
        # dir still exists BEFORE flipping, or the flip would land on an
        # unreadable snapshot mid-multi-table rollback
        m = self.manifest(snapshot_id)
        for owner in set(m["buckets"].values()):
            if not os.path.isdir(os.path.join(self.data_dir, owner)):
                raise FileNotFoundError(
                    f"snapshot {snapshot_id} at {self.root} references "
                    f"expired data dir {owner}; it was removed by "
                    f"expire_snapshots and cannot be rolled back to")
        _atomic_write(self.current_path, str(snapshot_id))

    def compact(self) -> int:
        """Rewrite the whole table into one snapshot (maintenance)."""
        df = self.read()
        return self._commit_full(df, 0, "compact", {})

    def diff(self, old_id: int, new_id: int | None = None) -> DataFrame:
        """Rows added/removed between two snapshots (the Iceberg
        incremental-read analog — what an incremental pipeline re-processes
        after a crawl advances the table).

        CoW lineage makes this bucket-pruned for free: a bucket whose
        manifest owner is identical in both snapshots shares the same
        physical files, so it is skipped without reading a byte — only
        rewritten buckets are scanned and compared. At 10^10 rows a
        superstep touches a politeness-bounded bucket subset; the diff
        cost follows THAT, not the table size.

        Full-row MULTISET semantics (``exceptAll``): an updated row
        surfaces as its new version tagged ``_change='added'`` plus its
        old version tagged ``'removed'`` (the change-data-capture view),
        and a change in duplicate-row count surfaces as the surplus copies
        — a set-based anti-join would miss both. Column order follows the
        table schema in both the empty and non-empty paths."""
        new_id = self.current_snapshot_id() if new_id is None else new_id
        mo, mn = self.manifest(old_id), self.manifest(new_id)
        schema_cols = [f.split()[0] for f in mn["schema_ddl"].split(", ")]
        changed = [
            int(b)
            for b in set(mo["buckets"]) | set(mn["buckets"])
            if mo["buckets"].get(b) != mn["buckets"].get(b)
        ]
        if not changed:
            return (
                self.spark.createDataFrame([], mn["schema_ddl"])
                .withColumn("_change", F.lit(""))
                .select(*schema_cols, "_change")
            )
        old = self.read(old_id, buckets=changed).select(*schema_cols)
        new = self.read(new_id, buckets=changed).select(*schema_cols)
        added = new.exceptAll(old).withColumn("_change", F.lit("added"))
        removed = old.exceptAll(new).withColumn("_change", F.lit("removed"))
        return added.unionByName(removed)

    def expire_snapshots(self, keep_last: int = 3) -> None:
        """Drop data dirs unreachable from the last ``keep_last`` snapshots."""
        keep_ids = set()
        chain = self.history()
        for m in chain[-keep_last:]:
            keep_ids.update(m["buckets"].values())
        for entry in os.listdir(self.data_dir):
            if entry not in keep_ids:
                shutil.rmtree(os.path.join(self.data_dir, entry), ignore_errors=True)


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)


def _max_manifest_id(manifest_dir: str) -> int:
    """Highest snapshot id present on disk, -1 when none (covers abandoned
    timelines left behind by rollback, which current_snapshot_id misses)."""
    best = -1
    if os.path.isdir(manifest_dir):
        for entry in os.listdir(manifest_dir):
            if entry.startswith("snap-") and entry.endswith(".json"):
                try:
                    best = max(best, int(entry[5:-5]))
                except ValueError:
                    continue
    return best


class AppendTable:
    """Append-only segment log (fetch log / results / metrics tables)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "manifests")
        self.current_path = os.path.join(root, "_CURRENT")

    def exists(self) -> bool:
        return os.path.exists(self.current_path)

    def current_snapshot_id(self) -> int:
        with open(self.current_path) as f:
            return int(f.read().strip())

    def manifest(self, snapshot_id: int | None = None) -> dict[str, Any]:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        with open(os.path.join(self.manifest_dir, f"snap-{sid}.json")) as f:
            return json.load(f)

    def append(self, df: DataFrame, summary: dict[str, Any] | None = None,
               coalesce: int | None = None) -> int:
        """Append a segment. ``coalesce`` caps output files — per-superstep
        log/metric appends are small and shouldn't pay a 32-task write."""
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)
        sid = _max_manifest_id(self.manifest_dir) + 1  # rollback-safe (see SnapshotTable)
        parent = self.current_snapshot_id() if self.exists() else None
        seg = f"seg-{sid}"
        out = df.coalesce(coalesce) if coalesce else df
        out.write.mode("overwrite").parquet(os.path.join(self.data_dir, seg))
        ddl = _schema_ddl(df)
        if self.exists():
            pm = self.manifest()
            segments = pm["segments"] + [seg]
            # schema stability is tracked incrementally (O(1) per append):
            # true iff every segment in the chain shares this DDL. read()
            # may then skip per-read schema inference; a drifting log
            # (e.g. a router whose output columns vary by step) falls back
            # to inference so older segments are never silently null-filled
            stable = bool(pm.get("schema_stable", False)) \
                and pm["schema_ddl"] == ddl
        else:
            segments = [seg]
            stable = True
        manifest = {
            "id": sid,
            "parent": parent,
            "committed_at": time.time(),
            "segments": segments,
            "schema_ddl": ddl,
            "schema_stable": stable,
            "summary": summary or {},
        }
        _atomic_write(os.path.join(self.manifest_dir, f"snap-{sid}.json"), json.dumps(manifest))
        _atomic_write(self.current_path, str(sid))
        return sid

    def history(self) -> list[dict[str, Any]]:
        """Manifest chain of the CURRENT timeline, oldest first (follows
        ``parent`` links, so abandoned post-rollback manifests are skipped)."""
        out: list[dict[str, Any]] = []
        if not self.exists():
            return out
        sid: int | None = self.current_snapshot_id()
        while sid is not None and sid >= 0:
            m = self.manifest(sid)
            out.append(m)
            sid = m.get("parent")
        return list(reversed(out))

    def rollback(self, snapshot_id: int | None) -> None:
        """Truncate the log to an earlier append (``None`` = before the first
        append: the table reads as non-existent and the next append starts a
        fresh segment list). Segment data of the abandoned tail stays on disk;
        ids are never reused (``append`` scans all manifests)."""
        if snapshot_id is None:
            if os.path.exists(self.current_path):
                os.remove(self.current_path)
            return
        if not os.path.exists(os.path.join(self.manifest_dir, f"snap-{snapshot_id}.json")):
            raise FileNotFoundError(f"no snapshot {snapshot_id} at {self.root}")
        _atomic_write(self.current_path, str(snapshot_id))

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        if not self.exists():
            raise FileNotFoundError(f"AppendTable at {self.root} is empty")
        m = self.manifest(snapshot_id)
        paths = [os.path.join(self.data_dir, s) for s in m["segments"]]
        if m.get("schema_stable", False):
            # stored DDL skips footer-based schema inference at construction
            # (the segment list grows one dir per superstep — see
            # SnapshotTable); only taken when every segment in the chain
            # shares this DDL (flag maintained incrementally by append)
            return self.spark.read.schema(m["schema_ddl"]).parquet(*paths)
        # schema drifted across appends (or pre-flag manifest): infer, so a
        # mixed-schema log surfaces parquet's merge behavior instead of
        # silently null-filling older segments against the newest DDL
        return self.spark.read.parquet(*paths)
