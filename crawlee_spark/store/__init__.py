"""Snapshot-committed parquet tables (Iceberg stand-in).

The production design targets Iceberg (MERGE INTO, snapshot isolation,
time-travel). This container has no Iceberg runtime jars, so the same
contract is provided by a small manifest-over-parquet layer:

- :class:`~crawlee_spark.store.snapshot_table.SnapshotTable` — copy-on-write
  table bucketed by an integer partition column; a commit rewrites only the
  touched buckets and inherits the rest by reference (per-partition lineage).
- :class:`~crawlee_spark.store.snapshot_table.AppendTable` — append-only log
  of parquet segments (fetch log, results, metrics).

Both give atomic commits (tmp + rename of a ``_CURRENT`` pointer), resume
from any snapshot, and a lineage chain in the manifests. Swapping in real
Iceberg replaces only this module.
"""

from crawlee_spark.store.snapshot_table import AppendTable, SnapshotTable  # noqa: F401
