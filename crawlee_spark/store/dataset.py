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

import json
import os
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
        array index semantics without a global shuffle: zipWithIndex is done
        once per appended batch, not over the table)."""
        start = self.item_count()
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType(list(df.schema.fields) + [StructField("seq", LongType())])
        rdd = df.rdd.zipWithIndex().map(lambda t: tuple(t[0]) + (start + t[1],))
        with_seq = self.spark.createDataFrame(rdd, schema)
        n = with_seq.count()
        self.table.append(with_seq, {"item_count": start + n,
                                     "seq_min": start, "seq_max": start + n - 1})
        return n

    def get_data(
        self,
        offset: int = 0,
        limit: int | None = None,
        desc: bool = False,
        fields: list[str] | None = None,
    ) -> DataFrame:
        """getData with the reference's offset/limit/desc/fields options
        (``dataset.ts:262-302``)."""
        df = self.table.read()
        order = F.col("seq").desc() if desc else F.col("seq").asc()
        df = df.orderBy(order)
        if offset:
            df = df.offset(offset)
        if limit is not None:
            df = df.limit(limit)
        if fields:
            df = df.select(*fields)
        else:
            df = df.drop("seq")
        return df

    def export_to_json(self, path: str) -> None:
        """exportToJSON (``dataset.ts:332-360``) — single ordered file."""
        rows = [r.asDict(recursive=True) for r in self.table.read().orderBy("seq").collect()]
        for r in rows:
            r.pop("seq", None)
        _atomic_write(path, json.dumps(rows, indent=2, default=str))

    def export_to_csv(self, path: str) -> None:
        """exportToCSV (``dataset.ts:362-392``; header + rows)."""
        df = self.table.read().orderBy("seq").drop("seq")
        cols = df.columns
        lines = [",".join(cols)]
        for r in df.collect():
            lines.append(",".join(_csv_cell(r[c]) for c in cols))
        _atomic_write(path, "\n".join(lines) + "\n")

    # map/reduce surface (``dataset.ts:443-518``) — thin DataFrame wrappers
    def map(self, fn: Callable[[DataFrame], DataFrame]) -> DataFrame:
        return fn(self.get_data())

    def reduce(self, agg_exprs: list) -> dict[str, Any]:
        row = self.get_data().agg(*agg_exprs).first()
        return row.asDict() if row else {}


def _csv_cell(v: Any) -> str:
    if v is None:
        return ""
    s = str(v)
    if any(c in s for c in ",\"\n"):
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
        safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in key)
        return os.path.join(self.root, f"{safe}.json")

    def set_value(self, key: str, value: Any) -> None:
        if value is None:
            self.delete_value(key)
            return
        _atomic_write(self._path(key), json.dumps(value, default=str))

    def get_value(self, key: str, default: Any = None) -> Any:
        p = self._path(key)
        if not os.path.exists(p):
            return default
        with open(p) as f:
            return json.load(f)

    def delete_value(self, key: str) -> None:
        p = self._path(key)
        if os.path.exists(p):
            os.remove(p)

    def keys(self) -> list[str]:
        return sorted(
            f[: -len(".json")] for f in os.listdir(self.root) if f.endswith(".json")
        )
