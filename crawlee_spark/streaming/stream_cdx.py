"""Streaming CDX index ingestion → frontier seeds.

Common Crawl publishes each snapshot's index as shard files that land
over hours; a pipeline that waits for the full set wastes a day of crawl
budget. This source streams shards AS THEY ARRIVE: readStream(text) →
foreachBatch(parse + select + frontier MERGE). Idempotence is layered —
a foreachBatch replay after restart is skipped via the frontier's lineage
(batch ids recorded in commit summaries), and re-selected URLs across
batches dedup through the frontier's canonical-key MERGE anyway, so the
worst case of a replay is a no-op commit, never a duplicate request.

Scale shape per batch: the per-file parse/select is the cdx_select plan
(scan → two map-side-combining aggs) over ONLY the new shard's lines;
the frontier MERGE touches only the buckets the new URLs hash into.
State = the frontier itself — no second store to reconcile.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlee_spark.operators.frontier import FrontierTable
from crawlee_spark.sources.cdx import parse_cdxj, select_captures


class StreamingCdxIngest:
    """readStream(CDX-J shard dir) → foreachBatch(select + enqueue)."""

    def __init__(self, spark: SparkSession, workdir: str,
                 mime_prefix: str | None = "image/",
                 statuses: tuple[str, ...] = ("200",),
                 num_buckets: int = 8):
        self.spark = spark
        self.mime_prefix = mime_prefix
        self.statuses = statuses
        path = os.path.join(workdir, "frontier")
        self.frontier = (
            FrontierTable(spark, path, num_buckets=num_buckets)
            if FrontierTable(spark, path, num_buckets=num_buckets).exists()
            else FrontierTable.create(spark, path, num_buckets=num_buckets)
        )
        self.batches: list[dict[str, Any]] = []

    def _committed_batches(self, ckpt: str) -> set[int]:
        # batch ids are only unique WITHIN one streaming checkpoint: a
        # rebuilt checkpoint dir renumbers from 0 against the same
        # frontier, so the stamp is (checkpoint, batch_id) — a bare
        # batch_id would make the new stream skip genuinely new shards
        # that happen to land in low-numbered batches. (Deleting and
        # recreating the SAME checkpoint path still collides; the MERGE
        # dedup bounds the damage to skipped-not-duplicated, documented.)
        return {
            int(m["summary"]["step"])
            for m in self.frontier.table.history()
            if m.get("operation") == "add_requests"
            and "step" in m.get("summary", {})
            and m.get("summary", {}).get("ckpt") == ckpt
        }

    def _process_batch(self, batch_df: DataFrame, batch_id: int,
                       ckpt: str) -> None:
        if int(batch_id) in self._committed_batches(ckpt):
            return  # replay after restart: commit already landed
        selected = select_captures(
            parse_cdxj(batch_df.select(F.col("value").alias("line"))),
            mime_prefix=self.mime_prefix, statuses=self.statuses,
        )
        reqs = selected.select(
            "url", F.lit(False).alias("forefront"), F.lit(0).alias("depth")
        )
        # (ckpt, batch_id) stamps the commit summary, making replays
        # detectable; an all-duplicate batch still commits (MERGE keeps
        # content identical), so the stamp always lands for non-empty input
        stats = self.frontier.add_requests(
            reqs, step=int(batch_id), summary_extra={"ckpt": ckpt}
        )
        self.batches.append({"batch_id": int(batch_id), **stats})

    def start(self, shard_dir: str, checkpoint_dir: str,
              available_now: bool = True, max_files_per_trigger: int = 1):
        stream = (
            self.spark.readStream
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .text(shard_dir)
        )
        ckpt = os.path.abspath(checkpoint_dir)
        writer = (
            stream.writeStream
            .foreachBatch(lambda df, bid: self._process_batch(df, bid, ckpt))
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def drain(self, shard_dir: str, checkpoint_dir: str,
              timeout_secs: int = 300) -> list[dict]:
        q = self.start(shard_dir, checkpoint_dir, available_now=True)
        q.awaitTermination(timeout_secs)
        return self.batches
