"""Structured-Streaming surface: the keepAlive / dynamic-queue mode.

Reference mapping (SURVEY.md §2.9):

- Crawlee's queue is dynamic — producers ``addRequest`` while consumers
  fetch (``request_provider.ts:105-158`` + ``request_queue.ts:115-171``),
  and ``keepAlive`` keeps the crawler running on an empty queue
  (``basic-crawler.ts:284-288, 683-686``).
- Spark-first: a file-source stream of seed batches drives
  ``foreachBatch``; each micro-batch runs ONE engine superstep path
  (canonicalize → MERGE → budgeted fetch → enqueue). Checkpointing is the
  stream's checkpoint dir + the frontier's own snapshots — either alone can
  recover the crawl.
- Late/duplicate arrivals are handled by the same MERGE dedup (the frontier
  key set is the dedup state — no separate streaming state store needed,
  which is what keeps this restartable at 10^10 keys: state lives in the
  table, not in the executor).
- ``windowed_fetch_rate`` shows the watermark + windowed-agg pattern over
  the fetch log (the reference's 60 s sliding rate window, SURVEY.md §2.6).

The BSP driver loop (engine.py) remains the primary execution mode; this
module is the ``keepAlive=true`` analog for continuously-arriving seeds.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlee_spark.engine import CrawlConfig, CrawlEngine


class StreamingCrawl:
    """readStream(seed dir) → foreachBatch(superstep) → frontier snapshots.

    Seeds arrive as text files of URLs (one per line) dropped into
    ``seed_dir``; each micro-batch enqueues them and advances the crawl one
    superstep against ``corpus``.
    """

    def __init__(self, spark: SparkSession, workdir: str, corpus: DataFrame,
                 cfg: CrawlConfig | None = None, robots: DataFrame | None = None):
        self.spark = spark
        self.engine = CrawlEngine(spark, workdir, cfg)
        self.corpus = corpus
        self.robots = robots
        self.batches: list[dict[str, Any]] = []

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        urls = batch_df.select(F.col("value").alias("url")).filter(F.col("url") != "")
        if not self.engine.frontier.exists():
            self.engine.add_seeds(urls)
        else:
            # same canonicalization flags as add_seeds / the superstep's
            # enqueue — a keep_fragment / extended-unique-key config must
            # not depend on WHICH batch delivered a URL
            cfg = self.engine.cfg
            self.engine.frontier.add_requests(
                urls, step=self.engine.step,
                keep_fragment=cfg.keep_fragment,
                use_extended_unique_key=cfg.use_extended_unique_key,
            )
        stats = self.engine.run_superstep(self.corpus, self.robots)
        self.batches.append({"batch_id": batch_id, **stats})

    def start(self, seed_dir: str, checkpoint_dir: str, available_now: bool = True):
        """availableNow=True drains pending files then stops (the testable
        mode); False = keepAlive — run until explicitly stopped."""
        stream = self.spark.readStream.format("text").load(seed_dir)
        writer = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def drain(self, seed_dir: str, checkpoint_dir: str, timeout_secs: int = 300) -> list[dict]:
        """Run availableNow to completion, then keep running supersteps until
        the frontier drains (new links enqueued by the last batch still need
        fetching after the stream stops)."""
        q = self.start(seed_dir, checkpoint_dir, available_now=True)
        q.awaitTermination(timeout_secs)
        totals = self.engine.run(self.corpus, robots=self.robots)
        return self.batches + [{"batch_id": "drain", **totals}]


def windowed_fetch_rate(fetch_log: DataFrame, window: str = "60 seconds",
                        slide: str = "15 seconds", watermark: str = "2 minutes",
                        ts_col: str = "ts") -> DataFrame:
    """Watermarked sliding-window fetch counts — the Structured Streaming
    form of the reference's rate buckets. Works on a static DataFrame too
    (identical expression; the watermark is a no-op in batch mode)."""
    df = fetch_log
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(F.count("*").alias("fetches"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "fetches")
    )


def streaming_url_seen(stream: DataFrame, watermark: str = "10 minutes",
                       ts_col: str = "ts", url_col: str = "url") -> DataFrame:
    """Streaming URL-seen: canonicalize → xxhash64 unique key →
    ``dropDuplicatesWithinWatermark`` on the key.

    Two-tier dedup at 10^10-URL scale: this operator bounds IN-FLIGHT
    duplicate state to keys newer than the watermark (the state store holds
    O(keys-per-watermark-window), not O(all keys ever)); DURABLE dedup
    stays the frontier MERGE anti-join against the snapshot table, exactly
    like the batch engine — executors never hold the full seen set. The
    reference's analog is the 1M-LRU uniqueKey cache in front of the
    storage dedup (``request_provider.ts:46-47, 129-158``): same
    recent-keys-in-memory / full-set-in-storage split, with the watermark
    playing the LRU-bound role deterministically.

    Batch DataFrames get plain dropDuplicates (same key expression), so the
    operator is testable against the batch path one-to-one.
    """
    from crawlee_spark.functions.urls import canonicalize

    keyed = (
        stream.withColumn("_canon", canonicalize(F.col(url_col)))
        .filter(F.col("_canon").isNotNull())
        .withColumn("url_hash", F.xxhash64(F.col("_canon")))
    )
    if keyed.isStreaming:
        return keyed.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(["url_hash"])
    return keyed.dropDuplicates(["url_hash"])
