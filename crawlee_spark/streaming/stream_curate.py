"""Streaming quality curation: document micro-batches through the gate
stack as they arrive.

The streaming twin of ``plans/queries.py::q_curation_pipeline`` stages
1-3 — the shape a continuously-crawling training pipeline runs: documents
stream in as they are fetched and each micro-batch gets its per-document
verdict (Gopher rules → distilled classifier → bigram-LM fluency band)
before being handed to downstream dedup (``stream_dedup.StreamingDedup``
is stage 4 — run it over this stream's ``kept`` output).

State design: the classifier weight dim and the LM count dims are built
ONCE from a REFERENCE corpus at construction (the lm/classifier
train/score split) and pinned executor-local — micro-batches only pay the
broadcast-join score pass, never a training aggregate. That matches
production: gates are frozen models; retraining is a new deployment, not
a per-batch side effect. Dims are Heaps-law sized — broadcastable at any
reference-corpus scale.

Recovery: the stream checkpoint replays unprocessed files; the decisions
table is an append-only segment log stamped with the batch id, so a
replayed batch is skipped whole (same replay-guard contract as
StreamingCdxIngest / StreamingDedup). Verdicts are pure functions of
(document, frozen dims), so a replay that does re-run is bit-identical.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlee_spark.operators.classifier import score_hashed, train_hashed_nb
from crawlee_spark.operators.gates import gopher_gate
from crawlee_spark.operators.lm import bigram_dims, score_bigram
from crawlee_spark.store.snapshot_table import AppendTable

DOC_SCHEMA = "doc_id long, text string"


class StreamingCurate:
    """readStream(doc dir, JSON) → foreachBatch(gate stack over frozen
    dims) → decisions append table (doc_id, reject_stage, kept)."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        reference_docs: DataFrame,
        band_lo_16: int = 76,
        band_hi_16: int = 79,
    ):
        self.spark = spark
        # band in 1/16 bits: lo <= -sum_q16/n <= hi, checked in integers
        self.band_lo_16 = band_lo_16
        self.band_hi_16 = band_hi_16
        # frozen models: trained once, pinned; batches never re-aggregate
        # the reference corpus
        self.weights = train_hashed_nb(
            gopher_gate(reference_docs), F.col("kept")
        ).localCheckpoint(eager=True)
        uni, bi_dim, total = bigram_dims(reference_docs)
        self.lm_dims = (
            uni.localCheckpoint(eager=True),
            bi_dim.localCheckpoint(eager=True),
            total.localCheckpoint(eager=True),
        )
        self.decisions = AppendTable(spark, os.path.join(workdir, "decisions"))
        self.batches: list[dict[str, Any]] = []
        # committed-batch replay guard, walked from the manifest chain ONCE
        # (at first use / restart) and then maintained incrementally — the
        # chain walk is O(stream lifetime), so re-walking per batch made the
        # guard quadratic over long-running streams
        self._committed: set[int] | None = None

    def _committed_batches(self) -> set[int]:
        if self._committed is None:
            if not self.decisions.exists():
                self._committed = set()
            else:
                self._committed = {
                    int(m["summary"]["batch_id"])
                    for m in self.decisions.history()
                    if "batch_id" in m.get("summary", {})
                }
        return self._committed

    def verdicts(self, docs: DataFrame) -> DataFrame:
        """Batch-shape gate stack (also usable outside streaming):
        (doc_id, reject_stage ∈ {gopher, classifier, lm-band, NULL},
        kept)."""
        g = gopher_gate(docs).select("doc_id", F.col("kept").alias("g_ok"))
        cls = score_hashed(docs, self.weights).select("doc_id", "predicted")
        lm = score_bigram(docs, self.lm_dims).select(
            "doc_id", "n_tokens", "sum_q16")
        base = docs.select("doc_id").join(g, "doc_id") \
            .join(cls, "doc_id").join(lm, "doc_id")
        band_ok = (
            (-F.col("sum_q16") >= self.band_lo_16 * F.col("n_tokens"))
            & (-F.col("sum_q16") <= self.band_hi_16 * F.col("n_tokens")))
        out = base.select(
            "doc_id",
            F.when(~F.col("g_ok"), F.lit("gopher"))
            .when(~F.col("predicted"), F.lit("classifier"))
            .when(~band_ok, F.lit("lm-band"))
            .alias("reject_stage"),
        )
        return out.withColumn("kept", F.col("reject_stage").isNull())

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in self._committed_batches():
            return  # foreachBatch replay after restart
        docs = batch_df.select("doc_id", "text").dropDuplicates(["doc_id"])
        # pin the verdicts: the gate stack runs ONCE per micro-batch; the
        # append write and the stats aggregation both read the pinned rows
        decided = self.verdicts(docs).withColumn(
            "batch_id", F.lit(int(batch_id))).localCheckpoint(eager=True)
        self.decisions.append(decided, {"batch_id": int(batch_id)}, coalesce=2)
        row = decided.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("kept"),
        ).first()
        self.batches.append(
            {"batch_id": int(batch_id), "seen": int(row["n"]),
             "kept": int(row["kept"] or 0)})
        self._committed_batches().add(int(batch_id))

    def start(self, doc_dir: str, checkpoint_dir: str,
              available_now: bool = True, max_files_per_trigger: int = 1):
        stream = (
            self.spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .json(doc_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def drain(self, doc_dir: str, checkpoint_dir: str,
              timeout_secs: int = 300) -> list[dict]:
        q = self.start(doc_dir, checkpoint_dir, available_now=True)
        q.awaitTermination(timeout_secs)
        return self.batches
