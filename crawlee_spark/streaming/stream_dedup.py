"""Streaming incremental dedup: document micro-batches LSH-matched against
the persisted corpus signature table.

The streaming twin of ``plans/queries.py::q_dedup_incremental`` — the shape
a continuously-crawling training pipeline runs: documents arrive as they are
fetched; each micro-batch is (1) keep-first deduped WITHIN the batch, then
(2) matched against everything already ingested, and only the survivors'
signatures are appended to the corpus state.

State design for 10^10 docs: the corpus side is a SIGNATURE table —
``num_perm`` longs per document, built exactly once when the document is
admitted — never the raw text. A batch therefore pays shingling/hashing for
its own rows only, and the corpus contributes just a band-hash derivation
over already-materialized signatures (8 longs → ``bands`` longs, one
projection). The matching join is the same (band, bh) equi-join as the batch
operator (``operators/dedup.py::minhash_lsh_matches_sigs``): candidate
volume ∝ batch × collision rate, never corpus².

Recovery: the stream checkpoint replays unprocessed files; the signature and
decision tables are append-only segment logs, and ``foreachBatch`` may
re-run a batch on restart. Exactly-once is layered: the DECISIONS append is
the admission stamp and commits LAST, so a stamped batch is skipped whole;
a crash in the window between the sigs append and the stamp replays the
batch, where (a) the matcher's self-id exclusion keeps already-landed
survivors classified ``admitted`` (a doc is never a dup of itself) and
(b) the sigs append is skipped for a batch id already in the sigs lineage —
no duplicate rows, no flipped decisions (pinned by
tests/test_streaming.py::test_streaming_dedup_replay_after_sig_commit_crash).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlee_spark.operators.dedup import (
    minhash_keep_first_sigs,
    minhash_lsh_matches_sigs,
    minhash_signatures,
)
from crawlee_spark.store.snapshot_table import AppendTable

DOC_SCHEMA = "doc_id long, text string"


class StreamingDedup:
    """readStream(doc dir, JSON) → foreachBatch(in-batch keep-first +
    corpus LSH match) → signature/decision append tables."""

    def __init__(self, spark: SparkSession, workdir: str, num_perm: int = 8,
                 bands: int = 4, shingle_n: int = 3):
        self.spark = spark
        self.num_perm = num_perm
        self.bands = bands
        self.shingle_n = shingle_n
        self.sigs = AppendTable(spark, os.path.join(workdir, "sigs"))
        self.decisions = AppendTable(spark, os.path.join(workdir, "decisions"))
        self.batches: list[dict[str, Any]] = []

    def _committed_batches(self) -> set[int]:
        # the DECISIONS table is the admission stamp: it is appended LAST
        # in _process_batch, so its batch_id implies the sigs landed too.
        # (Stamping sigs alone would miss zero-admission batches — they
        # skip the sigs append — and a replay would double their decision
        # rows.)
        if not self.decisions.exists():
            return set()
        return {
            int(m["summary"]["batch_id"])
            for m in self.decisions.history()
            if "batch_id" in m.get("summary", {})
        }

    def _sig_batches(self) -> set[int]:
        if not self.sigs.exists():
            return set()
        return {
            int(m["summary"]["batch_id"])
            for m in self.sigs.history()
            if "batch_id" in m.get("summary", {})
        }

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) in self._committed_batches():
            return  # foreachBatch replay after restart: already admitted
        docs = batch_df.select("doc_id", "text").dropDuplicates(["doc_id"])
        sig_new = minhash_signatures(
            docs, self.num_perm, self.shingle_n
        ).localCheckpoint(eager=True)  # signatures feed 3 jobs below

        drop_in = minhash_keep_first_sigs(sig_new, self.num_perm, self.bands)
        kept = sig_new.join(drop_in, on="id", how="left_anti")
        if self.sigs.exists():
            matches = minhash_lsh_matches_sigs(
                kept, self.sigs.read(), self.num_perm, self.bands
            )
        else:
            matches = self.spark.createDataFrame(
                [], "id long, first_match long, n_matches long"
            )
        survivors = kept.join(matches, on="id", how="left_anti") \
            .localCheckpoint(eager=True)

        decided = (
            sig_new.select("id")
            .join(drop_in.withColumn("_in", F.lit(True)), "id", "left")
            .join(matches, "id", "left")
            .select(
                F.lit(int(batch_id)).alias("batch_id"),
                F.col("id").alias("doc_id"),
                F.when(F.col("_in"), F.lit("dup-in-batch"))
                .when(F.col("first_match").isNotNull(), F.lit("dup-of-corpus"))
                .otherwise(F.lit("admitted")).alias("action"),
                "first_match",
                F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            )
        )
        # commit order matters for crash recovery: sigs FIRST, decisions
        # (the stamp) LAST. A crash between the two leaves sigs committed
        # without a stamp; the replay recomputes (the matcher's self-id
        # exclusion keeps survivors correct against the already-landed
        # sigs) and skips only the sig re-append — no duplicate rows, no
        # duplicate decisions.
        n_admitted = survivors.count()
        if (n_admitted or not self.sigs.exists()) \
                and int(batch_id) not in self._sig_batches():
            self.sigs.append(survivors, {"batch_id": int(batch_id)}, coalesce=2)
        self.decisions.append(decided, {"batch_id": int(batch_id)}, coalesce=2)
        self.batches.append({
            "batch_id": int(batch_id),
            "seen": sig_new.count(),
            "admitted": n_admitted,
        })

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

    def corpus_ids(self) -> set[int]:
        if not self.sigs.exists():
            return set()
        return {r["id"] for r in self.sigs.read().select("id").collect()}
