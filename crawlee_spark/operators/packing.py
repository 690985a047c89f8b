"""Sequence packing: concat-and-chunk documents into fixed token windows.

LLM pre-training consumes documents as fixed-length context windows
(e.g. 512/2048/8192 tokens): documents are concatenated in a deterministic
order and the stream is chunked every ``ctx`` tokens, so each document gets
a starting offset, the id of the window holding its first token, and the
number of windows it spans. This is the last shuffle-bearing stage of a
training-data pipeline — after dedup/filtering, before tensorization.

Scale shape: a GLOBAL concat order would be a single-partition prefix sum
(one task owns 100 TB). Packing does not need global contiguity — windows
are independent training examples — so the corpus is sharded by a hash of
the document key and each shard packs independently:

- shard = md5_hash64(key) % num_shards  → uniform, reproducible across
  runs/engines/partitionings (no ``monotonically_increasing_id``);
- per-shard prefix sum = one window partitioned by ``shard`` (never a
  global window): Spark plans a hash exchange on shard + in-partition
  running sum, exactly parallel at any corpus size;
- at 1000 executors choose num_shards ≈ a few × total cores; each shard's
  window sort is a local sort of corpus/num_shards rows.

Determinism contract: offsets are a pure function of (key order, token
counts) within a shard — integer arithmetic only, so the DuckDB oracle
(``SUM ... OVER (PARTITION BY shard ORDER BY key ROWS UNBOUNDED PRECEDING
TO 1 PRECEDING)``) agrees bit-for-bit.

No reference analog (Crawlee stops at the dataset); north-rule
training-pipeline extension like dedup/ANN (SURVEY.md §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlee_spark.functions.text import md5_hash64


def shard_of(key, num_shards: int):
    """Deterministic shard id for packing: md5_hash64(key) % num_shards.

    md5_hash64 is non-negative (63-bit), so Spark ``%`` and DuckDB ``%``
    agree without pmod gymnastics.
    """
    key = F.col(key) if isinstance(key, str) else key
    return (md5_hash64(key.cast("string")) % num_shards).cast("long")


def shard_manifest(
    df: DataFrame,
    key_col: str,
    bytes_col: str,
    num_buckets: int = 16,
    samples_per_shard: int = 8,
) -> DataFrame:
    """WebDataset-style shard assignment for an image+caption export.

    Multimodal training readers consume fixed-size shards (tar files of
    ~N samples) streamed sequentially; the export step must decide, for
    every sample, which shard it lands in and at which byte offset —
    WITHOUT a global sort. Same sharding shape as ``sequence_pack``:

      bucket      = md5_hash64(key) % num_buckets   (uniform, reproducible)
      rank        = dense 0-based position within the bucket by key order
      shard_id    = bucket * 2^20 + rank div samples_per_shard
      sample_idx  = rank % samples_per_shard
      byte_offset = running sum of ``bytes_col`` of EARLIER samples in the
                    same shard (the tar offset where this sample starts)

    Scale: two windows, each partitioned — by bucket, then by
    (bucket, shard-seq) — never global. At 1000 executors pick
    num_buckets ≈ a few × total cores; each bucket's local sort handles
    corpus/num_buckets rows, and shard boundaries are a pure function of
    (bucket, key order), so re-runs and resumes land samples identically.
    Integer arithmetic only — the DuckDB oracle agrees bit-for-bit.
    """
    out = df.withColumn("bucket", shard_of(key_col, num_buckets))
    w_bucket = Window.partitionBy("bucket").orderBy(F.col(key_col).asc())
    out = out.withColumn(
        "_rank", (F.row_number().over(w_bucket) - 1).cast("long"))
    out = out.withColumn(
        "shard_id",
        (F.col("bucket") * (1 << 20)
         + F.expr(f"_rank div {samples_per_shard}")).cast("long"),
    ).withColumn(
        "sample_idx", (F.col("_rank") % samples_per_shard).cast("long"))
    w_shard = (
        Window.partitionBy("bucket", "shard_id")
        .orderBy(F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = out.withColumn(
        "byte_offset",
        F.coalesce(F.sum(bytes_col).over(w_shard), F.lit(0)).cast("long"),
    )
    return out.drop("_rank")


def sequence_pack(
    df: DataFrame,
    tokens_col: str,
    order_col: str,
    shard_col: str,
    ctx: int,
) -> DataFrame:
    """Assign concat-and-chunk window offsets within each shard.

    Adds:
      start_off  — running token offset of the doc within its shard stream
      pack_id    — window index of the doc's first token (start_off div ctx)
      n_windows  — how many ctx-token windows the doc spans

    Rows with ``tokens_col`` <= 0 must be filtered by the caller (a
    zero-token doc has no window to belong to).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    out = df.withColumn("start_off", start)
    out = out.withColumn("pack_id", F.expr(f"start_off div {ctx}"))
    return out.withColumn(
        "n_windows",
        (
            F.expr(f"(start_off + {tokens_col} - 1) div {ctx}")
            - F.col("pack_id")
            + F.lit(1)
        ).cast("long"),
    )
