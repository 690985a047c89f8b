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

from collections.abc import Sequence

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


def tar_sample_bytes(*payload_cols) -> "F.Column":
    """Exact tar bytes one sample occupies: per entry a 512-byte ustar
    header + data padded to the next 512-block. Feed this as
    ``shard_manifest``'s ``bytes_col`` and the manifest's ``byte_offset``
    IS the sample's first header offset inside the written shard
    (``write_webdataset`` below) — asserted byte-for-byte in
    tests/test_packing.py against stdlib tarfile."""
    total = F.lit(0).cast("long")
    for c in payload_cols:
        col = F.col(c) if isinstance(c, str) else c
        # octet_length: BYTES for strings too (UTF-8), not characters
        n = F.coalesce(F.octet_length(col).cast("long"), F.lit(0))
        # header + data padded to the next 512 block: (n+511) & -512
        total = total + 512 + (n + 511).bitwiseAND(F.lit(-512).cast("long"))
    return total


def write_webdataset(
    manifest: DataFrame,
    out_dir: str,
    *,
    key_col: str = "image_id",
    entries: dict[str, str] | None = None,
) -> DataFrame:
    """Distributed WebDataset export: one deterministic ``.tar`` per shard.

    ``manifest`` is ``shard_manifest`` output (columns ``shard_id``,
    ``sample_idx`` + the payload columns). ``entries`` maps tar-entry
    extension -> source column, e.g. ``{"jpg": "bytes", "txt": "caption"}``
    — the WebDataset convention where one sample = consecutive entries
    ``{key}.{ext}`` sharing the key stem.

    Each shard group writes ``shard-{shard_id:010d}.tar`` via tmp +
    atomic rename (re-executed tasks replace, never corrupt — the same
    contract as ``write_warc``). Tar bytes are DETERMINISTIC: ustar
    format (pax when a shard has any entry name over ustar's 100-byte
    cap — decided per shard before writing, still a pure function of the
    names), mtime 0, uid/gid 0, mode 0644, entries in (sample_idx,
    extension) order — a re-run or resumed export writes byte-identical
    shards (the manifest made shard membership a pure function of key
    order; this makes the FILE a pure function of the manifest).

    Returns one row per written shard: (shard_id, path, n_samples,
    tar_bytes) — the export receipt a resume checks before re-writing.

    Scale: the only exchange is the groupBy on shard_id (uniform by
    construction — rank div samples_per_shard); each group holds
    ``samples_per_shard`` samples, executors write straight to shared
    storage, no driver involvement. Python/Arrow is the right boundary
    here (opaque bytes -> POSIX tar framing, not expressible as column
    ops).
    """
    import os

    entries = entries or {"jpg": "bytes", "txt": "caption"}
    os.makedirs(out_dir, exist_ok=True)
    exts = sorted(entries)
    cols = ["shard_id", "sample_idx", key_col] + [entries[e] for e in exts]

    def dump(pdf):
        import io
        import tarfile

        import pandas as pd
        from pyspark import TaskContext

        pdf = pdf.sort_values("sample_idx")
        shard_id = int(pdf["shard_id"].iloc[0])
        # USTAR caps entry names at 100 bytes; longer keys fall back to PAX
        # (still deterministic: the pax 'path' record is a pure function of
        # the name) instead of crashing mid-export with ValueError from
        # tarfile. Decided per shard BEFORE writing so the format is stable.
        max_name = max(
            (len(f"{stem}.{ext}".encode()) for stem in
             pdf[key_col].astype(str) for ext in exts), default=0)
        fmt = tarfile.USTAR_FORMAT if max_name <= 100 else tarfile.PAX_FORMAT
        final = os.path.join(out_dir, f"shard-{shard_id:010d}.tar")
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        tmp = f"{final}.tmp-{attempt}"
        # stream entries straight to the tmp file: peak memory is ONE
        # entry's payload, not the whole shard (a standard ~1 GB shard
        # previously cost ~1 GB heap per concurrent task via BytesIO)
        with tarfile.open(tmp, mode="w", format=fmt) as tf:
            for _, row in pdf.iterrows():
                stem = str(row[key_col])
                for ext in exts:
                    v = row[entries[ext]]
                    if v is None:
                        data = b""  # octet_length(NULL) counted as 0
                    elif isinstance(v, (bytes, bytearray)):
                        data = v
                    else:
                        data = str(v).encode("utf-8")
                    ti = tarfile.TarInfo(name=f"{stem}.{ext}")
                    ti.size = len(data)
                    ti.mtime = 0
                    ti.uid = ti.gid = 0
                    ti.uname = ti.gname = ""
                    ti.mode = 0o644
                    tf.addfile(ti, io.BytesIO(bytes(data)))
        tar_bytes = os.path.getsize(tmp)
        os.replace(tmp, final)
        return pd.DataFrame({
            "shard_id": [shard_id],
            "path": [final],
            "n_samples": [len(pdf)],
            "tar_bytes": [tar_bytes],
        })

    return (
        manifest.select(*cols)
        .groupBy("shard_id")
        .applyInPandas(
            dump,
            "shard_id long, path string, n_samples long, tar_bytes long")
    )


def read_webdataset(
    spark,
    path: str,
    *,
    exts: Sequence[str] = ("jpg", "txt"),
) -> DataFrame:
    """Source dual of ``write_webdataset``: shard tars back into sample rows.

    One row per sample key: (shard_path, key, one binary column per
    extension). The unit of parallelism is the FILE — exactly how
    training readers consume WebDataset (shards are sequential tars;
    entries of one sample are adjacent) — so a directory of shards
    parallelizes across executors with zero shuffle: binaryFile scan →
    per-file tarfile walk in mapInPandas. Unknown extensions are ignored;
    a sample missing one of ``exts`` carries NULL for it.
    """
    import pandas as pd

    ext_list = list(exts)
    schema = ("shard_path string, key string, "
              + ", ".join(f"`{e}` binary" for e in ext_list))

    def walk(batches):
        import io
        import tarfile

        for b in batches:
            out = {k: [] for k in ["shard_path", "key", *ext_list]}
            for p, blob in zip(b["path"], b["content"]):
                samples: dict[str, dict[str, bytes]] = {}
                order: list[str] = []
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for ti in tf.getmembers():
                        if not ti.isreg():
                            # externally produced shards may carry dirs or
                            # symlinks; extractfile() returns None for those
                            continue
                        stem, _, ext = ti.name.rpartition(".")
                        if not stem or ext not in ext_list:
                            continue
                        if stem not in samples:
                            samples[stem] = {}
                            order.append(stem)
                        samples[stem][ext] = tf.extractfile(ti).read()
                for stem in order:
                    out["shard_path"].append(p)
                    out["key"].append(stem)
                    for e in ext_list:
                        out[e].append(samples[stem].get(e))
            yield pd.DataFrame(out)

    src = spark.read.format("binaryFile").load(f"{path}/*.tar")
    return src.select("path", "content").mapInPandas(walk, schema)
