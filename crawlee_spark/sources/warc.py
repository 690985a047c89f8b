"""WARC / WET ingestion — the Common Crawl file formats a web-scale
training pipeline reads upstream of everything in this repo.

Reference parity: Crawlee has no WARC reader (it crawls live); this is a
task-brief training-pipeline source (SURVEY.md §2.11). Format per ISO
28500 / the WARC 1.0 spec: records are `WARC/1.0\\r\\n` + headers +
`\\r\\n\\r\\n` + Content-Length payload + `\\r\\n\\r\\n`; .warc.gz files
concatenate one gzip MEMBER per record, which is why the format cannot be
byte-split mid-file — the unit of parallelism is the FILE.

Scale shape: Common Crawl ships ~72k WET files x ~150 MB per snapshot, so
file-granular parallelism saturates any cluster; `spark.read.format
("binaryFile")` yields one row per file (never splits a gzip stream) and
the parse runs inside `mapInPandas` — Arrow-batched, one Python pass per
file, emitting a row per record. Per-record Python is unavoidable for
this format in ANY engine (the reference's fetch path is per-request
JavaScript); the point is that it happens once at ingest, after which
everything downstream is JVM columnar. Filters on the OUTPUT (url, date)
cannot push into the gzip scan — partition-prune by file path (crawl
segment directories) instead, which binaryFile's `pathGlobFilter` does.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "source_file string, rec_index int, rec_type string, url string, "
    "warc_date string, content_length long, payload binary"
)

WET_SCHEMA = (
    "source_file string, rec_index int, url string, warc_date string, "
    "content_length long, text string"
)


def _split_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record from raw (decompressed)
    bytes. Content-Length framing only — never splits on payload content
    (payloads legally contain 'WARC/1.0' lines). A record with a missing
    or non-numeric Content-Length (corrupt/truncated file) is SKIPPED and
    the parser resyncs at the next record marker — corrupt members at
    crawl scale must cost one record, not the task or the file tail."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\r"):
            pos += 2
        if pos >= n or not data[pos:].startswith(b"WARC/"):
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers: dict = {}
        for line in data[pos:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        body_start = head_end + 4
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            nxt = data.find(b"\r\nWARC/", body_start)
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def _decompress(raw: bytes) -> bytes:
    """gzip (multi-member, the .warc.gz convention) or passthrough."""
    if raw[:2] == b"\x1f\x8b":
        # gzip.decompress handles concatenated members since CPython 3.x
        return gzip.decompress(raw)
    return raw


def parse_warc_bytes(
    raw: bytes, source_file: str = ""
) -> Iterable[tuple[str, int, str, str, str, int, bytes]]:
    """Pure-Python record iterator (the engine-independent core; also the
    simulator/test twin of the Spark path)."""
    for i, (h, body) in enumerate(_split_records(_decompress(raw))):
        yield (
            source_file,
            i,
            h.get("warc-type", ""),
            h.get("warc-target-uri", ""),
            h.get("warc-date", ""),
            len(body),
            body,
        )


def read_warc(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """All WARC records under ``path`` as
    (source_file, rec_index, rec_type, url, warc_date, content_length,
    payload). One task per file (gzip members are unsplittable); the
    binaryFile source prunes by ``glob`` (e.g. ``*.warc.gz``) before any
    byte is read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "source_file", "rec_index", "rec_type", "url",
            "warc_date", "content_length", "payload",
        ]
        # one output frame PER FILE, not per Arrow batch: a batch can pack
        # several files, and holding every decompressed payload of a batch
        # at once multiplies peak worker memory by files-per-batch
        for b in batches:
            for path_, content in zip(b["path"], b["content"]):
                yield pd.DataFrame(
                    list(parse_warc_bytes(bytes(content), path_)), columns=cols
                )

    return files.mapInPandas(parse, WARC_SCHEMA)


def read_wet(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """WET (extracted-text) records as
    (source_file, rec_index, url, warc_date, content_length, text) —
    ``conversion`` records only, with the text decoded UTF-8-replace: the
    direct feed for the documents-table ops (dedup/quality/langid). The
    per-snapshot ``warcinfo`` preamble record is dropped here, exactly the
    rows a downstream dedup must never see."""
    w = read_warc(spark, path, glob)
    conv = w.filter(w.rec_type == "conversion")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b[["source_file", "rec_index", "url",
                     "warc_date", "content_length"]].copy()
            out["text"] = [
                bytes(p).decode("utf-8", "replace") for p in b["payload"]
            ]
            yield out

    return conv.mapInPandas(decode, WET_SCHEMA)


def write_warc_file(
    path: str,
    records: Iterable[tuple[str, str, str, bytes]],
    compress: bool = True,
) -> None:
    """Write (rec_type, url, warc_date, payload) records as a spec-shaped
    WARC file — one gzip member per record when ``compress`` (the
    .warc.gz convention that keeps members independently decodable). The
    fixture twin of the reader — kept in the same module so the two
    framings cannot drift."""
    out = io.BytesIO()
    for rec_type, url, date, payload in records:
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode()
        member = head + payload + b"\r\n\r\n"
        out.write(gzip.compress(member) if compress else member)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def write_warc(df: "DataFrame", out_dir: str, compress: bool = True) -> None:
    """Distributed WARC export: each partition's executor writes ONE
    ``part-NNNNN.warc.gz`` with one gzip member per record — the same
    file-granular sharding Common Crawl itself ships, and the exact dual
    of ``read_warc`` (file = unit of parallelism, members independently
    decodable). Input columns: ``rec_type, url, warc_date, payload``.

    No driver bottleneck: rows never leave their executor; ``out_dir`` is
    shared storage on a real cluster (object-store mount / HDFS), the
    local FS here. Task retries are safe — each attempt writes
    ``<file>.tmp-<attemptId>`` and atomically renames over the final
    name, so a re-executed partition replaces, never corrupts or
    duplicates, its file (rename-last-wins; partial writes are invisible
    because the final name only ever points at a complete file). Empty
    partitions write nothing (an empty gzip stream is not a valid
    member)."""
    import os

    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def dump(rows) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return
        ctx = TaskContext.get()
        final = os.path.join(out_dir, f"part-{ctx.partitionId():05d}{ext}")
        tmp = f"{final}.tmp-{ctx.taskAttemptId()}"
        recs = (
            (r["rec_type"], r["url"], r["warc_date"], bytes(r["payload"]))
            for r in _chain_one(first, it)
        )
        write_warc_file(tmp, recs, compress=compress)
        os.replace(tmp, final)

    df.foreachPartition(dump)


def _chain_one(first, rest):
    yield first
    yield from rest
