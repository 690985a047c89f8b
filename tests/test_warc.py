"""WARC/WET ingestion (sources/warc.py): spec framing (Content-Length,
never content-splitting), multi-member gzip, warcinfo filtering, file-
granular task parallelism, and the pure-Python/Spark twin agreement."""

from __future__ import annotations

import gzip

from crawlee_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    read_wet,
    write_warc_file,
)


def _records():
    return [
        ("warcinfo", "", "2026-01-01T00:00:00Z", b"software: test\r\n"),
        ("conversion", "http://a.example/x", "2026-01-01T00:00:01Z",
         b"hello world from a"),
        # payload that CONTAINS a WARC header line — Content-Length framing
        # must carry the parser straight through it
        ("conversion", "http://b.example/y", "2026-01-01T00:00:02Z",
         b"tricky\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nbody"),
        ("response", "http://c.example/z", "2026-01-01T00:00:03Z",
         b"HTTP/1.1 200 OK\r\n\r\n<html>c</html>"),
    ]


def test_python_parser_roundtrip(tmp_path):
    p = str(tmp_path / "f.warc.gz")
    write_warc_file(p, _records(), compress=True)
    raw = open(p, "rb").read()
    # multi-member gzip: more than one member boundary present
    assert raw[:2] == b"\x1f\x8b" and raw.count(b"\x1f\x8b\x08") >= 4
    rows = list(parse_warc_bytes(raw, "f"))
    assert [r[2] for r in rows] == ["warcinfo", "conversion", "conversion", "response"]
    assert rows[2][3] == "http://b.example/y"
    assert rows[2][6].endswith(b"body")            # framing survived the decoy
    assert [r[1] for r in rows] == [0, 1, 2, 3]    # rec_index in file order


def test_read_warc_and_wet(spark, tmp_path):
    write_warc_file(str(tmp_path / "a.warc.gz"), _records(), compress=True)
    write_warc_file(str(tmp_path / "b.warc"), _records()[:2], compress=False)
    w = read_warc(spark, str(tmp_path))
    rows = w.collect()
    assert len(rows) == 6                          # 4 gz + 2 plain
    # the unsplittability invariant: binaryFile yields each file WHOLE in
    # one row (a gzip stream is never byte-split across tasks) — pin it by
    # matching row content length against the on-disk size per file
    import os
    files = {r["path"].split("/")[-1]: len(r["content"]) for r in
             spark.read.format("binaryFile").load(str(tmp_path)).collect()}
    want = {f: os.path.getsize(tmp_path / f) for f in os.listdir(tmp_path)}
    assert files == want and len(files) == 2
    wet = read_wet(spark, str(tmp_path)).collect()
    by = {(r["source_file"].split("/")[-1], r["rec_index"]): r for r in wet}
    assert len(wet) == 3                           # warcinfo/response dropped
    assert by[("a.warc.gz", 1)]["text"] == "hello world from a"
    assert by[("a.warc.gz", 2)]["text"].endswith("body")
    assert by[("b.warc", 1)]["url"] == "http://a.example/x"


def test_glob_prunes_before_read(spark, tmp_path):
    write_warc_file(str(tmp_path / "a.warc.gz"), _records(), compress=True)
    write_warc_file(str(tmp_path / "skip.txt"), _records()[:1], compress=False)
    only = read_warc(spark, str(tmp_path), glob="*.warc.gz")
    assert only.count() == 4


def test_wet_feeds_document_ops(spark, tmp_path):
    # the WET output is directly consumable by the documents-table ops
    write_warc_file(str(tmp_path / "a.warc.gz"), _records(), compress=True)
    from pyspark.sql import functions as F
    from crawlee_spark.functions.text import token_count
    wet = read_wet(spark, str(tmp_path)).select(
        F.col("url").alias("doc_id"), "text")
    got = {r["doc_id"]: r["n"] for r in
           wet.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert got["http://a.example/x"] == 4


def test_corrupt_record_resync():
    # a record with a malformed Content-Length is skipped; the parser
    # resyncs at the next record marker instead of crashing or dropping
    # the file tail
    good = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://ok.example/\r\nWARC-Date: d\r\n"
        b"Content-Length: 4\r\n\r\ngood\r\n\r\n"
    )
    bad = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://bad.example/\r\nWARC-Date: d\r\n"
        b"Content-Length: abc\r\n\r\noops\r\n\r\n"
    )
    missing = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://none.example/\r\nWARC-Date: d\r\n\r\nx\r\n\r\n"
    )
    rows = list(parse_warc_bytes(bad + missing + good, "f"))
    assert [r[3] for r in rows] == ["http://ok.example/"]
    assert rows[0][6] == b"good"


def test_write_warc_distributed_round_trip(spark, tmp_path):
    from crawlee_spark.sources.warc import write_warc

    rows = [
        ("response", f"https://h{i % 3}.test/p/{i}",
         f"2026-08-19T00:00:{i:02d}Z", bytearray(f"payload-{i}".encode()))
        for i in range(17)
    ]
    df = spark.createDataFrame(
        rows, "rec_type string, url string, warc_date string, payload binary"
    ).repartition(5)
    out = str(tmp_path / "export")
    write_warc(df, out)
    import os
    parts = sorted(os.listdir(out))
    assert parts and all(p.endswith(".warc.gz") for p in parts)
    assert not any(".tmp-" in p for p in parts)
    back = read_warc(spark, out, glob="*.warc.gz")
    got = sorted((r["url"], bytes(r["payload"]).decode()) for r in back.collect())
    assert got == sorted((u, p.decode()) for _, u, _, p in rows)
    # idempotence: a re-run (task retry analog) replaces, never duplicates
    write_warc(df, out)
    back2 = read_warc(spark, out, glob="*.warc.gz")
    assert back2.count() == 17


def test_write_warc_skips_empty_partitions(spark, tmp_path):
    from crawlee_spark.sources.warc import write_warc

    df = spark.createDataFrame(
        [("response", "https://a.test/", "2026-01-01T00:00:00Z", bytearray(b"x"))],
        "rec_type string, url string, warc_date string, payload binary",
    ).repartition(8)
    out = str(tmp_path / "sparse")
    write_warc(df, out)
    import os
    assert len(os.listdir(out)) == 1  # 7 empty partitions write nothing
