"""CDX-J index source (sources/cdx.py): SURT key transform, line
format/parse round trip, malformed-line resilience, and capture
selection semantics (latest-per-surt, digest dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.sources import cdx


def test_surt_key(spark):
    rows = [
        ("https://WWW.Img3.example.COM:8080/Photos/1.jpg?Q=en",),
        ("http://example.com",),
        ("https://a.b.c.test/x#frag-is-not-in-key",),
        ("http://example.com:80/x",),
        ("https://example.com:443/x",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r[0] for r in df.select(cdx.surt_key("url")).collect()]
    assert got == [
        # non-default port kept: :8080 and :80 are different origins
        "com,example,img3:8080)/photos/1.jpg?q=en",
        "com,example)/",
        "test,c,b,a)/x",
        "com,example)/x",
        "com,example)/x",
    ]


def test_format_parse_round_trip(spark):
    df = spark.createDataFrame([(1,)], "i int")
    line_col = cdx.format_cdxj(
        F.lit("com,example)/a.jpg"),
        F.lit("20260102030405"),
        {
            "url": F.lit("https://example.com/a.jpg"),
            "mime": F.lit("image/jpeg"),
            "status": F.lit("200"),
            "digest": F.lit("d1"),
            "length": F.lit("1234"),
            "offset": F.lit("987654"),
            "filename": F.lit("crawl-00.warc.gz"),
        },
    )
    line = df.select(line_col.alias("line")).first()["line"]
    assert line == (
        'com,example)/a.jpg 20260102030405 {"url": "https://example.com/a.jpg",'
        ' "mime": "image/jpeg", "status": "200", "digest": "d1",'
        ' "length": "1234", "offset": "987654", "filename": "crawl-00.warc.gz"}'
    )
    parsed = cdx.parse_cdxj(spark.createDataFrame([(line,)], "line string"))
    row = parsed.first()
    assert (row["surt"], row["ts"]) == ("com,example)/a.jpg", "20260102030405")
    assert (row["url"], row["status"], row["mime"]) == (
        "https://example.com/a.jpg", "200", "image/jpeg")
    assert (row["length"], row["offset"]) == (1234, 987654)
    assert parsed.schema["length"].dataType.simpleString() == "bigint"


def test_parse_drops_malformed_lines(spark):
    good = ('a,b)/x 20260101000000 {"url": "http://b.a/x", "status": "200"}')
    rows = [(good,), ("corrupt no json",), ("short 123 {}",), (None,)]
    parsed = cdx.parse_cdxj(spark.createDataFrame(rows, "line string"))
    assert parsed.count() == 1
    assert parsed.first()["digest"] is None  # absent field -> NULL, not error


def _line(surt, ts, url, status, mime, digest, off):
    return (
        f'{surt} {ts} {{"url": "{url}", "mime": "{mime}", "status": "{status}",'
        f' "digest": "{digest}", "length": "10", "offset": "{off}",'
        f' "filename": "f.warc.gz"}}'
    )


def test_select_captures_latest_then_digest_dedup(spark):
    lines = [
        # same surt: the 2026 capture supersedes the 2025 one
        _line("com,a)/1", "20250101000000", "http://a.com/1", "200", "image/png", "OLD", 1),
        _line("com,a)/1", "20260101000000", "http://a.com/1", "200", "image/png", "D1", 2),
        # latest capture is a 404 -> filtered BEFORE the latest pick,
        # so the older 200 wins
        _line("com,a)/2", "20260201000000", "http://a.com/2", "404", "image/png", "D2", 3),
        _line("com,a)/2", "20250201000000", "http://a.com/2", "200", "image/png", "D2", 4),
        # wrong mime never competes
        _line("com,a)/3", "20269901000000", "http://a.com/3", "200", "text/html", "D3", 5),
        # same digest as surt com,a)/1 -> collapsed, representative = min surt
        _line("com,b)/1", "20260301000000", "http://b.com/1", "200", "image/gif", "D1", 6),
    ]
    df = spark.createDataFrame([(line,) for line in lines], "line string")
    out = cdx.select_captures(cdx.parse_cdxj(df), mime_prefix="image/")
    got = {r["digest"]: r for r in out.collect()}
    assert set(got) == {"D1", "D2"}
    assert got["D1"]["surt"] == "com,a)/1" and got["D1"]["n_urls"] == 2
    assert got["D1"]["ts"] == "20260101000000"
    assert got["D2"]["ts"] == "20250201000000" and got["D2"]["n_urls"] == 1


def test_format_cdxj_escapes_json_specials(spark):
    df = spark.createDataFrame([(1,)], "i int")
    line_col = cdx.format_cdxj(
        F.lit("com,example)/q"),
        F.lit("20260102030405"),
        {
            "url": F.lit('https://example.com/q?t="a"\\b'),
            "status": F.lit("200"),
        },
    )
    line = df.select(line_col.alias("line")).first()["line"]
    parsed = cdx.parse_cdxj(
        spark.createDataFrame([(line,)], "line string")).first()
    # a raw quote/backslash in the URL must survive the round trip, not
    # corrupt the JSON blob (which would NULL every field)
    assert parsed["url"] == 'https://example.com/q?t="a"\\b'
    assert parsed["status"] == "200"


def test_select_captures_null_digest_and_offset(spark):
    # digest-less captures: one per surt, never collapsed into one NULL
    # group; NULL offset ('-' variant): the pick is NULL-safe so ts and
    # filename always come from the SAME chosen capture
    nodig = (
        'com,c)/{i} 2026010100000{i} {{"url": "http://c.com/{i}",'
        ' "mime": "image/png", "status": "200", "length": "10",'
        ' "offset": "{off}", "filename": "f{i}.warc.gz"}}'
    )
    lines = [
        nodig.format(i=1, off=5),
        nodig.format(i=2, off=6),
        # same surt twice: newer capture has offset '-' (-> NULL); the
        # pick must still choose it and report ITS filename with its ts
        'com,d)/1 20250101000000 {"url": "http://d.com/1", "mime": "image/png",'
        ' "status": "200", "digest": "DD", "length": "10", "offset": "7",'
        ' "filename": "old.warc.gz"}',
        'com,d)/1 20260101000000 {"url": "http://d.com/1", "mime": "image/png",'
        ' "status": "200", "digest": "DD", "length": "11", "offset": "-",'
        ' "filename": "new.warc.gz"}',
    ]
    df = spark.createDataFrame([(line,) for line in lines], "line string")
    out = cdx.select_captures(cdx.parse_cdxj(df), mime_prefix="image/")
    rows = out.collect()
    assert len(rows) == 3  # two digest-less singletons + DD
    no_digest = sorted(r["surt"] for r in rows if r["digest"] is None)
    assert no_digest == ["com,c)/1", "com,c)/2"]
    dd = next(r for r in rows if r["digest"] == "DD")
    assert (dd["ts"], dd["filename"], dd["offset"]) == (
        "20260101000000", "new.warc.gz", None)
