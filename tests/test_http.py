"""Content-type / charset detection (functions/http.py — the http-crawler
encoding pipeline) and the ErrorSnapshotter analog
(CrawlConfig.save_error_snapshots; error_snapshotter.ts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.functions.http import (
    bom_charset,
    detect_charset,
    header_charset,
    meta_charset,
    parse_mime,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_header_charset_aliases_quotes_case(spark):
    cases = {
        "text/html; charset=utf-8": "utf-8",
        "text/html; CHARSET=UTF8": "utf-8",
        'application/json;charset="ISO8859-1"': "iso-8859-1",
        "text/plain; charset='latin1'": "iso-8859-1",
        "text/plain; charset=cp1252": "windows-1252",
        "text/plain; charset=EUC-KR": "euc-kr",  # unknown alias lowercased
        "text/html": None,
        "": None,
    }
    for raw, want in cases.items():
        assert _one(spark, header_charset(F.lit(raw))) == want, raw
    assert _one(spark, header_charset(F.lit(None).cast("string"))) is None


def test_parse_mime(spark):
    assert _one(spark, parse_mime(F.lit(" Text/HTML ; charset=x"))) == "text/html"
    assert _one(spark, parse_mime(F.lit(None).cast("string"))) is None


def test_bom_and_meta(spark):
    assert _one(spark, bom_charset(F.unhex(F.lit("EFBBBF68")))) == "utf-8"
    assert _one(spark, bom_charset(F.unhex(F.lit("FFFE68")))) == "utf-16le"
    assert _one(spark, bom_charset(F.unhex(F.lit("FEFF68")))) == "utf-16be"
    assert _one(spark, bom_charset(F.unhex(F.lit("6869")))) is None
    assert _one(spark, meta_charset(
        F.lit('<META Charset="Big5">'))) == "big5"
    assert _one(spark, meta_charset(F.lit(
        '<meta http-equiv="Content-Type" content="text/html; '
        'charset=gb2312">'))) == "gb2312"
    assert _one(spark, meta_charset(F.lit("<head></head>"))) is None


def test_detect_priority_order(spark):
    ct = F.lit("text/html; charset=iso-8859-1")
    bom = F.unhex(F.lit("EFBBBF"))
    meta = F.lit('<meta charset="big5">')
    # header beats BOM beats meta beats default
    assert _one(spark, detect_charset(ct, bom, meta)) == "iso-8859-1"
    none_s = F.lit(None).cast("string")
    assert _one(spark, detect_charset(none_s, bom, meta)) == "utf-8"
    assert _one(spark, detect_charset(none_s, F.unhex(F.lit("68")), meta)) \
        == "big5"
    assert _one(spark, detect_charset(none_s, F.unhex(F.lit("68")),
                                      F.lit("<p>"))) == "utf-8"


def test_error_snapshotter_first_occurrence_per_signature(spark, tmp_path):
    """One captured page per unique error signature across the WHOLE crawl
    (error_snapshotter.ts first-occurrence contract), carrying the page
    state; disabled by default."""
    from crawlee_spark import datagen
    from crawlee_spark.engine import (
        CrawlConfig,
        CrawlEngine,
        FailureModelConf,
        StatusModelConf,
    )

    rows = list(datagen.gen_corpus_rows(40, 4, seed=13, with_bytes=False))
    seeds = datagen.gen_seed_rows(40, 4, seed=13, n_seeds=4)
    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows],
        "url string, html string")
    seeds_df = spark.createDataFrame(
        seeds, "url string, forefront boolean, depth int, label string")
    cfg = CrawlConfig(
        num_buckets=4,
        failures=FailureModelConf(fail_mod=6, fail_attempts=1),
        status=StatusModelConf(status_mods={503: 7, 429: 5}),
        save_error_snapshots=True,
    )
    eng = CrawlEngine(spark, str(tmp_path / "snap"), cfg)
    eng.add_seeds(seeds_df)
    eng.run(corpus_df)
    snaps = eng.error_snapshots.read().collect()
    sigs = [r["signature"] for r in snaps]
    # exactly one capture per unique signature over the whole crawl
    assert len(sigs) == len(set(sigs)) and len(sigs) >= 2
    log_errs = {
        r["status"] for r in eng.fetch_log.read()
        .filter("status <> 'ok'").select("status").distinct().collect()
    }
    # every error class got its capture (signature is the NORMALIZED form —
    # digits collapse; the raw class rides along in `error`)
    assert {r["error"] for r in snaps} == log_errs
    for r in snaps:
        assert r["url"].lower().startswith("http")  # corpus has case-messy URLs
        assert r["html_snapshot"] is not None
    # default-off: no table
    eng2 = CrawlEngine(spark, str(tmp_path / "nosnap"),
                       CrawlConfig(num_buckets=4,
                                   failures=FailureModelConf(fail_mod=6)))
    eng2.add_seeds(seeds_df)
    eng2.run(corpus_df)
    assert not eng2.error_snapshots.exists()
