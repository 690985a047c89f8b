"""Sitemap XML seed source (urlset + sitemapindex).

Reference anchor: Crawlee's seed sources (SURVEY.md §2.1) cover static
lists and free-text manifests (``request_provider.ts:566-603``); sitemap
ingestion is the standard companion every crawler grows (the reference
gained ``Sitemap``/``RobotsFile`` utils after v3.6.2 — this implements the
sitemaps.org protocol directly, not a port).

Spark mapping: a sitemap is ROWS (sitemap_url, xml). Parsing is one
``regexp_extract_all`` + ``explode`` per entry kind — whole-stage codegen,
splittable over however many sitemap files a 10^10-URL crawl shards into
(sitemaps.org caps one file at 50k URLs, so a big site IS many rows).
Entity unescaping covers the five XML named entities, column-side.

Protocol notes (sitemaps.org):
- ``<urlset><url><loc>..</loc><lastmod/><changefreq/><priority/></url>``
- ``<sitemapindex><sitemap><loc>..</loc></sitemap>`` points at child
  sitemaps — ``sitemap_index_locs`` returns them so the caller can fetch
  and union another round (recursion depth is bounded by the protocol: an
  index may not point at another index).
- ``<loc>`` is XML-escaped; order within a file is meaningful (crawl
  priority hint) and is preserved in the ``pos`` column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlee_spark.functions import urls as U

# one <url>...</url> (or <sitemap>...</sitemap>) block; DOTALL via (?s)
_URL_BLOCK = r"(?s)<url\b[^>]*>(.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap\b[^>]*>(.*?)</sitemap>"
_TAG = r"(?s)<{tag}\b[^>]*>\s*(.*?)\s*</{tag}>"


def xml_unescape(col: Column) -> Column:
    """Decode the five XML named entities. &amp; is decoded LAST so
    '&amp;lt;' yields the literal '&lt;' (correct double-escape handling).
    DuckDB mirror: the same replace chain. Numeric character references are
    out of scope (a <loc> is a URL; non-ASCII must be percent-encoded per
    sitemaps.org, so named entities are the only escapes that occur)."""
    c = F.regexp_replace(col, "&lt;", "<")
    c = F.regexp_replace(c, "&gt;", ">")
    c = F.regexp_replace(c, "&quot;", '"')
    c = F.regexp_replace(c, "&apos;", "'")
    c = F.regexp_replace(c, "&amp;", "&")
    return c


def _tag_of(block: Column, tag: str) -> Column:
    return F.nullif(F.regexp_extract(block, _TAG.format(tag=tag), 1), F.lit(""))


def parse_sitemap(df: DataFrame, xml_col: str = "xml",
                  src_col: str = "sitemap_url") -> DataFrame:
    """urlset rows -> one row per <url> entry.

    Output: (sitemap_url, pos, url, lastmod, changefreq, priority) with
    ``pos`` = 0-based document order within its sitemap (the crawl-priority
    hint). Entries without a <loc> are dropped (spec: loc is required).
    """
    blocks = df.select(
        F.col(src_col).alias("sitemap_url"),
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
        ).alias("pos", "_b"),
    )
    out = blocks.select(
        "sitemap_url",
        F.col("pos").cast("long").alias("pos"),
        xml_unescape(_tag_of(F.col("_b"), "loc")).alias("url"),
        # try_*, never plain to_date/cast: ANSI mode is on (Spark 4
        # default), and real-world sitemaps DO carry <lastmod>frequently
        # </lastmod> / <priority>high</priority> — a malformed FIELD must
        # cost a NULL, not the task (same policy as cdx.parse_cdxj)
        F.try_to_date(_tag_of(F.col("_b"), "lastmod")).alias("lastmod"),
        _tag_of(F.col("_b"), "changefreq").alias("changefreq"),
        _tag_of(F.col("_b"), "priority").try_cast("double").alias("priority"),
    )
    return out.filter(F.col("url").isNotNull())


def sitemap_index_locs(df: DataFrame, xml_col: str = "xml",
                       src_col: str = "sitemap_url") -> DataFrame:
    """sitemapindex rows -> (sitemap_url, pos, child_url) per <sitemap>."""
    blocks = df.select(
        F.col(src_col).alias("sitemap_url"),
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_SITEMAP_BLOCK), 1)
        ).alias("pos", "_b"),
    )
    return blocks.select(
        "sitemap_url",
        F.col("pos").cast("long").alias("pos"),
        xml_unescape(_tag_of(F.col("_b"), "loc")).alias("child_url"),
    ).filter(F.col("child_url").isNotNull())


# Sitemap: directives are group-independent records (sitemaps.org; RFC 9309
# §2.2.4 "other records") — one multiline case-insensitive regex over the raw
# body, stopping at '#' (comment) or end of line. Mirror of
# operators/robots.py::sitemap_urls_py (line-split + partition at ':').
_SITEMAP_DIRECTIVE = r"(?mi)^[ \t]*sitemap[ \t]*:([^#\r\n]*)"


def sitemaps_from_robots(df: DataFrame, text_col: str = "robots_txt",
                         host_col: str = "host") -> DataFrame:
    """``Sitemap:`` directives from robots.txt bodies -> seed sitemap URLs.

    Input: rows (host, robots_txt). Output: (host, pos, sitemap_url) with
    ``pos`` = 0-based file order. Whole-stage codegen (regexp_extract_all +
    posexplode); empty values filtered (a bare ``Sitemap:`` line is ignored,
    matching the py mirror). The result feeds the same fetch->parse_sitemap
    loop as explicit sitemap seeds.
    """
    blocks = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(_SITEMAP_DIRECTIVE), 1)
        ).alias("pos", "_v"),
    )
    return blocks.select(
        "host",
        F.col("pos").cast("long").alias("pos"),
        # btrim over the WS set — the py mirror (robots.sitemap_urls_py)
        # str.strip()s, and F.trim removes only spaces (tab-padded
        # directives would diverge)
        F.btrim(F.col("_v"), F.lit(U.WS)).alias("sitemap_url"),
    ).filter(F.col("sitemap_url") != "")


def sitemap_requests(df: DataFrame, xml_col: str = "xml",
                     src_col: str = "sitemap_url") -> DataFrame:
    """Parsed sitemap entries as seed request rows for the frontier.

    Maps lastmod/priority into userData (the reference carries source
    metadata on Request.userData); the frontier's normalize+dedup MERGE
    (operators/frontier.py) does the rest — list-vs-sitemap seeds never
    diverge on canonicalization.
    """
    entries = parse_sitemap(df, xml_col, src_col)
    return entries.select(
        "url",
        F.lit(False).alias("forefront"),
        F.lit(0).alias("depth"),
        F.lit(None).cast("string").alias("label"),
        F.create_map(
            F.lit("sitemap_url"), F.col("sitemap_url"),
            F.lit("sitemap_pos"), F.col("pos").cast("string"),
            F.lit("lastmod"), F.col("lastmod").cast("string"),
            F.lit("priority"), F.col("priority").cast("string"),
        ).alias("user_data"),
    )
