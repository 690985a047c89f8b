"""HTTP response metadata column logic: content-type + charset detection.

Reference behavior being reproduced (``packages/http-crawler/src/internals/
http-crawler.ts`` encoding handling + ``packages/utils`` content-type
parsing): the crawler derives the page encoding from, in priority order,

  1. the ``charset=`` parameter of the Content-Type header,
  2. a byte-order mark on the body,
  3. a ``<meta charset=...>`` / ``http-equiv`` declaration in the first
     bytes of the document,
  4. the UTF-8 default.

Everything here is a JVM column expression (regexp_extract / hex prefix
compares) — charset detection over 100 TB of fetched bodies is a pure map
stage that pipelines with the scan; only the first KB of the body is ever
touched (callers pass a prefix).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_CHARSET = "utf-8"

# canonical lowercase names for the aliases the reference's iconv layer
# accepts most often; unknown names pass through lowercased
_ALIASES = {
    "utf8": "utf-8",
    "iso8859-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "windows1252": "windows-1252",
    "cp1252": "windows-1252",
}


def _canon(name: Column) -> Column:
    low = F.lower(F.trim(F.regexp_replace(name, "[\"']", "")))
    out = low
    for a, c in _ALIASES.items():
        out = F.when(low == a, F.lit(c)).otherwise(out)
    return out


def parse_mime(content_type: Column) -> Column:
    """``text/html; charset=utf-8`` → ``text/html`` (lowercased, trimmed);
    NULL/empty → NULL."""
    mime = F.lower(F.trim(F.regexp_extract(
        F.coalesce(content_type, F.lit("")), r"^\s*([^;\s]+)", 1)))
    return F.when(mime == "", F.lit(None).cast("string")).otherwise(mime)


def header_charset(content_type: Column) -> Column:
    """``charset=`` parameter of a Content-Type header, canonicalized;
    NULL when absent."""
    raw = F.regexp_extract(
        F.coalesce(content_type, F.lit("")),
        r"(?i)charset\s*=\s*\"?([^\";\s]+)", 1)
    return F.when(raw == "", F.lit(None).cast("string")) \
        .otherwise(_canon(raw))


def bom_charset(body: Column) -> Column:
    """Byte-order-mark sniff over a BINARY body prefix: EF BB BF → utf-8,
    FF FE → utf-16le, FE FF → utf-16be; NULL otherwise."""
    h3 = F.hex(F.substring(body, 1, 3))
    h2 = F.hex(F.substring(body, 1, 2))
    return (
        F.when(h3 == "EFBBBF", F.lit("utf-8"))
        .when(h2 == "FFFE", F.lit("utf-16le"))
        .when(h2 == "FEFF", F.lit("utf-16be"))
        .otherwise(F.lit(None).cast("string"))
    )


def meta_charset(html_prefix: Column) -> Column:
    """``<meta charset=...>`` or ``http-equiv`` content charset from the
    document head (pass a bounded prefix — the reference also only sniffs
    the head); NULL when absent."""
    text = F.coalesce(html_prefix, F.lit(""))
    direct = F.regexp_extract(
        text, r"(?i)<meta[^>]*\bcharset\s*=\s*[\"']?([a-zA-Z0-9_.:-]+)", 1)
    return F.when(direct == "", F.lit(None).cast("string")) \
        .otherwise(_canon(direct))


def detect_charset(content_type: Column, body: Column,
                   html_prefix: Column) -> Column:
    """The reference's resolution order: header param → BOM → meta tag →
    utf-8 default."""
    return F.coalesce(
        header_charset(content_type),
        bom_charset(body),
        meta_charset(html_prefix),
        F.lit(DEFAULT_CHARSET),
    )
