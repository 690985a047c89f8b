"""CDX-J (Common Crawl / web-archive capture index) parsing + selection.

A CDX-J index line is ``<SURT key> <14-digit timestamp> <JSON blob>``
where the JSON carries ``url``, ``mime``, ``status``, ``digest``,
``length``, ``offset``, ``filename`` — enough to fetch the record with a
single ranged read from the named ``.warc.gz`` file. Selecting from the
index (status/mime filter, latest capture per URL, content-digest dedup)
is how a training pipeline decides WHICH of the ~3B captures per Common
Crawl snapshot to actually download, so it runs before any byte of
payload moves.

Reference parity: Crawlee has no archive-index reader (it crawls live);
this is a task-brief training-pipeline source (SURVEY.md §2.11),
format per the pywb CDXJ spec and Common Crawl's cc-index layout.

Scale shape: one snapshot ships the index as ~300 sorted ``cdx-*.gz``
shards (~250 GB); lines parse with JVM regexp + ``get_json_object``
columnar expressions (no Python), selection is two hash aggregations
(latest-per-key, then representative-per-digest) — both map-side
combinable, so the shuffle carries one row per distinct key, not per
capture. The index is sorted by SURT, so at cluster scale a prefix
predicate partition-prunes via the secondary ``cluster.idx`` file;
here that corresponds to an ordinary path/prefix filter pushed to the
scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CDX_FIELDS = ("url", "mime", "status", "digest", "length", "offset", "filename")


def surt_key(url: Column | str) -> Column:
    """Sort-friendly URI Reordering Transform key for a URL column:
    ``com,example,img)/path?query`` — host lowercased, ``www.`` stripped,
    labels reversed and comma-joined, then ``)`` + the lowercased
    path+query (``/`` when empty). DEFAULT ports (80/443) are stripped;
    any other port is kept pywb-style after the labels
    (``com,example:8080)/x``) — distinct origins must not collapse to
    one key. (pywb strips :80 only for http and :443 only for https;
    stripping both unconditionally is the documented simplification.)
    Pure JVM expressions; the DuckDB mirror lives in ``plans/queries.py``
    (``_SURT_SQL``), the pure-Python twin in tests/test_cdx_property.py."""
    u = F.col(url) if isinstance(url, str) else url
    hostport = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":\d+$", ""), r"^www\.", "")
    port_sfx = F.when(
        (port != "") & (port != "80") & (port != "443"),
        F.concat(F.lit(":"), port),
    ).otherwise(F.lit(""))
    rest = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)", 1))
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(F.array_join(F.reverse(F.split(host, r"\.")), ","),
                    port_sfx, F.lit(")"), rest)


def format_cdxj(surt: Column, ts: Column, fields: dict[str, Column]) -> Column:
    """Render one CDX-J line. ``fields`` values are string columns; keys
    are emitted in CDX_FIELDS order so the line layout is deterministic
    (Common Crawl emits a stable field order too). Values are JSON-string
    escaped (``\\`` then ``"``) — raw double-quotes DO occur in crawled
    URLs, and an unescaped one would corrupt the whole JSON blob, turning
    every field of the capture NULL on re-parse."""
    parts = []
    for k in CDX_FIELDS:
        if k in fields:
            esc = F.regexp_replace(fields[k], r'(["\\])', "\\\\$1")
            parts.append(F.concat(F.lit(f'"{k}": "'), esc, F.lit('"')))
    body = F.concat_ws(", ", *parts)
    return F.concat(surt, F.lit(" "), ts, F.lit(" {"), body, F.lit("}"))


def parse_cdxj(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse CDX-J lines into typed columns — JVM-side only: one anchored
    regexp for the three space-separated parts, ``get_json_object`` per
    JSON field (Jackson, no Python). Malformed lines (no JSON brace,
    short timestamp) yield NULL surt/ts and are dropped, costing one row
    not the task, mirroring the WARC resync policy (sources/warc.py)."""
    line = F.col(line_col)
    surt = F.regexp_extract(line, r"^(\S+) (\d{14}) \{", 1)
    ts = F.regexp_extract(line, r"^\S+ (\d{14}) \{", 1)
    blob = F.regexp_extract(line, r"^\S+ \d{14} (\{.*\})$", 1)
    out = df.select(
        F.when(surt != "", surt).alias("surt"),
        F.when(ts != "", ts).alias("ts"),
        *[F.get_json_object(blob, f"$.{k}").alias(k) for k in CDX_FIELDS],
    ).filter(F.col("surt").isNotNull() & F.col("ts").isNotNull())
    # try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
    # of a non-numeric length/offset (some archive CDX variants emit '-')
    # would kill the task; a malformed FIELD must cost a NULL, same as a
    # malformed LINE costs a row
    return out.withColumns(
        {
            "length": F.col("length").try_cast("long"),
            "offset": F.col("offset").try_cast("long"),
        }
    )


def plan_ranged_reads(records: DataFrame, gap_bytes: int = 16384) -> DataFrame:
    """Coalesce selected (filename, offset, length) records into batched
    byte-range read tasks — the step between index selection and the
    actual WARC fetches. Object stores price and rate-limit per request,
    so adjacent records in the same file should ride one ranged GET; a
    new read group starts when the next record begins more than
    ``gap_bytes`` past the previous record's end.

    Shape: ONE exchange, partitioned by filename; within a file, a lag +
    running-sum window ordered by offset assigns group ids, then a
    grouped aggregate emits one row per read. Per-file row counts are
    bounded by file size / record size (~30k for a 150 MB WARC at ~5 KB
    records), so per-filename partitions cannot skew unboundedly. Output
    ``waste_bytes`` (range bytes minus payload bytes) is the tuning
    signal for ``gap_bytes``."""
    from pyspark.sql import Window

    w = Window.partitionBy("filename").orderBy("offset")
    prev_end = F.lag(F.col("offset") + F.col("length")).over(w)
    new_grp = F.when(
        prev_end.isNull() | (F.col("offset") > prev_end + gap_bytes), 1
    ).otherwise(0)
    grouped = records.withColumn("grp", F.sum(new_grp).over(w))
    return grouped.groupBy("filename", "grp").agg(
        F.min("offset").alias("range_start"),
        F.max(F.col("offset") + F.col("length")).alias("range_end"),
        F.count("*").alias("n_records"),
        (F.max(F.col("offset") + F.col("length")) - F.min("offset")
         - F.sum("length")).alias("waste_bytes"),
    )


def select_captures(
    parsed: DataFrame,
    mime_prefix: str | None = None,
    statuses: tuple[str, ...] = ("200",),
) -> DataFrame:
    """Index selection: keep acceptable captures (status class + MIME
    prefix), pick the LATEST capture per SURT key, then dedup identical
    payloads across URLs by content digest, keeping the lexicographically
    first SURT (deterministic representative) and counting how many
    distinct URLs shared the digest.

    Two hash aggregations, zero joins/windows: ``max_by``/``min_by`` on a
    packed fixed-width pick string gives a total order, so partial
    aggregation combines map-side and the shuffle is one row per distinct
    surt (agg 1) / digest (agg 2) — at 3B captures per snapshot that is
    the floor for this computation."""
    ok = parsed.filter(F.col("status").isin(*statuses))
    if mime_prefix is not None:
        ok = ok.filter(F.col("mime").startswith(mime_prefix))
    # ts is fixed-width (14 digits) so string max IS latest; ties broken
    # by filename+offset for determinism across identical re-captures.
    # NULL-SAFE: variant CDX rows may carry a NULL filename/offset ('-'
    # fields), and a NULL pick would make max_by SKIP that capture while
    # any independently-aggregated column still saw it — every output
    # field must come from the ONE capture the pick chose, so ts is
    # max_by too, never a bare max.
    cap_pick = F.concat(
        F.col("ts"),
        F.coalesce(F.col("filename"), F.lit("")),
        F.lpad(F.coalesce(F.col("offset"), F.lit(0)).cast("string"), 12, "0"),
    )
    latest = ok.groupBy("surt").agg(
        F.max_by("url", cap_pick).alias("url"),
        F.max_by("ts", cap_pick).alias("ts"),
        F.max_by("digest", cap_pick).alias("digest"),
        F.max_by("length", cap_pick).alias("length"),
        F.max_by("offset", cap_pick).alias("offset"),
        F.max_by("filename", cap_pick).alias("filename"),
    )
    # digest-less captures (variant CDX without the digest field) must NOT
    # collapse into one NULL group — a missing digest says "unknown
    # content", so each such URL stays its own download
    dkey = F.coalesce(
        F.col("digest"), F.concat(F.lit("nodigest:"), F.col("surt"))
    )
    return (
        latest.groupBy(dkey.alias("_dk"))
        .agg(
            F.max("digest").alias("digest"),
            F.min("surt").alias("surt"),
            F.min_by("url", "surt").alias("url"),
            F.min_by("ts", "surt").alias("ts"),
            F.min_by("length", "surt").alias("length"),
            F.min_by("offset", "surt").alias("offset"),
            F.min_by("filename", "surt").alias("filename"),
            F.count("*").alias("n_urls"),
        )
        .drop("_dk")
    )
