"""Seed sources: RequestList and remote-manifest URL extraction.

Reference semantics (SURVEY.md §2.1):

- ``RequestList.open(sources)`` — static seed array, dedup by uniqueKey on
  insert, optional ``keepDuplicateUrls`` suffixing
  (``packages/core/src/storages/request_list.ts:290-333, 696-726``);
- ``requestsFromUrl`` — download a text/CSV manifest and regex-extract URLs
  (``request_provider.ts:566-603``; ``packages/utils/src/internals/
  extract-urls.ts:33-53``; ``URL_NO_COMMAS_REGEX`` at ``general.ts:8``);
- ``sourcesFunction`` lazy seeds — a second DataFrame unioned in
  (``request_list.ts:413-425``);
- persisted-state reload (``request_list.ts:372-385``) — the frontier
  snapshot already provides this (store/snapshot_table.py).

Spark mapping: a RequestList IS a DataFrame of request rows; "open" is
normalize+dedup (the same ``frontier.make_requests`` path the queue uses),
so list-vs-queue never diverge on canonicalization. Manifest fetch is
``spark.read.text`` + ``regexp_extract_all`` + ``explode`` — at 10^10-URL
scale the manifest read parallelizes over file splits and the extraction is
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlee_spark.operators.frontier import make_requests

# Portable core of the reference's URL_NO_COMMAS_REGEX
# (``packages/utils/src/internals/general.ts:8``): scheme://host/path without
# spaces/commas/quotes — the manifest-extraction contract, not a validator.
URL_REGEX = r"https?://[^\s,\"'<>]+"


def requests_from_url_text(spark: SparkSession, text_df: DataFrame,
                           value_col: str = "value") -> DataFrame:
    """Extract URL request rows from free text lines (requestsFromUrl)."""
    return (
        text_df.select(
            F.explode(
                F.regexp_extract_all(F.col(value_col), F.lit(URL_REGEX), 0)
            ).alias("url")
        )
        .filter(F.col("url") != "")
    )


def requests_from_manifest(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.text(manifest) -> url rows (one regex pass, splittable)."""
    return requests_from_url_text(spark, spark.read.text(path))


class RequestList:
    """Static seed list with insert-dedup, as a DataFrame."""

    def __init__(self, df: DataFrame, num_buckets: int = 32,
                 keep_duplicate_urls: bool = False, keep_fragment: bool = False):
        """``df`` needs a ``url`` column; optional unique_key/forefront/
        depth/label per frontier.normalize_requests."""
        if keep_duplicate_urls:
            # keepDuplicateUrls (``request_list.ts:712-714``): uniqueKey
            # suffixed with a per-row index so nothing collapses
            df = df.withColumn(
                "unique_key",
                F.concat(
                    F.col("url"), F.lit("#dup-"),
                    F.monotonically_increasing_id().cast("string"),
                ),
            )
        self.requests = make_requests(df, step=0, num_buckets=num_buckets,
                                      keep_fragment=keep_fragment)

    def count(self) -> int:
        return self.requests.count()

    def to_seeds(self) -> DataFrame:
        """Rows ready for ``CrawlEngine.add_seeds`` / frontier MERGE."""
        return self.requests

    @classmethod
    def open(cls, spark: SparkSession, sources: list[str | dict],
             num_buckets: int = 32, **kw) -> "RequestList":
        """Reference-shaped constructor from a Python list of url strings or
        {'url': ..., 'forefront': ...} dicts (driver-side small lists; big
        seed sets should arrive as DataFrames/manifests instead)."""
        rows = []
        for s in sources:
            d = {"url": s} if isinstance(s, str) else dict(s)
            rows.append({
                "url": d["url"],
                "forefront": bool(d.get("forefront", False)),
                "depth": int(d.get("depth", 0)),
                "label": d.get("label"),
            })
        df = spark.createDataFrame(
            rows, "url string, forefront boolean, depth int, label string"
        )
        return cls(df, num_buckets=num_buckets, **kw)
