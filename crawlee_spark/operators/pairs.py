"""Image+caption pair curation: LAION-style gating and anchor-text stats.

Training a multimodal model on crawled data needs, between the crawl and
tensorization:

  (a) per-pair filtering on image geometry and caption shape — the
      LAION-400M/5B recipe: minimum side, aspect-ratio bound, allowed
      container formats, caption token window (CLIP truncates at 77
      tokens, so longer captions waste label signal);
  (b) anchor-text aggregation per target URL — the web's free labeling
      signal: anchors pointing at a page/image are weak captions/queries
      (classic search-engine practice, reused for VLM training data).

Scale shapes (docs/SCALE.md):

- ``filter_pairs``: one scan, ZERO shuffles — every gate is a JVM column
  expression over (w, h, fmt, caption). On the input_hint table shape the
  ``bytes`` column is never touched, so a columnar reader prunes it: the
  100 TB table costs a metadata-column scan. Reject reasons use a fixed
  priority (first failing gate wins) so the output is deterministic and
  the reject histogram is one follow-up groupBy.
- ``anchor_stats``: two hash aggregations — (url, anchor) counts combine
  map-side (hot targets like nav links collapse before the shuffle), then
  a per-url argmax via a single ``max_by`` on a (count, anchor) composite
  key. No window, no sort, no join; shuffle volume is O(distinct
  (url, anchor)), not O(links).

No reference analog (Crawlee stops at the dataset) — training-pipeline
addendum ops (SURVEY.md §2.11), same family as dedup/packing/sampling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# gate names in priority order (first failing gate is THE reject reason)
REJECT_TOO_SMALL = "too-small"
REJECT_BAD_ASPECT = "bad-aspect"
REJECT_BAD_FORMAT = "bad-format"
REJECT_CAPTION_SHORT = "caption-short"
REJECT_CAPTION_LONG = "caption-long"


def caption_tokens(caption: Column) -> Column:
    """Whitespace token count of a caption; 0 for blank/NULL.

    Mirrors DuckDB ``len(regexp_split_to_array(trim(caption), '\\s+'))``
    with the same blank-string guard.
    """
    t = F.trim(caption)
    return (
        F.when(caption.isNull() | (F.length(t) == 0), F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )


def filter_pairs(
    pairs: DataFrame,
    *,
    min_side: int = 64,
    max_aspect: int = 3,
    allowed_fmts: Sequence[str] = ("jpeg", "png"),
    min_tokens: int = 2,
    max_tokens: int = 77,
) -> DataFrame:
    """Gate (image, caption) pairs; annotate instead of dropping.

    Input columns: ``w``/``h`` (int pixel dims), ``fmt`` (container format,
    lowercase), ``caption``. Adds:

      n_tokens      — whitespace token count of the caption
      reject_reason — first failing gate in priority order, NULL if clean
      kept          — reject_reason IS NULL

    The aspect gate uses integer cross-multiplication (``w > max_aspect*h``)
    so there is no float division to disagree across engines. Callers that
    want the kept subset filter on ``kept``; keeping rejects makes the
    reject histogram (the curation report every dataset paper publishes) a
    single groupBy downstream.
    """
    out = pairs.withColumn("n_tokens", caption_tokens(F.col("caption")))
    w, h, nt = F.col("w"), F.col("h"), F.col("n_tokens")
    reason = (
        F.when((w < min_side) | (h < min_side), F.lit(REJECT_TOO_SMALL))
        .when((w > max_aspect * h) | (h > max_aspect * w),
              F.lit(REJECT_BAD_ASPECT))
        .when(~F.col("fmt").isin(*allowed_fmts), F.lit(REJECT_BAD_FORMAT))
        .when(nt < min_tokens, F.lit(REJECT_CAPTION_SHORT))
        .when(nt > max_tokens, F.lit(REJECT_CAPTION_LONG))
    )
    out = out.withColumn("reject_reason", reason)
    return out.withColumn("kept", F.col("reject_reason").isNull())


def anchor_stats(links: DataFrame) -> DataFrame:
    """Per-target anchor-text aggregation over (url, anchor) link rows.

    Returns one row per url:

      n_links    — total in-links
      n_anchors  — distinct anchor texts seen
      top_anchor — most frequent anchor; ties break to the
                   lexicographically greatest (a total order, so the
                   argmax is exact under map-side combining)

    Two hash aggregations, no window: the composite pick key
    ``lpad(count) || anchor`` makes (count, anchor) one orderable string —
    the same trick as the best-caption pick in image_caption_pairs.
    """
    per_anchor = links.groupBy("url", "anchor").agg(
        F.count(F.lit(1)).alias("c"))
    pick = F.concat(
        F.lpad(F.col("c").cast("string"), 10, "0"), F.col("anchor"))
    return per_anchor.groupBy("url").agg(
        F.sum("c").cast("long").alias("n_links"),
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.max_by("anchor", pick).alias("top_anchor"),
    )
