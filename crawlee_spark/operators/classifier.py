"""Hashed-feature linear text classifier (fastText / CCNet quality shape).

Every serious training-data pipeline gates documents with a LEARNED
classifier on top of the heuristic rules: CCNet (Wenzek et al. 2020)
scores with a fastText model, FineWeb-Edu distills an educational-quality
classifier and runs it over the whole CommonCrawl. The architecture that
scales to 100 TB is always the same:

  tokens → hash into D buckets (the "hashing trick") → per-bucket learned
  weight → document score = sum of its buckets' weights.

This module reproduces that architecture end-to-end in Spark with NO
external model artifact: weights are learned in-corpus as Naive-Bayes
log-odds from a label column (NB log-count ratios ARE the classic linear
baseline — Wang & Manning 2012's NBSVM uses exactly these features).

Cross-engine exactness: weights are FIXED-POINT integers — log2 at
1/16-bit granularity via ``qlog2_16`` (exact table below 16, linear
mantissa interpolation on the top 5 bits above; pure integer ops in
Spark, DuckDB, and the Python twin) — so the per-document sum is an
integer: order-independent under any partitioning and bit-for-bit
comparable against the oracle. On the in-repo distillation task the
fixed-point model scores within 3 accuracy points of exact float NB
(0.72 vs 0.75); a production deployment would broadcast float weights
from an offline trainer — the plan shape (tiny weight dim broadcast
against the exploded token stream) is identical.

Plan shapes at 100 TB (see docs/SCALE.md):

- ``train_hashed_nb``: explode tokens (map-side) → ONE hash aggregation on
  the bucket id (cardinality D — thousands, not billions; combines
  map-side so shuffle volume is O(partitions × D), independent of corpus
  size). Output dim has exactly D' ≤ D rows — broadcastable forever.
- ``score_hashed``: explode tokens → broadcast-join the weight dim (no
  shuffle of the corpus side) → per-doc sum (map-side combine, one
  shuffle keyed on doc id). Two corpus scans total for train+score; a
  real pipeline trains once and scores many corpora.

No reference analog (Crawlee stops at the dataset); training-pipeline
addendum op (SURVEY.md §2.11), same family as dedup/sampling/packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlee_spark.functions.text import md5_hash64, tokens_of
from crawlee_spark.operators.dedup import rebalance_narrow

DEFAULT_NUM_BUCKETS = 4096


# exact floor(16 * log2(x)) for x in [1, 16) — shared verbatim with the
# DuckDB oracle and the Python twin
QLOG_SMALL = {1: 0, 2: 16, 3: 25, 4: 32, 5: 37, 6: 41, 7: 44, 8: 48,
              9: 50, 10: 53, 11: 55, 12: 57, 13: 59, 14: 60, 15: 62}


def qlog2_16(x: Column) -> Column:
    """~16·log2(x) for integer x ≥ 1, as an exact-integer fixed-point value.

    x < 16: exact table. x ≥ 16: ``16·msb + (top-5-bits − 16)`` — linear
    interpolation on the mantissa's top 4 fractional bits (max error
    ~0.09 bits, monotone, overflow-free at any count). Everything is
    integer bit arithmetic, so Spark, DuckDB
    (``16*(length(bin(x))-1) + ((x >> (length(bin(x))-5)) - 16)``), and
    the Python twin agree bit-for-bit.
    """
    small = F.lit(None).cast("long")
    for k in sorted(QLOG_SMALL, reverse=True):
        small = F.when(x == k, F.lit(QLOG_SMALL[k])).otherwise(small)
    msb = (F.length(F.bin(x)) - 1).cast("long")
    approx = 16 * msb + (
        F.call_function("shiftright", x, (msb - 4).cast("int")) - 16)
    return F.when(x < 16, small).otherwise(approx).cast("long")


def feature_bucket(token: Column, num_buckets: int = DEFAULT_NUM_BUCKETS) -> Column:
    """Hashing-trick bucket id of a token: ``md5_hash64(token) mod D``.

    md5 keeps it portable (Spark + DuckDB agree); at real scale xxhash64
    is the cheaper drop-in (same modular shape, one engine only).
    """
    return F.pmod(md5_hash64(token), F.lit(num_buckets)).cast("long")


def train_hashed_nb(
    docs: DataFrame,
    label: Column,
    *,
    text_col: str = "text",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> DataFrame:
    """Learn per-bucket quantized NB log-odds weights from labeled docs.

    ``label`` is a boolean column expression over ``docs`` (True = the
    positive class, e.g. "high quality" / "target language"). Returns the
    weight dim — one row per OBSERVED bucket:

      bucket   — feature id in [0, num_buckets)
      c_pos    — token occurrences in positive-class docs
      c_neg    — token occurrences in negative-class docs
      weight   — (qlog(c_pos+1) − qlog(T_pos+1)) − (qlog(c_neg+1) −
                 qlog(T_neg+1)): class-prior-normalized NB log-odds in
                 1/16-bit fixed point (T_* = total class token counts;
                 without the normalization an imbalanced corpus biases
                 every weight toward the majority class). 0-count buckets
                 never appear and implicitly weigh 0, which the scorer's
                 left join honors.

    One exploding scan + one D-cardinality hash aggregation (+ a 1-row
    total over the D-row dim, broadcast); the result is
    vocabulary-independent in size (≤ D rows) and broadcastable at any
    corpus scale.
    """
    ex = rebalance_narrow(docs).select(
        label.alias("_pos"),
        F.explode(tokens_of(F.col(text_col))).alias("tok"),
    )
    counts = ex.groupBy(
        feature_bucket(F.col("tok"), num_buckets).alias("bucket")
    ).agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("long").alias("c_pos"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).cast("long").alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").cast("long").alias("t_pos"),
        F.sum("c_neg").cast("long").alias("t_neg"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "c_pos",
        "c_neg",
        (
            (qlog2_16(F.col("c_pos") + 1) - qlog2_16(F.col("t_pos") + 1))
            - (qlog2_16(F.col("c_neg") + 1) - qlog2_16(F.col("t_neg") + 1))
        ).alias("weight"),
    )


def score_hashed(
    docs: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> DataFrame:
    """Score every document against a hashed weight dim.

    Returns one row per input document:

      <id_col>   — carried through
      n_tokens   — token count (0 for empty/NULL text)
      score      — integer sum of per-token bucket weights (0-weight for
                   buckets absent from the dim)
      predicted  — score > 0 (the NB decision at equal priors)

    The weight dim is broadcast (≤ D rows), so the corpus side never
    shuffles for the join; the only exchange is the per-doc aggregation.
    Empty documents score 0 / predicted false via the left join-back.
    """
    ex = rebalance_narrow(docs).select(
        F.col(id_col),
        F.explode(tokens_of(F.col(text_col))).alias("tok"),
    ).select(
        id_col,
        feature_bucket(F.col("tok"), num_buckets).alias("bucket"),
    )
    joined = ex.join(F.broadcast(weights.select("bucket", "weight")),
                     "bucket", "left")
    per = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.coalesce(F.col("weight"), F.lit(0))).cast("long").alias("score"),
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
            (F.coalesce("score", F.lit(0)) > 0).alias("predicted"),
        )
    )


# --- pure-Python twin (parity testing, same role as simulator mirrors) ---

import re as _re

_TOKEN_RE = _re.compile(r"[^a-z0-9]+")


def _tokens_py(text: str | None) -> list[str]:
    if not text:
        return []
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def _bucket_py(token: str, num_buckets: int) -> int:
    import hashlib

    h = int(hashlib.md5(token.encode()).hexdigest()[:14], 16)
    return h % num_buckets


def qlog2_16_py(x: int) -> int:
    """Twin of ``qlog2_16`` (x >= 1)."""
    if x < 16:
        return QLOG_SMALL[x]
    msb = x.bit_length() - 1
    return 16 * msb + ((x >> (msb - 4)) - 16)


def train_hashed_nb_py(
    rows: list[tuple[str | None, bool]], num_buckets: int = DEFAULT_NUM_BUCKETS
) -> dict[int, int]:
    """(text, label) rows -> {bucket: weight}; twin of train_hashed_nb."""
    pos: dict[int, int] = {}
    neg: dict[int, int] = {}
    for text, label in rows:
        for tok in _tokens_py(text):
            b = _bucket_py(tok, num_buckets)
            (pos if label else neg)[b] = (pos if label else neg).get(b, 0) + 1
    t_pos, t_neg = sum(pos.values()), sum(neg.values())
    out = {}
    for b in set(pos) | set(neg):
        out[b] = (qlog2_16_py(pos.get(b, 0) + 1) - qlog2_16_py(t_pos + 1)) - (
            qlog2_16_py(neg.get(b, 0) + 1) - qlog2_16_py(t_neg + 1))
    return out


def score_hashed_py(
    text: str | None, weights: dict[int, int],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> tuple[int, int, bool]:
    """-> (n_tokens, score, predicted); twin of score_hashed for one doc."""
    toks = _tokens_py(text)
    score = sum(weights.get(_bucket_py(t, num_buckets), 0) for t in toks)
    return len(toks), score, score > 0
