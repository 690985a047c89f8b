"""Deterministic hash-based sampling for training-data pipelines.

A 100 TB corpus is never consumed whole: pipelines carve out stratified
samples (per-language / per-domain / per-quality-bucket) and reproducible
train/test splits. Random sampling (``df.sample``) is not reproducible
across runs, partitionings, or engines — the standard fix is HASH-based
sampling: order or threshold rows by a cryptographic hash of a stable key,
so the same row always lands in the same sample regardless of cluster size,
partition layout, or execution order.

Everything here is a plain column expression (md5 — present in Spark AND
DuckDB, so every operator is oracle-checkable bit-for-bit):

- ``sample_per_group``: top-n rows per group by hash order — stratified
  sampling. Plan: one per-group window (partitioned, never global), i.e.
  ``WindowGroupLimit`` partial/final in Spark 4 — no full sort, no shuffle
  beyond the group keys.
- ``hash_split``: keep rows whose key-hash falls below a threshold derived
  from ``frac`` — reproducible train/test split. Plan: a pure filter
  (pushes past joins, prunes with the scan); complementary split = the
  negated filter, guaranteed disjoint + exhaustive.

No reference analog (Crawlee has no sampling); this is a north-rule
training-pipeline extension like dedup/ANN (SURVEY.md §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_key(*cols, salt: str = "") -> "F.Column":
    """md5 over the concatenated string forms of ``cols`` (+ optional salt).

    The salt varies the sample without touching the data ("give me a
    DIFFERENT deterministic 1%"). concat_ws('\\x1f', ...) keeps multi-column
    keys unambiguous (unit separator never occurs in numeric casts).
    """
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
             for c in cols]
    if salt:
        parts = [F.lit(salt)] + parts
    return F.md5(F.concat_ws("\x1f", *parts))


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified sample: the ``n`` rows per group whose
    ``sample_key`` sorts first (hash order == uniform-at-random order, but
    stable across runs/partitionings/engines). Ties broken by the key
    columns themselves, so the output is a pure function of the data."""
    key = sample_key(*key_cols, salt=salt)
    w = Window.partitionBy(*group_cols).orderBy(
        key.asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("_sk", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_sk", "_rn")
    )


def split_threshold(frac: float) -> str:
    """The 32-hex-digit threshold T such that P(md5_hex < T) == frac for a
    uniform hash. Computed once on the driver; both engines then compare
    lowercase hex strings lexicographically (well-defined, identical)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    if frac >= 1.0:
        # 2^128 formats to 33 hex chars, which LEXICOGRAPHICALLY sorts
        # before most 32-char digests ("10…0" < "ff…") — return a sentinel
        # that sorts after every lowercase hex digest instead
        return "g"
    return format(int(frac * (1 << 128)), "032x")


def hash_split(
    df: DataFrame,
    frac: float,
    key_cols: list[str],
    salt: str = "",
    complement: bool = False,
) -> DataFrame:
    """Reproducible ``frac`` split by key hash: a row is IN iff
    ``md5(key) < threshold(frac)``. ``complement=True`` returns the other
    side; the two sides are disjoint and exhaustive by construction, and a
    row's side never changes when the table grows — the property that makes
    hash splits the standard for train/test at corpus scale."""
    t = split_threshold(frac)
    cond = sample_key(*key_cols, salt=salt) < F.lit(t)
    return df.filter(~cond if complement else cond)


def uniform_unit(*cols, salt: str = "") -> "F.Column":
    """Deterministic U[0,1) from the key hash: first 12 hex chars of md5
    (48 bits) / 2^48 — one exact int→double conversion, then one IEEE
    division, identical in both engines.

    DuckDB mirror:
    ``CAST(('0x' || substr(md5(k), 1, 12)) AS BIGINT) / 281474976710656.0``
    """
    h = F.conv(F.substring(sample_key(*cols, salt=salt), 1, 12), 16, 10).cast("long")
    return h / F.lit(float(1 << 48))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Importance sampling: keep each row independently with probability
    equal to its weight (clipped to [0, 1]) — the training-data-mixing
    primitive ("sample documents proportional to quality"; e.g. the CCNet /
    DCLM-style quality-weighted retention stage).

    Deterministic: the acceptance draw is ``uniform_unit(key) < weight``,
    so a row's fate is a pure function of (key, salt, weight) — stable
    across runs, partitionings, engines, and corpus growth, and the salt
    gives an independent redraw. Plan: a pure filter (no shuffle, pushes
    into the scan alongside other predicates).
    """
    u = uniform_unit(*key_cols, salt=salt)
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)),
                F.lit(1.0))
    return df.filter(u < w)
