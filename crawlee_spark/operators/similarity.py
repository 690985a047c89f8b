"""Similarity search over embedding columns (array<float>).

Two paths, both `queries()` entries with oracles:

- ``ann_topk_bruteforce``: exact cosine top-k — the correctness baseline.
  Query set × corpus join; at scale the query side is broadcast and the
  corpus scan is the only pass (no shuffle of the corpus).
- ``ann_lsh``: random-hyperplane LSH buckets — the scale path. Vectors
  hash to a signature of sign(w_p · v) bits; candidates share a bucket, so
  the join is bucket-to-bucket (shuffle ∝ corpus, candidates ∝ bucket size,
  never corpus × queries). Hyperplane weights are DETERMINISTIC integer
  pseudo-noise (portable arithmetic — the DuckDB oracle derives the same
  planes), standing in for seeded Gaussians.

All JVM-side higher-order array functions; no Python in the hot path.
An IVF variant would assign to k-means centroids instead of hyperplane
buckets — same join shape; hyperplane LSH is chosen because it needs no
training pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                              lambda acc, x: acc + x))


def cosine_col(a, b):
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def ann_topk_bruteforce(
    emb: DataFrame,
    k: int = 10,
    query_mod: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the query subset (id % query_mod == 0).

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k by
    (cosine desc, neighbor_id asc) — fully deterministic tie-break.
    Scale shape: queries broadcast, corpus scanned once; the rank window
    partitions by query_id (small), not by corpus.
    """
    v = emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    q = v.filter(F.col("id") % query_mod == 0).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    joined = v.join(F.broadcast(q), F.col("id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        cosine_col(F.col("qv"), F.col("v")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket_expr(vec, planes: int = 8, dim: int = 64):
    """Deterministic hyperplane bucket id: bit p = [w_p · v >= 0] with
    integer pseudo-noise weights w_p[d] = ((p*1009 + d*9176 + 12345) % 97) - 48.

    Portable arithmetic — the DuckDB oracle computes identical buckets:
    ``list_sum(list_transform(range(0, dim), d ->
        ((p*1009 + d*9176 + 12345) % 97 - 48) * v[d+1]))``.
    """
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        weights = F.array(*[
            F.lit(float((p * 1009 + d * 9176 + 12345) % 97 - 48)) for d in range(dim)
        ])
        proj = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def ann_lsh(
    emb: DataFrame,
    k: int = 10,
    query_mod: int = 50,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking WITHIN the query's LSH bucket.

    Recall < 1 by design (bucket may miss true neighbors); the point is the
    join shape: corpus shuffled once on bucket id, per-bucket candidate sets,
    no corpus × queries blow-up. Multi-probe (flipping low-margin bits) is
    the standard recall knob — same plan, more candidate buckets.
    """
    v = emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    bucketed = v.withColumn("bucket", lsh_bucket_expr(F.col("v"), planes, dim))
    q = bucketed.filter(F.col("id") % query_mod == 0).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    joined = bucketed.join(F.broadcast(q), on="bucket").filter(
        F.col("id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        cosine_col(F.col("qv"), F.col("v")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_lsh_multiprobe(
    emb: DataFrame,
    k: int = 10,
    query_mod: int = 50,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH: each query probes its own bucket PLUS every
    Hamming-1 bucket (one hyperplane bit flipped) — the standard recall
    knob (Lv et al., VLDB'07): a near neighbor on the wrong side of ONE
    low-margin hyperplane is recovered without adding hash tables.

    Plan shape is unchanged from ``ann_lsh``: the probe fan-out happens on
    the tiny query side (explode to ``planes+1`` rows per query, still
    broadcast); the corpus keeps its single bucket and is scanned once —
    candidates grow ~(planes+1)× per query, never corpus × queries. Each
    corpus vector lives in exactly one bucket and probe buckets are
    distinct, so no (query, neighbor) pair duplicates — no dedup stage.
    """
    v = emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    bucketed = v.withColumn("bucket", lsh_bucket_expr(F.col("v"), planes, dim))
    probe_arr = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(planes)],
    )
    q = (
        bucketed.filter(F.col("id") % query_mod == 0)
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"),
                F.explode(probe_arr).alias("probe"))
    )
    joined = bucketed.join(F.broadcast(q), F.col("bucket") == F.col("probe")).filter(
        F.col("id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        cosine_col(F.col("qv"), F.col("v")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
