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
``ann_ivf`` adds the third standard shape: an IVF-Flat inverted file over
deterministic sampled centroids (no training pass, oracle-reproducible
arithmetic), with ``n_probe`` as the recall knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlee_spark.operators.dedup import rebalance_narrow


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
    v = rebalance_narrow(emb).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
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
    v = rebalance_narrow(emb).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
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


def ann_ivf(
    emb: DataFrame,
    k: int = 10,
    query_mod: int = 50,
    n_centroids: int = 32,
    n_probe: int = 4,
    centroid_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k: an inverted file over sampled centroids.

    The third standard ANN shape next to brute force and hyperplane LSH
    (see module docstring): every corpus vector is assigned to its nearest
    centroid (one inverted list per centroid); a query probes its
    ``n_probe`` nearest centroids and ranks exactly within those lists.

    Centroids are a DETERMINISTIC sample of the corpus itself
    (``id % centroid_mod == 1``, first ``n_centroids`` by id) rather than
    k-means means: a float mean computed by a parallel aggregate is
    order-nondeterministic in IEEE arithmetic, which would break the
    value-hash oracle; sampled centroids (IVF over a training sample) keep
    every arithmetic step a sequential per-row fold that DuckDB reproduces
    bit-for-bit.

    Scale shape: centroids are tiny and broadcast twice (corpus assignment,
    query probing); the corpus is scanned once for assignment and shuffled
    once on ``c_id``; candidates ∝ n_probe/n_centroids of the corpus per
    query. At real scale n_centroids grows ~sqrt(corpus) and assignment
    cost corpus × centroids is the classic IVF build tradeoff.
    """
    v = rebalance_narrow(emb).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    cent = (
        v.filter(F.col("id") % centroid_mod == 1)
        .orderBy("id")
        .limit(n_centroids)
        .select(F.col("id").alias("c_id"), F.col("v").alias("cv"))
    )
    # nearest centroid per corpus vector: argmax over UNROUNDED cosine
    # (sequential fold, same evaluation order as the oracle's list_reduce),
    # tie-broken by centroid id via lexicographic struct max
    raw_cos = _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv")))
    assigned = (
        v.join(F.broadcast(cent))
        .select("id", "v", F.col("c_id"), raw_cos.alias("_cos"))
        .groupBy("id")
        .agg(
            F.first("v").alias("v"),
            F.max_by(F.col("c_id"), F.struct(F.col("_cos"), -F.col("c_id"))).alias("c_id"),
        )
    )
    q = (
        v.filter(F.col("id") % query_mod == 0)
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"))
    )
    q_cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("c_id").asc()
    )
    probes = (
        q.join(F.broadcast(cent))
        .select("query_id", "qv", "c_id", q_cos.alias("_cos"))
        .withColumn("_pr", F.row_number().over(probe_w))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "c_id")
    )
    joined = assigned.join(F.broadcast(probes), on="c_id").filter(
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
    v = rebalance_narrow(emb).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
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


def quantize_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(v_i·127/max|v|).

    THE memory lever for embedding search at corpus scale: float32
    vectors shrink 4× (a 10^10-row embedding table drops from ~2.5 TB to
    ~640 GB per 64 dims), shuffle/cache volume drops with them, and the
    integer dot product below is exact (no float accumulation order).
    Rounding is ``floor(x·127/max + 0.5)`` — explicit half-up in DOUBLE,
    bit-reproducible across Spark/DuckDB (both evaluate the same IEEE
    expression; plain ``round()`` differs in half-even vs half-up across
    engines). Zero vectors quantize to all-zeros.

    Output: (id, qv: array<long> in [-127, 127], qnorm: long — the exact
    integer squared norm, precomputed so scoring never re-folds it).
    """
    v = _as_double(F.col(vec_col))
    mx = F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    qv = F.when(
        mx > 0,
        F.transform(v, lambda x: F.floor(x * 127.0 / mx + 0.5).cast("long")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
    out = emb.select(F.col(id_col).alias("id"), qv.alias("qv"))
    qnorm = F.aggregate(F.col("qv"), F.lit(0).cast("long"),
                        lambda a, x: a + x * x)
    return out.withColumn("qnorm", qnorm)


def ann_topk_int8(
    emb: DataFrame,
    k: int = 10,
    query_mod: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k cosine over int8-quantized vectors.

    Same plan shape as ``ann_topk_bruteforce`` (queries broadcast, corpus
    scanned once, rank window per query) but the hot loop is an INTEGER
    dot product over the quantized arrays — 4× less data moved and an
    exactly-associative accumulation; the only floats are the final
    ``dot/sqrt(na·nb)`` per candidate, rounded to 6 for the oracle.
    Cosine under symmetric per-vector scaling is scale-invariant, so the
    quantized cosine approximates the float one to ~1/127 resolution —
    rank-1 recall is asserted against the float path in tests.
    """
    q8 = quantize_int8(emb, id_col=id_col, vec_col=vec_col)
    queries = q8.filter(F.col("id") % query_mod == 0).select(
        F.col("id").alias("query_id"), F.col("qv").alias("qa"),
        F.col("qnorm").alias("na"))
    joined = rebalance_narrow(q8).join(
        F.broadcast(queries), F.col("id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qv"), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda a, x: a + x)
    cos = F.when(
        (F.col("na") > 0) & (F.col("qnorm") > 0),
        F.round(dot / (F.sqrt(F.col("na")) * F.sqrt(F.col("qnorm"))), 6),
    ).otherwise(F.lit(0.0))  # zero vector -> defined 0, not NaN rank chaos
    scored = joined.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        cos.alias("cosine_q8"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q8").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
