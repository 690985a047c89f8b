"""Semantic (embedding-cluster-scoped) deduplication — SemDeDup.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) removes *semantic*
duplicates from web-scale training corpora: cluster the embeddings with
k-means, then search for high-cosine pairs ONLY within each cluster —
the cluster is the blocking key that turns an O(n²) all-pairs sweep into
per-cluster all-pairs over small groups. At 100 TB the knob is
``n_centroids ≈ corpus / target_cluster_size``: the centroid table stays
tiny (broadcast), the corpus is shuffled ONCE on the assigned cluster id,
and the quadratic term is bounded by the largest cluster, never the corpus.

Centroids here are a DETERMINISTIC sample of the corpus itself rather than
Lloyd-iterated means, for the same reason as ``ann_ivf``
(operators/similarity.py): a float mean computed by a parallel aggregate is
order-nondeterministic in IEEE arithmetic, which would break the value-hash
oracle; sampled centroids keep every arithmetic step a sequential per-row
fold that the DuckDB oracle reproduces bit-for-bit. SemDeDup's published
recipe is equally agnostic — any partition of embedding space works; the
paper uses k-means over a sample.

Reference scope note: this is a beyond-reference training-data op (build
brief), not a Crawlee operator; the Crawlee-side analog is content dedup of
crawled pages (`uniqueKey`, packages/core/src/storages — exact only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlee_spark.operators.dedup import rebalance_narrow
from crawlee_spark.operators.similarity import _as_double, _dot, _norm, cosine_col


def assign_clusters(
    emb: DataFrame,
    n_centroids: int = 32,
    centroid_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, c_id): each vector labeled with its nearest sampled centroid
    (argmax cosine, ties to the lower centroid id).

    Plan shape: centroids broadcast, corpus scanned once; the argmax is a
    max_by hash aggregate keyed on id (map-side combine), no window.
    """
    v = rebalance_narrow(emb).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    cent = (
        v.filter(F.col("id") % centroid_mod == 1)
        .orderBy("id")
        .limit(n_centroids)
        .select(F.col("id").alias("c_id"), F.col("v").alias("cv"))
    )
    raw_cos = _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv")))
    return (
        v.join(F.broadcast(cent))
        .select("id", "v", "c_id", raw_cos.alias("_cos"))
        .groupBy("id")
        .agg(
            F.first("v").alias("v"),
            F.max_by(F.col("c_id"), F.struct(F.col("_cos"), -F.col("c_id"))).alias("c_id"),
        )
    )


def semantic_dedup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_centroids: int = 32,
    centroid_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, c_id, cosine): exact-cosine near-dup pairs WITHIN each
    cluster — the SemDeDup candidate sweep.

    The pair join is an equi-join on ``c_id`` (shuffle ∝ corpus, pairs ∝
    Σ cluster_size² — bounded by the largest cluster). Recall vs a global
    all-pairs sweep is < 1 by construction exactly when a near-dup pair
    straddles a cluster boundary — the trade the paper measures. The
    synthetic testdata embeddings cluster loosely (max pair cosine ~0.51,
    see q_dedup_embedding), so the default threshold matches that family's
    0.4 and measured recall vs the global sweep is ~0.22 at sf0.01; real
    SemDeDup corpora use ~0.95+ where near-dup pairs are nearly colinear
    and almost always co-cluster.
    """
    assigned = assign_clusters(emb, n_centroids, centroid_mod, id_col, vec_col)
    a, b = assigned.alias("a"), assigned.alias("b")
    return (
        a.join(b, on="c_id")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("c_id"),
            cosine_col(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup_remove(
    emb: DataFrame,
    threshold: float = 0.4,
    n_centroids: int = 32,
    centroid_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Keep-first SemDeDup sweep: drop every vector that near-duplicates a
    LOWER id in its cluster; return the surviving (vec_id,) set.

    Same keep-first convention as ``minhash_lsh_remove`` (pairwise, not
    transitive — route pairs through ``connected_components`` when group
    semantics are needed; documented trade in operators/dedup.py).
    """
    pairs = semantic_dedup_pairs(
        emb, threshold, n_centroids, centroid_mod, id_col, vec_col)
    removed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return emb.select(id_col).join(removed, on=id_col, how="left_anti")
