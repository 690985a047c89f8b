"""ANN similarity search (operators/similarity.py): brute-force exactness
is pinned by the DuckDB oracle gate (q:ann_topk); these tests pin the
LSH-vs-multiprobe relationship, which no single-query oracle can express:
multi-probe's candidate set is a strict superset (query bucket + every
Hamming-1 bucket), so its recall vs brute force can only improve."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.operators.similarity import (
    ann_lsh,
    ann_lsh_multiprobe,
    ann_topk_bruteforce,
)

DIM = 8
N = 120
MOD = 40  # 3 query vectors


def _emb(spark):
    # deterministic pseudo-noise vectors, same arithmetic style as the
    # hyperplane weights (no RNG in tests)
    rows = [
        (i, [float((i * 37 + d * 101 + 13) % 19 - 9) for d in range(DIM)])
        for i in range(N)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_multiprobe_superset_and_recall(spark):
    emb = _emb(spark)
    kw = dict(k=10, query_mod=MOD, planes=6, dim=DIM)
    single = _pairs(ann_lsh(emb, **kw))
    multi = _pairs(ann_lsh_multiprobe(emb, **kw))
    exact = _pairs(ann_topk_bruteforce(emb, k=10, query_mod=MOD))

    # candidate growth: every single-probe hit whose cosine survives the
    # top-k cut is still found; recall against brute force never drops
    assert len(multi & exact) >= len(single & exact)
    # multi-probe must actually widen the candidate pool on this input
    # (3 queries x 6 extra probe buckets): more ranked output overall
    assert len(multi) >= len(single)


def test_multiprobe_no_duplicate_pairs(spark):
    """One bucket per corpus vector + distinct probe buckets => a
    (query, neighbor) pair can never appear twice before ranking."""
    emb = _emb(spark)
    out = ann_lsh_multiprobe(emb, k=10**6, query_mod=MOD, planes=6, dim=DIM)
    total = out.count()
    distinct = out.select("query_id", "neighbor_id").distinct().count()
    assert total == distinct


def test_multiprobe_ranks_dense_per_query(spark):
    emb = _emb(spark)
    out = ann_lsh_multiprobe(emb, k=10, query_mod=MOD, planes=6, dim=DIM)
    per_q = out.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx"), F.min("rank").alias("mn")
    )
    for r in per_q.collect():
        assert r["mn"] == 1 and r["mx"] == r["n"]  # ranks 1..n, no gaps


def test_ivf_partition_and_probe_containment(spark):
    """IVF invariants: every corpus vector lands in exactly one inverted
    list; with n_probe == n_centroids the result EQUALS brute force (probing
    every list removes the approximation, leaving only the join shape)."""
    from crawlee_spark.operators.similarity import ann_ivf

    emb = _emb(spark)
    exact = _pairs(ann_topk_bruteforce(emb, k=5, query_mod=MOD))
    all_probe = _pairs(
        ann_ivf(emb, k=5, query_mod=MOD, n_centroids=8, n_probe=8, centroid_mod=13)
    )
    assert all_probe == exact

    # narrow probing is a subset of the full-probe candidate universe and
    # stays deterministic across runs
    narrow1 = _pairs(ann_ivf(emb, k=5, query_mod=MOD, n_centroids=8, n_probe=2,
                             centroid_mod=13))
    narrow2 = _pairs(ann_ivf(emb, k=5, query_mod=MOD, n_centroids=8, n_probe=2,
                             centroid_mod=13))
    assert narrow1 == narrow2
    assert len(narrow1) > 0
