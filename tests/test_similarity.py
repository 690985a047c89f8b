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


def test_quantized_embedding_lsh_finds_true_dups(spark):
    """Quantized hyperplane LSH (operators/dedup.py) must find every true
    near-duplicate pair: identical-direction vectors collide in EVERY table
    (all sign projections equal), so recall on exact/near-exact dups is 1
    regardless of the planes/tables knobs. Also pins the quantized-cosine
    error bound vs the float cosine (|Δ| ≤ ~dim·2⁻²⁰ after normalization)."""
    import math

    from crawlee_spark.operators.dedup import embedding_near_dup_lsh

    base = [
        [float((i * 37 + d * 101 + 13) % 19 - 9) / 10.0 for d in range(16)]
        for i in range(30)
    ]
    rows = [(i, v) for i, v in enumerate(base)]
    # true dups: exact copy of v0, and v1 with one component nudged
    rows.append((100, list(base[0])))
    nudged = list(base[1])
    nudged[0] += 1e-4
    rows.append((101, nudged))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = embedding_near_dup_lsh(emb, threshold=0.999, tables=2, planes=6, dim=16)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in out.collect()}
    assert (0, 100) in got and (1, 101) in got

    # quantized cosine of the exact copy is 1 up to int rounding
    assert abs(got[(0, 100)] - 1.0) < 1e-5
    # cross-check one pair against the float cosine
    a, b = base[1], nudged
    dot = sum(x * y for x, y in zip(a, b))
    ref = dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))
    assert abs(got[(1, 101)] - ref) < 1e-4


def test_int8_quantization_and_rank1_recall(spark):
    """int8 path: quantized values bounded, zero-vector safe, and rank-1
    neighbors match the float brute-force path (1/127 resolution is far
    finer than the synthetic corpus's cosine gaps)."""
    import numpy as np

    from crawlee_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_int8,
        quantize_int8,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(120)]
    rows.append((120, [0.0] * 16))  # zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    q8 = {r["id"]: r for r in quantize_int8(df).collect()}
    for r in q8.values():
        assert all(-127 <= x <= 127 for x in r["qv"])
    assert q8[120]["qnorm"] == 0 and set(q8[120]["qv"]) == {0}
    # max-abs element quantizes to exactly ±127
    assert any(abs(x) == 127 for x in q8[0]["qv"])

    # float path has no zero-vector guard (ANSI divide-by-zero; none occur
    # in real embeddings) — compare on the nonzero subset, while the int8
    # path handles the zero row explicitly (cosine 0)
    nz = df.filter("vec_id < 120")
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in ann_topk_bruteforce(nz, k=3, query_mod=40).collect()}
    quant = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in ann_topk_int8(df, k=3, query_mod=40).collect()}
    r1_exact = {q: n for (q, rk), n in exact.items() if rk == 1}
    r1_quant = {q: n for (q, rk), n in quant.items() if rk == 1}
    agree = sum(r1_exact[q] == r1_quant.get(q) for q in r1_exact)
    assert agree >= len(r1_exact) - 1, (r1_exact, r1_quant)
