"""SemDeDup cluster-blocked dedup (operators/semantic.py) and CCNet-style
line dedup (operators/dedup.py::line_dedup). Exact output values are pinned
by the DuckDB oracle gate (q:semantic_dedup, q:semantic_dedup_remove,
q:line_dedup); these tests pin the INVARIANTS a single-query oracle can't:
blocking soundness (cluster-scoped pairs ⊆ the global sweep with identical
cosines), remove-sweep set algebra, and line-dedup keep-first semantics on
a hand-built corpus."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crawlee_spark.operators.dedup import embedding_near_dup_pairs, line_dedup
from crawlee_spark.operators.semantic import (
    assign_clusters,
    semantic_dedup_pairs,
    semantic_dedup_remove,
)


def _emb(spark, n=120, dim=8):
    # two tight direction families + noise: ids 0.. alternate between
    # base directions, with a deterministic per-id perturbation
    rows = []
    for i in range(n):
        base = [1.0 if d == (i % 4) else 0.1 for d in range(dim)]
        eps = ((i * 37) % 11 - 5) / 100.0
        rows.append((i, [float(x + (eps if d == (i % 3) else 0.0))
                         for d, x in enumerate(base)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_assign_clusters_total_and_self(spark):
    emb = _emb(spark)
    a = assign_clusters(emb, n_centroids=8, centroid_mod=7).collect()
    assert len(a) == 120                     # every vector labeled exactly once
    cents = {r["c_id"] for r in a}
    sampled = sorted(i for i in range(120) if i % 7 == 1)[:8]
    assert cents <= set(sampled)             # labels come from the sample
    by_id = {r["id"]: r["c_id"] for r in a}
    for c in cents:                          # a centroid is its own nearest
        assert by_id[c] == c


def test_cluster_pairs_subset_of_global_with_same_cosine(spark):
    emb = _emb(spark)
    blocked = semantic_dedup_pairs(emb, threshold=0.9, n_centroids=8,
                                   centroid_mod=7)
    glob = embedding_near_dup_pairs(emb, threshold=0.9)
    b = {(r["id_a"], r["id_b"]): r["cosine"] for r in blocked.collect()}
    g = {(r["id_a"], r["id_b"]): r["cosine"] for r in glob.collect()}
    assert b, "the synthetic families must produce within-cluster pairs"
    assert set(b) <= set(g)                  # blocking never invents a pair
    for k, cos in b.items():                 # identical exact cosine
        assert math.isclose(cos, g[k], abs_tol=1e-9)


def test_semantic_remove_is_complement_of_id_b(spark):
    emb = _emb(spark)
    pairs = semantic_dedup_pairs(emb, threshold=0.9, n_centroids=8,
                                 centroid_mod=7)
    removed = {r["id_b"] for r in pairs.collect()}
    kept = {r["vec_id"] for r in semantic_dedup_remove(
        emb, threshold=0.9, n_centroids=8, centroid_mod=7).collect()}
    assert kept == set(range(120)) - removed
    assert kept | removed == set(range(120))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_keep_first_and_rebuild_order(spark):
    # window=2 lines; doc 0 owns both lines; doc 1 repeats doc 0's first
    # line but keeps its own second; doc 2 is entirely doc 0's lines
    docs = _docs(spark, [
        (0, "a b c d"),
        (1, "a b x y"),
        (2, "a b c d"),
        (3, "p q"),
    ])
    out = {r["doc_id"]: r for r in line_dedup(docs, window=2).collect()}
    assert out[0]["clean_text"] == "a b c d"
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (2, 2)
    assert out[1]["clean_text"] == "x y"     # "a b" was doc 0's, pos order kept
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (2, 1)
    assert 2 not in out                      # fully-duplicated doc drops out
    assert out[3]["clean_text"] == "p q"


def test_line_dedup_within_doc_duplicates_and_short_tail(spark):
    # the same line twice INSIDE one doc: second occurrence dropped; the
    # 1-token tail line survives as its own chunk
    docs = _docs(spark, [(0, "a b a b z")])
    out = line_dedup(docs, window=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["clean_text"] == "a b z"
    assert (r["n_lines"], r["n_kept"]) == (3, 2)


def test_line_dedup_plan_is_aggregate_not_window(spark):
    # the keeper must be a hash aggregate (map-side combine), not a
    # row_number window sorting every hash partition
    docs = _docs(spark, [(0, "a b c d"), (1, "a b x y")])
    df = line_dedup(docs, window=2)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_line_dedup_empty_docs_drop_uniformly(spark):
    # split('', ' ') is [''] — without the text guard the FIRST empty doc
    # would keep one '' line and later empty docs would vanish as its dups
    docs = _docs(spark, [(0, ""), (1, ""), (2, "a b")])
    out = {r["doc_id"]: r for r in line_dedup(docs, window=2).collect()}
    assert set(out) == {2}  # every empty doc has 0 lines, none keeps ''
    assert out[2]["clean_text"] == "a b"
