"""Dedup operator unit tests: pin the knobs the DuckDB oracle gate cannot
see — hot-bucket capping, checkpoint durability modes, and first-match
dedup equivalence (the oracle pins outputs; these pin the operator's
behavior under non-default scale settings)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawlee_spark.operators import dedup as D


@pytest.fixture()
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(80)
    )


def _pairs_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_max_bucket_subset_and_noop(docs):
    """A large cap is a no-op; a tight cap only ever REMOVES pairs (drops
    template mega-buckets), never invents them."""
    base = _pairs_set(D.minhash_lsh_pairs(docs))
    uncapped_eq = _pairs_set(D.minhash_lsh_pairs(docs, max_bucket=10_000))
    assert uncapped_eq == base
    capped = _pairs_set(D.minhash_lsh_pairs(docs, max_bucket=2))
    assert capped <= base
    assert len(capped) < len(base)  # the templated corpus has buckets > 2


def test_minhash_first_match_equals_distinct(docs):
    """The first-colliding-band dedup must produce exactly the distinct
    candidate set (one copy per colliding pair, no copies lost)."""
    from crawlee_spark.functions.text import md5_hash64

    bands, r = 4, 2
    sigs = D.minhash_signatures(docs, 8, 3)
    band_hashes = []
    for b in range(bands):
        piece = F.concat_ws(",", *[
            F.element_at(F.col("sig"), b * r + j + 1).cast("string")
            for j in range(r)
        ])
        band_hashes.append(md5_hash64(F.concat(piece, F.lit(f"#band{b}"))))
    rows = sigs.select(
        "id", F.explode(F.array(F.array(*band_hashes))).alias("bhs")
    ).select("id", "bhs", F.posexplode("bhs").alias("band", "bh"))
    a, b_ = rows.alias("a"), rows.alias("b")
    naive = _pairs_set(
        a.join(b_, on=["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    assert _pairs_set(D.minhash_lsh_pairs(docs)) == naive


def test_checkpoint_mode_reliable(docs, tmp_path, spark):
    """CHECKPOINT_MODE='reliable' pins pairs through a
    SparkContext-checkpoint-dir write (the executor-loss-safe mode for
    multi-hour cluster sweeps) with identical results."""
    base = _pairs_set(D.minhash_lsh_pairs(docs))
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    old = D.CHECKPOINT_MODE
    D.CHECKPOINT_MODE = "reliable"
    try:
        reliable = _pairs_set(D.minhash_lsh_pairs(docs))
    finally:
        D.CHECKPOINT_MODE = old
    assert reliable == base
    ckpt_files = list((tmp_path / "ckpt").rglob("*"))
    assert ckpt_files, "reliable checkpoint wrote nothing"


def test_hamming_max_bucket_subset_and_noop(docs):
    sigs = D.simhash(docs, 48)
    base = _pairs_set(D.hamming_pairs(sigs, 3, 48))
    assert _pairs_set(D.hamming_pairs(sigs, 3, 48, max_bucket=10_000)) == base
    capped = _pairs_set(D.hamming_pairs(sigs, 3, 48, max_bucket=2))
    assert capped <= base


def test_components_log_rounds_on_chain(spark):
    """Pointer jumping: a 40-node path graph (diameter 39) must fully
    converge within 10 rounds — min-label alone would need 39. Guards the
    O(log diameter) claim for adversarial (non-clique) dup graphs."""
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in D.connected_components(pairs, max_iter=10).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_incremental_matches_vs_pair_projection(docs):
    """Incremental batch-vs-corpus matches == the cross-side projection of
    the full pair set: an incoming doc is flagged iff the (uncapped) LSH
    pair graph links it to any existing doc, first_match is the min such
    neighbor, and n_matches counts distinct existing neighbors."""
    docs = docs.sparkSession.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )  # the 80-row fixture slice has no cross-side collisions
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    existing = docs.filter(F.col("doc_id") % 5 != 0)
    got = {
        r["id"]: (r["first_match"], r["n_matches"])
        for r in D.minhash_lsh_matches(incoming, existing).collect()
    }
    all_pairs = _pairs_set(D.minhash_lsh_pairs(docs))
    expect: dict[int, set[int]] = {}
    for a, b in all_pairs:
        for inc, ex in ((a, b), (b, a)):
            if inc % 5 == 0 and ex % 5 != 0:
                expect.setdefault(inc, set()).add(ex)
    assert got == {k: (min(v), len(v)) for k, v in expect.items()}
    assert got, "fixture corpus must produce at least one cross-side match"


def test_hamming_block_col_equals_postfilter(spark):
    """block_col (cross-modal equality inside the equi-join key) must give
    exactly the pairs a post-join equality filter would — and keep the
    equi-join plan (no nested-loop)."""
    sigs = spark.range(0, 400).select(
        F.col("id"),
        F.xxhash64((F.col("id") - F.col("id") % 8).cast("string")).alias("sig"),
        (F.col("id") % 3).alias("grp"),
    )
    blocked = D.hamming_pairs(sigs, max_hamming=4, bits=64, id_col="id",
                              sig_col="sig", block_col="grp")
    plain = D.hamming_pairs(sigs, max_hamming=4, bits=64, id_col="id",
                            sig_col="sig")
    grp = sigs.select(F.col("id").alias("id_a"), F.col("grp").alias("_ga"))
    grp_b = sigs.select(F.col("id").alias("id_b"), F.col("grp").alias("_gb"))
    want = (plain.join(grp, "id_a").join(grp_b, "id_b")
            .filter(F.col("_ga") == F.col("_gb")))
    assert _pairs_set(blocked) == _pairs_set(want)
    assert len(_pairs_set(blocked)) > 0
    D.CHECKPOINT_PAIRS = False
    try:
        plan = D.hamming_pairs(sigs, max_hamming=4, bits=64, id_col="id",
                               sig_col="sig", block_col="grp")._jdf.queryExecution(
                               ).executedPlan().toString()
    finally:
        D.CHECKPOINT_PAIRS = True
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_keep_best_dominates_cluster(spark):
    """q:dedup_keep_best pins exact values; this pins the INVARIANT: the
    keeper's quality is the max of its cluster, with min-id tie-break, and
    every cluster elects exactly one keeper."""
    from pyspark.sql import functions as F

    from crawlee_spark.plans.queries import (
        _t, q_dedup_keep_best, q_dedup_components)
    from crawlee_spark.functions import text as T

    sf = "/root/testdata/sf0.01"
    keep = {r["component"]: r for r in q_dedup_keep_best(spark, sf).collect()}
    comp = q_dedup_components(spark, sf).collect()
    quality = {
        r["doc_id"]: r["q"]
        for r in _t(spark, sf, "documents")
        .select("doc_id", T.quality_score(F.col("text")).alias("q")).collect()
    }
    members: dict[int, list[int]] = {}
    for r in comp:
        members.setdefault(r["component"], []).append(r["doc_id"])
    assert set(members) == set(keep)
    for c, ids in members.items():
        best_q = max(quality[i] for i in ids)
        expect = min(i for i in ids if quality[i] == best_q)
        assert keep[c]["keep_id"] == expect
        assert keep[c]["keep_quality"] == best_q
        assert keep[c]["n_members"] == len(ids)


def test_brute_force_twins_size_guarded(spark, docs):
    """The quadratic ground-truth twins must refuse inputs beyond their
    audit-scale cap (VERDICT r2 item #2) — raising, not silently sampling —
    and still run under the cap / with an explicit opt-out."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    with pytest.raises(D.BruteForceSizeError, match="minhash_lsh_pairs"):
        D.ngram_jaccard_pairs(docs, max_rows=10).count()
    with pytest.raises(D.BruteForceSizeError, match="embedding_near_dup_lsh"):
        D.embedding_near_dup_pairs(emb, max_rows=10).count()

    # under the cap: runs; explicit opt-out: identical result
    guarded = _pairs_set(
        D.embedding_near_dup_pairs(emb.limit(30), threshold=0.4))
    unguarded = _pairs_set(
        D.embedding_near_dup_pairs(emb.limit(30), threshold=0.4,
                                   max_rows=None))
    assert guarded == unguarded
