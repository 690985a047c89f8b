"""Sequence packing (operators/packing.py). Exact offsets are pinned by the
DuckDB oracle gate (q:sequence_pack); these tests pin the INVARIANTS the
single-query oracle cannot express: stream contiguity within a shard,
window-span arithmetic, shard stability under corpus growth, and
independence from the input partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.operators.packing import sequence_pack, shard_of

CTX = 100


def _docs(spark, n, parts=4):
    rows = [(i, (i * 37) % 90 + 1) for i in range(n)]  # 1..90 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    return df.repartition(parts).withColumn("shard", shard_of("doc_id", 4))


def test_pack_offsets_are_contiguous_per_shard(spark):
    out = sequence_pack(_docs(spark, 200), "n_tokens", "doc_id", "shard", CTX)
    by_shard: dict[int, list] = {}
    for r in out.collect():
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 4
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            assert r["start_off"] == off          # no gaps, no overlaps
            assert r["pack_id"] == off // CTX
            end = off + r["n_tokens"] - 1
            assert r["n_windows"] == end // CTX - off // CTX + 1
            off += r["n_tokens"]


def test_pack_window_span_bounds(spark):
    out = sequence_pack(_docs(spark, 200), "n_tokens", "doc_id", "shard", CTX)
    # every doc here is <= 90 tokens < CTX, so it spans 1 or 2 windows
    spans = [r["n_windows"] for r in out.collect()]
    assert set(spans) <= {1, 2}
    assert 2 in spans  # some doc straddles a boundary


def test_pack_is_partitioning_invariant_and_growth_stable(spark):
    a = sequence_pack(_docs(spark, 150, parts=1), "n_tokens", "doc_id",
                      "shard", CTX)
    b = sequence_pack(_docs(spark, 150, parts=7), "n_tokens", "doc_id",
                      "shard", CTX)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b

    # appending docs with LARGER keys never moves existing docs' offsets
    big = sequence_pack(_docs(spark, 300), "n_tokens", "doc_id", "shard", CTX)
    prefix = sorted(
        map(tuple, big.filter(F.col("doc_id") < 150).collect()))
    assert prefix == rows_a


def test_image_batch_pack_invariants(spark):
    """Batches are aspect-homogeneous, never cross a shard, fill slots
    0..B-1 contiguously, and only the last batch per (bkt, shard) stream
    may be ragged (exact values pinned by the q:image_batch_pack oracle)."""
    from crawlee_spark.plans.queries import q_image_batch_pack

    rows = q_image_batch_pack(spark, "/root/testdata/sf0.01").collect()
    groups: dict[tuple, list] = {}
    for r in rows:
        assert 1 <= r["bkt"] <= 12
        assert r["bkt"] == min(max(r["w"] * 4 // r["h"], 1), 12)
        groups.setdefault((r["bkt"], r["shard"], r["batch_idx"]), []).append(r)
    streams: dict[tuple, int] = {}
    for (bkt, shard, bi), batch in groups.items():
        assert sorted(r["slot"] for r in batch) == list(range(len(batch)))
        assert len(batch) <= 16
        streams[(bkt, shard)] = max(streams.get((bkt, shard), -1), bi)
    for (bkt, shard), last in streams.items():
        for bi in range(last):  # every batch before the last one is full
            assert len(groups[(bkt, shard, bi)]) == 16


def test_shard_of_is_uniform_enough(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    counts = (
        df.withColumn("s", shard_of("doc_id", 8))
        .groupBy("s").count().collect()
    )
    assert len(counts) == 8
    assert all(80 < r["count"] < 170 for r in counts)
