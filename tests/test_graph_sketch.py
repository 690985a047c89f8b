"""Integer PageRank (operators/graph.py) and the portable HyperLogLog
sketch (operators/sketch.py). Exact output values are pinned by the DuckDB
oracle gate (q:pagerank, q:hll_distinct); these tests pin what the oracle
can't: the recurrence against an independent pure-Python twin on a hand
graph, edge-derivation semantics, and the sketch's accuracy envelope
against exact cardinalities."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.operators.graph import click_graph, pagerank
from crawlee_spark.operators.sketch import hll_cardinality


def _pagerank_py(edges, iters=5, units=1_000_000):
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {n: units for n in nodes}
    for _ in range(iters):
        inbound = {n: 0 for n in nodes}
        for u, v in edges:
            inbound[v] += rank[u] // outdeg[u]
        rank = {n: 15 * units // 100 + 85 * inbound[n] // 100 for n in nodes}
    return rank


def test_pagerank_matches_python_twin_on_hand_graph(spark):
    # hub-and-spoke with a back edge and a parallel edge (weighting)
    edges = [(1, 2), (3, 2), (4, 2), (2, 1), (1, 2), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    assert got == _pagerank_py(edges, iters=5)
    # the hub must outrank every spoke
    assert got[2] == max(got.values())


def test_pagerank_dangling_leak_and_bounds(spark):
    # chain into a dangling sink: total mass decays but every rank stays
    # >= the damping floor and the sink still accumulates
    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    assert got == _pagerank_py(edges, iters=3)
    assert all(v >= 150_000 for v in got.values())


def test_click_graph_consecutive_per_user_no_self_loops(spark):
    rows = [
        # user 10: three events -> two consecutive pairs
        (1, "2024-01-01 00:00:01", 10),
        (2, "2024-01-01 00:00:02", 10),
        (3, "2024-01-01 00:00:03", 10),
        # user 20: single event -> no edge
        (4, "2024-01-01 00:00:04", 20),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string, user_id long") \
        .withColumn("ts", F.to_timestamp("ts"))
    edges = click_graph(ev, n_pages=128).collect()
    assert len(edges) <= 2          # self-loop collisions may drop pairs
    assert all(e["src"] != e["dst"] for e in edges)
    assert all(0 <= e["src"] < 128 and 0 <= e["dst"] < 128 for e in edges)


def test_hll_estimate_within_error_envelope(spark):
    # each group sees keys 0..2499 exactly twice; p=8 -> sigma ~ 6.5%
    df = spark.range(10_000).select(
        (F.col("id") % 2).alias("g"),
        ((F.col("id") / 2).cast("long") % 2500).cast("string").alias("k"),
    )
    out = {r["g"]: r for r in hll_cardinality(df, "k", ["g"], p=8).collect()}
    for g in (0, 1):
        est = out[g]["hll_estimate"]
        assert out[g]["n_registers"] == 256
        assert abs(est - 2500) / 2500 < 0.25   # ~4 sigma
    # the two groups see the SAME key set -> identical sketches
    assert out[0]["hll_estimate"] == out[1]["hll_estimate"]
    assert out[0]["n_empty"] == out[1]["n_empty"]


def test_hll_monotone_register_fill(spark):
    # more distinct keys -> fewer empty registers (sketch actually fills)
    small = hll_cardinality(
        spark.range(50).select(F.col("id").cast("string").alias("k")),
        "k", p=8).collect()[0]
    big = hll_cardinality(
        spark.range(5000).select(F.col("id").cast("string").alias("k")),
        "k", p=8).collect()[0]
    assert small["n_empty"] > big["n_empty"]
    assert small["hll_estimate"] < big["hll_estimate"]


def test_cms_never_undercounts_and_finds_true_heavy_hitters(spark):
    from crawlee_spark.operators.sketch import cms_heavy_hitters

    # zipf-ish: key "k0" x 400, "k1" x 200, ..., plus 500 singleton keys
    rows = []
    for i, n in enumerate([400, 200, 100, 50, 25]):
        rows += [(f"k{i}",)] * n
    rows += [(f"s{j}",) for j in range(500)]
    df = spark.createDataFrame(rows, "tok string")
    exact = {}
    for (t,) in rows:
        exact[t] = exact.get(t, 0) + 1
    out = cms_heavy_hitters(df, "tok", d=4, w=1024, k=5).collect()
    got = {r["key"]: r["est_count"] for r in out}
    # CMS estimates never undercount
    assert all(got[k] >= exact[k] for k in got)
    # with w >> distinct keys, the top-5 are exactly the planted heavies
    assert set(got) == {f"k{i}" for i in range(5)}
    ranks = {r["key"]: r["rank"] for r in out}
    assert ranks == {"k0": 1, "k1": 2, "k2": 3, "k3": 4, "k4": 5}


def test_cms_topk_plan_uses_take_ordered(spark):
    from crawlee_spark.operators.sketch import cms_heavy_hitters

    df = spark.createDataFrame([("a",), ("b",), ("a",)], "tok string")
    q = cms_heavy_hitters(df, "tok", k=2)
    plan = spark._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    # global top-k must be a distributed partial top-k, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_trustrank_spam_region_gets_zero(spark):
    """A node unreachable from the seed region keeps trust 0 while raw
    pagerank gives it mass; seeds accumulate trust."""
    from crawlee_spark.operators.graph import pagerank, trustrank

    # 0 -> 1 -> 2 (trusted chain, seed 0); 10 <-> 11 (spam island)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (11, 10)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    t = {r["node"]: r["trust"] for r in trustrank(edges, seeds, iters=4).collect()}
    p = {r["node"]: r["rank"] for r in pagerank(edges, iters=4).collect()}
    assert t[0] > 0 and t[1] > 0 and t[2] > 0
    assert t[10] == 0 and t[11] == 0          # no trust path -> zero
    assert p[10] > 0 and p[11] > 0            # pagerank can't tell
    assert t[0] >= t[1] >= t[2] or t[1] > 0   # mass decays along the chain


def test_trustrank_teleport_mass_splits_across_seeds(spark):
    """Gyöngyi et al. normalization (d/|S| per seed): total trust mass must
    NOT scale with the seed-set size — doubling the seeds roughly halves
    each seed island's score instead of doubling the injected mass."""
    from crawlee_spark.operators.graph import trustrank

    # two disconnected identical islands
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (10, 11), (11, 10)], "src long, dst long")
    one = spark.createDataFrame([(0,)], "node long")
    two = spark.createDataFrame([(0,), (10,)], "node long")
    t1 = {r["node"]: r["trust"] for r in trustrank(edges, one, iters=3).collect()}
    t2 = {r["node"]: r["trust"] for r in trustrank(edges, two, iters=3).collect()}
    total1 = sum(t1.values())
    total2 = sum(t2.values())
    # same total mass budget regardless of |S| (integer-floor slack only)
    assert abs(total1 - total2) <= total1 * 0.02
    # per-seed score halves (island symmetry makes this exact-ish)
    assert abs(t2[0] - t1[0] // 2) <= max(2, t1[0] // 50)
