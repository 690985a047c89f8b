"""Link-graph operators: click-graph derivation + integer-arithmetic
PageRank.

Frontier prioritization by link importance is the classic crawl-ordering
signal (OPIC / PageRank-ordered crawling — Cho, Garcia-Molina & Page,
"Efficient crawling through URL ordering", WWW'98). The reference schedules
purely by insertion order + forefront (request_queue.ts); at 10^10 URLs a
production crawler re-prioritizes the frontier from the link graph it has
already observed. This module provides that signal as a set-based operator
over an edge DataFrame.

Determinism: classic PageRank iterates float sums whose value depends on
reduction order — unusable under a value-hash oracle. Ranks here are
integer "rank units" (1e6 per node at init) with the damped update

    rank'(v) = 150_000 + (85 * inbound(v)) div 100
    inbound(v) = Σ_{edges u→v} rank(u) div outdeg(u)

— every step is exact int64 arithmetic (sums are order-independent), both
engines floor identically, and the fixed iteration count makes the whole
computation one deterministic dataflow. Truncation loses < outdeg units per
node per step (bounded, documented); dangling nodes leak their rank mass
(the standard simplification — re-injection would add one scalar broadcast
per iteration at scale).

Scale shape per iteration: one equi-join ranks⋈edges on src (edges arrive
pre-joined with outdeg — computed once), one hash aggregate on dst with
map-side combine, one left join back to the node set. Edges re-use their
partitioning across iterations; lineage is truncated per step with
localCheckpoint exactly like operators/dedup.py::connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlee_spark.functions.text import md5_hash64


def click_graph(events: DataFrame, n_pages: int = 128) -> DataFrame:
    """(src, dst) edge multiset: consecutive events of the same user are a
    click edge between their (synthetic, hash-derived) pages.

    The testdata events table carries no URL column, so the page id is
    derived deterministically: ``page = md5_hash64(event_id) % n_pages``
    (the DuckDB oracle mirrors the derivation). Self-loops dropped;
    parallel edges kept (repeat clicks weight the edge).
    """
    page = F.pmod(md5_hash64(F.col("event_id").cast("string")), F.lit(n_pages))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag(page).over(w).alias("src"), page.alias("dst"))
    return pairs.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))


def _damped_rank_loop(
    edges: DataFrame,
    node_dim: DataFrame,
    iters: int,
    src_col: str,
    dst_col: str,
) -> DataFrame:
    """Shared integer-unit damped iteration: ``node_dim`` carries, per
    node, its teleport term ``tp`` (added every round) and initial
    ``rank``. PageRank = uniform tp/init; TrustRank = seed-gated. One
    place owns the recurrence so fixes (e.g. dangling-mass re-injection)
    cannot diverge between the two."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # join outdeg once; every iteration reuses this edge set
    ed = e.join(outdeg, on="src").localCheckpoint(eager=True)
    ranks = node_dim.select("node", "rank")
    for _ in range(iters):
        inbound = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inbound"))
        )
        ranks = (
            node_dim.join(inbound, node_dim["node"] == inbound["dst"], "left")
            .select(
                "node",
                (F.col("tp")
                 + F.expr("85 * coalesce(inbound, 0L) div 100")).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def _node_set(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    units: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank): integer-unit PageRank after ``iters`` damped updates
    (see module docstring for the exact recurrence and why it is integer).

    Nodes = every id appearing as src or dst. Output rank is int64 units
    (1e6 = the undamped per-node mass).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    node_dim = _node_set(e).select(
        "node",
        F.lit(15 * units // 100).cast("long").alias("tp"),
        F.lit(units).cast("long").alias("rank"),
    )
    return _damped_rank_loop(e, node_dim, iters, "src", "dst")


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    units: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, trust): TrustRank — PageRank whose teleport mass lands ONLY
    on a trusted seed set (Gyongyi, Garcia-Molina, Pedersen, VLDB 2004).

    The crawl-quality application: seed with known-good hosts and spam
    farms reachable only from spam keep ~0 trust, giving the frontier a
    prioritization / domain-cap signal that raw PageRank can't (link
    farms self-inflate PageRank but can't manufacture trust without an
    in-link from the trusted region).

    Same recurrence as ``pagerank`` via ``_damped_rank_loop`` — only the
    node dim differs: the teleport mass and the initial mass are SPLIT
    across the seed set as in Gyöngyi et al. §4.3 (d/|S| per seed — here
    ``(15% · units) div |S|`` teleport and ``units div |S|`` initial, both
    exact integer division), so total trust mass is ~``units`` regardless
    of |S| and scores are comparable across seed sets of different sizes.
    Non-seeds get 0/0. int64-exact, so the unrolled-CTE oracle is
    bit-identical. ``seeds``: one ``node`` column (membership join is
    broadcast — the seed list is curation-sized; its count is a 1-row dim
    cross-joined in, never a driver-side collect).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    seed_nodes = seeds.select(F.col("node")).distinct()
    n_seeds = seed_nodes.agg(
        F.greatest(F.count(F.lit(1)), F.lit(1)).cast("long").alias("_ns"))
    seed_dim = seed_nodes.crossJoin(F.broadcast(n_seeds)).select(
        "node",
        F.expr(f"CAST({15 * units // 100} AS BIGINT) div _ns")
        .alias("_teleport"),
        F.expr(f"CAST({units} AS BIGINT) div _ns").alias("_init"),
    )
    node_dim = (
        _node_set(e)
        .join(F.broadcast(seed_dim), "node", "left")
        .select(
            "node",
            F.coalesce("_teleport", F.lit(0).cast("long")).alias("tp"),
            F.coalesce("_init", F.lit(0).cast("long")).alias("rank"),
        )
    )
    out = _damped_rank_loop(e, node_dim, iters, "src", "dst")
    return out.select("node", F.col("rank").alias("trust"))
