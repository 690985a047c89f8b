"""Per-phase profile of the engine's fixed superstep cost.

Runs the q_crawl_depth_schedule corpus (same DAG, same config) through
``CrawlEngine`` with an event hook that accumulates ``engine.last_timings``
across supersteps, then prints per-phase totals + per-step means. This is
the measurement loop behind the VERDICT r4 item-#7 work: the engine is
depth-bounded (superstep count tracks crawl depth, not data size), so the
per-step FIXED cost — driver round-trips, plan builds, commit bookkeeping —
is the whole latency story at toy scale.

Usage:
    PYTHONPATH=/root/repo python scripts/profile_superstep.py \
        [--sf-dir /root/testdata/sf0.01] [--cpus 8]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from crawlee_spark.engine import CrawlConfig, CrawlEngine
    from crawlee_spark.operators.enqueue_links import EnqueueLinksOptions
    from crawlee_spark.session import get_spark

    spark = get_spark("profile_superstep", master=f"local[{args.cpus}]",
                      shuffle_partitions=8)
    d = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc"))
    n = d.count()

    def _url(doc_col):
        return F.concat(F.lit("http://h"), (doc_col % 7).cast("string"),
                        F.lit(".test/doc/"), doc_col.cast("string"))

    def _anchor(t):
        return F.when(
            t > F.col("doc"),
            F.concat(F.lit('<a href="'), _url(t), F.lit('">x</a> ')),
        ).otherwise(F.lit(""))

    corpus = d.select(
        _url(F.col("doc")).alias("url"),
        F.concat(
            _anchor((3 * F.col("doc") + 1) % n),
            _anchor((7 * F.col("doc") + 2) % n),
            _anchor((F.col("doc") + n // 2) % n),
        ).alias("html"),
    )
    seeds = spark.createDataFrame(
        [(f"http://h{i % 7}.test/doc/{i}", False, 0, None) for i in range(3)],
        "url string, forefront boolean, depth int, label string",
    )
    wd = tempfile.mkdtemp(prefix="profile_sched_")
    eng = CrawlEngine(spark, wd, CrawlConfig(
        num_buckets=4, enqueue=EnqueueLinksOptions(strategy="all")))
    eng.add_seeds(seeds)

    totals: dict[str, float] = {}
    steps = [0]
    orig = eng.run_superstep

    def wrapped(*a, **k):
        st = orig(*a, **k)
        steps[0] += 1
        for k2, v in (eng.last_timings or {}).items():
            totals[k2] = totals.get(k2, 0.0) + v
        return st

    eng.run_superstep = wrapped
    t0 = time.time()
    res = eng.run(corpus)
    wall = time.time() - t0

    print(f"n={n} supersteps={res['supersteps']} handled={res['handled']} "
          f"wall={wall:.1f}s")
    phase_sum = sum(totals.values())
    for k, v in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {k:18s} total={v:7.2f}s  per-step={v / max(steps[0], 1):.3f}s  "
              f"share={100 * v / phase_sum:.1f}%")
    print(f"  (phases sum {phase_sum:.1f}s of {wall:.1f}s wall; the gap is "
          f"run()-loop overhead outside run_superstep)")
    shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
