"""Integration-tier scale parity: engine vs simulator on a big Zipf corpus.

The pytest parity suite pins semantics on small corpora (fast, exhaustive
configs); this harness is the FIXTURES.md tier-2 evidence run — the same
bit-for-bit assertion (crawl order AND final URL-seen set equal to the
pure-Python simulator) at a corpus size where partitioning, bucket pruning
and the politeness/budget operators actually matter. Exercises redirects
(loadedUrl base-resolution, http-crawler.ts:480) and the deterministic
failure model (retry path) at scale.

Usage:
    PYTHONPATH=/root/repo python scripts/parity_scale.py \
        [--pages 20000] [--hosts 200] [--seeds 50] [--cpus 32]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time

from crawlee_spark import datagen
from crawlee_spark.engine import CrawlConfig, CrawlEngine, FailureModelConf
from crawlee_spark.operators.politeness import PolitenessConfig
from crawlee_spark.session import get_spark
from crawlee_spark.simulator import FailureModel, SimConfig, simulate


def run_case(spark, name, rows, seeds_py, cfg, sim_cfg):
    corpus_py = {r["url"]: {"html": r["html"], "redirect_to": r["redirect_to"]}
                 for r in rows}
    t0 = time.time()
    sim = simulate(corpus_py, seeds_py, sim_cfg)
    sim_s = time.time() - t0

    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"], "redirect_to": r["redirect_to"]}
         for r in rows],
        "url string, html string, redirect_to string",
    )
    seeds_df = spark.createDataFrame(
        seeds_py, "url string, forefront boolean, depth int, label string")

    workdir = tempfile.mkdtemp(prefix=f"parity_scale_{name}_")
    try:
        t0 = time.time()
        eng = CrawlEngine(spark, workdir, cfg)
        eng.add_seeds(seeds_df)
        totals = eng.run(corpus_df)
        eng_s = time.time() - t0
        order = eng.crawl_order()
        seen = eng.url_seen()
        ok = order == sim.crawl_order and seen == sim.url_seen
        if order != sim.crawl_order:
            for i, (a, b) in enumerate(zip(order, sim.crawl_order)):
                if a != b:
                    print(f"[{name}] ORDER first diff at {i}: engine={a} sim={b}")
                    break
            print(f"[{name}] ORDER lens: engine {len(order)} sim {len(sim.crawl_order)}")
        if seen != sim.url_seen:
            print(f"[{name}] SEEN diff: engine-only {sorted(seen - sim.url_seen)[:3]} "
                  f"sim-only {sorted(sim.url_seen - seen)[:3]}")
        print(f"[{name}] {'OK' if ok else 'FAIL'} fetched={len(order)} "
              f"seen={len(seen)} steps={eng.step} engine={eng_s:.1f}s "
              f"sim={sim_s:.1f}s totals={totals}")
        return ok
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20_000)
    ap.add_argument("--hosts", type=int, default=200)
    ap.add_argument("--seeds", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("parity_scale", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    rows = list(datagen.gen_corpus_rows(
        args.pages, args.hosts, seed=11, with_bytes=False, redirect_every=17))
    seeds_py = datagen.gen_seed_rows(
        args.pages, args.hosts, seed=11, n_seeds=args.seeds)
    print(f"corpus: {args.pages} pages / {args.hosts} hosts (Zipf), "
          f"{args.seeds} seeds, redirects every 17th page")

    fails = FailureModelConf(fail_mod=13, fail_attempts=2, dead_mod=97)
    sim_fails = FailureModel(fail_mod=13, fail_attempts=2, dead_mod=97)
    cases = [
        # unbounded budget: few wide supersteps (BFS closure; stresses the
        # per-superstep set operators at full width)
        ("wide", CrawlConfig(num_buckets=32, failures=fails),
         SimConfig(failures=sim_fails)),
        # budgeted: many narrow supersteps (stresses checkpoint/commit and
        # budget selection over a large standing frontier)
        ("budget",
         CrawlConfig(num_buckets=32, failures=fails,
                     politeness=PolitenessConfig(max_requests_per_minute=2000,
                                                 step_secs=60)),
         SimConfig(failures=sim_fails,
                   politeness=PolitenessConfig(max_requests_per_minute=2000,
                                               step_secs=60))),
    ]
    results = {n: run_case(spark, n, rows, seeds_py, c, s) for n, c, s in cases}
    print("PARITY-SCALE", results)
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
