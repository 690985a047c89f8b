"""Dev smoke: engine vs simulator parity on a tiny corpus (fast iteration)."""
import shutil
import sys
import tempfile

from crawlee_spark import datagen
from crawlee_spark.engine import CrawlConfig, CrawlEngine, FailureModelConf
from crawlee_spark.operators.politeness import PolitenessConfig
from crawlee_spark.session import get_spark
from crawlee_spark.simulator import FailureModel, SimConfig, simulate

N_PAGES, N_HOSTS, N_SEEDS = 60, 5, 5


def run_case(spark, name, cfg: CrawlConfig, sim_cfg: SimConfig, with_robots=False):
    rows = list(datagen.gen_corpus_rows(N_PAGES, N_HOSTS, seed=42, with_bytes=False))
    corpus_py = {r["url"]: {"html": r["html"]} for r in rows}
    seeds_py = datagen.gen_seed_rows(N_PAGES, N_HOSTS, seed=42, n_seeds=N_SEEDS)
    robots_rows = datagen.gen_robots_rows(N_HOSTS) if with_robots else None

    sim = simulate(corpus_py, seeds_py, sim_cfg, robots_rows=robots_rows)

    corpus_df = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows], "url string, html string"
    )
    seeds_df = spark.createDataFrame(seeds_py, "url string, forefront boolean, depth int, label string")
    robots_df = datagen.robots_df(spark, N_HOSTS) if with_robots else None

    workdir = tempfile.mkdtemp(prefix=f"smoke_{name}_")
    try:
        eng = CrawlEngine(spark, workdir, cfg)
        eng.add_seeds(seeds_df)
        totals = eng.run(corpus_df, robots=robots_df)
        order = eng.crawl_order()
        seen = eng.url_seen()
        ok = True
        if order != sim.crawl_order:
            ok = False
            print(f"[{name}] CRAWL ORDER MISMATCH: engine {len(order)} sim {len(sim.crawl_order)}")
            for i, (a, b) in enumerate(zip(order, sim.crawl_order)):
                if a != b:
                    print("  first diff at", i, "engine", a, "sim", b)
                    break
            print("  engine tail:", order[:10])
            print("  sim tail   :", sim.crawl_order[:10])
        if seen != sim.url_seen:
            ok = False
            print(f"[{name}] URL-SEEN MISMATCH: engine-only {sorted(seen - sim.url_seen)[:5]} "
                  f"sim-only {sorted(sim.url_seen - seen)[:5]}")
        print(f"[{name}] {'OK' if ok else 'FAIL'} — fetched={len(order)} seen={len(seen)} "
              f"steps eng={eng.step} sim={sim.steps} totals={totals}")
        return ok
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main():
    spark = get_spark("smoke", master="local[4]", shuffle_partitions=4)
    cases = [
        ("default", CrawlConfig(num_buckets=8), SimConfig()),
        (
            "budget",
            CrawlConfig(num_buckets=8, politeness=PolitenessConfig(
                max_requests_per_minute=5, step_secs=60)),
            SimConfig(politeness=PolitenessConfig(max_requests_per_minute=5, step_secs=60)),
        ),
        (
            "delay",
            CrawlConfig(num_buckets=8, politeness=PolitenessConfig(
                same_domain_delay_secs=2.0, step_secs=1.0)),
            SimConfig(politeness=PolitenessConfig(same_domain_delay_secs=2.0, step_secs=1.0)),
        ),
        (
            "failures",
            CrawlConfig(num_buckets=8, failures=FailureModelConf(fail_mod=7, fail_attempts=2, dead_mod=31)),
            SimConfig(failures=FailureModel(fail_mod=7, fail_attempts=2, dead_mod=31)),
        ),
        (
            "maxcrawl",
            CrawlConfig(num_buckets=8, politeness=PolitenessConfig(max_requests_per_crawl=20)),
            SimConfig(politeness=PolitenessConfig(max_requests_per_crawl=20)),
        ),
    ]
    results = {}
    for name, cfg, sim_cfg in cases:
        results[name] = run_case(spark, name, cfg, sim_cfg, with_robots=False)
    # robots case separately (default politeness)
    results["robots"] = run_case(spark, "robots", CrawlConfig(num_buckets=8), SimConfig(), with_robots=True)
    print(results)
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
