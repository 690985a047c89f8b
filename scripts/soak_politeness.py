"""Politeness-advance soak: touched-bucket commit cost vs state size.

Round 5 changed the per-superstep politeness advance from a full state
rewrite to a touched-bucket copy-on-write commit (engine._advance_politeness).
This soak measures what that buys: advance a FIXED fetch set (64 hosts) over
a politeness state of S rows and compare

  touched  — read only the fetch set's host-hash buckets, advance, commit
             those buckets (the engine's round-5 path), vs
  full     — read the whole state, advance globally, rewrite every bucket
             (the rounds-1-4 path, kept here as the control).

Expectation: the full path grows ~linearly with S (it rewrites all S rows
every superstep); the touched path grows only with S × |touched buckets| /
num_buckets (the inherited buckets cost a manifest pointer). State rows =
hosts in cooldown ≈ delay-window × hosts-per-step, so at a 30-step window
the full path rewrites ~30× the per-step host count — per superstep.

Usage:
    PYTHONPATH=/root/repo python scripts/soak_politeness.py \
        [--small 100000] [--big 1000000] [--buckets 1024] [--hosts 64] \
        [--rounds 3] [--cpus 8]

Prints one line per (path, state-size, round) plus a best-of summary.
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def build_state(spark, table_root, n_rows, num_buckets, step):
    from crawlee_spark.functions import urls
    from crawlee_spark.store.snapshot_table import SnapshotTable

    state = spark.range(n_rows).select(
        F.concat(F.lit("s"), F.col("id").cast("string"),
                 F.lit(".cool.example")).alias("host"),
        # all rows still in cooldown (far future) so none expire mid-soak
        (F.lit(step) + 1000 + F.pmod(F.col("id"), F.lit(50)).cast("int"))
        .alias("next_allowed_step"),
    ).withColumn("bucket", urls.host_hash(F.col("host"), num_buckets))
    return SnapshotTable.create(spark, table_root, state,
                                num_buckets=num_buckets,
                                summary={"soak": "seed"})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=100_000)
    ap.add_argument("--big", type=int, default=1_000_000)
    ap.add_argument("--buckets", type=int, default=1024)
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from crawlee_spark.functions import urls
    from crawlee_spark.operators import politeness as pol
    from crawlee_spark.session import get_spark

    spark = get_spark("soak_politeness", master=f"local[{args.cpus}]",
                      shuffle_partitions=16)
    cfg = pol.PolitenessConfig(same_domain_delay_secs=30.0, step_secs=1.0)
    fetched = spark.createDataFrame(
        [(f"f{i}.fetch.example",) for i in range(args.hosts)], "host string"
    ).withColumn("crawl_delay", F.lit(None).cast("double"))
    pol_buckets = sorted({
        r["b"] for r in fetched.select(
            urls.host_hash(F.col("host"), args.buckets).alias("b")).collect()
    })
    print(f"fetch set: {args.hosts} hosts -> {len(pol_buckets)} touched "
          f"buckets of {args.buckets}")

    results: dict[tuple[str, int], list[float]] = {}
    for n_rows in (args.small, args.big):
        for path in ("touched", "full"):
            for rnd in range(args.rounds):
                root = tempfile.mkdtemp(prefix=f"soak_pol_{path}_{n_rows}_")
                table = build_state(spark, root, n_rows, args.buckets,
                                    step=100)
                t0 = time.time()
                if path == "touched":
                    state = table.read(buckets=pol_buckets).select(
                        "host", "next_allowed_step")
                    new_state = pol.advance_politeness(
                        state, fetched, step=100, cfg=cfg,
                    ).withColumn(
                        "bucket", urls.host_hash(F.col("host"), args.buckets))
                    table.commit_buckets(new_state, "politeness",
                                         {"soak": path}, touched=pol_buckets)
                else:
                    state = table.read().select("host", "next_allowed_step")
                    new_state = pol.advance_politeness(
                        state, fetched, step=100, cfg=cfg,
                    ).withColumn(
                        "bucket", urls.host_hash(F.col("host"), args.buckets))
                    table._commit_full(new_state, args.buckets, "politeness",
                                       {"soak": path})
                dt = time.time() - t0
                results.setdefault((path, n_rows), []).append(dt)
                print(json.dumps({"path": path, "state_rows": n_rows,
                                  "round": rnd, "secs": round(dt, 3)}))
                shutil.rmtree(root, ignore_errors=True)

    print("--- best-of summary ---")
    best = {k: min(v) for k, v in results.items()}
    for (path, n), v in sorted(best.items()):
        print(f"{path:8s} state={n:>9,d}  best={v:6.2f}s")
    t_ratio = best[("touched", args.big)] / best[("touched", args.small)]
    f_ratio = best[("full", args.big)] / best[("full", args.small)]
    print(f"state x{args.big // args.small}: touched-path ratio "
          f"{t_ratio:.2f}, full-path ratio {f_ratio:.2f} "
          f"(touched advantage at big state: "
          f"{best[('full', args.big)] / best[('touched', args.big)]:.1f}x)")


if __name__ == "__main__":
    main()
