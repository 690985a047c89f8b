"""Commit-cost soak: per-superstep commit cost follows the TOUCHED bucket
set, not the frontier size (docs/SCALE.md's core claim; VERDICT r2 #9).

Protocol: two frontiers, 2M and 20M resident rows, all resident rows
confined to buckets >= TOUCH (seeded through the table's own
normalize/make_requests path, then committed once — seeding is not
measured). Then the SAME three disjoint 200k-URL batches — whose hosts
hash into buckets 0..TOUCH-1 only — are MERGEd into each table through
``FrontierTable.add_requests`` (canonicalize → dedup → bucket-pruned
read → anti-join → copy-on-write commit of the touched buckets). Because
the read side is manifest-pruned to the touched buckets and untouched
buckets are inherited by the commit, the measured time must be FLAT in
the resident size: rep k sees identical touched-bucket content at both
sizes, so the per-rep ratio 20M/2M ≈ 1 is the evidence (a naive
whole-table rewrite/scan would show ~10x).

Appends one JSON line (kind=commit_soak) to BENCH/scaling_runs.jsonl.
Usage: PYTHONPATH=/root/repo python scripts/soak_commit_cost.py [resident...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from crawlee_spark.functions import urls  # noqa: E402
from crawlee_spark.operators import frontier as fr  # noqa: E402
from crawlee_spark.session import get_spark  # noqa: E402

NUM_BUCKETS = 64
TOUCH = 4                # measured batches confined to buckets 0..3
BATCH_ROWS = 200_000
REPS = 3


def _host_buckets(spark, n_cand: int = 4000) -> dict[str, int]:
    cand = spark.range(n_cand).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"))
    return {
        r["host"]: r["b"]
        for r in cand.select(
            "host", urls.host_hash(F.col("host"), NUM_BUCKETS).alias("b")
        ).collect()
    }


def _urls_over(spark, hosts: list[str], lo: int, hi: int):
    arr = F.array(*[F.lit(h) for h in hosts])
    host = F.element_at(arr, (F.pmod(F.col("id"), F.lit(len(hosts))) + 1)
                        .cast("int"))
    par = spark.sparkContext.defaultParallelism * 4
    return spark.range(lo, hi, 1, par).select(
        F.concat(F.lit("https://"), host, F.lit("/p/"),
                 F.col("id").cast("string")).alias("url"))


def soak(spark, resident_rows: int, batch_hosts: list[str],
         resident_hosts: list[str], workroot: str) -> dict:
    root = os.path.join(workroot, f"frontier_{resident_rows}")
    ft = fr.FrontierTable.create(spark, root, NUM_BUCKETS)
    # seed (NOT measured): resident rows through the table's own
    # normalize path, confined to the un-touched buckets
    gen = int(resident_rows * 1.02)
    norm = fr.make_requests(_urls_over(spark, resident_hosts, 0, gen),
                            step=0, num_buckets=NUM_BUCKETS)
    ft.table.commit_buckets(norm, "add_requests",
                            {"step": 0, "client": ft.client_id})
    actual = ft.read().count()
    times = []
    for rep in range(REPS):
        lo = 10_000_000_000 + rep * BATCH_ROWS  # disjoint from residents
        braw = _urls_over(spark, batch_hosts, lo, lo + BATCH_ROWS)
        t0 = time.time()
        res = ft.add_requests(braw, step=rep + 1)
        dt = time.time() - t0
        assert res["added"] == BATCH_ROWS, res
        times.append(round(dt, 3))
    return {"resident": actual, "batch_rows": BATCH_ROWS,
            "rep_secs": times}


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 20_000_000]
    spark = get_spark("commit-soak", shuffle_partitions=NUM_BUCKETS)
    hb = _host_buckets(spark)
    batch_hosts = [h for h, b in hb.items() if b < TOUCH][:64]
    resident_hosts = [h for h, b in hb.items() if b >= TOUCH][:1024]
    assert batch_hosts and resident_hosts
    workroot = tempfile.mkdtemp(prefix="commit_soak_")
    out = {"kind": "commit_soak", "num_buckets": NUM_BUCKETS,
           "touch_buckets": TOUCH, "levels": {}}
    try:
        for r in sizes:
            out["levels"][str(r)] = soak(spark, r, batch_hosts,
                                         resident_hosts, workroot)
            print(json.dumps(out["levels"][str(r)]), flush=True)
    finally:
        shutil.rmtree(workroot, ignore_errors=True)
    lv = [out["levels"][str(r)] for r in sizes]
    if len(lv) == 2:
        out["ratio_per_rep"] = [
            round(b / a, 3) for a, b in zip(lv[0]["rep_secs"],
                                            lv[1]["rep_secs"])
        ]
    with open(os.path.join(REPO, "BENCH", "scaling_runs.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
