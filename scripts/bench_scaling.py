"""Scaling-efficiency evidence (BASELINE.json criterion: >=0.8 from N to 4N).

No real multi-executor cluster exists in this sandbox, so per the task
instructions the same job runs at two parallelism levels — local[8] and
local[32] — on identical input, in SEPARATE processes (a SparkSession's
master is fixed per JVM). Writes BENCH/BASELINE.md with throughput at both
levels and the scaling efficiency (T_32/T_8)/4.

Usage: PYTHONPATH=/root/repo python scripts/bench_scaling.py [rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from crawlee_spark.session import get_spark
from bench import frontier_throughput

cpus = int(sys.argv[1])
rows = int(sys.argv[2])
spark = get_spark(f"scale{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
# warmup: JVM launch + whole-stage codegen + C2 JIT of the regex-heavy
# canonicalization (cold first runs under-state steady-state throughput
# by 2-3x; the cluster analogy is long-lived executors)
frontier_throughput(spark, rows // 4)
frontier_throughput(spark, rows)
best = None
for _ in range(2):
    dt, unique = frontier_throughput(spark, rows)
    if best is None or dt < best[0]:
        best = (dt, unique)
print(json.dumps({{"cpus": cpus, "secs": best[0], "unique": best[1],
                  "urls_per_sec": best[1] / best[0]}}))
"""


def run_level(cpus: int, rows: int) -> dict:
    code = CHILD.format(repo=REPO)
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(rows)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    r8 = run_level(8, rows)
    r32 = run_level(32, rows)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — frontier throughput + scaling efficiency

North-star job (BASELINE.json): URLs scheduled + deduped / sec —
canonicalize → uniqueKey(xxhash64) → batch dedup → MERGE anti-join against a
200k-row frontier → per-host politeness-budgeted head selection, on a
{rows:,}-row synthetic URL batch over 1,000 hosts with ~10% canonical
duplicates (bench.py::frontier_throughput; all JVM-side expressions).

Measured {time.strftime('%Y-%m-%d')} on this sandbox (single machine,
local-mode parallelism as the stand-in for executor count — no real cluster
available; see task instructions):

| parallelism | wall s | unique URLs | URLs/sec |
|---|---|---|---|
| local[8]  (N)  | {r8['secs']:.2f} | {r8['unique']:,} | {r8['urls_per_sec']:,.0f} |
| local[32] (4N) | {r32['secs']:.2f} | {r32['unique']:,} | {r32['urls_per_sec']:,.0f} |

**Scaling efficiency (T_4N / T_N) / 4 = {eff:.3f}** (criterion: >= 0.8).

Caveats: local-mode scaling shares one JVM heap and one shuffle service, so
this under-states true multi-executor scaling for shuffle-light jobs and
over-states it for memory-bound ones; the job here is shuffle-dominated
(dedup exchange on url_hash + per-host window), which is the honest proxy
for the frontier MERGE at cluster scale.
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)
    print(json.dumps({"local8": r8, "local32": r32, "efficiency": round(eff, 3)}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
