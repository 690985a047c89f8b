"""Hot-host skew handling: salted repartition for stateless stages.

SURVEY.md §4 / §7 hard part (c): a "crawl all of wikipedia" seed makes one
host own a large share of the frontier (the synthetic corpus reproduces this
with a Zipf(1.1) host distribution — the hot host holds ~30% of URLs).
Politeness/ordering stages MUST see a host's rows in one place (per-host
windows), but *stateless* per-row stages — HTML parse, image decode,
feature extraction — have no such constraint, so they repartition on
(host, salt) to spread a hot host over ``salt_n`` partitions.

AQE's skew-join splitting (enabled in session.py) covers the join-side
cases; this helper covers the mapInPandas stages AQE can't rebalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key_col: str = "host",
                       salt_n: int = 8, num_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, deterministic salt) — splits each key's rows
    over up to ``salt_n`` partitions. Salt derives from url_hash when
    present (stable across runs), else from a per-row hash of all columns.
    """
    if "url_hash" in df.columns:
        salt = F.pmod(F.col("url_hash"), F.lit(salt_n))
    else:
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(salt_n))
    out = df.withColumn("_salt", salt)
    if num_partitions:
        out = out.repartition(num_partitions, key_col, "_salt")
    else:
        out = out.repartition(key_col, "_salt")
    return out.drop("_salt")


def partition_histogram(df: DataFrame) -> list[int]:
    """Rows per partition (skew diagnostics for tests/benches)."""
    return [
        int(r["count"])
        for r in df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").count().orderBy("_pid").collect()
    ]
