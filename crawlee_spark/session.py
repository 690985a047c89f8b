"""SparkSession factory with scale-appropriate defaults.

Local-mode testing uses local[N]; the same config block is what we'd ship to
a multi-executor cluster via spark-submit (AQE, skew-join handling, Arrow).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawlee_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on: runtime coalescing + skew-join splitting (hot hosts).
    - Arrow on: all pandas-UDF boundaries are Arrow batches.
    - UTC session TZ: oracle (DuckDB) comparisons are TZ-naive UTC.
    - shuffle partitions default to the local core count, not 200.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Throughput GC: the engine's hot paths (regex canonicalization,
        # md5 shingle hashing) are allocation-rate bound; G1's concurrent
        # cycles cap map-stage scaling at ~8 threads on this box, ParallelGC
        # restores near-linear thread scaling (measured 3.3x from 8->32).
        # Only takes effect when this call actually launches the JVM.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
