"""crawlee_spark — a PySpark-native URL-frontier / crawl-orchestration engine.

A from-scratch reimplementation of the capabilities of Crawlee v3.6.2
(reference behavior documented in SURVEY.md) as an idiomatic Spark engine:

- the frontier is a snapshot-committed parquet table (Iceberg stand-in),
  partitioned by host-hash bucket;
- URL canonicalization / uniqueKey / dedup are Spark SQL column expressions
  (whole-stage-codegen'd, no Python in the hot path);
- scheduling (priority + forefront + politeness + budget + robots) is a
  declarative DataFrame plan per BSP superstep;
- all unavoidable Python (HTML link resolution, image decode) runs as
  Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from crawlee_spark.session import get_spark  # noqa: F401
