"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The registry itself lives in ``crawlee_spark/plans/queries.py`` — one entry
per implemented operator from SURVEY.md §2 plus the training-data pipeline
ops (dedup families, ANN, text analysis, image validation).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end BSP crawl — seeds → canonicalize → MERGE dedup
    → politeness-budgeted head selection → fetch join → enqueueLinks →
    retry/dead-letter → loop to the empty-frontier fixpoint; returns the
    fetch log (unique_key, step, status, retry_count). ORACLE-CHECKED: the
    DuckDB oracle reproduces the whole log closed-form (BFS layering +
    retry schedule); intra-step order is additionally pinned by
    tests/test_engine_parity.py."""
    from crawlee_spark.plans.queries import q_crawl_end_to_end

    return q_crawl_end_to_end(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawlee_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from crawlee_spark.plans.queries import ORACLES

    return dict(ORACLES)
