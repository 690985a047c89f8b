"""spark-submit entrypoint (north_rule: "run end-to-end via spark-submit
--py-files on multi-executor clusters").

The package ships as a zip on the executors' PYTHONPATH — no install step:

    cd /root/repo && python -c "import shutil; shutil.make_archive(
        '/tmp/crawlee_spark', 'zip', '.', 'crawlee_spark')"
    spark-submit --master local[8] --py-files /tmp/crawlee_spark.zip \
        scripts/submit_job.py /root/testdata/sf0.001

(`scripts/submit_demo.sh` wraps exactly that.) On a real cluster the same
command with `--master yarn|k8s://...` and `--num-executors N` is the N vs
4N scaling run; the zip travels to every executor, which matters because
Arrow UDF workers deserialize functions from crawlee_spark.* modules.

Runs the flagship end-to-end crawl (BSP superstep loop: canonicalize ->
MERGE dedup -> politeness head select -> fetch join -> enqueueLinks) plus
one dedup query, and prints one JSON line so callers can assert on it.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("crawlee-spark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from crawlee_spark.plans.queries import QUERIES

    t0 = time.time()
    crawl_rows = QUERIES["crawl_end_to_end"](spark, sf_dir).count()
    dedup_rows = QUERIES["dedup_exact"](spark, sf_dir).count()
    print(json.dumps({
        "ok": crawl_rows > 0,
        "crawl_rows": crawl_rows,
        "dedup_rows": dedup_rows,
        "secs": round(time.time() - t0, 2),
        "master": spark.sparkContext.master,
        "via": "spark-submit --py-files",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
