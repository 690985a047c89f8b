"""Project templates for the ``create`` CLI command.

Reference surface (``packages/templates``): a manifest of named templates,
each a list of files the CLI materializes into a fresh project directory
(``manifest.json``; ``packages/cli/src/commands/CreateProjectCommand.ts:
103-189`` downloads the files and rewrites the project name into
``package.json``). The reference ships browser/cheerio variants; the Spark
engine's analogs are a frontier-crawl starter and a training-data curation
starter, with ``crawlee.json`` playing ``package.json``'s role (project
name + script map for the ``run`` command).

Templates are embedded strings, not network downloads — the engine has no
template registry service, and a scaffold must work offline on a cluster
edge node.
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# shared files
# --------------------------------------------------------------------------

_GITIGNORE = """\
storage/
output/
__pycache__/
*.pyc
spark-warehouse/
"""

_SUBMIT_SH = """\
#!/bin/sh
# Cluster submit: ship the crawlee_spark package alongside the job
# (spark-submit --py-files; BASELINE north_rule run mode). Point
# CRAWLEE_SPARK_PKG at a crawlee_spark zip/egg when it is not already
# installed on the executors.
exec spark-submit \\
    ${CRAWLEE_SPARK_PKG:+--py-files "$CRAWLEE_SPARK_PKG"} \\
    --conf spark.sql.adaptive.enabled=true \\
    --conf spark.sql.shuffle.partitions=${SHUFFLE_PARTITIONS:-200} \\
    main.py "$@"
"""

# --------------------------------------------------------------------------
# getting-started: frontier crawl to the fixpoint, results in a Dataset
# --------------------------------------------------------------------------

_GETTING_STARTED_MAIN = '''\
"""Getting-started crawl: synthesize a deterministic corpus, crawl it to
the empty-frontier fixpoint, and store the fetch log in the default
Dataset (the reference template's "crawl a site, push results" flow,
re-expressed over the BSP engine)."""

import argparse
import os
import shutil

from pyspark.sql import functions as F

from crawlee_spark import datagen
from crawlee_spark.configuration import Configuration
from crawlee_spark.engine import CrawlEngine
from crawlee_spark.session import get_spark
from crawlee_spark.store.dataset import open_dataset


def run(spark=None, pages=60, hosts=5, n_seeds=5):
    config = Configuration.get_global_configuration()
    spark = spark or get_spark("getting-started", master="local[4]",
                               shuffle_partitions=4)

    rows = list(datagen.gen_corpus_rows(pages, hosts, seed=42,
                                        with_bytes=False))
    corpus = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"]} for r in rows],
        "url string, html string")
    seeds = spark.createDataFrame(
        list(datagen.gen_seed_rows(pages, hosts, seed=42, n_seeds=n_seeds)),
        "url string, forefront boolean, depth int, label string")

    workdir = config.storage_path("crawls", "default")
    if config.get("purge_on_start"):
        shutil.rmtree(workdir, ignore_errors=True)
    cfg = config.to_crawl_config(num_buckets=8)
    # under --no-purge a previous run's state survives: RESUME it (already
    # handled requests stay handled; add_seeds MERGE-dedups the seed batch)
    if os.path.exists(workdir):
        engine = CrawlEngine.resume(spark, workdir, cfg)
    else:
        engine = CrawlEngine(spark, workdir, cfg)
    step0 = engine.step
    engine.add_seeds(seeds)
    totals = engine.run(corpus)

    # push only THIS run's fetch-log rows — a resumed run must not append
    # the prior runs' rows to the dataset a second time
    dataset = open_dataset(spark)
    n = 0
    if engine.fetch_log.exists():
        n = dataset.push_data(
            engine.fetch_log.read().filter(F.col("step") > step0)
            .select("unique_key", "step", "status", "retry_count"))
    print(f"crawl finished: {totals}; {n} fetch-log rows appended to the "
          f"default dataset under {config.get('storage_dir')!r}")
    return totals


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", type=int, default=60)
    ap.add_argument("--hosts", type=int, default=5)
    ap.add_argument("--seeds", type=int, default=5)
    a = ap.parse_args()
    run(pages=a.pages, hosts=a.hosts, n_seeds=a.seeds)
'''

_GETTING_STARTED_README = """\
# {project}

A crawlee_spark starter: BFS frontier crawl over a synthetic corpus,
politeness-aware head selection, results in the default Dataset.

Run locally:

    python -m crawlee_spark run            # or: python main.py

Disable the automatic purge of the default storages:

    python -m crawlee_spark run --no-purge

Submit to a cluster (ship the package via --py-files):

    CRAWLEE_SPARK_PKG=/path/to/crawlee_spark.zip ./submit.sh

Tune without code changes through the `CRAWLEE_*` environment variables
(`CRAWLEE_STORAGE_DIR`, `CRAWLEE_SPARK_NUM_BUCKETS`, ...).
"""

# --------------------------------------------------------------------------
# curation: gate + dedup pipeline over a documents parquet
# --------------------------------------------------------------------------

_CURATION_MAIN = '''\
"""Curation starter: Gopher quality gate -> exact dedup -> MinHash-LSH
near-dedup over a documents parquet (doc_id, text, ...); writes the
curated survivors as parquet. Every stage is a set-based DataFrame op —
gates are one scan, dedup is hash/band equi-joins — so the same script
runs unchanged from a laptop sample to a full corpus."""

import argparse

from pyspark.sql import functions as F

from crawlee_spark.operators import dedup
from crawlee_spark.operators.gates import gopher_gate
from crawlee_spark.session import get_spark


def run(input_path, output_path, spark=None, min_words=20):
    spark = spark or get_spark("curation", master="local[4]",
                               shuffle_partitions=4)
    docs = spark.read.parquet(input_path)

    # 1. quality gate (one scan, zero shuffles)
    gated = (gopher_gate(docs, min_words=min_words)
             .filter(F.col("kept")).select(*docs.columns))

    # 2. exact dedup, keep-first (hash agg + one join back)
    groups = dedup.exact_dedup(gated)            # (dup_key, keep_id, n_dups)
    survivors = (
        gated.withColumn("dup_key", F.md5(F.col("text")))
        .join(groups, "dup_key", "left")
        .filter(F.col("keep_id").isNull() | (F.col("doc_id") == F.col("keep_id")))
        .select(*docs.columns)
    )

    # 3. MinHash-LSH near-dedup, keep-first (band equi-join)
    sigs = dedup.minhash_signatures(survivors)
    drop = dedup.minhash_keep_first_sigs(sigs).withColumnRenamed("id", "doc_id")
    curated = survivors.join(drop, "doc_id", "left_anti")

    curated.write.mode("overwrite").parquet(output_path)
    kept = spark.read.parquet(output_path).count()
    print(f"curated {kept} documents -> {output_path}")
    return kept


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", default="output/curated.parquet")
    ap.add_argument("--min-words", type=int, default=20)
    a = ap.parse_args()
    run(a.input, a.output, min_words=a.min_words)
'''

_CURATION_README = """\
# {project}

A crawlee_spark curation starter: Gopher gate + exact dedup + MinHash-LSH
near-dedup over a documents parquet.

    python main.py --input /path/to/documents.parquet --output out.parquet

Cluster submit: `CRAWLEE_SPARK_PKG=... ./submit.sh --input ... --output ...`
"""

# --------------------------------------------------------------------------
# manifest (packages/templates/manifest.json analog)
# --------------------------------------------------------------------------


def _crawlee_json(script: str) -> str:
    return (
        '{\n'
        '    "name": "my-crawler",\n'
        '    "scripts": {\n'
        f'        "start": "{script}"\n'
        '    }\n'
        '}\n'
    )


MANIFEST: dict = {
    "templates": [
        {
            "name": "getting-started",
            "description": "Getting started: frontier crawl over a "
                           "synthetic corpus [PySpark]",
            "run_hint": "python -m crawlee_spark run",
            "files": {
                "main.py": _GETTING_STARTED_MAIN,
                "crawlee.json": _crawlee_json("python main.py"),
                "README.md": _GETTING_STARTED_README,
                ".gitignore": _GITIGNORE,
                "submit.sh": _SUBMIT_SH,
            },
        },
        {
            "name": "curation",
            "description": "Training-data curation pipeline "
                           "(quality gate + dedup) [PySpark]",
            "run_hint": "python main.py --input /path/to/documents.parquet",
            "files": {
                "main.py": _CURATION_MAIN,
                "crawlee.json": _crawlee_json(
                    "python main.py --input documents.parquet"),
                "README.md": _CURATION_README,
                ".gitignore": _GITIGNORE,
                "submit.sh": _SUBMIT_SH,
            },
        },
    ],
}


def template_names() -> list[str]:
    return [t["name"] for t in MANIFEST["templates"]]


def get_template(name: str) -> dict:
    for t in MANIFEST["templates"]:
        if t["name"] == name:
            return t
    raise KeyError(name)
