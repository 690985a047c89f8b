"""End-to-end training-data pipeline demo: the whole repo in one run.

crawl (politeness + redirects + dedup)  ->  fetched image+caption assets
  ->  header sniff (JVM pre-filter)     ->  decode + PSNR/caption validate
  ->  pHash near-dup removal            ->  aspect-bucketed batch packing
  ->  WARC export + read-back           ->  one JSON summary line

This is the LAION/CommonCrawl recipe over the deterministic corpus: every
stage is an operator tested elsewhere in isolation; the demo pins that
they COMPOSE — schemas line up, the crawl's fetch set drives the image
stages, and the export round-trips. Runs in ~1 min at the default size:

    PYTHONPATH=/root/repo python scripts/pipeline_demo.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

from crawlee_spark import datagen
from crawlee_spark.engine import CrawlConfig, CrawlEngine
from crawlee_spark.functions.images import sniff_header, validate_pages
from crawlee_spark.operators.dedup import hamming_pairs
from crawlee_spark.operators.packing import shard_of
from crawlee_spark.operators.politeness import PolitenessConfig
from crawlee_spark.sources.warc import read_warc, write_warc

SEED = 42
LOSSLESS = ("png", "ppm", "bmp", "gif")


def run_pipeline(spark, n_pages: int = 80, n_hosts: int = 6,
                 batch_size: int = 8, workdir: str | None = None) -> dict:
    own_dir = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="pipeline_demo_")
    try:
        return _run(spark, n_pages, n_hosts, batch_size, workdir)
    finally:
        if own_dir:
            shutil.rmtree(workdir, ignore_errors=True)


def _run(spark, n_pages, n_hosts, batch_size, workdir) -> dict:
    # 1. corpus + crawl: politeness-budgeted BFS with redirects
    rows = list(datagen.gen_corpus_rows(n_pages, n_hosts, seed=SEED,
                                        with_bytes=True, redirect_every=9))
    pages = spark.createDataFrame(
        [{k: r[k] for k in ("image_id", "bytes", "w", "h", "fmt",
                            "caption", "phash", "url")} for r in rows],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, url string",
    )
    corpus = spark.createDataFrame(
        [{"url": r["url"], "html": r["html"], "redirect_to": r["redirect_to"]}
         for r in rows],
        "url string, html string, redirect_to string",
    )
    seeds = spark.createDataFrame(
        datagen.gen_seed_rows(n_pages, n_hosts, seed=SEED, n_seeds=6),
        "url string, forefront boolean, depth int, label string",
    )
    eng = CrawlEngine(spark, f"{workdir}/crawl", CrawlConfig(
        num_buckets=8,
        politeness=PolitenessConfig(max_requests_per_minute=40, step_secs=60),
    ))
    eng.add_seeds(seeds)
    totals = eng.run(corpus)
    fetched_urls = [u for _, u in eng.crawl_order()]

    # 2. the crawl's fetch set selects the assets (join, not collect-driven
    # at scale — the list->DF here is demo-sized)
    fetched = pages.join(
        spark.createDataFrame([(u,) for u in fetched_urls], "url string"),
        "url",
    )

    # 3. JVM header sniff must agree with the table's declared metadata
    sniffed = fetched.select(
        "image_id", "fmt", "w", "h", sniff_header(F.col("bytes")).alias("s")
    )
    bad_sniff = sniffed.filter(
        (F.col("s.fmt") != F.col("fmt"))
        | (F.col("fmt").isin(*[f for f in LOSSLESS if f != "ppm"])
           & ((F.col("s.w") != F.col("w")) | (F.col("s.h") != F.col("h"))))
    ).count()

    # 4. decode + PSNR/caption validation (Arrow-batched)
    validated = validate_pages(fetched, seed=SEED)
    n_ok = validated.filter("ok").count()

    # 5. pHash near-dup sweep (pigeonhole Hamming equi-join, keep-first).
    # Random noise images virtually never collide, so plant ONE exact
    # duplicate (re-hosted copy of the first asset, id sorted last) to pin
    # that the sweep actually fires — it must remove exactly the clone.
    clone = fetched.limit(1).withColumn("image_id", F.lit("img-999999999999"))
    dedup_in = fetched.unionByName(clone)
    pairs = hamming_pairs(dedup_in, max_hamming=3, id_col="image_id",
                          sig_col="phash")
    dupes = pairs.select(F.col("id_b").alias("image_id")).distinct()
    survivors = dedup_in.join(dupes, "image_id", "left_anti")

    # 6. aspect-bucketed batch packing over the survivors
    packed = (
        survivors
        .withColumn("bkt", F.least(F.greatest(F.expr("w * 4 div h"),
                                              F.lit(1)), F.lit(12)))
        .withColumn("shard", shard_of("image_id", 2))
    )
    from pyspark.sql import Window
    rn = F.row_number().over(
        Window.partitionBy("bkt", "shard").orderBy("image_id")) - 1
    packed = packed.select(
        "image_id", "bkt", "shard",
        (rn / batch_size).cast("int").alias("batch_idx"),
    )
    n_batches = packed.select("bkt", "shard", "batch_idx").distinct().count()

    # 7. WARC export of the fetched payloads + read-back
    export_dir = f"{workdir}/export"
    write_warc(
        fetched.select(
            F.lit("response").alias("rec_type"), "url",
            F.lit("2026-08-19T00:00:00Z").alias("warc_date"),
            F.col("bytes").alias("payload"),
        ).repartition(4),
        export_dir,
    )
    n_reread = read_warc(spark, export_dir, glob="*.warc.gz").count()

    return {
        "pages": n_pages,
        "fetched": len(fetched_urls),
        "assets": fetched.count(),
        "sniff_mismatches": bad_sniff,
        "validated_ok": n_ok,
        "near_dupes_removed": dedup_in.count() - survivors.count(),
        "survivors": survivors.count(),
        "batches": n_batches,
        "warc_reread": n_reread,
        "supersteps": eng.step,
        "totals": totals,
    }


def main() -> int:
    from crawlee_spark.session import get_spark

    spark = get_spark("pipeline_demo", master="local[4]", shuffle_partitions=8)
    out = run_pipeline(spark)
    print("PIPELINE " + json.dumps(out, default=str))
    ok = (out["sniff_mismatches"] == 0
          and out["validated_ok"] == out["assets"]
          and out["near_dupes_removed"] == 1  # exactly the planted clone
          and out["survivors"] == out["assets"]
          and out["warc_reread"] == out["assets"])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
