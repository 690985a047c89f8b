"""Dump formatted physical plans for the engine's key operators and check
the properties that matter at 100 TB: predicate pushdown, column pruning,
broadcast joins, whole-stage codegen spans, absence of single-partition
windows. Findings summarized in docs/PLANS.md.

Usage: PYTHONPATH=/root/repo python scripts/dump_plans.py [sf_dir]
"""
import io
import re
import sys
from contextlib import redirect_stdout

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

from pyspark.sql import functions as F

from crawlee_spark.operators import dedup
from crawlee_spark.plans.queries import QUERIES
from crawlee_spark.session import get_spark

# show the real join plans, not a localCheckpoint scan (inspection only;
# the shipped operators keep the eager pin — see dedup.CHECKPOINT_PAIRS)
dedup.CHECKPOINT_PAIRS = False

# AQE off for INSPECTION ONLY: AdaptiveSparkPlan hides WholeStageCodegen
# annotations until execution; the shipped engine keeps AQE on (session.py).
spark = get_spark("plans", master="local[8]", shuffle_partitions=8,
                  extra_conf={"spark.sql.adaptive.enabled": "false"})


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


CHECKS = {
    "pricing_summary": [
        ("PushedFilters", r"PushedFilters: \[.*LessThanOrEqual"),
        ("pruned ReadSchema", r"ReadSchema:[^\n]*l_returnflag"),
        ("no l_orderkey read", r"^(?!.*ReadSchema:[^\n]*l_orderkey)", "absent"),
        ("codegen", "codegen"),
    ],
    "revenue_join": [
        ("broadcast dims", r"BroadcastHashJoin"),
        ("codegen", "codegen"),
    ],
    "frontier_head_select": [
        ("window per host (not global)", r"Window.*host"),
        ("codegen", "codegen"),
    ],
    "url_dedup": [
        ("partial agg before exchange", r"HashAggregate"),
        ("codegen", "codegen"),
    ],
    "ann_topk": [
        ("query side broadcast", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
    ],
    # round-2 plan fixes: every blocked dedup join must be an EQUI-join —
    # a BroadcastNestedLoopJoin anywhere means the O(n^2) path came back
    "dedup_simhash": [
        ("no nested-loop (pigeonhole equi-join)", r"BroadcastNestedLoopJoin", "absent"),
        ("hash/sort-merge join on chunks", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("codegen", "codegen"),
    ],
    "image_phash_neardup": [
        ("no nested-loop (pigeonhole equi-join)", r"BroadcastNestedLoopJoin", "absent"),
        ("hash/sort-merge join on chunks", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
    ],
    "dedup_embedding_lsh": [
        ("no nested-loop (bucket equi-join)", r"BroadcastNestedLoopJoin", "absent"),
        ("hash/sort-merge join on buckets", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
    ],
    "ann_lsh_multiprobe": [
        ("no nested-loop (probe equi-join)", r"BroadcastNestedLoopJoin", "absent"),
        ("probe side broadcast", r"BroadcastHashJoin"),
    ],
    "rate_window": [
        # the blocked variant DOES use a Window — but partitioned by the
        # 60 s block (≤ window_secs rows per partition); what must never
        # appear is the empty-partition-spec funnel, whose physical
        # signature is Exchange SinglePartition
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("block-partitioned window", r"Window \[.*partitionBy|Window.*_blk"),
        ("codegen", "codegen"),
    ],
    "stratified_sample": [
        # per-group top-n must be a group-partitioned window with the
        # rank-limit pushed into partial/final WindowGroupLimit — never a
        # global sort or single-partition funnel
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("window group-limit pushdown", r"WindowGroupLimit"),
        ("codegen", "codegen"),
    ],
    "hash_split": [
        # a hash split is a pure filter: no exchange at all, and the scan
        # reads only the projected columns
        ("no shuffle", r"Exchange", "absent"),
        ("pruned ReadSchema", r"ReadSchema: struct<doc_id:bigint,lang:string,source:string>"),
        ("codegen", "codegen"),
    ],
    "text_repetition": [
        # the whole Gopher gate is in-row array math — one scan-project
        ("no shuffle (in-row fold)", r"Exchange", "absent"),
        ("codegen", "codegen"),
    ],
    "pii_scrub": [
        ("no shuffle (scan-project)", r"Exchange", "absent"),
        ("codegen", "codegen"),
    ],
    "ann_ivf": [
        # corpus->centroid assignment is corpus x 32 centroids with the
        # centroid side broadcast (the standard IVF build); the candidate
        # join must be an equi-join on c_id
        ("centroid side broadcast", r"BroadcastExchange"),
        ("candidate equi-join on c_id", r"BroadcastHashJoin.*c_id|SortMergeJoin.*c_id"),
    ],
    "contamination": [
        # the benchmark shingle set is tiny by construction and must
        # BROADCAST — the corpus side never shuffles on the shingle key
        ("bench side broadcast", r"BroadcastHashJoin"),
        ("codegen", "codegen"),
    ],
    "dedup_incremental": [
        # cross-side LSH match is the same (band, bh) equi-join as the
        # pair generator — a nested loop anywhere means the O(n^2) path
        ("no nested-loop (band equi-join)", r"BroadcastNestedLoopJoin", "absent"),
        ("hash/sort-merge join on bands", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
    ],
    "dup_ngram_coverage": [
        # df-count + join-back + per-doc agg: partial aggregation before
        # every exchange, no single-partition funnel
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("partial agg before exchange", r"HashAggregate"),
        ("codegen", "codegen"),
    ],
    "semantic_dedup": [
        # SemDeDup: the corpus x 32-centroid ASSIGNMENT is a deliberate
        # broadcast nested loop (tiny centroid side — the standard IVF
        # build, same as ann_ivf); what must be an EQUI-join is the PAIR
        # join on c_id, or the all-pairs sweep escaped its blocking
        ("centroid side broadcast", r"BroadcastExchange"),
        ("pair equi-join on c_id", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin).*c_id"),
    ],
    "line_dedup": [
        # keeper selection must be a min_by hash aggregate (map-side
        # combine), never a row_number window over the hash partitions
        ("no window", r"Window", "absent"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("partial agg before exchange", r"HashAggregate"),
        ("codegen", "codegen"),
    ],
    "heavy_hitters": [
        # bounded-state CMS build (partial-combining aggregates); global
        # top-k via TakeOrderedAndProject, never a full sort; the rank
        # window runs over the k survivors only
        ("distributed partial top-k", r"TakeOrderedAndProject"),
        ("partial agg before exchange", r"HashAggregate"),
        ("codegen", "codegen"),
    ],
    "hll_distinct": [
        # the register build is two hash aggregates with partial combine;
        # the shuffle carries registers, never keys
        ("no window", r"Window", "absent"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("partial agg before exchange", r"HashAggregate"),
        ("codegen", "codegen"),
    ],
    "sequence_pack": [
        # the prefix sum must run per hash shard — one hash exchange on
        # shard, never a global (empty-partition-spec) window
        ("shard-partitioned exchange", r"hashpartitioning\(shard"),
        ("per-shard window", r"Window"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
    ],
    "domain_cap": [
        # the per-domain top-K must pre-prune map-side (WindowGroupLimit
        # partial/final) — no global sort, no single-partition funnel
        ("window group limit pre-prune", r"WindowGroupLimit"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
    ],
    "image_batch_pack": [
        # batch assignment must window per (bucket, shard) — the shard key
        # is what keeps 12 aspect classes from becoming 12 skewed tasks
        ("bucket+shard partitioned exchange", r"hashpartitioning\(bkt"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
    ],
    "dup_span_removal": [
        # one content-keyed exchange for the window-frequency keeper agg
        # (map-side combine), join-back, per-doc collect — no row_number
        # window over wtext partitions, no single-partition funnel
        ("no window", r"Window", "absent"),
        ("partial agg before exchange", r"HashAggregate"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
    ],
    "corpus_summary": [
        # one grouped aggregate, integer sums, |sources|-row output
        ("no window", r"Window", "absent"),
        ("partial agg before exchange", r"HashAggregate"),
        ("codegen", "codegen"),
    ],
    "unigram_logprob": [
        # token-frequency dim joins back over the token exchange; per-doc
        # aggregate partial-combines; integer log2 keeps it codegen-able
        ("no window", r"Window", "absent"),
        ("partial agg before exchange", r"HashAggregate"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("codegen", "codegen"),
    ],
    "token_mix": [
        # the (lang, accept) dim must broadcast back onto the corpus (the
        # corpus itself is never shuffled by doc); the lang aggregate
        # partial-combines map-side. The one Window in the plan runs over
        # the |langs|-row dim (grand total), not the corpus — checked by
        # asserting the corpus is scanned at most twice.
        ("rates dim broadcast", r"BroadcastHashJoin"),
        ("partial agg before exchange", r"HashAggregate"),
    ],
    "image_caption_pairs": [
        # alt-text mining is scan -> explode -> ONE grouped aggregate on
        # the canonical image URL; max_by packs the keep-best pick into a
        # partial-combining aggregate (SortAggregate because of the
        # ordering argument — still partial/final), never a window
        ("no window", r"Window", "absent"),
        ("no join", r"Join", "absent"),
        ("partial agg before exchange", r"SortAggregate|HashAggregate"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("codegen", "codegen"),
    ],
    "cdx_select": [
        # index selection is scan -> generate -> TWO grouped aggregates
        # (latest-per-surt, representative-per-digest), both map-side
        # combining; no joins, no windows, no global funnel
        ("no window", r"Window", "absent"),
        ("no join", r"Join", "absent"),
        ("partial agg before exchange", r"SortAggregate|HashAggregate"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("codegen", "codegen"),
    ],
    "recrawl_priority": [
        # change-rate estimation is ONE url-keyed grouped aggregate; the
        # per-group capture list is bounded (captures-per-URL), the fold
        # is an in-row array HOF — no window, no join, no funnel
        ("no window", r"Window", "absent"),
        ("no join", r"Join", "absent"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("codegen", "codegen"),
    ],
    "warc_read_plan": [
        # the lag + running-sum windows both run per FILENAME partition
        # (bounded by records-per-file) over one exchange; never global
        ("filename-partitioned exchange", r"hashpartitioning\(filename"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("no join", r"Join", "absent"),
    ],
    "image_header_sniff": [
        # format detection + dimension extraction is a pure scan-project
        # (hex/conv/substring column expressions) — no Python, no shuffle
        ("no shuffle (scan-project)", r"Exchange", "absent"),
        ("no Python boundary", r"ArrowEvalPython|BatchEvalPython|MapInPandas", "absent"),
        ("codegen", "codegen"),
    ],
    "crawl_capacity": [
        # host-keyed agg + broadcast 1-row global max; the per-host rows
        # must never funnel into a single partition or a global window
        ("no window", r"Window", "absent"),
        ("global max broadcast back", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("partial agg before exchange", r"HashAggregate"),
        ("codegen", "codegen"),
    ],
    "caption_filter": [
        # LAION pair gating is a pure scan-project: every gate a column
        # expression, no shuffle; only (doc_id, text) are read from the
        # synth source — on the input_hint table bytes would be pruned
        ("no shuffle (scan-project)", r"Exchange", "absent"),
        ("pruned ReadSchema", r"ReadSchema: struct<doc_id:bigint,text:string>"),
        ("codegen", "codegen"),
    ],
    "anchor_topk": [
        # anchor aggregation = two grouped aggregates, both map-side
        # combining (the argmax is a packed max_by, not a window); no
        # join, no window, no global funnel
        ("no window", r"Window", "absent"),
        ("no join", r"Join", "absent"),
        ("partial agg before exchange", r"SortAggregate|HashAggregate"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
        ("codegen", "codegen"),
    ],
    "bigram_logprob": [
        # count dims are map-side-combining aggs; the bigram dim joins its
        # prefix unigram count dim-side; the per-doc sum is partial-agg'd;
        # no window, no Python, no single-partition funnel
        ("partial agg before exchange", r"HashAggregate"),
        ("no window", r"Window", "absent"),
        ("no Python boundary", r"ArrowEvalPython|BatchEvalPython|MapInPandas", "absent"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
    ],
    "image_keep_best": [
        # pigeonhole pair join + two broadcastable res-dim joins +
        # distinct-losers anti-join; no nested-loop, no window
        ("no nested-loop join", r"BroadcastNestedLoopJoin|CartesianProduct", "absent"),
        ("anti-join sweep", r"LeftAnti"),
        ("no Python boundary", r"ArrowEvalPython|BatchEvalPython|MapInPandas", "absent"),
    ],
    "conditional_fetch": [
        # url-keyed join + host-keyed agg; partial agg before exchange,
        # no window, no single-partition funnel
        ("partial agg before exchange", r"HashAggregate"),
        ("no window", r"Window", "absent"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
    ],
    "curation_pipeline": [
        # four composed stages: classifier weights broadcast; the ONLY
        # nested loops are the deliberate 1-row broadcast totals dims
        # (Cross BuildRight — train_hashed_nb / score_bigram grand
        # totals); keeper selection a hash agg (no window), no
        # single-partition funnel
        ("weights broadcast", r"BroadcastHashJoin"),
        # pattern ends with \w (not ')') because the absent-handler
        # rstrips trailing parens from legacy patterns
        ("nested loops only 1-row Cross totals",
         r"BroadcastNestedLoopJoin (?!Cross|\[)\w", "absent"),
        ("no window", r"Window", "absent"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
    ],
    "gopher_quality": [
        # all seven Gopher rules are column expressions over one scan:
        # no shuffle, no Python, whole plan codegen'd
        ("no shuffle (scan-project)", r"Exchange", "absent"),
        ("no Python boundary", r"ArrowEvalPython|BatchEvalPython|MapInPandas", "absent"),
        ("codegen", "codegen"),
    ],
    "quality_classifier": [
        # train = D-cardinality hash agg (partial before exchange);
        # score = the weight dim broadcast against the exploded corpus
        # (the corpus side must NEVER shuffle for the weight join)
        ("weight dim broadcast", r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
        ("partial agg before exchange", r"HashAggregate"),
        ("no window", r"Window", "absent"),
        ("no Python boundary", r"ArrowEvalPython|BatchEvalPython|MapInPandas", "absent"),
    ],
    "shard_manifest": [
        # shard assignment windows per bucket then per (bucket, shard) —
        # both partitioned exchanges, never a global manifest sort
        ("bucket-partitioned exchange", r"hashpartitioning\(bucket"),
        ("per-bucket window", r"Window"),
        ("no single-partition funnel", r"Exchange SinglePartition", "absent"),
    ],
    # dedup_minhash_lsh returns an eagerly-localCheckpointed result (the
    # band rows are pinned then released) — its visible plan is a scan of
    # the checkpoint, so it has no inspectable join plan here.
    # pagerank's per-iteration plan is truncated by localCheckpoint (same
    # note); its join/agg shape is asserted structurally in
    # tests/test_graph_sketch.py via the python-twin parity instead.
}

report = []
for name, checks in CHECKS.items():
    df = QUERIES[name](spark, sf_dir)
    p = plan_of(df)
    simple = plan_of(df, "simple")
    report.append(f"== {name} ==")
    for item in checks:
        label, pattern = item[0], item[1]
        absent = len(item) > 2 and item[2] == "absent"
        if pattern == "codegen":
            ok = "*(" in simple
        elif absent:
            ok = not re.search(pattern.replace("^(?!.*", "").rstrip(")"), p)
        else:
            ok = bool(re.search(pattern, p, re.S) or re.search(pattern, simple, re.S))
        report.append(f"  [{'OK' if ok else 'MISS'}] {label}")
    # compactness signals: exchange count + codegen spans (the `*(N)`
    # markers — Spark 4.1 formatted mode doesn't label codegen)
    n_ex = len(re.findall(r"Exchange", simple))
    n_cg = len(set(re.findall(r"\*\((\d+)\)", simple)))
    report.append(f"  exchanges={n_ex} codegen_spans={n_cg}")

# token_mix: the only Window runs over the |langs|-row rates dim — pinned
# indirectly by the corpus being scanned at most twice (totals + filter);
# a corpus-sized window or a duplicated aggregate chain would add a scan.
_tm_simple = plan_of(QUERIES["token_mix"](spark, sf_dir), "simple")
_tm_scans = _tm_simple.count("Scan parquet")
report.append("== token_mix (scan audit) ==")
report.append(f"  [{'OK' if _tm_scans <= 2 else 'MISS'}] corpus scanned <= 2x "
              f"(scans={_tm_scans})")

# curation_pipeline: the gopher gate must be computed ONCE (round-2 review
# item: the gate fed both the g_ok column and the classifier's training
# labels as two separate gate-expression scans; now one pinned projection
# feeds both). Parquet scans left in the plan: classifier score, the two
# LM dims + LM score, and the doc-key/md5 base — the gate itself reads the
# checkpoint. A regression re-inlining the gate adds parquet scans AND
# re-materializes the (expensive) gate expression tree.
_cp_simple = plan_of(QUERIES["curation_pipeline"](spark, sf_dir), "simple")
_cp_scans = _cp_simple.count("Scan parquet")
_cp_ckpt = ("ExistingRDD" in _cp_simple) or ("Scan rdd" in _cp_simple.lower())
report.append("== curation_pipeline (scan audit) ==")
report.append(f"  [{'OK' if _cp_scans <= 7 else 'MISS'}] corpus scanned <= 7x "
              f"(scans={_cp_scans}; doc-key base + classifier score + 3 "
              f"inline LM-dim builds + 2-stream LM score — the production "
              f"path passes frozen weights/lm_dims and drops the dim scans)")
report.append(f"  [{'OK' if _cp_ckpt else 'MISS'}] gopher gate pinned once "
              f"(checkpoint scan present; round-2 ran the gate twice)")

# frontier normalize: the URL parse must be evaluated ONCE per row behind
# the Generate barrier (explode of a single-element struct array) — without
# it Catalyst inlines the parse tree into every derived column (~4x slower;
# measured on the 2M-row frontier microbench). The substring_index count in
# the executed plan is the duplication canary: one parse is ~130 textual
# occurrences (the parse tree reuses its own sub-pieces), the regressed
# inlined form is ~460.
from crawlee_spark.operators.frontier import normalize_requests

raw = spark.range(10_000).select(
    F.concat(F.lit("https://h"), (F.col("id") % 100).cast("string"),
             F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url"))
norm = normalize_requests(raw, step=1, num_buckets=32)
np_plan = norm._jdf.queryExecution().executedPlan().toString()
n_si = np_plan.count("substring_index")
report.append("== frontier normalize_requests ==")
report.append(f"  [{'OK' if 'Generate' in np_plan else 'MISS'}] Generate barrier present")
report.append(f"  [{'OK' if n_si <= 200 else 'MISS'}] single URL parse "
              f"(substring_index occurrences={n_si}, regression threshold 200)")

print("\n".join(report))

# full plan dumps for the two flagship shapes
dumps = []
for name in ("pricing_summary", "frontier_head_select"):
    dumps.append(f"\n### PLAN {name}\n```\n"
                 + plan_of(QUERIES[name](spark, sf_dir))[:3000] + "\n```")

with open("docs/PLANS.md", "w") as f:
    f.write(
        "# Physical-plan verification (scripts/dump_plans.py)\n\n"
        "Checked properties for the plans that matter at 100 TB — predicate\n"
        "pushdown to parquet, column pruning, broadcast of dims, map-side\n"
        "partial aggregation, per-key (never global) windows, whole-stage\n"
        "codegen. AQE is disabled for inspection only (AdaptiveSparkPlan\n"
        "hides codegen annotations pre-execution); the engine ships with AQE\n"
        "on.\n\n```\n" + "\n".join(report) + "\n```\n" + "\n".join(dumps) + "\n"
    )
print("wrote docs/PLANS.md")
