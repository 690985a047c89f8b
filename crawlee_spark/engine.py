"""The crawl engine: a driver-orchestrated BSP superstep loop over snapshot
tables (SURVEY.md §7 architecture).

One superstep = one logical time tick = ONE frontier snapshot commit:

  pending -> robots sweep -> politeness/budget selection -> deterministic
  "fetch" (canonical-hash join against the image+caption corpus + hash-derived
  failure model) -> enqueueLinks (Arrow UDF extract + JVM filter chain) ->
  combined MERGE (handled / retried / dead / fresh rows) -> politeness
  advance -> metrics + fetch-log append.

This replaces the reference's AutoscaledPool task loop
(``packages/basic-crawler/src/internals/basic-crawler.ts:1144-1277`` +
``autoscaled_pool.ts:460-564``): Spark's scheduler provides the concurrency,
set-based operators provide the semantics, and snapshot isolation removes
every consistency sleep/lock (``storages/utils.ts:126-142``,
``memory-storage request-queue.ts:182-285``).

Determinism: crawl order is fully defined by (step, order_no, depth,
url_hash) — the simulator (crawlee_spark/simulator.py) is the spec and
tests/test_engine_parity.py pins engine == simulator on crawl order, URL-seen
set, dead-letter set, and per-host counters.

Scale shape (100 TB / 1000 executors):
- frontier reads are bucket-pruned; the superstep commit rewrites only
  touched buckets (copy-on-write) with per-partition lineage in the manifest;
- the fetch join shuffles only the fetch set (politeness-bounded), never the
  corpus: candidates are joined hash-to-hash against a bucketed corpus scan
  with bytes/html column-pruned until needed;
- politeness + robots dims are O(hosts) and broadcast;
- the only Python is the extract/validate pandas UDFs (Arrow-batched);
- driver holds O(1) state (step counter, handled count, politeness rows).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time as _time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from crawlee_spark.functions import headers, urls
from crawlee_spark.operators import politeness as pol
from crawlee_spark.operators import robots as robots_op
from crawlee_spark.operators.enqueue_links import EnqueueLinksOptions, enqueue_links
from crawlee_spark.operators.frontier import (
    STEP_SHIFT,
    FrontierTable,
    make_requests,
    merge_new_requests,
    order_no_expr,
)
from crawlee_spark.store.snapshot_table import AppendTable, SnapshotTable, _atomic_write


@dataclass
class FailureModelConf:
    """Hash-derived deterministic fetch failures (mirror of
    simulator.FailureModel — same pmod arithmetic on the same xxhash64).
    Models NETWORK-level errors (got-scraping throw path): transient for the
    first ``fail_attempts`` tries, or permanently failing hosts."""

    fail_mod: int = 0
    fail_attempts: int = 2
    dead_mod: int = 0

    def success_col(self):
        ok = F.lit(True)
        if self.dead_mod:
            ok = ok & (F.pmod(F.col("url_hash"), F.lit(self.dead_mod)) != 0)
        if self.fail_mod:
            ok = ok & ~(
                (F.pmod(F.col("url_hash"), F.lit(self.fail_mod)) == 0)
                & (F.col("retry_count") < self.fail_attempts)
            )
        return ok


@dataclass
class StatusModelConf:
    """Deterministic HTTP status model + the reference's status-class table.

    ``status_mods`` assigns a status code when ``pmod(url_hash, mod) == 0``
    (evaluated in ascending code order, first hit wins; everything else is
    200). Classification mirrors the reference:

    - >= 500 and not in ``ignore_error_codes`` -> error, retried on the
      retry budget (``http-crawler.ts:643-667`` 5xx throw);
    - in ``additional_error_codes`` -> same (user-extended throw set);
    - in ``session_blocked_codes`` [401, 403, 429] -> SessionError: retire
      the session and retry on the ROTATION budget, retry_count untouched
      (``session_pool.ts:164``, ``basic-crawler.ts:538-540, 1435-1452``);
    - 406 -> unsupported content type, no-retry dead
      (``http-crawler.ts:789-808``);
    - anything else (2xx, other 4xx, ignored codes) -> passes to the
      handler = handled (4xx pages run the requestHandler in the
      reference).
    """

    status_mods: dict[int, int] = field(default_factory=dict)
    ignore_error_codes: tuple[int, ...] = ()
    additional_error_codes: tuple[int, ...] = ()
    session_blocked_codes: tuple[int, ...] = (401, 403, 429)
    max_session_rotations: int = 10  # basic-crawler.ts:540 default

    def status_col(self):
        expr = None
        for code in sorted(self.status_mods):
            cond = F.pmod(F.col("url_hash"), F.lit(self.status_mods[code])) == 0
            expr = F.when(cond, F.lit(code)) if expr is None else expr.when(cond, F.lit(code))
        return expr.otherwise(F.lit(200)) if expr is not None else F.lit(200)

    def status_of(self, url_hash: int) -> int:
        """Python mirror (simulator parity)."""
        for code in sorted(self.status_mods):
            if url_hash % self.status_mods[code] == 0:
                return code
        return 200


@dataclass
class CrawlConfig:
    num_buckets: int = 32
    politeness: pol.PolitenessConfig = field(default_factory=pol.PolitenessConfig)
    enqueue: EnqueueLinksOptions = field(default_factory=EnqueueLinksOptions)
    failures: FailureModelConf = field(default_factory=FailureModelConf)
    status: StatusModelConf = field(default_factory=StatusModelConf)
    max_retries: int = 3          # basic-crawler.ts:538 default
    user_agent: str = "*"
    keep_fragment: bool = False
    # METHOD(payloadHash):canonicalUrl dedup keys (request.ts:361-384)
    use_extended_unique_key: bool = False
    # label -> handler dispatch applied to each superstep's successful
    # fetches; handler outputs append to the router_results table
    # (operators/router.py; reference packages/core/src/router.ts:32-55).
    # router_strict mirrors the reference's 'Route not found' throw: a
    # fetched label with no handler and no default raises instead of
    # silently dropping the rows (router.ts:52-55); set False to tolerate
    router: Any = None
    router_strict: bool = True
    # pre/post-navigation hooks (http-crawler.ts:96-120, 299-300). Pre hooks
    # are DF->DF over the selected fetch set BEFORE the corpus join — they
    # may annotate request columns, e.g. set `skip_navigation` true
    # (request.ts skipNavigation: handled without a fetch, no link
    # extraction). Post hooks are DF->DF over fetched rows AFTER navigation
    # (may rewrite `_html` / `_loaded`) and BEFORE status classification.
    # Hooks must be 1:1 on rows (no adds/drops) — mirrored per-row in
    # simulator.SimConfig for parity tests.
    pre_navigation_hooks: list = field(default_factory=list)
    post_navigation_hooks: list = field(default_factory=list)
    # deterministic proxy assignment (operators/proxies.py;
    # proxy_configuration.ts) — session-sticky, rotation-aware, logged per
    # fetch; None = direct connection
    proxies: Any = None
    # errorHandler (basic-crawler.ts:151-158): DF->DF over each superstep's
    # RETRIED rows (url, error, retry_count, user_data, ...) BEFORE they
    # re-enter the frontier; the returned frame's (url_hash, user_data)
    # pairs overwrite the retried requests' user_data — the reference's
    # "mutate the request between retries" surface. Must not add/drop rows.
    error_handler: Any = None
    # failedRequestHandler (basic-crawler.ts:160-167): DF->DF over each
    # superstep's DEAD rows (retries exhausted / no-retry); its output is
    # appended to the failed_requests dead-letter table verbatim.
    failed_request_handler: Any = None
    max_steps: int = 10_000
    validate_images: bool = False  # run the PSNR/caption validator per fetch
    seed: int = 42
    # Bloom URL-seen prefilter (operators/urlseen.py): semantically a no-op
    # (exact anti-join backstop), prunes the frontier-side read of the MERGE.
    use_bloom: bool = False
    bloom_expected_per_bucket: int = 100_000
    bloom_fpp: float = 0.03
    # which filter backs the URL-seen prefilter when use_bloom=True —
    # "bloom" (operators/urlseen.py) or "cuckoo" (operators/cuckoo.py; adds
    # fingerprint DELETION for deleteRequest/purge without a shard rebuild)
    urlseen_kind: str = "bloom"
    # retryOnBlocked content heuristic (``blocked.ts:4-8``): blocked pages
    # fail with 'session-blocked' and retry (session rotation analog)
    detect_blocked: bool = False
    # hot-host skew: salt factor for the stateless parse stage (0 = off;
    # politeness/ordering stages are never salted — SURVEY.md §7(c))
    parse_salt: int = 0
    # per-bucket session pool tracking (operators/sessions.py): fetch
    # identities with error scores / usage / rotation — observability state,
    # deliberately decoupled from crawl ordering (parity-neutral)
    track_sessions: bool = False
    sessions_per_bucket: int = 4
    # createSessionFunction (session_pool.ts:50): DF->DF over the freshly
    # created pool rows (bucket, session_id, error_score, usage_count,
    # created_step, retired) — custom session identities/initial state
    create_session_function: Any = None
    # isFinishedFunction (autoscaled_pool.ts:20-37): engine -> bool consulted
    # before each superstep; True ends the crawl even with pending work
    # (the reference's custom-termination override)
    is_finished_function: Any = None
    # EventManager bus (crawlee_spark/events.py; event_manager.ts:42-46):
    # persistState after every superstep commit, migrating/aborting when an
    # interrupt is requested, exit at run end; None = no bus
    events: Any = None
    # hadMultipleClients (request-queue.ts:493-507): the engine's lineage
    # authority assumes it is the queue's only writer; on resume a foreign
    # commit in the frontier lineage raises unless this is set (the caller
    # accepting e.g. a raw maintenance commit as their own)
    allow_foreign_writers: bool = False
    # ErrorSnapshotter (statistics/error_snapshotter.ts, saveErrorSnapshots):
    # capture the page state of the FIRST occurrence of each unique error
    # signature into the error_snapshots table — set-based: per-superstep
    # min_by representative per signature, anti-joined against the
    # already-captured signature set (the table itself is the "seen" state,
    # O(unique signatures) rows)
    save_error_snapshots: bool = False
    # anti-starvation (beyond-reference, off by default): a continuous
    # forefront stream can starve normal-band pending rows forever under a
    # tight per-host budget (forefront always sorts first). When set,
    # normal rows pending for more than this many supersteps are lifted
    # ABOVE the forefront band for selection — oldest first — at
    # selection time only (no table mutation, no extra commit). Changes
    # fetch ordering by design, so parity tests leave it None.
    starvation_boost_steps: int | None = None


FETCH_LOG_SCHEMA = (
    "step int, url string, unique_key string, url_hash long, host string, "
    "bucket int, order_no long, depth int, retry_count int, status string, "
    "status_code int, loaded_url string, proxy_url string, "
    "header_profile_id int, user_agent string"
)

METRICS_SCHEMA = (
    "step int, bucket int, host string, handled long, failed long, "
    "retried long, robots_dead long"
)


class CrawlEngine:
    """Owns the work dir: frontier/, politeness snapshot, fetch_log/,
    metrics/, results/, crawl_state.json."""

    def __init__(self, spark: SparkSession, workdir: str, cfg: CrawlConfig | None = None):
        self.spark = spark
        self.workdir = workdir
        self.cfg = cfg or CrawlConfig()
        self.frontier = FrontierTable(spark, os.path.join(workdir, "frontier"),
                                      self.cfg.num_buckets)
        if self.frontier.exists() and \
                self.frontier.num_buckets != self.cfg.num_buckets:
            # the table was rebucketed since this config was written; the
            # engine derives politeness/session buckets from cfg, so a
            # silent mismatch would split state across two bucket spaces
            raise ValueError(
                f"frontier at {workdir} uses num_buckets="
                f"{self.frontier.num_buckets} (rebucketed) but CrawlConfig"
                f".num_buckets={self.cfg.num_buckets}; update the config")
        self.fetch_log = AppendTable(spark, os.path.join(workdir, "fetch_log"))
        self.metrics = AppendTable(spark, os.path.join(workdir, "metrics"))
        self.results = AppendTable(spark, os.path.join(workdir, "results"))
        # router handler outputs get their OWN table: AppendTable.read()
        # loads every segment under one inferred schema, so image-validation
        # rows and handler-defined rows must never share a directory
        self.router_results = AppendTable(
            spark, os.path.join(workdir, "router_results")
        )
        # failedRequestHandler dead-letter output (own table: AppendTable
        # segments must share one schema per directory)
        self.failed_requests = AppendTable(
            spark, os.path.join(workdir, "failed_requests")
        )
        # first-occurrence-per-error-signature page captures
        # (error_snapshotter.ts; written only when cfg.save_error_snapshots)
        self.error_snapshots = AppendTable(
            spark, os.path.join(workdir, "error_snapshots")
        )
        self.state_path = os.path.join(workdir, "crawl_state.json")
        self.step = 0
        self.handled_count = 0
        # politeness state lives in a host-hash-bucketed snapshot table —
        # O(delayed hosts) can reach 10^6+ at web scale, which must never
        # sit in driver memory (round-1 kept a driver-side dict here); the
        # driver holds only the table handle
        self.politeness = SnapshotTable(spark, os.path.join(workdir, "politeness"))
        self.urlseen = None
        if self.cfg.use_bloom:
            if self.cfg.urlseen_kind == "cuckoo":
                from crawlee_spark.operators.cuckoo import CuckooUrlSeen as _Seen
            else:
                from crawlee_spark.operators.urlseen import UrlSeenShards as _Seen

            self.urlseen = _Seen(
                os.path.join(workdir, "url_seen"),
                expected_per_bucket=self.cfg.bloom_expected_per_bucket,
                fpp=self.cfg.bloom_fpp,
            )
            self.urlseen.load()  # resume path: reload persisted shards
        # session pool state: one row per (bucket, session_id) in a bucketed
        # snapshot table — like politeness, the pool never sits in driver
        # memory (round-2 kept buckets x per_bucket rows in crawl_state.json
        # and collect()ed the updated pool every superstep; at the SCALE.md
        # target of 4-16k buckets that is 10^4-10^5 rows through the driver
        # per superstep). The driver holds only the table handle.
        self.sessions = SnapshotTable(spark, os.path.join(workdir, "sessions"))
        # pending interrupt kind ("migrating" | "aborting"), set via
        # request_interrupt — checked by run() after each superstep commit
        self._interrupt: str | None = None
        # (frontier_snapshot_id, pending_count) carried from the previous
        # superstep's commit: lets the next superstep skip the
        # pending-emptiness probe job. The snapshot-id guard invalidates the
        # carry on ANY out-of-band frontier mutation (add_requests,
        # reprioritize, rollback, foreign writer) — those commit, changing
        # the id, and the next superstep falls back to the real probe.
        self._pending_carry: tuple[int, int] | None = None
        # per-phase wall timings of the last superstep (observability;
        # initialized here so hooks/listeners can read it before the first
        # superstep without an AttributeError)
        self.last_timings: dict[str, float] = {}

    # -- state / resume -----------------------------------------------------

    def _save_state(self) -> None:
        payload = json.dumps({
            "step": self.step,
            "handled_count": self.handled_count,
        })
        _atomic_write(self.state_path, payload)
        # per-step checkpoint of the (driver-small) scalar state — together
        # with the snapshot-table manifests this makes EVERY superstep a
        # resumable checkpoint (north_rule), not just the latest one
        hist_dir = os.path.join(self.workdir, "state_history")
        os.makedirs(hist_dir, exist_ok=True)
        _atomic_write(os.path.join(hist_dir, f"step-{self.step}.json"), payload)

    def _load_state(self) -> bool:
        if not os.path.exists(self.state_path):
            return False
        with open(self.state_path) as f:
            s = json.load(f)
        self.step = s["step"]
        self.handled_count = s["handled_count"]
        # (legacy state files carried a "sessions" rows list; the pool now
        # lives in the sessions SnapshotTable and needs no JSON restore)
        return True

    @classmethod
    def resume(cls, spark: SparkSession, workdir: str, cfg: CrawlConfig | None = None,
               at_step: int | None = None) -> "CrawlEngine":
        """Resume from the latest snapshots, or — with ``at_step`` — from ANY
        earlier superstep checkpoint (north_rule: resumable from any
        checkpoint): every table is rolled back to its state as of the end of
        that superstep before the crawl continues. Leases don't exist — a
        superstep either committed fully or its snapshot was never flipped,
        so no lock expiry is needed."""
        eng = cls(spark, workdir, cfg)
        if not eng.frontier.exists():
            raise FileNotFoundError(f"no frontier at {workdir}")
        # multi-writer detection BEFORE the torn-superstep heal: a foreign
        # commit can also leave the frontier "ahead", and healing would
        # silently roll the foreign rows back — refusing surfaces the
        # single-writer violation instead (hadMultipleClients analog)
        if eng.frontier.had_multiple_clients() and \
                not eng.cfg.allow_foreign_writers:
            raise ValueError(
                f"frontier at {workdir} has commits from another writer "
                f"(had_multiple_clients); this engine is the queue's "
                f"lineage authority. Roll the foreign commits back, or "
                f"resume with CrawlConfig(allow_foreign_writers=True) to "
                f"adopt them.")
        eng._load_state()
        # torn-superstep detection: a superstep spans several commits
        # (frontier, logs, politeness) with crawl_state.json saved LAST.
        # A crash in between leaves the frontier AHEAD of the saved step;
        # re-running against that mixed state would log a different fetch
        # set under the same step and skip the politeness advance. The
        # frontier is committed FIRST in the superstep, so "frontier
        # ahead" detects every torn window — heal by rolling all tables
        # back to the saved checkpoint before continuing.
        ahead = eng._frontier_max_step()
        if at_step is None and ahead > eng.step:
            import logging

            logging.getLogger(__name__).warning(
                "torn superstep detected at %s (frontier at step %d, "
                "saved state at %d); rolling back to the checkpoint",
                workdir, ahead, eng.step)
            eng.rollback_to(eng.step)
        if at_step is not None:
            eng.rollback_to(at_step)
        return eng

    def _frontier_max_step(self) -> int:
        """Highest superstep stamped in the frontier's commit chain."""
        mx = -1
        for m in self.frontier.table.history():
            mx = max(mx, int(m.get("summary", {}).get("step", -1)))
        return mx

    def checkpoints(self) -> list[int]:
        """Steps with a saved checkpoint (sorted). Step 0 = seeds-only."""
        hist_dir = os.path.join(self.workdir, "state_history")
        if not os.path.isdir(hist_dir):
            return []
        steps = []
        for entry in os.listdir(hist_dir):
            if entry.startswith("step-") and entry.endswith(".json"):
                steps.append(int(entry[5:-5]))
        return sorted(steps)

    @staticmethod
    def _chain_snapshot_at(history: list[dict], step: int) -> int | None:
        """Snapshot id of the LAST manifest in chain order whose running-max
        summary step is <= ``step`` (running max because a late add_seeds
        commits with step 0 mid-chain — picking it would resurrect later
        supersteps' effects)."""
        best: int | None = None
        seen_max = -1
        for m in history:
            seen_max = max(seen_max, int(m.get("summary", {}).get("step", -1)))
            if seen_max <= step:
                best = int(m["id"])
        return best

    def rollback_to(self, step: int) -> None:
        """Roll every piece of crawl state back to the end of superstep
        ``step`` (an earlier checkpoint), after which the crawl can re-run
        deterministically. Frontier + politeness + session pool flip
        ``_CURRENT`` to the snapshot committed at-or-before that step; the
        append logs truncate their segment lists; Bloom shards rebuild from
        the rolled-back frontier (their snapshot stamp no longer matches);
        the scalar state (step / handled_count) reloads from the per-step
        checkpoint file."""
        hist_path = os.path.join(self.workdir, "state_history", f"step-{step}.json")
        if not os.path.exists(hist_path):
            raise FileNotFoundError(
                f"no checkpoint for step {step}; have {self.checkpoints()}")
        sid = self._chain_snapshot_at(self.frontier.table.history(), step)
        if sid is None:
            raise FileNotFoundError(f"no frontier snapshot at step <= {step}")
        # a rollback can cross a rebucket boundary: check the TARGET
        # snapshot's bucket count BEFORE flipping anything — otherwise
        # MERGEs after the flip would key new rows with the post-rebucket
        # N over pre-rebucket data (silent duplicates), and raising after
        # a partial flip would leave mixed state
        stored = self.frontier.stored_num_buckets(from_snapshot=sid)
        target_n = stored if stored is not None else self.frontier.num_buckets
        if target_n != self.cfg.num_buckets:
            raise ValueError(
                f"rollback_to({step}) crosses a rebucket: that snapshot "
                f"uses num_buckets={target_n} but CrawlConfig.num_buckets="
                f"{self.cfg.num_buckets}; update the config first")
        self.frontier.table.rollback(sid)
        self.frontier.num_buckets = target_n
        for dim in (self.politeness, self.sessions):
            if dim.exists():
                dsid = self._chain_snapshot_at(dim.history(), step)
                if dsid is None:
                    # the dim didn't exist yet at that step: both politeness
                    # and the session pool are derived state, so drop the
                    # table (rebuilt as the crawl re-runs) rather than
                    # keeping future supersteps' rows
                    shutil.rmtree(dim.root, ignore_errors=True)
                else:
                    dim.rollback(dsid)
        for log in (self.fetch_log, self.metrics, self.results,
                    self.router_results, self.failed_requests,
                    self.error_snapshots):
            if log.exists():
                log.rollback(self._chain_snapshot_at(log.history(), step))
        with open(hist_path) as f:
            s = json.load(f)
        self.step = s["step"]
        self.handled_count = s["handled_count"]
        self._save_state()
        self._ensure_urlseen_fresh()

    # -- setup --------------------------------------------------------------

    def add_seeds(self, seeds: DataFrame) -> dict[str, Any]:
        if not self.frontier.exists():
            FrontierTable.create(self.spark, self.frontier.table.root, self.cfg.num_buckets)
        # enqueue in the CURRENT step band: mid-crawl seed additions must
        # append behind existing pending work (the reference's addRequests
        # orders by Date.now), not jump ahead in the step-0 band — the
        # streaming ingest already passes step=engine.step for the same
        # reason (stream_crawl.py)
        res = self.frontier.add_requests(
            seeds, step=self.step, keep_fragment=self.cfg.keep_fragment,
            use_extended_unique_key=self.cfg.use_extended_unique_key,
        )
        if self.urlseen is not None:
            self.urlseen.rebuild(
                self.frontier.read().select("bucket", "url_hash"),
                frontier_snapshot=self.frontier.table.current_snapshot_id(),
            )
        self._save_state()
        return res

    def _ensure_urlseen_fresh(self) -> None:
        """Rebuild persisted Bloom shards when they don't match the current
        frontier snapshot (crash between frontier commit and shard save):
        stale shards would send just-committed keys down the
        'definitely-unseen' path that skips the exact anti-join backstop."""
        if self.urlseen is None or not self.frontier.exists():
            return
        sid = self.frontier.table.current_snapshot_id()
        if self.urlseen.frontier_snapshot != sid:
            self.urlseen.rebuild(
                self.frontier.read().select("bucket", "url_hash"),
                frontier_snapshot=sid,
            )

    # -- one superstep ------------------------------------------------------

    def _politeness_df(self) -> DataFrame | None:
        """Current politeness dim (host, next_allowed_step) or None.
        Persisted as a bucketed snapshot table — resumable like every other
        piece of crawl state, never held on the driver."""
        if not self.politeness.exists():
            return None
        return self.politeness.read().select("host", "next_allowed_step")

    def _advance_politeness(self, fetched: DataFrame, step: int,
                            host_delays: DataFrame | None,
                            pol_buckets: list[int] | None = None) -> None:
        """Distributed politeness advance (set-based ``advance_politeness``
        over the snapshot table): replaces the round-1 driver dict, which
        grew O(delayed hosts). Skipped entirely when no delay can apply.

        Touched-bucket commit (same CoW model as the frontier): only the
        buckets of this step's politeness KEYS (``pol_buckets``, from the
        stats probe — host-hash of fetched hosts, plus domain keys under
        domain keying) are rewritten; the rest inherit by manifest pointer.
        Rounds 1-4 rewrote the WHOLE state table every superstep —
        O(hosts-in-cooldown) write amplification that a delay window of k
        steps multiplies by ~k at scale. Expired rows in untouched buckets
        linger until their bucket is next rewritten; that is safe because
        every reader already treats ``next_allowed_step <= step`` as
        no-block (``select_fetch_set``) and ``_max_politeness_wait``
        compares against the current step."""
        cfg = self.cfg
        if cfg.politeness.same_domain_delay_secs <= 0 and host_delays is None:
            return
        if pol_buckets is not None and not pol_buckets:
            # no fetched rows this step (robots-only commit): no key can
            # advance, and expiry is lazy — nothing to write
            return
        domain_col = "_domain" if cfg.politeness.key_by_domain else None
        cols = ["host"] + ([domain_col] if domain_col else [])
        touched = fetched.select(*cols).distinct()
        if host_delays is not None:
            touched = touched.join(
                F.broadcast(host_delays.select("host", "crawl_delay")),
                on="host", how="left",
            )
        bucket_col = urls.host_hash(F.col("host"), cfg.num_buckets)
        if not self.politeness.exists():
            new_state = pol.advance_politeness(
                None, touched, step, cfg.politeness, domain_col=domain_col,
            ).withColumn("bucket", bucket_col)
            SnapshotTable.create(self.spark, self.politeness.root, new_state,
                                 num_buckets=cfg.num_buckets,
                                 summary={"step": step})
            return
        # prior state restricted to the touched buckets: advance_politeness
        # keeps (non-updated, non-expired) rows and unions the new ones, so
        # the result is the touched buckets' FULL new content
        state_touched = self.politeness.read(
            buckets=pol_buckets).select("host", "next_allowed_step")
        new_state = pol.advance_politeness(
            state_touched, touched, step, cfg.politeness,
            domain_col=domain_col,
        ).withColumn("bucket", bucket_col)
        self.politeness.commit_buckets(new_state, "politeness",
                                       {"step": step}, touched=pol_buckets)

    def _max_politeness_wait(self) -> int:
        if not self.politeness.exists():
            return 0
        row = self.politeness.read().agg(
            F.max("next_allowed_step").alias("m")).first()
        return int(row["m"]) if row["m"] is not None else 0

    def _check_corpus_unique(self, corpus: DataFrame) -> None:
        """Raise when two corpus rows canonicalize to one key: the fetch
        join is a left join on the canonical hash, so a duplicate key
        would fan requests out (double-counted handled, duplicate frontier
        rows — a PK violation) while the simulator's dict silently keeps
        one. One count-vs-distinct agg, memoized per corpus frame."""
        memo = getattr(self, "_corpus_check_memo", None)
        if memo is not None and memo is corpus:
            return
        dup = (
            corpus.select(urls.url_hash(urls.unique_key(F.col("url"))).alias("_k"))
            .groupBy("_k").count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                "corpus has URLs that canonicalize to the same key; "
                "dedup the corpus on unique_key(url) before crawling"
            )
        self._corpus_check_memo = corpus

    def _static_exprs(self) -> dict:
        """STEP-INDEPENDENT column trees of the superstep, built once per
        engine (Column objects wrap immutable unresolved expressions, so one
        build serves every superstep). Rounds 1-4 rebuilt the status/error/
        retry/probe trees every step — pure driver py4j cost that dominated
        the fixed per-step latency at toy data sizes (round-5 profile;
        VERDICT r4 item #7). Everything here references columns by NAME and
        ``cfg`` fields frozen at engine construction."""
        sx = getattr(self, "_sx", None)
        if sx is not None:
            return sx
        cfg = self.cfg
        sm = cfg.status
        sx = {}
        sx["fetch_hash"] = urls.url_hash(urls.unique_key(F.col("url")))
        sx["status_code"] = (
            F.when(F.col("skip_navigation"), F.lit(0))  # no HTTP request
            .when(F.col("_html").isNull(), F.lit(0))
            .otherwise(sm.status_col())
        )
        sc = F.col("_status_code")
        in_ignore = sc.isin(list(sm.ignore_error_codes)) if sm.ignore_error_codes \
            else F.lit(False)
        is_5xx = (sc >= 500) & ~in_ignore
        is_addl = sc.isin(list(sm.additional_error_codes)) \
            if sm.additional_error_codes else F.lit(False)
        is_sess = sc.isin(list(sm.session_blocked_codes)) & ~in_ignore \
            if sm.session_blocked_codes else F.lit(False)
        sx["err_col"] = (
            # skipNavigation: handled without navigating (request.ts) —
            # success regardless of corpus/status, no extraction
            F.when(F.col("skip_navigation"), F.lit(None).cast("string"))
            .when(F.col("_html").isNull(), F.lit("404-not-found"))
            .when(~cfg.failures.success_col(), F.lit("fetch-failed"))
            .when(F.col("_blocked"), F.lit("session-blocked"))
            .when(is_5xx, F.lit("http-5xx"))
            .when(is_addl, F.lit("http-error"))
            .when(is_sess, F.lit("session-blocked"))
            .when(sc == 406, F.lit("unsupported-content-type"))
            .otherwise(F.lit(None).cast("string"))
        )
        sx["rot_col"] = F.col("_err") == "session-blocked"
        sx["can_retry"] = (~F.col("no_retry")) & (
            F.when(F.col("_rot"),
                   F.col("rotation_count") < sm.max_session_rotations)
            .when(F.col("_err") == "unsupported-content-type", F.lit(False))
            .otherwise(F.col("retry_count") < cfg.max_retries)
        )
        can_retry = sx["can_retry"]
        # politeness-state buckets touched by this fetch set, feeding the
        # touched-bucket politeness commit. HOST keys need no extra work:
        # the frontier's bucket column IS host_hash(host), so the host-side
        # bucket set equals the `buckets` collect_set below. Only DOMAIN
        # keys ("d:<registrable domain>", domain keying on) hash to
        # different buckets and need their own set; the null-guard keeps a
        # PSL-miss row (NULL _domain) from contributing hash(NULL)'s bucket.
        sx["probe_fetch"] = [
            F.sum(F.when(F.col("_success"), 1).otherwise(0)).alias("handled"),
            F.sum(F.when(~F.col("_success") & ~can_retry, 1).otherwise(0)).alias("failed"),
            F.sum(F.when(~F.col("_success") & can_retry, 1).otherwise(0)).alias("retried"),
            F.collect_set("bucket").alias("buckets"),
        ]
        if cfg.politeness.key_by_domain:
            sx["probe_fetch"].append(
                F.collect_set(
                    F.when(F.col("_domain").isNotNull(),
                           urls.host_hash(
                               F.concat(F.lit(pol.DOMAIN_KEY_PREFIX),
                                        F.col("_domain")),
                               cfg.num_buckets))
                ).alias("pol_buckets"))
        sx["probe_count"] = [
            F.count(F.lit(1)).alias("handled"),
            F.lit(0).alias("failed"), F.lit(0).alias("retried"),
            F.collect_set("bucket").alias("buckets"),
        ]
        sx["metrics_aggs"] = [
            F.sum(F.when(F.col("_success"), 1).otherwise(0)).alias("handled"),
            F.sum(F.when(~F.col("_success") & ~can_retry, 1).otherwise(0)).alias("failed"),
            F.sum(F.when(~F.col("_success") & can_retry, 1).otherwise(0)).alias("retried"),
        ]
        if cfg.proxies is not None:
            # session key varies with rotation_count: a rotated
            # (SessionError) retry gets a fresh egress identity, while
            # plain retries stay sticky; tiers escalate on retry_count
            sx["proxy_col"] = cfg.proxies.proxy_col(
                F.pmod(F.col("url_hash"), F.lit(1 << 31)) + F.col("rotation_count"),
                F.col("retry_count"),
            )
        else:
            sx["proxy_col"] = F.lit(None).cast("string")
        # header identity (got-scraping analog, functions/headers.py):
        # same session key as the proxy pick — fixed across plain
        # retries, redrawn on SessionError rotation
        hdr = headers.header_profile_cols(
            F.pmod(F.col("url_hash"), F.lit(1 << 31))
            + F.col("rotation_count"))
        sx["hdr_id"] = hdr["header_profile_id"].alias("header_profile_id")
        sx["hdr_ua"] = hdr["user_agent"].alias("user_agent")
        # STEP-INDEPENDENT commit-rewrite trees (the step-dependent two —
        # handled_step, order_no — are built per superstep; these four read
        # only _mark/_err/prior columns and never the step)
        sx["rewrite_static"] = {
            "retry_count":
                F.when(F.col("_mark") == "retry", F.col("retry_count") + 1)
                .otherwise(F.col("retry_count")),
            "rotation_count":
                F.when(F.col("_mark") == "rot", F.col("rotation_count") + 1)
                .otherwise(F.col("rotation_count")),
            "forefront":
                F.when(F.col("_mark").isin("retry", "rot"), F.lit(False))
                .otherwise(F.col("forefront")),
            "error":
                F.when(F.col("_mark") == "robots",
                       F.lit("robots-disallowed"))
                .when(F.col("_mark").isin("retry", "rot", "dead"),
                      F.col("_err"))
                .otherwise(F.col("error")),
        }
        sx["rewrite_user_data"] = F.when(
            F.col("_mark").isin("retry", "rot")
            & F.col("_new_ud").isNotNull(),
            F.col("_new_ud"),
        ).otherwise(F.col("user_data"))
        # mark-tag trees for the commit's marks/errs unions
        sx["mark_handled"] = F.lit("handled").alias("_mark")
        sx["mark_retry"] = (
            F.when(F.col("_rot"), F.lit("rot")).otherwise(F.lit("retry"))
            .alias("_mark"))
        sx["mark_dead"] = F.lit("dead").alias("_mark")
        sx["mark_robots"] = F.lit("robots").alias("_mark")
        sx["err_alias"] = F.col("error").alias("_err")
        self._sx = sx
        return sx

    def _corpus_keyed(self, corpus: DataFrame) -> DataFrame:
        """Canonical-hash-keyed projection of the fetch corpus, memoized AND
        persisted per corpus frame: the corpus is constant across the whole
        crawl, but rounds 1-4 rebuilt this expression tree (driver-side
        py4j/Catalyst cost, measured ~0.3 s/superstep at sf0.1) and
        re-canonicalized every corpus URL in EVERY superstep's fetch join.
        One projection, computed once, read from cache thereafter.

        Column-prune discipline unchanged: scheduling never reads bytes
        (decisive at image scale, SURVEY.md §4) — only html for extraction
        plus the redirect target (loadedUrl model, http-crawler.ts:480).
        The memo is keyed by a STRONG frame reference compared with ``is``
        (same rationale as ``_robots_delays_dim``); the superseded cache
        entry is unpersisted when the corpus frame changes, and ``run``
        releases it at crawl end."""
        memo = getattr(self, "_corpus_keyed_memo", None)
        if memo is not None and memo[0] is corpus:
            return memo[1]
        corpus_cols = [
            urls.url_hash(F.col("_ck")).alias("_fetch_hash"),
            F.col("html").alias("_html"),
        ]
        if "redirect_to" in corpus.columns:
            corpus_cols.append(F.col("redirect_to").alias("_redirect"))
        ck = corpus.withColumn(
            "_ck", urls.unique_key(F.col("url"))
        ).select(*corpus_cols)
        if "redirect_to" not in corpus.columns:
            ck = ck.withColumn("_redirect", F.lit(None).cast("string"))
        ck = ck.persist()
        if memo is not None:
            try:
                memo[1].unpersist()
            except Exception:
                pass
        self._corpus_keyed_memo = (corpus, ck)
        return ck

    def release_corpus_cache(self) -> None:
        """Unpersist the memoized fetch-corpus projection (crawl end)."""
        memo = getattr(self, "_corpus_keyed_memo", None)
        if memo is not None:
            try:
                memo[1].unpersist()
            except Exception:
                pass
            self._corpus_keyed_memo = None

    def _robots_delays_dim(self, robots: DataFrame | None) -> DataFrame | None:
        """(host, crawl_delay) dim for this robots frame, or None when no
        host has a Crawl-delay line. Fully distributed (no per-host rows on
        the driver — the round-1 ``crawl_delays_py`` collect scaled O(hosts));
        one emptiness probe per robots frame, memoized."""
        if robots is None:
            return None
        # memo keyed by a STRONG reference compared with `is` — an id()-keyed
        # memo can spuriously hit after the old DataFrame is garbage-collected
        # and CPython reuses its id for a different robots frame
        memo = getattr(self, "_delays_memo", None)
        if memo is None or memo[0] is not robots:
            dim = robots_op.crawl_delays_dim(robots, self.cfg.user_agent)
            self._delays_memo = (robots, dim if not dim.isEmpty() else None)
        return self._delays_memo[1]

    def run_superstep(self, corpus: DataFrame, robots: DataFrame | None = None) -> dict[str, Any]:
        """Execute one superstep; returns its stats. ``corpus`` must carry
        url, html (+ the input_hint payload columns when validate_images).

        Job-count discipline: one superstep runs a fixed handful of Spark
        jobs — ONE combined stats probe (fetch counters + new-request
        buckets + robots kills + pending counts in a single collect), the
        commit write (which also observes the committed pending count —
        ``Observation``, no extra job), and the two observability appends
        (run concurrently). The pending-emptiness check costs a job only
        when the snapshot-id-guarded carry from the previous commit is
        unavailable (first step after construction/resume, or an
        out-of-band frontier mutation). All counters derive from the probe;
        nothing is counted twice.
        """
        cfg = self.cfg
        step = self.step + 1
        # context for the send_request helper (non-navigation exchanges
        # resolved against this superstep's corpus, logged under this step)
        self._last_corpus = corpus
        self._inflight_step = step
        self._check_corpus_unique(corpus)
        stats = {"step": step, "fetched": 0, "handled": 0, "failed": 0,
                 "retried": 0, "robots_dead": 0, "enqueued": 0}

        # per-phase wall timings of the LAST superstep (observability: where
        # the fixed per-step cost goes; read via ``self.last_timings``)
        tm: dict[str, float] = {}
        _t = _time.perf_counter
        self.last_timings = tm
        t0 = _t()

        # pending-emptiness: trust the count carried from the previous
        # commit when the frontier snapshot hasn't moved since (see
        # _pending_carry) — saves one job launch per superstep; any other
        # writer/mutation changes the snapshot id and forces the real probe
        carry = self._pending_carry
        use_carry = (carry is not None
                     and carry[0] == self.frontier.table.current_snapshot_id())
        if use_carry and carry[1] == 0:
            self.step = step
            self._save_state()
            stats["empty"] = True
            return stats
        pending = self.frontier.pending().persist()
        try:
            if not use_carry and pending.isEmpty():
                self.step = step
                self._save_state()
                stats["empty"] = True
                return stats
            tm["pending_probe"] = _t() - t0
            t0 = _t()

            # 1. robots sweep (disallowed pending -> dead)
            host_delays = None
            disallowed = None
            disallowed_buckets: list[int] = []
            if robots is not None:
                allowed, disallowed = robots_op.filter_allowed(pending, robots, cfg.user_agent)
                allowed = allowed.persist()
                disallowed = disallowed.persist()
                # counts folded into the combined stats probe below (one
                # driver round-trip per superstep, not three)
                host_delays = self._robots_delays_dim(robots)
            else:
                allowed = pending

            # 2. politeness + budget selection (optionally keyed by the
            # PSL registrable domain — delayRequest keys by getDomain,
            # basic-crawler.ts:1111-1138)
            domain_col = None
            candidates = allowed
            if cfg.starvation_boost_steps is not None:
                # lift starved normal-band rows above EVERY forefront row,
                # oldest first: order_no - (2*(max_steps+2))<<32 is more
                # negative than any forefront magnitude ((step+1)<<32), and
                # ascending order then puts the smallest enqueued step
                # first. Selection-time rewrite only — the commit path
                # derives from the table read, never from this frame.
                lift = (2 * (cfg.max_steps + 2)) << STEP_SHIFT
                starved = (
                    (F.col("order_no") > 0)
                    & (F.lit(step) - F.col("enqueued_step")
                       > cfg.starvation_boost_steps)
                )
                candidates = candidates.withColumn(
                    "order_no",
                    F.when(starved, F.col("order_no") - F.lit(lift))
                    .otherwise(F.col("order_no")))
            if cfg.politeness.key_by_domain:
                from crawlee_spark.functions import psl

                # build on `candidates`, not `allowed` — rebuilding from
                # `allowed` would silently drop the starvation-boost
                # order_no rewrite above (review r3 finding #1)
                candidates = psl.attach_registrable_domain(
                    candidates, "host", "_domain")
                domain_col = "_domain"
            fetch_set = pol.select_fetch_set(
                candidates, step, cfg.politeness,
                politeness_state=self._politeness_df(),
                host_delays=host_delays,
                handled_so_far=self.handled_count,
                domain_col=domain_col,
            )

            # pre-navigation hooks (http-crawler.ts:299 `preNavigationHooks`):
            # run over the selected batch before any fetch work; a hook may
            # set `skip_navigation` (request.ts skipNavigation — handled
            # without navigating, requestHandler sees no response)
            for hook in cfg.pre_navigation_hooks:
                fetch_set = hook(fetch_set)
            if "skip_navigation" not in fetch_set.columns:
                fetch_set = fetch_set.withColumn("skip_navigation", F.lit(False))
            else:
                fetch_set = fetch_set.withColumn(
                    "skip_navigation",
                    F.coalesce(F.col("skip_navigation"), F.lit(False)))

            # 3. deterministic fetch: canonical-hash join against the corpus.
            corpus_keyed = self._corpus_keyed(corpus)
            # the corpus join key is the FRAGMENT-STRIPPED canonical-URL
            # hash recomputed from the url, ALWAYS — uniqueKey is the
            # DEDUP identity, the fetch goes to request.url (the reference
            # fetches url no matter what uniqueKey says), and fragments
            # are never sent to the server (RFC 3986 §3.5). Relying on
            # url_hash would break three configurations: keep_fragment
            # (fragment-bearing hash ≠ corpus key), extended unique keys
            # (hash covers method+payload), and custom per-request
            # unique_key overrides (hash of the custom string).
            sx = self._static_exprs()
            fetch_keyed = fetch_set.withColumn("_fetch_hash", sx["fetch_hash"])
            fetched = fetch_keyed.join(corpus_keyed, on="_fetch_hash", how="left")
            fetched = fetched.withColumn(
                "_loaded", F.coalesce(F.col("_redirect"), F.col("url"))
            )
            # post-navigation hooks (http-crawler.ts:300): may rewrite
            # `_html` / `_loaded` before status classification + extraction.
            # Hooks see every fetched row; they must preserve nulls (missing
            # pages) and should no-op on `skip_navigation` rows — the
            # simulator mirror only invokes them on real navigations.
            for hook in cfg.post_navigation_hooks:
                fetched = hook(fetched)
            # status-class table (StatusModelConf docstring has the map);
            # trees memoized per engine in _static_exprs. Derived columns
            # are layered in THREE projections, not six withColumns — each
            # withColumn re-analyzes the whole fetch-join plan (round-5
            # profile: ~7 ms per call on this tree); a projection may only
            # reference columns of the PREVIOUS layer, which forces the
            # split (_err reads _blocked/_status_code; _rot/_success read
            # _err). SessionError (_rot) retries on the ROTATION budget and
            # leaves retry_count untouched (basic-crawler.ts:1435-1452).
            if cfg.detect_blocked:
                from crawlee_spark.functions.text import is_blocked_page

                blocked_col = is_blocked_page(F.col("_html"))
            else:
                blocked_col = F.lit(False)
            fetched = fetched.withColumns(
                {"_blocked": blocked_col, "_status_code": sx["status_code"]})
            fetched = fetched.withColumn("_err", sx["err_col"])
            can_retry = sx["can_retry"]
            fetched = fetched.withColumns(
                {"_rot": F.coalesce(sx["rot_col"], F.lit(False)),
                 "_success": F.col("_err").isNull()}).persist()
            successes = fetched.filter(F.col("_success"))
            failures = fetched.filter(~F.col("_success"))

            # 4. extract + enqueueLinks on successes (stateless stage — the
            # one place hot-host salting is allowed, SURVEY.md §7(c));
            # loaded_url feeds relative-href resolution + same-domain base
            # resolution (enqueue_links.ts:394-430). Built BEFORE the stats
            # probe so its bucket counts ride the same job.
            pages = successes.filter(~F.col("skip_navigation")).select(
                "url", F.col("_loaded").alias("loaded_url"),
                F.col("_html").alias("html"), "depth",
                "host", "url_hash")
            if cfg.parse_salt > 0:
                from crawlee_spark.operators.skew import salted_repartition

                pages = salted_repartition(pages, "host", cfg.parse_salt)
            pages = pages.select("url", "loaded_url", "html", "depth")
            links = enqueue_links(pages, cfg.enqueue)
            new_reqs = make_requests(
                links, step, cfg.num_buckets, cfg.keep_fragment,
                use_extended_unique_key=cfg.use_extended_unique_key,
            ).persist()

            # ONE combined probe job yields every per-superstep scalar the
            # driver needs — fetch counters, new-request count, robots-kill
            # count, and the three touched-bucket sets (each bounded by
            # num_buckets, a CONFIG constant, never data-sized). Rounds 1-4
            # ran three separate driver round-trips per superstep (robots
            # counts, fetch agg, new-bucket counts); at toy per-step data
            # sizes the job launches WERE the crawl latency (VERDICT r4
            # item #7). Per-host rows are still never collected: the
            # metrics table is written distributively below and politeness
            # advances set-based, so driver memory stays O(1) in host count.
            _BC_T = "array<struct<bucket:int,n:bigint>>"
            probe_memo = sx.setdefault("probe_row_memo", {})

            def _probe_row(src: str, frame, has_bucket_counts: bool = False,
                           has_pol: bool = False):
                key = (src, has_bucket_counts, has_pol)
                sel = probe_memo.get(key)
                if sel is None:
                    bc = (F.col("bucket_counts") if has_bucket_counts
                          else F.lit(None).cast(_BC_T))
                    pb = (F.col("pol_buckets") if has_pol
                          else F.lit(None).cast("array<int>"))
                    sel = [
                        F.lit(src).alias("_src"),
                        F.col("handled").cast("long").alias("handled"),
                        F.col("failed").cast("long").alias("failed"),
                        F.col("retried").cast("long").alias("retried"),
                        F.col("buckets"),
                        bc.alias("bucket_counts"),
                        pb.alias("pol_buckets"),
                    ]
                    probe_memo[key] = sel
                return frame.select(*sel)

            # pending branch: total + per-bucket pending counts over the
            # persisted pending frame (bounded by num_buckets rows) — feeds
            # the post-commit pending-count carry that replaces the next
            # superstep's emptiness-probe job
            pend_aggs = sx.get("pend_aggs")
            if pend_aggs is None:
                pend_aggs = {
                    "count": F.count(F.lit(1)).alias("n"),
                    "rollup": [
                        F.sum("n").cast("long").alias("handled"),
                        F.lit(0).cast("long").alias("failed"),
                        F.lit(0).cast("long").alias("retried"),
                        F.collect_set("bucket").alias("buckets"),
                        F.collect_list(
                            F.struct(
                                F.col("bucket").cast("int").alias("bucket"),
                                F.col("n").cast("long").alias("n"))
                        ).cast(_BC_T).alias("bucket_counts"),
                    ],
                }
                sx["pend_aggs"] = pend_aggs
            pend_counts = (
                pending.groupBy("bucket")
                .agg(pend_aggs["count"])
                .agg(*pend_aggs["rollup"])
            )
            probe = _probe_row("fetch", fetched.agg(*sx["probe_fetch"]),
                               has_pol=cfg.politeness.key_by_domain) \
                .unionByName(_probe_row("new", new_reqs.agg(*sx["probe_count"]))) \
                .unionByName(_probe_row("pending", pend_counts,
                                        has_bucket_counts=True))
            if disallowed is not None:
                probe = probe.unionByName(
                    _probe_row("robots", disallowed.agg(*sx["probe_count"])))
            tm["plan_build"] = _t() - t0
            t0 = _t()
            rows = {r["_src"]: r for r in probe.collect()}
            tm["stats_probe"] = _t() - t0
            t0 = _t()
            agg = rows["fetch"]
            n_handled = int(agg["handled"] or 0)
            n_retried = int(agg["retried"] or 0)
            n_dead = int(agg["failed"] or 0)
            fetched_buckets = [int(b) for b in (agg["buckets"] or [])]
            # host-key politeness buckets == frontier buckets (bucket IS
            # host_hash(host)); domain keys add their own hashed buckets
            pol_buckets = sorted(
                set(fetched_buckets)
                | {int(b) for b in (agg["pol_buckets"] or [])})
            n_fetch = n_handled + n_retried + n_dead
            stats.update(fetched=n_fetch, handled=n_handled,
                         retried=n_retried, failed=n_dead)
            stats["enqueued"] = int(rows["new"]["handled"] or 0)
            nb_buckets = [int(b) for b in (rows["new"]["buckets"] or [])]
            if disallowed is not None:
                stats["robots_dead"] = int(rows["robots"]["handled"] or 0)
                disallowed_buckets = [int(b) for b in
                                      (rows["robots"]["buckets"] or [])]
            pend_total = int(rows["pending"]["handled"] or 0)
            pend_by_bucket = {int(e["bucket"]): int(e["n"])
                              for e in (rows["pending"]["bucket_counts"] or [])}

            if n_fetch == 0 and (stats["robots_dead"] == 0):
                # no commit: the snapshot id is unchanged, so the probed
                # total stays valid for the next superstep's carry
                self._pending_carry = (
                    self.frontier.table.current_snapshot_id(), pend_total)
                self.step = step
                self._save_state()
                return stats

            # ErrorSnapshotter (error_snapshotter.ts): page capture for the
            # FIRST occurrence of each unique error signature — one grouped
            # min_by per superstep, anti-joined against already-captured
            # signatures (the table IS the seen-set; O(unique signatures))
            snap_batch = None
            if cfg.save_error_snapshots:
                from crawlee_spark.operators.sessions import error_signature

                snaps = failures.select(
                    error_signature(F.col("_err")).alias("signature"),
                    F.col("_err").alias("error"),
                    "url", "url_hash",
                    F.col("_status_code").alias("status_code"),
                    F.substring(F.coalesce(F.col("_html"), F.lit("")),
                                1, 4096).alias("html_snapshot"),
                )
                snap_batch = snaps.groupBy("signature").agg(
                    F.min_by(
                        F.struct("error", "url", "url_hash", "status_code",
                                 "html_snapshot"),
                        F.col("url_hash"),
                    ).alias("s")
                ).select("signature", "s.error", "s.url", "s.url_hash",
                         "s.status_code", "s.html_snapshot")
                # APPENDED AFTER the frontier commit (torn-superstep heal
                # invariant: the frontier commits first — see stage 6b)

            # 5. failure split: retry (rotation- or retry-budget) vs dead
            retries = failures.filter(can_retry).select(
                "url_hash", F.col("_err").alias("error"), "_rot")
            deads = failures.filter(~can_retry).select(
                "url_hash", F.col("_err").alias("error"))

            # errorHandler: may rewrite user_data on the retried rows
            # before they re-enter the frontier (basic-crawler.ts:151-158)
            ud_updates = None
            if cfg.error_handler is not None:
                handler_in = failures.filter(can_retry).select(
                    "url", "url_hash", "host", "depth", "retry_count",
                    "rotation_count", F.col("_err").alias("error"),
                    "user_data",
                )
                ud_updates = cfg.error_handler(handler_in).select(
                    "url_hash", F.col("user_data").alias("_new_ud")
                )
            # failedRequestHandler: dead rows -> dead-letter table
            # (basic-crawler.ts:160-167); the APPEND is deferred until
            # after the frontier commit (stage 6b) — appending first would
            # open a torn window the heal cannot detect (a crash between
            # this append and the commit leaves the frontier NOT ahead, so
            # the re-run would append the same dead rows twice)
            handled_dead = None
            if cfg.failed_request_handler is not None:
                dead_in = failures.filter(~can_retry).select(
                    F.lit(step).alias("step"), "url", "url_hash", "host",
                    "depth", "retry_count", F.col("_err").alias("error"),
                    "user_data",
                )
                handled_dead = cfg.failed_request_handler(dead_in)

            # 6. ONE combined frontier commit for all touched buckets
            handled_keys = successes.select("url_hash")
            touched = sorted(
                set(fetched_buckets) | set(nb_buckets) | set(disallowed_buckets)
            )
            existing = self.frontier.read(buckets=touched)

            marks = handled_keys.select("url_hash", sx["mark_handled"])
            marks = marks.unionByName(
                retries.select("url_hash", sx["mark_retry"])
            ).unionByName(deads.select("url_hash", sx["mark_dead"]))
            if disallowed is not None:
                marks = marks.unionByName(
                    disallowed.select("url_hash", sx["mark_robots"])
                )
            errs = retries.select("url_hash", sx["err_alias"]).unionByName(
                deads.select("url_hash", sx["err_alias"])
            )

            new_order = order_no_expr(step, F.lit(False)).cast("long")
            updated = (
                existing.join(marks, on="url_hash", how="left")
                .join(errs, on="url_hash", how="left")
            )
            # all mark-driven rewrites in ONE projection (each rewrite reads
            # only pre-rewrite columns, so a single withColumns is exact and
            # avoids re-analyzing the join plan per column — round-5
            # profile). SessionError rotations are budgeted separately and
            # do NOT consume the retry budget (basic-crawler.ts:1435-1452).
            rewrites = {
                # the two step-embedding trees, built per superstep; the
                # step-independent four come memoized from _static_exprs
                "handled_step":
                    F.when(F.col("_mark").isin("handled", "dead", "robots"),
                           F.lit(step))
                    .otherwise(F.col("handled_step")),
                "order_no":
                    F.when(F.col("_mark").isin("handled", "dead", "robots"),
                           F.lit(None).cast("long"))
                    .when(F.col("_mark").isin("retry", "rot"), new_order)
                    .otherwise(F.col("order_no")),
                **sx["rewrite_static"],
            }
            drop_cols = ["_mark", "_err"]
            if ud_updates is not None:
                updated = updated.join(ud_updates, on="url_hash", how="left")
                rewrites["user_data"] = sx["rewrite_user_data"]
                drop_cols.append("_new_ud")
            updated = updated.withColumns(rewrites).drop(*drop_cols)
            if self.urlseen is not None and self.urlseen.has_shards():
                # store-partitioned split: the mark UDF ships a
                # StoreShardRef (path + per-bucket scalars); each task loads
                # only its buckets' shard files (SCALE.md §url_seen)
                self._ensure_urlseen_fresh()
                fresh = self.urlseen.merge(existing, new_reqs)
            else:
                fresh = merge_new_requests(existing, new_reqs)
            new_content = updated.unionByName(fresh.select(*updated.columns))
            # observe the committed pending rows during the write itself
            # (no extra job): pending-after-commit =
            #   probed total − probed pending in touched buckets
            #   + observed pending in the rewritten (touched) content.
            # Carried to the next superstep to replace its emptiness probe.
            pend_obs = Observation()
            new_content = new_content.observe(
                pend_obs,
                F.sum(F.col("order_no").isNotNull().cast("long"))
                .alias("pending_after"))

            tm["commit_plan"] = _t() - t0
            t0 = _t()
            commit_sid = self.frontier.table.commit_buckets(
                new_content, "superstep",
                {"step": step, "client": self.frontier.client_id,
                 **{k: v for k, v in stats.items() if k != "step"}},
            )
            pend_touched_before = sum(
                pend_by_bucket.get(b, 0) for b in touched)
            pend_after = int(pend_obs.get["pending_after"] or 0)
            self._pending_carry = (
                commit_sid, pend_total - pend_touched_before + pend_after)
            tm["frontier_commit"] = _t() - t0
            t0 = _t()
            refresh_fn = None
            if self.urlseen is not None:
                snap = self.frontier.table.current_snapshot_id()
                if self.urlseen.has_shards():
                    # refresh shards for the buckets this commit rewrote,
                    # stamped with the snapshot they reflect
                    # (crash-consistency marker). Deferred into the
                    # post-commit concurrent pool below: the refresh only
                    # touches urlseen state + shard files, so it overlaps
                    # the observability appends; a crash before it lands is
                    # caught by the stamp check (_ensure_urlseen_fresh).
                    def refresh_fn(snap=snap):
                        self.urlseen.refresh_buckets(
                            self.frontier.read(buckets=touched)
                            .select("bucket", "url_hash"),
                            frontier_snapshot=snap,
                        )
                else:
                    # empty meta here means the persisted shard state was
                    # missing/unreadable at resume (load() returned False) —
                    # a touched-buckets refresh would stamp a PARTIAL shard
                    # set as fresh, and the UNCOVERED buckets' keys would
                    # ride the definitely-unseen fast path around the exact
                    # anti-join backstop (duplicate inserts). Rebuild from
                    # the full frontier instead (ShardStoreBase coverage
                    # invariant).
                    self.urlseen.rebuild(
                        self.frontier.read().select("bucket", "url_hash"),
                        frontier_snapshot=snap,
                    )

            # 6b. dead-letter + error-snapshot appends — strictly AFTER the
            # frontier commit so every pre-commit crash leaves the frontier
            # NOT ahead and re-runs cleanly, and every post-commit crash IS
            # detected by the torn-superstep heal and rolled back
            if handled_dead is not None:
                # append unconditionally: an isEmpty() probe would run the
                # user handler's whole plan once for the probe and again
                # for the write
                self.failed_requests.append(
                    handled_dead, {"step": step}, coalesce=2)
            if snap_batch is not None:
                if self.error_snapshots.exists():
                    seen_sigs = self.error_snapshots.read() \
                        .select("signature").distinct()
                    snap_batch = snap_batch.join(
                        seen_sigs, "signature", "left_anti")
                # pin the (signature-sized) batch so the emptiness probe and
                # the append share ONE evaluation of the regex/agg/anti-join
                # plan; skip the append when no NEW signature appeared
                snap_batch = snap_batch.localCheckpoint(eager=True)
                if not snap_batch.isEmpty():
                    self.error_snapshots.append(
                        snap_batch.withColumn("step", F.lit(step)),
                        {"step": step}, coalesce=1)

            # 7. fetch log + metrics (per-partition metrics per north_rule;
            # proxy/header identity trees memoized in _static_exprs)
            log = fetched.select(
                F.lit(step).alias("step"), "url", "unique_key", "url_hash", "host",
                "bucket", "order_no", "depth", "retry_count",
                F.coalesce(F.col("_err"), F.lit("ok")).alias("status"),
                F.col("_status_code").alias("status_code"),
                F.col("_loaded").alias("loaded_url"),
                sx["proxy_col"].alias("proxy_url"),
                sx["hdr_id"],
                sx["hdr_ua"],
            )
            # per-(bucket, host) metrics written DISTRIBUTIVELY — at 10^6+
            # hosts these rows never touch the driver (north_rule
            # per-partition metrics; round 1 collected them)
            m = fetched.groupBy("bucket", "host").agg(*sx["metrics_aggs"]).select(
                F.lit(step).alias("step"), "bucket", "host",
                "handled", "failed", "retried",
                F.lit(0).cast("long").alias("robots_dead"),
            )
            if disallowed is not None and stats["robots_dead"]:
                # per-host robots kills belong in the metrics table too —
                # the scalar stats alone would leave every row's
                # robots_dead at 0
                m = m.unionByName(
                    disallowed.groupBy("bucket", "host")
                    .agg(F.count(F.lit(1)).alias("robots_dead"))
                    .select(
                        F.lit(step).alias("step"), "bucket", "host",
                        F.lit(0).cast("long").alias("handled"),
                        F.lit(0).cast("long").alias("failed"),
                        F.lit(0).cast("long").alias("retried"),
                        F.col("robots_dead").cast("long"),
                    )
                )
            tm["post_commit"] = _t() - t0
            t0 = _t()
            # the two observability appends go to DIFFERENT AppendTables
            # (disjoint manifest state) and both source from the persisted
            # `fetched` cache, so they run concurrently — two small write
            # jobs overlap their launch latency instead of paying it twice.
            # Crash-safety is unchanged: both sit inside the post-commit
            # torn window, and the heal rolls EVERY table back to the saved
            # checkpoint regardless of which append (if either) landed.
            log_cols = [c.strip().split(" ")[0]
                        for c in FETCH_LOG_SCHEMA.split(",")]
            with ThreadPoolExecutor(max_workers=3) as ex:
                futures = {
                    "fetch_log": ex.submit(self.fetch_log.append,
                                           log.select(*log_cols),
                                           {"step": step}, 4),
                    "metrics": ex.submit(self.metrics.append, m,
                                         {"step": step}, 4),
                }
                if refresh_fn is not None:
                    futures["urlseen_refresh"] = ex.submit(refresh_fn)
                # drain EVERY future before raising: a sequential
                # .result() chain would mask the later failures (e.g. a
                # shared-FS blip failing both the log append and the shard
                # refresh would surface only the first), leaving no trace
                # of the others for whoever debugs the crash
                errors = []
                for fname, fut in futures.items():
                    try:
                        fut.result()
                    except Exception as e:  # noqa: BLE001 — re-raised below
                        errors.append((fname, e))
                if errors:
                    for fname, e in errors[1:]:
                        logging.getLogger(__name__).error(
                            "post-commit %s also failed: %s", fname, e)
                    raise errors[0][1]
            tm["logs_append"] = _t() - t0
            t0 = _t()

            # 8. image validation results (input_hint invariant) per fetch
            if cfg.validate_images:
                from crawlee_spark.functions.images import validate_pages

                payload = corpus.withColumn("_ck", urls.unique_key(F.col("url"))).select(
                    urls.url_hash(F.col("_ck")).alias("url_hash"),
                    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                )
                # join on the CANONICAL-URL hash (_fetch_hash), never the
                # frontier url_hash: under use_extended_unique_key the
                # frontier hash covers method+payload and would match
                # nothing on the payload side
                # skip_navigation rows never issued an HTTP request: no
                # bytes arrived, so nothing to validate (matches the
                # no-extraction / no-session-charge treatment above)
                fetched_payload = successes.filter(
                    ~F.col("skip_navigation")
                ).select(
                    F.col("_fetch_hash").alias("url_hash")
                ).join(payload, "url_hash")
                v = validate_pages(fetched_payload, seed=cfg.seed).withColumn(
                    "step", F.lit(step)
                )
                self.results.append(v, {"step": step}, coalesce=4)

            # 8c. router/label dispatch over the successful fetches
            # (operators/router.py; reference router.ts:32-55) — handler
            # outputs append to their own router_results table
            if cfg.router is not None:
                routed_src = successes.select(
                    "url", F.col("_loaded").alias("loaded_url"),
                    F.col("_html").alias("html"), "depth", "label", "user_data",
                )
                routed = cfg.router(routed_src, strict=cfg.router_strict)
                if routed is not None:
                    # unconditional append: isEmpty() would evaluate every
                    # handler transform twice per superstep
                    self.router_results.append(
                        routed.withColumn("step", F.lit(step)),
                        {"step": step, "router": True}, coalesce=4,
                    )

            # 8b. session pool fold (observability state; deterministic
            # session pick = pmod(url_hash, per_bucket); status classes map
            # onto the reference's code semantics — blocked retires)
            if cfg.track_sessions:
                self._update_sessions(fetched, step)

            # 9. politeness advance — set-based over the snapshot dim
            # (operators/politeness.py::advance_politeness); no host rows on
            # the driver, state persists + resumes like the frontier
            self._advance_politeness(fetched, step, host_delays,
                                     pol_buckets=pol_buckets)

            self.handled_count += n_handled + n_dead
            self.step = step
            self._save_state()
            tm["tail"] = _t() - t0
            return stats
        finally:
            pending.unpersist()
            for df in ("allowed", "disallowed", "fetch_set", "fetched", "new_reqs"):
                obj = locals().get(df)
                try:
                    if obj is not None and hasattr(obj, "unpersist"):
                        obj.unpersist()
                except Exception:
                    pass
            # the URL-seen split persists its marked frame (one mark-UDF
            # pass per merge); its consumers are all evaluated by the
            # frontier commit above, so release it here — otherwise every
            # superstep leaks one cached DataFrame for the app's lifetime
            if self.urlseen is not None:
                self.urlseen.release_pinned()

    def _update_sessions(self, fetched: DataFrame, step: int) -> None:
        from crawlee_spark.operators import sessions as sess

        per_bucket = self.cfg.sessions_per_bucket
        if self.sessions.exists():
            pool = self.sessions.read()
        else:
            pool = sess.create_pool(self.spark, self.cfg.num_buckets, per_bucket)
            if self.cfg.create_session_function is not None:
                # createSessionFunction (session_pool.ts:50): user hook
                # shapes the initial pool rows (same schema contract)
                pool = self.cfg.create_session_function(pool)
        status = (
            F.when(F.col("_status_code") == 0, F.lit(404))        # no response
            .when(F.col("_err") == "fetch-failed", F.lit(500))    # network error
            .when(F.col("_blocked"), F.lit(403))                  # content block
            .otherwise(F.col("_status_code"))
        )
        # skip_navigation rows never issued an HTTP request (skipNavigation,
        # request.ts) — the reference's session sees no usage/error for them,
        # so they must not charge error_score or usage here either
        charged = fetched
        if "skip_navigation" in fetched.columns:
            charged = fetched.filter(~F.coalesce(F.col("skip_navigation"), F.lit(False)))
        # pick over USABLE sessions only (assign_sessions: the reference
        # never hands a retired/exhausted session to a request) — a bare
        # pmod over all slots would keep charging unusable sessions
        assigned = sess.assign_sessions(
            charged.select("bucket", "url_hash", status.alias("status_code")),
            pool,
        )
        results = assigned.filter(F.col("session_id").isNotNull()).select(
            "bucket", "session_id", "status_code"
        )
        new_pool = sess.update_pool(pool, results, step, per_bucket)
        # set-based commit: the pool is a full-rewrite dim like politeness
        # (state rows mutate in place each superstep, so buckets must not
        # inherit); nothing is collected to the driver
        if not self.sessions.exists():
            SnapshotTable.create(self.spark, self.sessions.root, new_pool,
                                 num_buckets=self.cfg.num_buckets,
                                 summary={"step": step})
        else:
            self.sessions._commit_full(new_pool, self.cfg.num_buckets,
                                       "sessions", {"step": step})

    def session_state(self) -> list[dict]:
        """Inspection/test helper: the pool as sorted dicts. Collects the
        (buckets x per_bucket)-row dim — fine for observability, never part
        of the superstep."""
        if not self.sessions.exists():
            return []
        cols = ["bucket", "session_id", "error_score", "usage_count",
                "created_step", "retired"]
        rows = self.sessions.read().select(*cols).collect()
        return sorted(
            (dict(zip(cols, r)) for r in rows),
            key=lambda d: (d["bucket"], d["session_id"]),
        )

    # -- the crawl loop -----------------------------------------------------

    def request_interrupt(self, kind: str = "migrating") -> None:
        """Ask the run loop to stop cleanly after the CURRENT superstep's
        commit — the platform's migrating/aborting signal
        (event_manager.ts:42-46). The just-committed superstep is a full
        checkpoint, so ``CrawlEngine.resume`` continues bit-identically."""
        if kind not in ("migrating", "aborting"):
            raise ValueError(f"unknown interrupt kind {kind!r}")
        self._interrupt = kind

    def _emit(self, event: str, payload: dict[str, Any]) -> None:
        if self.cfg.events is not None:
            self.cfg.events.emit(event, payload)

    def send_request(self, requests: DataFrame,
                     url_col: str = "url") -> DataFrame:
        """Deterministic mid-handler HTTP analog of the ``sendRequest``
        context helper (``basic-crawler.ts:1206-1224``): resolve arbitrary
        URLs against the SAME fragment-stripped canonical-hash corpus join
        as navigation, with the status model applied and NO retries (the
        reference pins ``gotScraping`` ``retry: {limit: 0}``), no link
        extraction, and nothing enqueued. Each call is recorded in the
        fetch log with ``skip_navigation``-style semantics: a logged
        non-navigation exchange, distinguishable by ``order_no IS NULL``
        (navigation rows always carry their frontier order_no).

        Call from a router handler (stage 8c runs AFTER the superstep's
        frontier commit, so the log append keeps the torn-superstep-heal
        invariant) or after ``run``. Returns (url, loaded_url,
        status_code, html, status) for the caller to join/consume.

        Scale shape: identical to navigation — one hash equi-join against
        the column-pruned corpus keyed on the canonical-URL hash; the
        request side is a handler-derived batch (bounded by the superstep's
        fetch set), so the join inherits the corpus join's broadcast/AQE
        strategy. Nothing lands on the driver."""
        corpus = getattr(self, "_last_corpus", None)
        if corpus is None:
            raise RuntimeError(
                "send_request needs a corpus: call during run()/run_superstep "
                "(router handlers) or after a run on this engine")
        cfg = self.cfg
        # the SAME memoized+persisted projection navigation joins against
        # (_corpus_keyed) — one keying definition, and a handler calling
        # send_request every superstep reads the cache instead of
        # re-canonicalizing the whole corpus per call
        corpus_keyed = self._corpus_keyed(corpus)

        # two keys, mirroring navigation exactly: the CORPUS join always
        # goes over the fragment-stripped canonical hash (fragments never
        # reach the server), while the request IDENTITY — what the status
        # and failure models key on, and what lands in the log — follows
        # the engine's uniqueKey rules (keep_fragment / extended form), so
        # the same URL gets the SAME deterministic outcome whether it is
        # navigated or side-requested under every config
        if cfg.use_extended_unique_key:
            ident = urls.extended_unique_key(
                F.col(url_col), keep_fragment=cfg.keep_fragment)
        else:
            ident = urls.unique_key(F.col(url_col),
                                    keep_fragment=cfg.keep_fragment)
        join_key = urls.url_hash(urls.unique_key(F.col(url_col)))
        req = requests.select(
            F.col(url_col).alias("url"),
            ident.alias("unique_key"),
            urls.url_hash(ident).alias("url_hash"),
            join_key.alias("_join_hash"),
            # same parser as the frontier rows (strips userinfo/port) —
            # NOT a regexp over the canonical string
            urls.host_of(F.col(url_col)).alias("host"),
        )
        got = req.join(corpus_keyed,
                       req["_join_hash"] == corpus_keyed["_fetch_hash"],
                       "left")
        got = got.withColumn("_loaded", F.coalesce(F.col("_redirect"), F.col("url")))
        sm = cfg.status
        got = got.withColumn(
            "_status_code",
            F.when(F.col("_html").isNull(), F.lit(0)).otherwise(sm.status_col()),
        )
        # single attempt (retry limit 0): the failure model's attempt-0
        # transient failures and dead hosts both surface as fetch-failed
        attempt0_ok = F.lit(True)
        if cfg.failures.dead_mod:
            attempt0_ok = attempt0_ok & (
                F.pmod(F.col("url_hash"), F.lit(cfg.failures.dead_mod)) != 0)
        if cfg.failures.fail_mod and cfg.failures.fail_attempts > 0:
            attempt0_ok = attempt0_ok & (
                F.pmod(F.col("url_hash"), F.lit(cfg.failures.fail_mod)) != 0)
        status = (
            F.when(F.col("_html").isNull(), F.lit("404-not-found"))
            .when(~attempt0_ok, F.lit("fetch-failed"))
            .otherwise(F.lit("ok"))
        )
        got = got.withColumn("_sr_status", status)

        step = int(getattr(self, "_inflight_step", None) or self.step)
        log = got.select(
            F.lit(step).alias("step"), "url", "unique_key", "url_hash",
            "host",
            urls.host_hash(F.col("host"), cfg.num_buckets).alias("bucket"),
            F.lit(None).cast("long").alias("order_no"),
            F.lit(None).cast("int").alias("depth"),
            F.lit(0).cast("int").alias("retry_count"),
            F.col("_sr_status").alias("status"),
            F.col("_status_code").alias("status_code"),
            F.col("_loaded").alias("loaded_url"),
            F.lit(None).cast("string").alias("proxy_url"),
            F.lit(None).cast("int").alias("header_profile_id"),
            F.lit(None).cast("string").alias("user_agent"),
        )
        self.fetch_log.append(log, {"step": step, "send_request": True},
                              coalesce=2)
        return got.select(
            "url", F.col("_loaded").alias("loaded_url"),
            F.col("_status_code").alias("status_code"),
            F.col("_html").alias("html"),
            F.col("_sr_status").alias("status"),
        )

    def run(self, corpus: DataFrame, robots: DataFrame | None = None,
            seeds: DataFrame | None = None) -> dict[str, Any]:
        cfg = self.cfg
        if seeds is not None:
            self.add_seeds(seeds)
        totals = {"supersteps": 0, "handled": 0, "failed": 0, "retried": 0,
                  "robots_dead": 0, "enqueued": 0}
        while self.step < cfg.max_steps:
            if cfg.politeness.max_requests_per_crawl is not None and \
               self.handled_count >= cfg.politeness.max_requests_per_crawl:
                break
            if cfg.is_finished_function is not None and \
                    cfg.is_finished_function(self):
                break
            st = self.run_superstep(corpus, robots)
            # the superstep's tables + scalar state are committed: this is
            # the reference's persistState tick (listeners may call
            # request_interrupt here — e.g. a platform migration signal)
            self._emit("persistState", {"isMigrating":
                                        self._interrupt == "migrating",
                                        "step": self.step})
            # systemInfo (event_manager.ts enum; the reference's Snapshotter
            # feeds on this): the superstep's load counters — the
            # time-weighted overload view lives in operators/autoscaling.py
            self._emit("systemInfo", {
                "step": self.step,
                **{k: st.get(k, 0) for k in
                   ("fetched", "handled", "failed", "retried")},
            })
            if not st.get("empty"):
                totals["supersteps"] += 1
                for k in ("handled", "failed", "retried", "robots_dead",
                          "enqueued"):
                    totals[k] += st[k]
            if self._interrupt is not None:
                # stop AFTER the commit: resume picks up from this
                # superstep. Checked BEFORE the empty-break so an interrupt
                # requested on an empty tick is still emitted, recorded,
                # and cleared (never left stale for a later run())
                self._emit(self._interrupt, {"step": self.step})
                totals["interrupted"] = self._interrupt
                self._interrupt = None
                break
            if st.get("empty"):
                break
            if st["fetched"] == 0 and st["robots_dead"] == 0:
                # nothing eligible: keep ticking only while a politeness
                # window is still ahead of us; else no progress is possible
                if self.step > self._max_politeness_wait():
                    break
        totals["steps"] = self.step
        totals["handled_count"] = self.handled_count
        self.release_corpus_cache()
        self._emit("exit", {"step": self.step})
        return totals

    # -- outputs ------------------------------------------------------------

    def crawl_order(self) -> list[tuple[int, str]]:
        """(step, unique_key) of successful fetches in canonical order —
        directly comparable to SimResult.crawl_order."""
        if not self.fetch_log.exists():
            return []
        rows = (
            self.fetch_log.read()
            # order_no NULL rows are send_request side exchanges, not
            # navigations — they never participate in crawl ordering
            .filter((F.col("status") == "ok") & F.col("order_no").isNotNull())
            .select("step", "unique_key", "order_no", "depth", "url_hash")
            .orderBy("step", "order_no", "depth", "url_hash")
            .collect()
        )
        return [(r["step"], r["unique_key"]) for r in rows]

    def url_seen(self) -> set[str]:
        return {r["unique_key"] for r in self.frontier.read().select("unique_key").collect()}

    def statistics(self, persist: bool = False) -> dict[str, Any]:
        """``Statistics.calculate()`` analog (``packages/core/src/crawlers/
        statistics.ts:222-266``), computed set-based from the fetch log.

        The reference's wall-clock fields map onto this engine's logical
        step clock (the determinism spec): durations become ATTEMPTS per
        request (1 = finished first try), ``crawlerRuntimeMillis`` becomes
        ``crawler_runtime_steps``, and per-minute rates become per-step
        rates. ``retry_histogram[i]`` = requests whose FINAL attempt
        carried ``retry_count == i`` (statistics.ts requestRetryHistogram).

        One grouped aggregate per request + one tiny histogram aggregate;
        the only driver-side rows are the histogram (≤ max_retries + 1
        entries) and the scalar summary. ``persist=True`` writes the dict
        under ``SDK_CRAWLER_STATISTICS_0`` in the workdir's KeyValueStore
        (statistics.ts persistState contract).

        End-of-crawl semantics: a request with attempts but no ``ok`` row
        counts as failed — exact once the crawl has drained (the usual
        call site); mid-crawl it includes still-retrying requests in the
        failed bucket (the reference's counters, incremented only at
        terminal outcomes, would not).
        """
        stats: dict[str, Any] = {
            "requests_finished": 0, "requests_failed": 0,
            "requests_total": 0, "retry_histogram": [],
            "request_avg_finished_attempts": None,
            "request_avg_failed_attempts": None,
            "requests_finished_per_step": 0.0,
            "crawler_runtime_steps": self.step,
        }
        if self.fetch_log.exists():
            # navigations only: send_request side exchanges (order_no NULL)
            # are outside the reference's Statistics counters
            log = self.fetch_log.read().filter(F.col("order_no").isNotNull())
            # final attempt per request: max (step, order-of-attempt) row.
            # 'ok' rows are terminal; a request is FAILED iff it never got
            # an ok row (dead letters stop appearing in later steps).
            # persisted: the scalar aggregate and the histogram both read
            # this requests-sized dim — without the pin each would re-scan
            # and re-shuffle the full attempt log
            per_req = log.groupBy("url_hash").agg(
                F.count(F.lit(1)).alias("attempts"),
                F.max(F.when(F.col("status") == "ok", 1).otherwise(0))
                .alias("finished"),
                F.max_by("retry_count", F.struct("step", "retry_count"))
                .alias("final_retry_count"),
            ).persist()
            agg = per_req.agg(
                F.sum("finished").alias("fin"),
                F.sum(1 - F.col("finished")).alias("fail"),
                F.sum(F.when(F.col("finished") == 1, F.col("attempts")))
                .alias("fin_attempts"),
                F.sum(F.when(F.col("finished") == 0, F.col("attempts")))
                .alias("fail_attempts"),
            ).first()
            fin = int(agg["fin"] or 0)
            fail = int(agg["fail"] or 0)
            try:
                hist_rows = per_req.groupBy("final_retry_count").count().collect()
            finally:
                per_req.unpersist()
            hist_map = {int(r["final_retry_count"]): int(r["count"])
                        for r in hist_rows}
            hist = [hist_map.get(i, 0)
                    for i in range(max(hist_map, default=-1) + 1)]
            stats.update(
                requests_finished=fin,
                requests_failed=fail,
                requests_total=fin + fail,
                retry_histogram=hist,
                request_avg_finished_attempts=(
                    round(int(agg["fin_attempts"] or 0) / fin, 6)
                    if fin else None),
                request_avg_failed_attempts=(
                    round(int(agg["fail_attempts"] or 0) / fail, 6)
                    if fail else None),
                requests_finished_per_step=(
                    round(fin / self.step, 6) if self.step else 0.0),
            )
        if persist:
            from crawlee_spark.store.dataset import KeyValueStore

            kvs = KeyValueStore(os.path.join(self.workdir, "key_value_store"))
            kvs.set_value("SDK_CRAWLER_STATISTICS_0", stats)
        return stats
