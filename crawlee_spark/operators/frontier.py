"""Frontier table: the priority queue at the heart of the engine.

Reference semantics being reproduced (SURVEY.md §1.5, §2.4):

- pending rows carry a signed ``order_no``; ``forefront`` rows are negative
  and sort first, LIFO among themselves (more-negative = newer = first);
  normal rows are positive, FIFO (``memory-storage
  resource-clients/request-queue.ts:554-560``, head sort at ``:178``).
- handled rows have ``order_no = NULL`` + ``handled_step`` set
  (``markRequestHandled``, ``request_provider.ts:377-404``).
- add is a primary-key MERGE on ``url_hash``: already-present keys are
  reported, not updated (``request-queue.ts:287-337``).
- reclaim bumps ``retry_count`` and re-inserts with a fresh ``order_no``
  (``request_provider.ts:412-449``).

Determinism: the reference uses wall-clock ``Date.now()`` which makes
concurrent ordering nondeterministic; this engine replaces it with a logical
clock — ``order_no = sign * ((step + 1) << 32)`` and a canonical compound
sort ``ORDER_COLS = (order_no asc, depth asc, url_hash asc)`` used by every
head selection. No per-batch sequence numbers are assigned, so enqueue needs
no global window (which would shuffle the batch to one partition — the
single-partition WindowExec anti-pattern). The pure Python simulator
(crawlee_spark/simulator.py) defines the same total order, so crawl ordering
is reproducible bit-for-bit.

Scale: every transform here is bucket-local — batches are keyed by
``bucket = pmod(xxhash64(host), N)`` before the merge, so the anti-join
shuffles only the (small) new batch, never the full frontier; the frontier
side arrives bucket-pruned from SnapshotTable.read(buckets=touched).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawlee_spark.functions import urls
from crawlee_spark.store import SnapshotTable

STEP_SHIFT = 32  # order_no = sign * ((step + 1) << 32)

# Canonical total order for head selection — every ORDER BY in the engine
# (and the simulator) uses exactly this.
ORDER_COLS = ("order_no", "depth", "url_hash")


def order_no_expr(step: int, forefront_col: Column | None = None):
    """order_no for rows enqueued at ``step``; negative when forefront
    (sign encoding per ``request-queue.ts:554-560``; LIFO among forefront
    falls out of two's-complement: newer step = more negative = first)."""
    base = F.lit((step + 1) << STEP_SHIFT).cast("long")
    if forefront_col is None:
        return base
    return F.when(forefront_col, -base).otherwise(base)

FRONTIER_SCHEMA = (
    "url string, unique_key string, url_hash long, host string, bucket int, "
    "order_no long, depth int, forefront boolean, retry_count int, "
    "no_retry boolean, handled_step int, enqueued_step int, "
    "label string, error string, method string, payload binary, "
    "user_data map<string,string>, rotation_count int"
)

FRONTIER_COLS = [f.split(" ")[0] for f in FRONTIER_SCHEMA.split(", ")]


def normalize_requests(
    raw: DataFrame,
    step: int,
    num_buckets: int,
    keep_fragment: bool = False,
    use_extended_unique_key: bool = False,
) -> DataFrame:
    """Normalize a raw URL batch into frontier rows (no dedup yet).

    ``raw`` needs a ``url`` column; optional: ``unique_key`` (explicit
    override, ``request.ts:361-375``), ``forefront``, ``depth``, ``label``,
    ``no_retry``, ``method`` (GET default), ``payload`` (binary),
    ``user_data``. Rows with no resolvable host are dropped (the reference
    rejects them at validation, ``memory-storage request-queue.ts:21``).

    ``use_extended_unique_key`` switches the dedup key to the
    ``METHOD(sha256-8(payload)):canonicalUrl`` form (``request.ts:361-384``)
    so e.g. two POSTs to one URL with different payloads dedup separately.
    """
    # defaults for absent optional columns, appended in ONE projection:
    # chained withColumn re-analyzes the whole plan per call (~O(n²) driver
    # cost on the per-superstep link batch; round-5 profile). The aliased
    # default Columns are built once per process (lazy: Column creation
    # needs the JVM gateway, so not at import time).
    cols = set(raw.columns)
    defaults = _NORMALIZE_DEFAULT_MEMO.get("defaults")
    if defaults is None:
        defaults = [
            ("unique_key", F.lit(None).cast("string").alias("unique_key")),
            ("forefront", F.lit(False).alias("forefront")),
            ("depth", F.lit(0).alias("depth")),
            ("label", F.lit(None).cast("string").alias("label")),
            ("no_retry", F.lit(False).alias("no_retry")),
            ("method", F.lit("GET").alias("method")),
            ("payload", F.lit(None).cast("binary").alias("payload")),
            ("user_data",
             F.lit(None).cast("map<string,string>").alias("user_data")),
        ]
        _NORMALIZE_DEFAULT_MEMO["defaults"] = defaults
    extras = [e for name, e in defaults if name not in cols]
    df = raw.select("*", *extras) if extras else raw

    e = _make_request_exprs(keep_fragment, use_extended_unique_key, num_buckets)
    df = df.select("*", e["parsed"]) \
        .filter(F.col("_p.host").isNotNull())

    return df.select(
        "url",
        *e["static_cols"],
        order_no_expr(step, F.col("forefront")).cast("long").alias("order_no"),
        F.lit(step).cast("int").alias("enqueued_step"),
        "label",
    ).select(*FRONTIER_COLS)


def _make_request_exprs(keep_fragment: bool, use_extended_unique_key: bool,
                        num_buckets: int) -> dict:
    """STEP-INDEPENDENT column trees of ``make_requests``, memoized per
    config. Column objects wrap immutable unresolved expression trees, so
    one build serves every batch — the canonicalize/parse tree is lambda-HOF
    heavy and measured ~0.5 s of driver py4j time PER BUILD; un-memoized it
    was rebuilt every superstep and dominated the engine's fixed per-step
    cost (round-5 profile).

    The URL parse (canonical form + host) is evaluated EXACTLY ONCE per
    row, behind a Generate barrier: explode(array(struct(...))) yields
    attribute references that CollapseProject/PushDownPredicates cannot
    inline back into downstream derivations. Without the barrier, Catalyst
    inlines the parse tree into unique_key, url_hash, host and bucket,
    each copy mutated differently by later rewrites so codegen
    subexpression elimination no longer recognizes them as common — the
    measured cost is ~4x this formulation on a 2M-row batch. Host comes
    straight from the parser (it IS the canonical host by construction),
    not from a regexp over the canonical string."""
    memo_key = (keep_fragment, use_extended_unique_key, num_buckets)
    e = _MAKE_REQUEST_EXPR_MEMO.get(memo_key)
    if e is not None:
        return e
    canon = urls.canonicalize(F.col("url"), keep_fragment)
    valid, _scheme, host_raw, _port, _path, _query = urls._url_parts(F.col("url"))
    host_col = (
        F.when(~valid | (host_raw == ""), F.lit(None).cast("string"))
        .otherwise(host_raw)
    )
    parsed = F.explode(
        F.array(F.struct(canon.alias("canon"), host_col.alias("host")))
    ).alias("_p")

    if use_extended_unique_key:
        # same bytes as urls.extended_unique_key, reusing the parsed form
        ph = F.when(F.col("payload").isNull(), F.lit("")).otherwise(
            F.substring(F.sha2(F.col("payload"), 256), 1, 8)
        )
        computed_key = F.concat(
            F.upper(F.coalesce(F.col("method"), F.lit("GET"))),
            F.lit("("), ph, F.lit("):"),
            F.coalesce(F.col("_p.canon"), F.trim(F.col("url"))),
        )
    else:
        computed_key = F.coalesce(F.col("_p.canon"), F.trim(F.col("url")))
    key = F.coalesce(F.col("unique_key"), computed_key)
    e = {
        "parsed": parsed,
        "static_cols": [
            key.alias("unique_key"),
            urls.url_hash(key).alias("url_hash"),
            F.col("_p.host").alias("host"),
            urls.host_hash(F.col("_p.host"), num_buckets).alias("bucket"),
            F.col("depth").cast("int").alias("depth"),
            F.coalesce(F.col("forefront"), F.lit(False)).alias("forefront"),
            F.lit(0).cast("int").alias("retry_count"),
            F.coalesce(F.col("no_retry"), F.lit(False)).alias("no_retry"),
            F.lit(None).cast("int").alias("handled_step"),
            F.lit(None).cast("string").alias("error"),
            F.upper(F.coalesce(F.col("method"), F.lit("GET"))).alias("method"),
            F.col("payload").cast("binary").alias("payload"),
            F.col("user_data").cast("map<string,string>").alias("user_data"),
            F.lit(0).cast("int").alias("rotation_count"),
        ],
    }
    _MAKE_REQUEST_EXPR_MEMO[memo_key] = e
    return e


_MAKE_REQUEST_EXPR_MEMO: dict[tuple, dict] = {}
_NORMALIZE_DEFAULT_MEMO: dict[str, list] = {}


def dedup_batch(batch: DataFrame) -> DataFrame:
    """Batch-internal dedup: first occurrence per key in deterministic order
    (``request_provider.ts:212-231`` keeps the first occurrence within one
    addRequests call; "first" here = (depth asc, forefront first, url asc)).

    Implemented as ``min_by(row, order)`` hash aggregation, NOT a
    row_number window: the aggregate gets map-side partial combine, so
    duplicate-heavy link batches collapse locally BEFORE the url_hash
    shuffle — at crawl scale most extracted links are duplicates, making
    this the difference between shuffling the raw explode fan-out and
    shuffling ~unique keys.
    """
    cols = batch.columns
    # the order struct must be a TOTAL order over everything that can
    # differ between same-key rows, or min_by resolves residual ties by
    # aggregation encounter order — partition-dependent, so two runs
    # could keep rows with different method/label/payload (an enqueue
    # transform that tags rows per source page creates exactly this).
    # user_data (map) is not orderable; rows identical in every ordered
    # field but user_data are indistinguishable to the queue and either
    # pick is stable under AQE only because the ordered fields tie last.
    #
    # Trees memoized per column tuple (Column objects wrap immutable
    # unresolved expressions): the engine calls this every superstep on the
    # fixed FRONTIER_COLS schema, and the ~40 py4j round-trips per build
    # were a measurable slice of the fixed per-step driver cost
    # (round-5 closing profile).
    memo_key = tuple(cols)
    e = _DEDUP_BATCH_EXPR_MEMO.get(memo_key)
    if e is None:
        order_fields = [
            F.col("depth"),
            F.when(F.col("forefront"), 0).otherwise(1).alias("_ff"),
            F.col("url"),
        ]
        for extra in ("method", "label", "payload"):
            if extra in cols:
                order_fields.append(F.col(extra))
        e = {
            "agg": F.min_by(
                F.struct(*[c for c in cols if c != "url_hash"]),
                F.struct(*order_fields)).alias("_r"),
            "unpack": [F.col(f"_r.{c}").alias(c)
                       for c in cols if c != "url_hash"],
        }
        _DEDUP_BATCH_EXPR_MEMO[memo_key] = e
    return (
        batch.groupBy("url_hash")
        .agg(e["agg"])
        .select("url_hash", *e["unpack"])
        .select(*cols)
    )


_DEDUP_BATCH_EXPR_MEMO: dict[tuple, dict] = {}


def make_requests(
    raw: DataFrame, step: int, num_buckets: int, keep_fragment: bool = False,
    use_extended_unique_key: bool = False,
) -> DataFrame:
    """normalize + batch-dedup in one go."""
    return dedup_batch(normalize_requests(
        raw, step, num_buckets, keep_fragment, use_extended_unique_key))


def merge_new_requests(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """MERGE-NOT-MATCHED-INSERT: rows of ``batch`` whose url_hash is absent
    from ``existing``. The caller unions this with ``existing`` for the
    touched buckets and commits.

    Equivalent Iceberg: ``MERGE INTO frontier USING batch ON url_hash WHEN
    NOT MATCHED THEN INSERT`` (replaces the per-request PK check at
    ``request-queue.ts:299-311`` and the 1M-entry LRU dedup cache at
    ``request_provider.ts:46-47`` — the URL-seen set IS the frontier key set
    under snapshot isolation).
    """
    # join key is url_hash ALONE (not bucket+url_hash): the hash already
    # identifies the uniqueKey, and a single-column key lets Catalyst reuse
    # the dedup stage's url_hash exchange instead of re-shuffling the batch
    # on a compound key (one fewer full-batch exchange per superstep)
    return batch.join(
        existing.select("url_hash"), on="url_hash", how="left_anti"
    )


def apply_handled(existing: DataFrame, handled_keys: DataFrame, step: int) -> DataFrame:
    """markRequestHandled for every url_hash in ``handled_keys``:
    ``order_no = NULL``, ``handled_step = step``
    (``request_provider.ts:377-404``)."""
    # distinct: a duplicate key in the dim must not fan the left join out
    # into duplicated frontier rows (PK invariant of the table)
    hk = handled_keys.select("url_hash").distinct().withColumn("_h", F.lit(True))
    return (
        existing.join(hk, on="url_hash", how="left")
        .withColumn(
            "handled_step",
            F.when(F.col("_h"), F.lit(step)).otherwise(F.col("handled_step")),
        )
        .withColumn(
            "order_no",
            F.when(F.col("_h"), F.lit(None).cast("long")).otherwise(F.col("order_no")),
        )
        .drop("_h")
    )


def apply_reclaim(
    existing: DataFrame,
    reclaim_keys: DataFrame,
    step: int,
    forefront: bool = False,
) -> DataFrame:
    """reclaimRequest: retry_count += 1, fresh order_no at the current step
    (forefront flips the sign) — ``request_provider.ts:412-449``.

    ``reclaim_keys`` needs ``url_hash`` and may carry ``error``.
    """
    has_error = "error" in reclaim_keys.columns
    # one row per key (min error for determinism): duplicate dim keys must
    # not fan the left join out into duplicated frontier rows
    rk = (
        reclaim_keys.groupBy("url_hash").agg(F.min("error").alias("_err"))
        if has_error else reclaim_keys.select("url_hash").distinct()
    ).withColumn("_r", F.lit(True))
    out = existing.join(rk, on="url_hash", how="left")
    new_order = order_no_expr(step, F.lit(forefront)).cast("long")
    out = (
        out.withColumn(
            "retry_count",
            F.when(F.col("_r"), F.col("retry_count") + 1).otherwise(F.col("retry_count")),
        )
        .withColumn(
            "order_no", F.when(F.col("_r"), new_order).otherwise(F.col("order_no"))
        )
        .withColumn(
            "forefront",
            F.when(F.col("_r"), F.lit(forefront)).otherwise(F.col("forefront")),
        )
    )
    if has_error:
        out = out.withColumn(
            "error", F.when(F.col("_r"), F.col("_err")).otherwise(F.col("error"))
        ).drop("_err")
    return out.drop("_r")


def apply_priority(existing: DataFrame, prio: DataFrame, step: int) -> DataFrame:
    """Fold a (url_hash, priority) dim into the queue order: matched
    PENDING rows are promoted into the forefront band, ordered among
    themselves by descending priority (higher = fetched first), ahead of
    every normal-FIFO row — the generalization of the boolean forefront
    flag to a numeric ``Request.priority``, and the hook that lets e.g.
    the freshness scheduler (``operators/recrawl.py``) drive fetch order.

    Encoding: ``order_no = -(((step+1) << STEP_SHIFT) + priority)`` — the
    same sign convention as forefront (negative sorts first), priority in
    the low bits so it never collides with another step's band (clamped
    to STEP_SHIFT bits). Handled rows and rows absent from the dim keep
    their order_no untouched; a superseding call with a new dim simply
    re-MERGEs (last write wins, snapshot-isolated like every mutation)."""
    cap = (1 << STEP_SHIFT) - 1
    # max priority per key: a duplicate dim key (two revisit signals for
    # one URL) must not fan the left join out into duplicated frontier rows
    p = prio.groupBy("url_hash").agg(
        # clamp to [0, cap]: a negative priority must not escape the step
        # band (it would subtract from base and collide with other bands)
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.max("priority").cast("long"), F.lit(cap)),
        ).alias("_prio"),
    )
    out = existing.join(p, on="url_hash", how="left")
    hit = (
        F.col("_prio").isNotNull()
        & F.col("handled_step").isNull()
        & F.col("order_no").isNotNull()
    )
    base = F.lit((step + 1) << STEP_SHIFT).cast("long")
    out = (
        out.withColumn(
            "order_no",
            F.when(hit, -(base + F.col("_prio"))).otherwise(F.col("order_no")),
        )
        .withColumn("forefront", F.when(hit, F.lit(True)).otherwise(F.col("forefront")))
    )
    return out.drop("_prio")


def apply_dead(existing: DataFrame, dead_keys: DataFrame, step: int) -> DataFrame:
    """Terminal failure: mark handled with an error (dead-letter semantics of
    the failedRequestHandler path, ``basic-crawler.ts:1334-1385``)."""
    has_error = "error" in dead_keys.columns
    # one row per key (min error for determinism) — see apply_reclaim
    dk = (
        dead_keys.groupBy("url_hash").agg(F.min("error").alias("_err"))
        if has_error else dead_keys.select("url_hash").distinct()
    ).withColumn("_d", F.lit(True))
    out = (
        existing.join(dk, on="url_hash", how="left")
        .withColumn(
            "handled_step",
            F.when(F.col("_d"), F.lit(step)).otherwise(F.col("handled_step")),
        )
        .withColumn(
            "order_no",
            F.when(F.col("_d"), F.lit(None).cast("long")).otherwise(F.col("order_no")),
        )
    )
    if has_error:
        out = out.withColumn(
            "error", F.when(F.col("_d"), F.col("_err")).otherwise(F.col("error"))
        ).drop("_err")
    return out.drop("_d")


class FrontierTable:
    """SnapshotTable-backed frontier with queue-operator methods.

    One snapshot per mutation (or one per superstep when the engine batches
    mutations) = the persistence/resume the reference gets from
    file-per-request JSON + PERSIST_STATE events (§2.9).
    """

    # every commit summary written through FrontierTable methods (or the
    # engine's superstep commit) carries this stamp; its absence in a
    # lineage entry marks a foreign writer (had_multiple_clients below)
    CLIENT_ID = "crawler"

    def __init__(self, spark: SparkSession, root: str, num_buckets: int = 32,
                 client_id: str | None = None):
        self.spark = spark
        self.client_id = client_id or self.CLIENT_ID
        self.table = SnapshotTable(spark, root)
        # the TABLE is the authority on its bucket count: `create` and
        # `rebucket` record it in the commit summary, and a fresh handle
        # adopts the stored value — a caller-supplied N that disagrees
        # with the data's actual bucket derivation would route MERGEs to
        # the wrong buckets (silent duplicate URLs)
        stored = self.stored_num_buckets() if self.table.exists() else None
        self.num_buckets = stored if stored is not None else num_buckets

    def stored_num_buckets(self, from_snapshot: int | None = None) -> int | None:
        """Latest ``num_buckets`` recorded in lineage (newest wins —
        create and every rebucket stamp it). Walks parents lazily from
        the CURRENT manifest (or ``from_snapshot`` — e.g. a rollback
        target, checked BEFORE flipping) and stops at the first stamp, so
        a 10^4-superstep crawl reads a handful of manifests (down to the
        create commit at worst), not the whole chain."""
        sid: int | None = (self.table.current_snapshot_id()
                           if from_snapshot is None else from_snapshot)
        while sid is not None and sid >= 0:
            m = self.table.manifest(sid)
            n = m.get("summary", {}).get("num_buckets")
            if n is not None:
                return int(n)
            sid = m.get("parent")
        return None

    @classmethod
    def create(
        cls, spark: SparkSession, root: str, num_buckets: int = 32
    ) -> "FrontierTable":
        empty = spark.createDataFrame([], FRONTIER_SCHEMA)
        SnapshotTable.create(spark, root, empty, num_buckets=num_buckets,
                             summary={"num_buckets": num_buckets,
                                      "client": cls.CLIENT_ID})
        return cls(spark, root, num_buckets)

    def rebucket(self, new_num_buckets: int) -> int:
        """Online bucket-count change (maintenance between crawls).

        At 10^10 URLs a bucket count chosen for the seed crawl becomes the
        parallelism ceiling — politeness and commit granularity are
        per-bucket. Rebucketing recomputes ``bucket = host_hash(host, N')``
        over the FULL table and commits it as one ``rebucket`` snapshot
        (copy-on-write: the old layout stays readable via time travel, and
        a crash mid-rewrite leaves ``_CURRENT`` on the old snapshot). The
        new count is stamped into lineage, so every fresh handle — and the
        engine's resume guard — adopts it. Cost: one full-table rewrite,
        the same O(table) as Iceberg's rewrite_data_files; run it between
        supersteps, never concurrently with a commit.

        Returns the new snapshot id. Bloom/cuckoo URL-seen shards are
        keyed per bucket — rebuild them after a rebucket
        (``UrlSeenShards.rebuild``); the engine's snapshot-stamp check
        forces that automatically on next run.
        """
        from crawlee_spark.functions import urls as _urls

        if new_num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        if not self.exists():
            raise FileNotFoundError(
                f"no frontier table at {self.table.root} to rebucket")
        df = self.read().withColumn(
            "bucket", _urls.host_hash(F.col("host"), new_num_buckets))
        sid = self.table._commit_full(
            df, new_num_buckets, "rebucket",
            {"num_buckets": new_num_buckets, "client": self.client_id})
        self.num_buckets = new_num_buckets
        return sid

    def exists(self) -> bool:
        return self.table.exists()

    def read(self, buckets: list[int] | None = None) -> DataFrame:
        return self.table.read(buckets=buckets)

    def pending(self) -> DataFrame:
        return self.read().filter(F.col("order_no").isNotNull())

    def add_requests(
        self, raw: DataFrame, step: int, keep_fragment: bool = False,
        use_extended_unique_key: bool = False,
        summary_extra: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Canonicalize + dedup + MERGE a batch of raw URLs. Returns counts
        {'added': n, 'already_present': m} (wasAlreadyPresent analog —
        batch-internal duplicates count as already_present, matching the
        per-item results of ``request_provider.ts:171-262``).
        ``summary_extra`` lands in the commit summary (lineage) — e.g. the
        streaming ingest stamps its checkpoint identity for replay
        detection."""
        normalized = normalize_requests(raw, step, self.num_buckets, keep_fragment,
                                        use_extended_unique_key)
        normalized = normalized.persist()
        try:
            batch_n = normalized.count()
            batch = dedup_batch(normalized)
            touched = [r["bucket"] for r in batch.select("bucket").distinct().collect()]
            if not touched:
                return {"added": 0, "already_present": 0}
            existing = self.read(buckets=touched)
            fresh = merge_new_requests(existing, batch).localCheckpoint(eager=True)
            # count the MERGE output itself, never `enqueued_step == step`
            # over the table: two batches sharing a step (two seed frames,
            # streamed batches between supersteps) would otherwise count
            # each other's rows. The checkpoint also pins the anti-join
            # result so the commit write reuses it instead of re-running it.
            added = fresh.count()
            new_content = existing.unionByName(fresh)
            self.table.commit_buckets(
                new_content, "add_requests",
                {"step": step, "batch": batch_n, "client": self.client_id,
                 **(summary_extra or {})},
            )
            return {"added": added, "already_present": batch_n - added}
        finally:
            normalized.unpersist()

    def reprioritize(self, prio: DataFrame, step: int) -> int:
        """MERGE a (url_hash, priority) dim into the queue order (see
        ``apply_priority``): one commit over the touched buckets only.
        Returns the number of pending rows promoted. Shuffle cost is the
        dim join over touched buckets — the dim is typically small
        (revisit candidates), so Spark broadcasts it."""
        hit = (
            self.pending()
            .join(prio.select("url_hash").distinct(), on="url_hash", how="inner")
        )
        touched = [r["bucket"] for r in hit.select("bucket").distinct().collect()]
        if not touched:
            return 0
        existing = self.read(buckets=touched)
        updated = apply_priority(existing, prio, step)
        # count the promoted set BEFORE the commit from the frame already
        # in hand — the promoted rows are exactly pending ∩ prio keys, so
        # a post-commit re-read + re-join would scan every touched bucket
        # again for the same number
        promoted = hit.count()
        self.table.commit_buckets(
            updated, "reprioritize",
            {"step": step, "client": self.client_id}, touched=touched
        )
        return promoted

    def delete_requests(self, keys: DataFrame) -> int:
        """``deleteRequest(id)`` (``packages/types/src/storages.ts:297``):
        remove rows whose ``url_hash`` appears in ``keys`` — a MERGE-DELETE
        over the touched buckets only. Returns the number of rows removed.

        Deleting re-opens the URL for future enqueueing (the key leaves the
        URL-seen set). Pair with ``CuckooUrlSeen.delete_keys`` to keep a
        cuckoo prefilter in sync without a rebuild; Bloom shards need
        ``refresh_buckets`` after deletes (bits cannot be unset).
        """
        k = keys.select("url_hash").distinct()
        hit = self.read().join(k, on="url_hash", how="inner")
        touched = [r["bucket"] for r in hit.select("bucket").distinct().collect()]
        if not touched:
            return 0
        existing = self.read(buckets=touched)
        kept = existing.join(k, on="url_hash", how="left_anti")
        # url_hash is the table PK, so the matched-row count IS the
        # removed count — no before/after full-bucket rescans needed
        removed = hit.count()
        self.table.commit_buckets(
            kept, "delete_requests",
            {"op": "deleteRequest", "client": self.client_id}, touched=touched
        )
        return removed

    # SnapshotTable's own maintenance commits (written through the table
    # layer, which knows nothing about clients) are not foreign writers
    MAINTENANCE_OPS = frozenset({"compact", "expire_snapshots"})

    def had_multiple_clients(self) -> bool:
        """``hadMultipleClients`` analog (``packages/memory-storage/src/
        resource-clients/request-queue.ts:493-507``): True when the commit
        lineage shows a writer other than this client — a foreign commit is
        any manifest whose summary lacks this table's client stamp or
        carries a different one, except the SnapshotTable maintenance
        operations (compact / expire), which the storage layer itself
        writes unstamped. The engine's single-writer lineage authority
        assumes exclusivity; this surfaces the violation instead of
        silently trusting it (``CrawlEngine.resume`` refuses when it
        trips). Walks the manifest chain (driver-side JSON, O(commits))."""
        for m in self.table.history():
            if m.get("operation") in self.MAINTENANCE_OPS:
                continue
            writer = m.get("summary", {}).get("client")
            if writer != self.client_id:
                return True
        return False

    def counters(self) -> dict[str, int]:
        """getInfo analog (``request_provider.ts:87-89, 529-561``)."""
        agg = self.read().agg(
            F.count("*").alias("total"),
            F.count(F.col("handled_step")).alias("handled"),
            F.count(F.when(F.col("order_no").isNotNull(), 1)).alias("pending"),
        ).first()
        return {"total": agg["total"], "handled": agg["handled"], "pending": agg["pending"]}

    def get_info(self) -> dict[str, Any]:
        """Queue metadata (``getInfo``): counters + multi-writer signal."""
        return {**self.counters(),
                "had_multiple_clients": self.had_multiple_clients()}

    def is_finished(self) -> bool:
        """isFinished under snapshot isolation: exact, no consistency loop
        (replaces ``request_queue.ts:284-295``)."""
        return self.pending().isEmpty()
