"""Pure-Python reference crawl simulator — the executable ordering spec.

The reference's crawl order is timing-dependent (``orderNo = Date.now()``,
concurrent task interleaving — SURVEY.md §7 hard part (a)). "Matching the
reference's crawl ordering" is therefore defined against *serial semantics*:
this simulator implements the reference's priority-queue + dedup + politeness
rules exactly (orderNo sign encoding ``memory-storage request-queue.ts:
554-560``, head sort ``:178``, dedup-on-insert ``request-queue.ts:299-311``,
delayRequest spacing ``basic-crawler.ts:1111-1138``, retry budget
``basic-crawler.ts:538-540``, maxRequestsPerCrawl ``:247-251``) with the
engine's deterministic logical clock, and the Spark engine must reproduce its
crawl order and URL-seen set bit-for-bit (tests/test_engine_parity.py).

It shares ALL semantic primitives with the engine — canonicalization
(functions.urls), xxhash64 (functions.hashing), link extraction
(functions.html), enqueueLinks filtering (operators.enqueue_links.
enqueue_links_py), robots matching (operators.robots) — so parity failures
localize to the engine's set-based operators, not to divergent copies of the
rules.

Superstep semantics (shared spec, BSP):
  step 0: seeds normalized + deduped + enqueued (order_no = ±(1 << 32)).
  step t >= 1:
    1. every pending URL disallowed by robots -> dead(handled at t,
       error='robots-disallowed').
    2. fetch set = pending, host politeness-eligible, ranked per host by
       (order_no, depth, url_hash) up to host budget, then globally capped
       (rate budget + remaining maxRequestsPerCrawl) by the same order.
    3. fetch: canonical-join to corpus; failure model may fail the attempt.
       success -> extract links -> enqueueLinks -> enqueue at t (dedup);
       failure -> retry (reclaim at t) while retry_count < max_retries and
       not no_retry, else dead.
    4. politeness state: hosts touched at t -> next_allowed_step = t + d.
  stop: no pending, or handled cap reached, or fetch set empty with no
  politeness wait active (safety).
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

from crawlee_spark.functions.hashing import xxhash64_str
from crawlee_spark.functions.urls import (
    canonicalize_py,
    extended_unique_key_py,
    host_of_py,
    unique_key_py,
)
from crawlee_spark.operators.enqueue_links import EnqueueLinksOptions, enqueue_links_py
from crawlee_spark.operators.politeness import PolitenessConfig
from crawlee_spark.operators.robots import compile_rules, crawl_delays_py, is_allowed_py

STEP_SHIFT = 32


@dataclass
class FailureModel:
    """Deterministic transient/permanent fetch failures (hash-derived so the
    Spark engine computes the identical outcomes column-side)."""

    fail_mod: int = 0       # pmod(url_hash, fail_mod)==0 -> transient failure
    fail_attempts: int = 2  # ... for the first N attempts
    dead_mod: int = 0       # pmod(url_hash, dead_mod)==0 -> always fails

    def outcome(self, url_hash: int, retry_count: int) -> bool:
        """True = fetch succeeds."""
        if self.dead_mod and url_hash % self.dead_mod == 0:
            return False
        if self.fail_mod and url_hash % self.fail_mod == 0 and retry_count < self.fail_attempts:
            return False
        return True


def _default_status():
    from crawlee_spark.engine import StatusModelConf

    return StatusModelConf()


@dataclass
class SimConfig:
    politeness: PolitenessConfig = field(default_factory=PolitenessConfig)
    enqueue: EnqueueLinksOptions = field(default_factory=EnqueueLinksOptions)
    failures: FailureModel = field(default_factory=FailureModel)
    # HTTP status model + class table — SHARED dataclass with the engine
    # (engine.StatusModelConf carries both the Spark column and the
    # status_of() python mirror), so the class semantics cannot drift
    status: "object" = field(default_factory=_default_status)
    max_retries: int = 3
    user_agent: str = "*"
    keep_fragment: bool = False
    max_steps: int = 10_000
    detect_blocked: bool = False  # retryOnBlocked content heuristic
    use_extended_unique_key: bool = False  # request.ts:361-384
    # pre/post-navigation hook mirrors (engine.CrawlConfig has the DF->DF
    # form; http-crawler.ts:96-120, 299-300). Pre: callable(row) -> bool|None
    # (True = skipNavigation, request.ts — handled without a fetch, no link
    # extraction; None leaves the previous hook's decision). Post:
    # callable(row, html, loaded_url) -> (html, loaded_url), invoked on real
    # navigations only, BEFORE blocked detection + extraction.
    pre_navigation_hooks: list = field(default_factory=list)
    post_navigation_hooks: list = field(default_factory=list)


@dataclass
class SimResult:
    crawl_order: list[tuple[int, str]]       # (step, unique_key) in fetch order
    url_seen: set[str]                       # final unique_key set
    handled: dict[str, int]                  # unique_key -> handled step
    dead: dict[str, str]                     # unique_key -> error
    per_host_counts: dict[str, dict[str, int]]
    steps: int


def _pmod(v: int, m: int) -> int:
    return v % m if m else 0


class _Row:
    __slots__ = ("url", "unique_key", "url_hash", "host", "order_no", "depth",
                 "forefront", "retry_count", "no_retry", "handled_step", "error",
                 "rotation_count", "fetch_key")

    def __init__(self, url, unique_key, url_hash, host, order_no, depth,
                 forefront, no_retry, fetch_key=None):
        self.url = url
        self.unique_key = unique_key
        self.url_hash = url_hash
        self.host = host
        self.order_no = order_no
        self.depth = depth
        self.forefront = forefront
        self.retry_count = 0
        self.rotation_count = 0
        self.no_retry = no_retry
        self.handled_step = None
        self.error = None
        # corpus lookup key: ALWAYS the canonical URL (the frontier key may
        # be the extended METHOD(hash):url form — mirrors the engine's
        # separate _fetch_hash join column)
        self.fetch_key = fetch_key if fetch_key is not None else unique_key

    def sort_key(self):
        return (self.order_no, self.depth, self.url_hash)


def simulate(
    corpus: dict[str, dict],
    seeds: list[dict],
    cfg: SimConfig | None = None,
    robots_rows: list[dict] | None = None,
) -> SimResult:
    """Run the serial crawl.

    ``corpus``: canonical_url -> {'html': str, ...} (the fetchable universe).
    ``seeds``: [{'url', 'forefront'?, 'depth'?}].
    """
    cfg = cfg or SimConfig()
    pol = cfg.politeness
    robots_rows = robots_rows or []
    rules = compile_rules(robots_rows, cfg.user_agent)
    delays = crawl_delays_py(robots_rows, cfg.user_agent)

    # corpus keyed by canonical form for the deterministic "fetch" join
    corpus_by_key = {}
    for u, page in corpus.items():
        k = canonicalize_py(u) or u
        corpus_by_key[k] = (u, page)

    frontier: dict[int, _Row] = {}   # url_hash -> row (the URL-seen set IS this key set)
    next_allowed: dict[str, int] = {}
    crawl_order: list[tuple[int, str]] = []
    dead: dict[str, str] = {}
    per_host: dict[str, dict[str, int]] = {}
    handled_count = 0

    def bump(host: str, k: str):
        per_host.setdefault(host, {"handled": 0, "failed": 0, "retried": 0})[k] += 1

    def enqueue(batch: list[dict], step: int):
        # batch-internal dedup keeps first occurrence in deterministic order
        # (request_provider.ts:212-231); insert-dedup against frontier keys.
        seen_in_batch: set[int] = set()
        # deterministic batch order: (depth, not forefront, url) like dedup_batch
        for r in sorted(batch, key=lambda r: (r.get("depth", 0),
                                              not r.get("forefront", False),
                                              r["url"])):
            url = r["url"].strip()
            if cfg.use_extended_unique_key:
                computed = extended_unique_key_py(
                    url, r.get("method", "GET"), r.get("payload"),
                    cfg.keep_fragment,
                )
                uk = r.get("unique_key") or computed
            else:
                uk = unique_key_py(url, r.get("unique_key"), cfg.keep_fragment)
            # corpus join key = FRAGMENT-STRIPPED canonical URL, always
            # (fragments never reach the server, RFC 3986 §3.5); mirrors
            # the engine's _fetch_hash, which equals url_hash only in the
            # plain keep_fragment=False configuration
            fetch_key = unique_key_py(url, None, False)
            host = host_of_py(url)
            if host is None:
                continue
            uh = xxhash64_str(uk)
            if uh in seen_in_batch or uh in frontier:
                continue
            seen_in_batch.add(uh)
            ff = bool(r.get("forefront", False))
            base = (step + 1) << STEP_SHIFT
            row = _Row(url, uk, uh, host, -base if ff else base,
                       r.get("depth", 0), ff, bool(r.get("no_retry", False)),
                       fetch_key=fetch_key)
            frontier[uh] = row

    enqueue(seeds, step=0)

    step = 0
    for step in range(1, cfg.max_steps + 1):
        pending = [r for r in frontier.values() if r.order_no is not None]
        if not pending:
            break
        if pol.max_requests_per_crawl is not None and handled_count >= pol.max_requests_per_crawl:
            break

        # 1. robots sweep over pending
        still = []
        for r in pending:
            # path+query, mirroring operators.robots.filter_allowed exactly:
            # strip fragment, drop scheme://authority, empty -> "/"
            base = r.url.split("#", 1)[0]
            m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]*", base)
            path = base[m.end():] if m else base
            if not is_allowed_py(rules, r.host, path or "/"):
                r.order_no = None
                r.handled_step = step
                r.error = "robots-disallowed"
                dead[r.unique_key] = r.error
                continue
            still.append(r)
        pending = still
        if not pending:
            continue

        # 2. politeness-eligible hosts, per-host budget, global caps
        # (key_by_domain: base delay keys/serializes by PSL registrable
        # domain — delayRequest via getDomain, basic-crawler.ts:1111-1138 —
        # while robots crawl-delays stay host-scoped)
        kbd = pol.key_by_domain
        if kbd:
            from crawlee_spark.functions.psl import registrable_domain_psl_py

            _dom_cache: dict[str, str] = {}

            def dom(h: str) -> str:
                if h not in _dom_cache:
                    _dom_cache[h] = registrable_domain_psl_py(h)
                return _dom_cache[h]

        eligible = [
            r for r in pending
            if next_allowed.get(r.host, 0) <= step
            and (not kbd or next_allowed.get("d:" + dom(r.host), 0) <= step)
        ]
        if not eligible:
            if not next_allowed:
                break  # safety: nothing to wait for
            continue
        by_host: dict[str, list[_Row]] = {}
        for r in eligible:
            by_host.setdefault(r.host, []).append(r)
        candidates: list[_Row] = []
        for host, rows in by_host.items():
            rows.sort(key=_Row.sort_key)
            d = delays.get(host)
            if kbd:
                # base delay no longer serializes per host; robots does
                budget = 1 if (d and d > 0) else pol.max_per_host_per_step
            else:
                budget = 1 if (pol.delay_steps(d) > 0) else pol.max_per_host_per_step
            candidates.extend(rows[:budget])
        if kbd and pol.delay_steps() > 0:
            # one per registrable domain per delay window
            candidates.sort(key=_Row.sort_key)
            seen_dom: set[str] = set()
            kept = []
            for r in candidates:
                dm = dom(r.host)
                if dm in seen_dom:
                    continue
                seen_dom.add(dm)
                kept.append(r)
            candidates = kept
        candidates.sort(key=_Row.sort_key)
        caps = []
        g = pol.global_budget()
        if g is not None:
            caps.append(g)
        if pol.max_requests_per_crawl is not None:
            caps.append(max(0, pol.max_requests_per_crawl - handled_count))
        if caps:
            candidates = candidates[: min(caps)]
        if not candidates:
            continue

        # 3. fetch + handle
        new_links: list[dict] = []
        touched_hosts: set[str] = set()
        sm = cfg.status
        for r in candidates:
            touched_hosts.add(r.host)
            skipped = False
            for h in cfg.pre_navigation_hooks:
                v = h(r)
                if v is not None:
                    skipped = bool(v)
            if skipped:
                # skipNavigation: handled without an HTTP request — success
                # regardless of corpus/status, no extraction (engine err_col's
                # first WHEN); still consumes rate budget + politeness slot
                crawl_order.append((step, r.unique_key))
                r.order_no = None
                r.handled_step = step
                handled_count += 1
                bump(r.host, "handled")
                continue
            hit = corpus_by_key.get(r.fetch_key)
            html = loaded = None
            if hit is not None:
                html = hit[1].get("html", "")
                loaded = hit[1].get("redirect_to") or r.url
                for h in cfg.post_navigation_hooks:
                    html, loaded = h(r, html, loaded)
            blocked = False
            if hit is not None and cfg.detect_blocked:
                from crawlee_spark.functions.text import is_blocked_page_py

                blocked = is_blocked_page_py(html)
            # status-class table — EXACT mirror of the engine's err_col
            # precedence: missing -> network fail -> content block -> 5xx ->
            # additional -> session codes -> 406 -> success
            status = 0 if hit is None else sm.status_of(r.url_hash)
            if hit is None:
                err = "404-not-found"
            elif not cfg.failures.outcome(r.url_hash, r.retry_count):
                err = "fetch-failed"
            elif blocked:
                err = "session-blocked"
            elif status >= 500 and status not in sm.ignore_error_codes:
                err = "http-5xx"
            elif status in sm.additional_error_codes:
                err = "http-error"
            elif status in sm.session_blocked_codes and status not in sm.ignore_error_codes:
                err = "session-blocked"
            elif status == 406:
                err = "unsupported-content-type"
            else:
                err = None
            if err is None:
                crawl_order.append((step, r.unique_key))
                new_links.extend(
                    enqueue_links_py(r.url, html, r.depth,
                                     cfg.enqueue, loaded_url=loaded)
                )
                r.order_no = None
                r.handled_step = step
                handled_count += 1
                bump(r.host, "handled")
            else:
                rot = err == "session-blocked"
                if rot:
                    can = (not r.no_retry) and r.rotation_count < sm.max_session_rotations
                elif err == "unsupported-content-type":
                    can = False
                else:
                    can = (not r.no_retry) and r.retry_count < cfg.max_retries
                if can:
                    if rot:
                        r.rotation_count += 1
                    else:
                        r.retry_count += 1
                    r.order_no = (step + 1) << STEP_SHIFT
                    r.forefront = False
                    r.error = err
                    bump(r.host, "retried")
                else:
                    r.order_no = None
                    r.handled_step = step
                    r.error = err
                    dead[r.unique_key] = err
                    handled_count += 1
                    bump(r.host, "failed")

        # 4. enqueue extracted links, then advance politeness. Keys collect
        # their MAX delay first (mirrors the engine's groupBy-max merge);
        # host and domain keys are separate namespaces ("d:" prefix), so an
        # apex host never merges into its own domain key.
        enqueue(new_links, step)
        import math as _math

        adv: dict[str, int] = {}
        for h in touched_hosts:
            if kbd:
                cd = delays.get(h)
                dh = _math.ceil(cd / pol.step_secs) if cd and cd > 0 else 0
                if dh > 0:
                    adv[h] = max(adv.get(h, 0), dh)
                dd = pol.delay_steps()
                if dd > 0:
                    # "d:"-prefixed namespace (politeness.DOMAIN_KEY_PREFIX):
                    # an apex host's robots delay must NOT merge into the
                    # domain key and stall sibling subdomains
                    dm = "d:" + dom(h)
                    adv[dm] = max(adv.get(dm, 0), dd)
            else:
                d = pol.delay_steps(delays.get(h))
                if d > 0:
                    adv[h] = max(adv.get(h, 0), d)
        for k, d in adv.items():
            next_allowed[k] = step + d

    return SimResult(
        crawl_order=crawl_order,
        url_seen={r.unique_key for r in frontier.values()},
        handled={r.unique_key: r.handled_step for r in frontier.values()
                 if r.handled_step is not None and r.unique_key not in dead},
        dead=dead,
        per_host_counts=per_host,
        steps=step,
    )
