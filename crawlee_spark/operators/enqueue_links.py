"""enqueueLinks: the map/filter/project stage of the crawl (SURVEY.md §2.5).

Reproduces the reference pipeline (``packages/core/src/enqueue_links/
enqueue_links.ts:235-384``):

  extract (pandas UDF)  ->  explode  ->  validity filter  ->  user transform
  (``enqueue_links.ts:362-375``: transformRequestFunction runs BEFORE any
  pattern/strategy filtering, so filters test the final url)
  ->  exclude any-match  ->  include(globs|regexps) first-match
  ->  EnqueueStrategy scope filter (all | same-hostname | same-domain |
      same-origin; default same-hostname when no user patterns,
      ``enqueue_links.ts:314-316``)  ->  limit  ->  frontier rows

Everything after extraction is JVM-side column logic (rlike on
driver-compiled regexes, eTLD+1 via functions.urls.registrable_domain) —
whole-stage codegen, no Python in the filter chain. Extraction itself is an
Arrow-batched ``mapInPandas`` emitting ``array<string>`` then ``explode``
(SURVEY.md §2.5 row 1).

Scale: the extract UDF processes Arrow batches of (url, html) and column-
prunes everything else; explode fan-out (~8 links/page) happens before the
narrow filters so Catalyst pushes the cheap string predicates below the
frontier MERGE shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlee_spark.functions import urls
from crawlee_spark.functions.html import extract_links

# -- strategies (``enqueue_links.ts:177-209``) ------------------------------

STRATEGY_ALL = "all"
STRATEGY_SAME_HOSTNAME = "same-hostname"
STRATEGY_SAME_DOMAIN = "same-domain"
STRATEGY_SAME_ORIGIN = "same-origin"


def glob_to_regex(glob: str) -> str:
    """minimatch-flavored glob -> anchored regex (case-insensitive at use).

    ``**`` crosses ``/``; ``*`` and ``?`` do not (minimatch defaults, used
    case-insensitively per ``shared.ts:64-70``).
    """
    out = []
    i = 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            if glob[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c in ".^$+{}()|[]\\":
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    return "^" + "".join(out) + "$"


@dataclass
class EnqueueLinksOptions:
    """Mirror of the reference option surface (``enqueue_links.ts:40-175``).

    ``strategy=None`` means "not explicitly set": the default same-hostname
    scope applies only when no user patterns were given
    (``enqueue_links.ts:314-316``). An EXPLICIT strategy — any value,
    including same-hostname — always ANDs with user patterns
    (``enqueue_links.ts:366-376`` filterRequestsByPatterns).
    """

    strategy: str | None = None
    globs: list[str] = field(default_factory=list)
    regexps: list[str] = field(default_factory=list)
    exclude_globs: list[str] = field(default_factory=list)
    exclude_regexps: list[str] = field(default_factory=list)
    limit: int | None = None
    forefront: bool = False
    label: str | None = None
    # DataFrame -> DataFrame user hook (transformRequestFunction analog,
    # ``shared.ts:258-264``) applied between the validity filter and the
    # pattern/strategy filters (``enqueue_links.ts:362-375``). The hook may
    # rewrite `url`/`label`/`forefront`/`depth` (filters see the rewritten
    # url) and may drop rows; it MUST pass every other column through
    # unchanged — in particular the filtering context columns `_src_url`,
    # `_loaded_url`, `rel_order` (enqueue_links raises if they are missing
    # after the hook).
    transform: Callable[[DataFrame], DataFrame] | None = None

    @property
    def user_patterns(self) -> bool:
        return bool(self.globs or self.regexps)

    @property
    def effective_strategy(self) -> str:
        return self.strategy or STRATEGY_SAME_HOSTNAME

    def include_regexes(self) -> list[str]:
        return [glob_to_regex(g) for g in self.globs] + list(self.regexps)

    def exclude_regexes(self) -> list[str]:
        return [glob_to_regex(g) for g in self.exclude_globs] + list(self.exclude_regexps)


# -- extraction UDF ---------------------------------------------------------

_EXTRACT_SCHEMA = "url string, loaded_url string, depth int, link string, rel_order int"


def extract_links_df(fetched: DataFrame) -> DataFrame:
    """(url, html, depth[, loaded_url], ...) -> one row per extracted link.

    Relative hrefs resolve against ``loaded_url`` — the POST-redirect URL the
    body actually came from (``request.loadedUrl``, ``http-crawler.ts:480``;
    cheerio's base is the final response URL) — defaulting to ``url``.
    ``rel_order`` preserves document order (the reference enqueues in
    document order; our canonical sort makes intra-batch order irrelevant for
    the frontier, but rel_order keeps extraction testable on its own).
    """
    src = fetched
    if "loaded_url" not in src.columns:
        src = src.withColumn("loaded_url", F.col("url"))

    def do_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "loaded_url": [], "depth": [], "link": [], "rel_order": []}
            for url, loaded, html, depth in zip(
                pdf["url"], pdf["loaded_url"], pdf["html"], pdf["depth"]
            ):
                base = loaded or url
                for j, link in enumerate(extract_links(base, html or "")):
                    rows["url"].append(url)
                    rows["loaded_url"].append(base)
                    rows["depth"].append(int(depth))
                    rows["link"].append(link)
                    rows["rel_order"].append(j)
            yield pd.DataFrame(rows)

    return src.select("url", "loaded_url", "html", "depth").mapInPandas(
        do_extract, _EXTRACT_SCHEMA
    )


# -- scope / pattern filters (pure column logic) ----------------------------


def _any_match(col, regexes: list[str]):
    """OR of case-insensitive rlike over driver-compiled patterns."""
    cond = F.lit(False)
    for r in regexes:
        cond = cond | col.rlike(f"(?i){r}")
    return cond


def apply_strategy(out: DataFrame, strategy: str,
                   link_col: str = "link", base_col: str = "url",
                   loaded_col: str = "loaded_url") -> DataFrame:
    """Scope filter comparing the candidate ``link`` against its source page.

    - same-hostname: identical lowercased host (default strategy) — vs the
      ORIGINAL request URL
    - same-domain: identical eTLD+1 under the FULL public-suffix list
      (tldts getDomain analog, functions/psl.py) — with redirect base
      resolution: links survive only if the loaded (post-redirect) URL's
      domain matches the original's, and the link's domain matches the
      loaded one (``enqueue_links.ts:394-430`` resolveBaseUrl: same-domain
      returns the final origin iff registrable domains match, else
      undefined => everything drops)
    - same-origin: identical scheme://host[:port] — vs the original URL
    - all: http(s) only (validity filter already guarantees that)
    (``enqueue_links.ts:177-209, 314-358``; http/https widening of origin
    globs at :445-447 means same-hostname ignores the scheme.)

    same-domain is DataFrame-level (broadcast joins against the PSL rule
    dims — map-side, no shuffle); the rest are pure column predicates.
    """
    if strategy == STRATEGY_ALL:
        return out
    link, base = F.col(link_col), F.col(base_col)
    if strategy == STRATEGY_SAME_HOSTNAME:
        return out.filter(urls.host_of(link) == urls.host_of(base))
    if strategy == STRATEGY_SAME_ORIGIN:
        return out.filter(urls.origin_of(link) == urls.origin_of(base))
    if strategy == STRATEGY_SAME_DOMAIN:
        from crawlee_spark.functions import psl

        out = psl.attach_registrable_domain(out, urls.host_of(link), "_rd_link")
        out = psl.attach_registrable_domain(out, urls.host_of(base), "_rd_base")
        out = psl.attach_registrable_domain(
            out, urls.host_of(F.col(loaded_col)), "_rd_loaded"
        )
        return out.filter(
            (F.col("_rd_loaded") == F.col("_rd_base"))
            & (F.col("_rd_link") == F.col("_rd_loaded"))
        ).drop("_rd_link", "_rd_base", "_rd_loaded")
    raise ValueError(f"unknown strategy {strategy!r}")


def enqueue_links(fetched: DataFrame, options: EnqueueLinksOptions | None = None) -> DataFrame:
    """Full pipeline: fetched pages -> candidate request rows (url, depth,
    forefront, label), ready for ``frontier.make_requests`` + MERGE.

    AND-composition order matches the reference: user include patterns first,
    then strategy scope (``enqueue_links.ts:366-376``); excludes are
    evaluated before includes (``shared.ts:148-161``); default strategy
    applies only when no user patterns were given (``:314-316``).
    """
    opt = options or EnqueueLinksOptions()
    links = extract_links_df(fetched)

    # request-option rows FIRST: the user transform rewrites candidates
    # BEFORE any pattern/strategy filtering (enqueue_links.ts:362-375 maps
    # transformRequestFunction over the options, THEN createRequests
    # filters) — so excludes/includes always test the FINAL url
    out = links.select(
        F.col("url").alias("_src_url"),
        F.col("loaded_url").alias("_loaded_url"),
        F.col("link").alias("url"),
        (F.col("depth") + 1).alias("depth"),
        F.lit(opt.forefront).alias("forefront"),
        F.lit(opt.label).cast("string").alias("label"),
        "rel_order",
    )
    if opt.transform is not None:
        out = opt.transform(out)
        missing = {"url", "_src_url", "_loaded_url", "rel_order"} - set(out.columns)
        if missing:
            raise ValueError(
                f"enqueue transform dropped required columns {sorted(missing)}; "
                "it must pass _src_url/_loaded_url/rel_order through unchanged "
                "(they carry the filtering context — see EnqueueLinksOptions)"
            )

    link = F.col("url")
    excl = opt.exclude_regexes()
    if excl:
        out = out.filter(~_any_match(link, excl))
    if opt.user_patterns:
        out = out.filter(_any_match(link, opt.include_regexes()))
        # reference: explicit patterns replace the DEFAULT strategy, but an
        # explicitly-set strategy (any value) still ANDs in
        # (``enqueue_links.ts:314-316, 366-376``)
        if opt.strategy is not None:
            out = apply_strategy(out, opt.strategy, link_col="url",
                                 base_col="_src_url", loaded_col="_loaded_url")
    else:
        out = apply_strategy(out, opt.effective_strategy, link_col="url",
                             base_col="_src_url", loaded_col="_loaded_url")

    if opt.limit is not None:
        # per source page in document order (``enqueue_links.ts:379`` slices
        # the first n links of ONE enqueueLinks call = one page here) — a
        # global DataFrame.limit(n) would pick nondeterministic rows across
        # the whole superstep and break engine==simulator parity
        from pyspark.sql import Window

        wl = Window.partitionBy("_src_url").orderBy("rel_order")
        out = (
            out.withColumn("_lrank", F.row_number().over(wl))
            .filter(F.col("_lrank") <= opt.limit)
            .drop("_lrank")
        )
    return out.drop("rel_order", "_src_url", "_loaded_url")


# -- pure-Python mirror (simulator spec) ------------------------------------


def enqueue_links_py(
    page_url: str,
    html: str,
    depth: int,
    options: EnqueueLinksOptions | None = None,
    loaded_url: str | None = None,
) -> list[dict]:
    """Identical semantics, one page at a time (the simulator's version).

    ``loaded_url`` is the post-redirect URL the body came from; relative
    hrefs resolve against it and same-domain base resolution uses it
    (``enqueue_links.ts:394-430``).

    transform hooks are DataFrame-shaped and not supported here; simulator
    configs that use them must supply a row-level equivalent separately.
    """
    from crawlee_spark.functions.psl import registrable_domain_psl_py
    from crawlee_spark.functions.urls import host_of_py

    opt = options or EnqueueLinksOptions()
    loaded = loaded_url or page_url
    incl = [re.compile(r, re.I) for r in opt.include_regexes()]
    excl = [re.compile(r, re.I) for r in opt.exclude_regexes()]

    def in_scope(link: str, strategy: str) -> bool:
        if strategy == STRATEGY_ALL:
            return True
        lh, bh = host_of_py(link), host_of_py(page_url)
        if lh is None or bh is None:
            return False
        if strategy == STRATEGY_SAME_HOSTNAME:
            return lh == bh
        if strategy == STRATEGY_SAME_DOMAIN:
            ld = host_of_py(loaded)
            if ld is None:
                return False
            rd_loaded = registrable_domain_psl_py(ld)
            return (
                rd_loaded == registrable_domain_psl_py(bh)
                and registrable_domain_psl_py(lh) == rd_loaded
            )
        if strategy == STRATEGY_SAME_ORIGIN:
            from crawlee_spark.functions.urls import canonicalize_py

            def origin(u):
                c = canonicalize_py(u) or ""
                m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]*)", c)
                return m.group(1) if m else ""

            return origin(link) == origin(page_url)
        raise ValueError(strategy)

    out = []
    for link in extract_links(loaded, html or ""):
        if excl and any(p.search(link) for p in excl):
            continue
        if opt.user_patterns:
            if not any(p.search(link) for p in incl):
                continue
            if opt.strategy is not None and not in_scope(link, opt.strategy):
                continue
        elif not in_scope(link, opt.effective_strategy):
            continue
        out.append(
            {"url": link, "depth": depth + 1, "forefront": opt.forefront, "label": opt.label}
        )
        if opt.limit is not None and len(out) >= opt.limit:
            break
    return out
