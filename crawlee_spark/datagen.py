"""Deterministic synthetic corpus generator (pages / link graph / seeds / robots).

Implements FIXTURES.md §§1-4: the image+caption `pages` table with EXACTLY the
`BASELINE.json` `input_hint` shape
``(image_id:string, bytes:binary, w:int, h:int, fmt:string, caption:string,
phash:long)``, a Zipf-skewed host assignment (one hot host ≈30% of URLs —
exercises skew handling + per-host politeness), an outlink graph rendered as
HTML blobs (exercises `extractUrlsFromCheerio` semantics,
``packages/cheerio-crawler/src/internals/cheerio-crawler.ts:244-268``), seeds
with canonicalization stress cases (pins ``packages/core/src/request.ts:361-375``
and ``test/core/request_list.test.ts:48-67``), and RFC 9309 robots rules.

Everything is a pure function of (seed, n_pages, n_hosts) — no wall clock, no
external data. The same generator feeds pytest (tiny), integration tests
(medium) and the bench harness (large), per FIXTURES.md "Scale points".

IMAGE CODEC NOTE: every format in the mix is a REAL interchange format
(:mod:`crawlee_spark.functions.images` — PIL/libjpeg are not in this
container, so the codecs are pure numpy/stdlib): `png` (RFC 2083
truecolor), `jpeg` (baseline ITU-T T.81, genuinely lossy ~43 dB), `ppm`
(netpbm P6), `bmp` (24-bit BI_RGB), `gif` (GIF89a LZW; palette-indexed,
so gif rows carry web-safe-quantized pixels — the palettization IS the
format's contract, and the round trip is then bit-exact). All
viewer-openable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from crawlee_spark.functions.images import (
    decode_image,
    encode_image,
    phash_pixels,
)

# ---------------------------------------------------------------------------
# Host universe: Zipf(s=1.1) popularity over hosts spread across several
# registrable domains with subdomains (FIXTURES.md §3 host assignment).
# ---------------------------------------------------------------------------

_DOMAINS = ["example.com", "other.net", "images.org", "crawl.co.uk", "media.io"]
_SUBS = ["www", "a", "b", "cdn", "blog", "shop", "news", "img"]

_WORDS = (
    "amber basalt cedar dune ember fjord garnet harbor iris juniper kelp "
    "lagoon maple nectar onyx prairie quartz reef sierra tundra umber vale "
    "willow xenon yarrow zephyr"
).split()


def make_hosts(n_hosts: int) -> list[str]:
    hosts = []
    for i in range(n_hosts):
        dom = _DOMAINS[i % len(_DOMAINS)]
        sub = _SUBS[(i // len(_DOMAINS)) % len(_SUBS)]
        hosts.append(dom if i < len(_DOMAINS) else f"{sub}{i}.{dom}")
    return hosts


def zipf_host_assignment(n_pages: int, n_hosts: int, seed: int, s: float = 1.1) -> np.ndarray:
    """Host index per page with Zipf(s) skew (hot host ~30% of pages)."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    probs = ranks ** (-s)
    probs /= probs.sum()
    return rng.choice(n_hosts, size=n_pages, p=probs)


def page_url(host: str, i: int) -> str:
    return f"https://{host}/p/{i}"


# ---------------------------------------------------------------------------
# pages table (input_hint shape)
# ---------------------------------------------------------------------------

_DIMS = [32, 64, 128]


def gen_page_pixels(seed: int, i: int, w: int, h: int) -> np.ndarray:
    """Reference pixels for page i: seeded RNG uint8 RGB array (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed ^ (i * 2654435761 % (1 << 31)))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def quantize_web_safe(pixels: np.ndarray) -> np.ndarray:
    """Web-safe 216-color quantization (6 levels per channel, 0/51/../255)
    — the reference transform for `fmt='gif'` rows: GIF is palette-indexed
    (<= 256 colors), so the page's canonical pixels ARE the palettized
    ones, and the codec round trip is bit-exact."""
    return (pixels // 51 * 51).astype(np.uint8)


def gen_caption(seed: int, i: int) -> str:
    rng = np.random.default_rng((seed * 31 + i) % (1 << 31))
    words = " ".join(rng.choice(_WORDS, size=6))
    return f"caption of page {i}: {words}"


def gen_pages_rows(n_pages: int, n_hosts: int, seed: int = 42, with_bytes: bool = True):
    """Yield dict rows for the pages table + url/host columns.

    Columns: image_id, bytes, w, h, fmt, caption, phash (input_hint) plus
    url, host (join key for the deterministic "fetch").
    """
    hosts = make_hosts(n_hosts)
    assign = zipf_host_assignment(n_pages, n_hosts, seed)
    dim_rng = np.random.default_rng(seed + 1)
    dims = dim_rng.choice(len(_DIMS), size=(n_pages, 2))
    fmt_rng = np.random.default_rng(seed + 2)
    # five REAL formats (module docstring); gif rows palettize first
    fmts = fmt_rng.choice(["png", "jpeg", "ppm", "bmp", "gif"], size=n_pages)
    for i in range(n_pages):
        host = hosts[assign[i]]
        w, h = _DIMS[dims[i][0]], _DIMS[dims[i][1]]
        fmt = str(fmts[i])
        if with_bytes:
            pixels = gen_page_pixels(seed, i, w, h)
            if fmt == "gif":
                pixels = quantize_web_safe(pixels)
            blob = encode_image(pixels, fmt)
            ph = phash_pixels(decode_image(blob, fmt, w, h))
        else:
            blob, ph = b"", 0
        yield {
            "image_id": f"img-{i:012d}",
            "bytes": blob,
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": gen_caption(seed, i),
            "phash": ph,
            "url": page_url(host, i),
            "host": host,
        }


PAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, url string, host string"
)


# ---------------------------------------------------------------------------
# Link graph + HTML blobs
# ---------------------------------------------------------------------------


def gen_outlinks(n_pages: int, n_hosts: int, seed: int = 42, avg_links: int = 8):
    """Outlink target page-ids per page: mix of same-host-heavy + random."""
    hosts = make_hosts(n_hosts)
    assign = zipf_host_assignment(n_pages, n_hosts, seed)
    rng = np.random.default_rng(seed + 3)
    by_host: dict[int, np.ndarray] = {}
    for hidx in range(n_hosts):
        by_host[hidx] = np.where(assign == hidx)[0]
    out = []
    for i in range(n_pages):
        k = int(rng.integers(1, 2 * avg_links))
        same = by_host[assign[i]]
        n_same = max(1, int(k * 0.7))
        targets = list(rng.choice(same, size=min(n_same, len(same)), replace=False))
        n_rand = k - len(targets)
        if n_rand > 0:
            targets += list(rng.integers(0, n_pages, size=n_rand))
        out.append((i, hosts[assign[i]], [int(t) for t in targets], [hosts[assign[t]] for t in map(int, targets)]))
    return out


def render_html(
    page_id: int,
    host: str,
    targets: list[int],
    target_hosts: list[str],
    seed: int = 42,
) -> str:
    """HTML blob for a page: anchor list with the edge cases FIXTURES.md §3
    requires — relative hrefs, a <base href> case, fragments-only, mailto:,
    malformed — so extraction must mirror ``cheerio-crawler.ts:244-268``
    ($('a') → href → resolve against base → drop unresolvable)."""
    rng = np.random.default_rng((seed * 7 + page_id) % (1 << 31))
    use_base = page_id % 17 == 0
    parts = ["<html><head>"]
    if use_base:
        parts.append(f'<base href="https://{host}/base/">')
    parts.append(f"</head><body><h1>page {page_id}</h1>")
    for t, th in zip(targets, target_hosts):
        style = int(rng.integers(0, 10))
        if th == host and style < 4:
            # relative href (resolved against base or page URL)
            parts.append(f'<a href="/p/{t}">rel {t}</a>')
        elif th == host and style == 4:
            parts.append(f'<a href="p/{t}">doc-rel {t}</a>')
        else:
            parts.append(f'<a href="https://{th}/p/{t}">abs {t}</a>')
    # noise anchors that must be dropped
    parts.append('<a href="#section">frag only</a>')
    parts.append('<a href="mailto:x@example.com">mail</a>')
    parts.append('<a href="">empty</a>')
    parts.append("<a>no href</a>")
    parts.append('<a href="javascript:void(0)">js</a>')
    parts.append("</body></html>")
    return "".join(parts)


def gen_corpus_rows(n_pages: int, n_hosts: int, seed: int = 42, with_bytes: bool = True,
                    redirect_every: int = 0):
    """pages rows + html column (the crawlable corpus in one table).

    ``redirect_every`` > 0 turns every k-th page into an HTTP redirect:
    its ``redirect_to`` names the final URL and its ``html`` is the TARGET
    page's html (the content a real fetch returns after following the
    redirect — ``loadedUrl`` semantics, ``http-crawler.ts:480``). Targets
    are never redirects themselves (single hop) and are intentionally
    chosen on a DIFFERENT host about half the time so the same-domain
    base-resolution rules (``enqueue_links.ts:394-430``) get exercised.
    """
    links = gen_outlinks(n_pages, n_hosts, seed)
    rows = []
    for row, (pid, host, targets, thosts) in zip(
        gen_pages_rows(n_pages, n_hosts, seed, with_bytes), links
    ):
        row["html"] = render_html(pid, host, targets, thosts, seed)
        row["redirect_to"] = None
        rows.append(row)
    if redirect_every == 1:
        # every page a redirect leaves no non-redirect target to point at —
        # the target-search loop below would never terminate
        raise ValueError("redirect_every must be 0 or >= 2")
    if redirect_every > 0:
        is_redirect = lambda p: p % redirect_every == redirect_every - 1
        for pid in range(n_pages):
            if not is_redirect(pid):
                continue
            t = (pid * 7 + 1) % n_pages
            while is_redirect(t) or t == pid:
                t = (t + 1) % n_pages
            rows[pid]["redirect_to"] = rows[t]["url"]
            rows[pid]["html"] = rows[t]["html"]
    yield from rows


CORPUS_SCHEMA = PAGES_SCHEMA + ", html string, redirect_to string"


# ---------------------------------------------------------------------------
# Seeds (canonicalization stress) + robots
# ---------------------------------------------------------------------------


def gen_seed_rows(n_pages: int, n_hosts: int, seed: int = 42, n_seeds: int = 10):
    """Seed list with canonicalization stress-cases. Variants 0-2 resolve
    into the corpus URL space (case/slash/fragment noise collapses to a
    real page); variants 3-4 carry query params that SURVIVE
    canonicalization (sorted non-utm params are part of the unique key),
    so they deliberately miss the corpus and exercise the 404 -> retry ->
    dead-letter path alongside the happy path."""
    hosts = make_hosts(n_hosts)
    assign = zipf_host_assignment(n_pages, n_hosts, seed)
    rng = np.random.default_rng(seed + 5)
    picks = rng.choice(n_pages, size=min(n_seeds, n_pages), replace=False)
    rows = []
    for j, p in enumerate(map(int, picks)):
        host = hosts[assign[p]]
        url = page_url(host, p)
        variant = j % 5
        if variant == 1:
            url = url.replace("https://", "HTTPS://").replace(host, host.upper()) + "/"
        elif variant == 2:
            url = url + "#frag"
        elif variant == 3:
            url = url + "?b=2&a=1&utm_source=x"
        elif variant == 4:
            url = url + "?a=1&b=2"  # dup of variant-3 page when same p (kept distinct p here)
        rows.append({"url": url, "forefront": j % 7 == 0, "depth": 0, "label": None})
    return rows


@dataclass
class RobotsRule:
    host: str
    user_agent: str
    rule: str  # 'allow' | 'disallow'
    path_pattern: str
    crawl_delay: float | None = None


def gen_robots_rows(n_hosts: int, seed: int = 42) -> list[dict]:
    """RFC 9309 rules: every 3rd host disallows a path prefix; one host
    disallows everything for '*' but allows our agent; crawl-delay on some."""
    hosts = make_hosts(n_hosts)
    rows: list[dict] = []
    for i, h in enumerate(hosts):
        if i % 3 == 0:
            rows.append({"host": h, "user_agent": "*", "rule": "disallow",
                         "path_pattern": "/private/", "crawl_delay": None})
        if i % 5 == 0:
            # disallow a slice of the page space: paths /p/1*, longest-match
            rows.append({"host": h, "user_agent": "*", "rule": "disallow",
                         "path_pattern": "/p/1", "crawl_delay": None})
            rows.append({"host": h, "user_agent": "*", "rule": "allow",
                         "path_pattern": "/p/12", "crawl_delay": None})
        if i % 4 == 0:
            rows.append({"host": h, "user_agent": "*", "rule": "allow",
                         "path_pattern": "/", "crawl_delay": 2.0})
    return rows


ROBOTS_SCHEMA = (
    "host string, user_agent string, rule string, path_pattern string, "
    "crawl_delay double"
)


# ---------------------------------------------------------------------------
# Spark DataFrame constructors
# ---------------------------------------------------------------------------


def corpus_df(spark, n_pages: int, n_hosts: int, seed: int = 42, with_bytes: bool = True,
              redirect_every: int = 0):
    rows = list(gen_corpus_rows(n_pages, n_hosts, seed, with_bytes, redirect_every))
    return spark.createDataFrame(rows, CORPUS_SCHEMA)


def seeds_df(spark, n_pages: int, n_hosts: int, seed: int = 42, n_seeds: int = 10):
    rows = gen_seed_rows(n_pages, n_hosts, seed, n_seeds)
    return spark.createDataFrame(rows, "url string, forefront boolean, depth int, label string")


def robots_df(spark, n_hosts: int, seed: int = 42):
    rows = gen_robots_rows(n_hosts, seed)
    if not rows:
        return spark.createDataFrame([], ROBOTS_SCHEMA)
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def write_corpus_parquet(spark, path: str, n_pages: int, n_hosts: int, seed: int = 42,
                         with_bytes: bool = True, partitions: int | None = None):
    """Materialize the corpus to parquet (bench path — generate once, scan many)."""
    df = corpus_df(spark, n_pages, n_hosts, seed, with_bytes)
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("overwrite").parquet(path)
    return path
