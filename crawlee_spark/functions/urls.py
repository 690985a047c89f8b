"""URL canonicalization, uniqueKey, host extraction — the engine's "distinct" key.

Reference behavior pins (see SURVEY.md §2.3):
- ``packages/core/src/request.ts:361-375`` — uniqueKey = normalizeUrl(url,
  keepUrlFragment) with fallback to the raw url.
- ``request.ts:400-401`` — documented example:
  ``HTTP://www.EXAMPLE.com/something/`` → ``http://www.example.com/something``
  (lowercase scheme+host, trailing slash stripped).
- ``test/core/request_list.test.ts:48-67`` — ``https://example.com/1`` and
  ``https://example.com/1#same`` share one uniqueKey (fragment stripped).
- BASELINE.json canonicalization: lowercase host, sorted query params,
  fragment strip; key hashed with xxhash64.

Normalization rules implemented (identically in three places — Spark columns
here, pure Python below for the reference simulator, and DuckDB SQL in
``plans/queries.py`` for the oracle):

1. trim whitespace
2. URL must have a ``scheme://`` prefix, else canonical form is NULL
   (callers treat NULL as "unresolvable, drop" — memory-storage pins http(s)
   at ``request-queue.ts:21``)
3. fragment stripped (kept verbatim when ``keep_fragment``)
4. scheme lowercased; userinfo dropped; host lowercased
5. default port dropped (http:80 / https:443), other ports kept
6. trailing slashes stripped from the path (``/x/`` → ``/x``, ``/`` → empty)
7. query params: empty tokens and ``utm_*`` keys dropped, remainder sorted
   lexicographically (sorted-params pin), rebuilt with ``&``

Everything is a Spark SQL column expression — whole-stage codegen, no Python
in the hot path.
"""

from __future__ import annotations

from urllib.parse import urljoin  # used by the (cold-path) resolver UDF

from pyspark.sql import Column
from pyspark.sql import functions as F

# Multi-label public suffixes we special-case for registrable-domain (eTLD+1)
# extraction. The reference uses the full tldts public-suffix list; a compact
# embedded subset keeps this JVM-side (no per-row Python). Extend as needed.
MULTI_LABEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
    "com.sg", "com.tr", "com.ar",
]

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
# validation-only form (no capture group needed for rlike)
_SCHEME_VALID_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"

def _big():  # F.lit needs an active session; build lazily
    return F.lit(2**30)


# the WHITESPACE the three mirrors agree to strip: the reference trims via
# JS String.trim before URL-parsing (request.ts computeUniqueKey), which
# removes tabs/newlines too — Spark F.trim strips ONLY spaces, so the
# mirrors use an explicit trim-set (py: str.strip(WS); DuckDB:
# trim(url, WS))
WS = " \t\n\r"


def _ws_trim(url: Column) -> Column:
    return F.btrim(url, F.lit(WS))


def _strip_fragment(url: Column) -> Column:
    # everything before the first '#' — non-regex
    return F.substring_index(_ws_trim(url), "#", 1)


def _url_parts(url: Column):
    """Split a URL into (valid, scheme, host, port_part-less pieces) with ONE
    regex evaluation (the scheme validity rlike) + non-regex string ops.

    This is the hottest expression in the engine (every frontier row passes
    through it); the previous implementation chained ~10 regexp
    extract/replace passes per URL — measured ~2x slower than this
    substring_index/substring pipeline at the frontier microbench.
    Semantics are IDENTICAL (pinned by tests/test_urls.py parity and the
    DuckDB oracle, which still uses the regex formulation).
    """
    base = _strip_fragment(url)
    valid = base.rlike(_SCHEME_VALID_RE)
    scheme = F.lower(F.substring_index(base, "://", 1))
    rest = F.substring(base, F.length(scheme) + F.lit(4), _big())
    # authority = rest up to the first '/' or '?'
    authority = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    tail = F.substring(rest, F.length(authority) + F.lit(1), _big())
    path = F.substring_index(tail, "?", 1)
    query = F.when(
        F.length(tail) > F.length(path),
        F.substring(tail, F.length(path) + F.lit(2), _big()),
    ).otherwise(F.lit(""))
    host_port = F.substring_index(authority, "@", -1)  # after LAST '@'
    host = F.lower(F.substring_index(host_port, ":", 1))
    port = F.regexp_extract(host_port, r":([0-9]+)$", 1)  # tiny-string regex
    return valid, scheme, host, port, path, query


def canonicalize(url: Column, keep_fragment: bool = False) -> Column:
    """Canonical URL as a Spark column (NULL when there is no scheme://)."""
    trimmed = _ws_trim(url)
    valid, scheme, host, port, path, query = _url_parts(url)
    port_part = (
        F.when(port == "", F.lit(""))
        .when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )

    norm_path = F.rtrim(path, F.lit("/"))  # strip ALL trailing slashes

    tokens = F.filter(
        F.split(query, "&"),
        lambda t: (t != "") & (~F.lower(t).startswith("utm_")),
    )
    sorted_q = F.concat_ws("&", F.array_sort(tokens))
    query_part = F.when(sorted_q == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_q)
    )

    canonical = F.concat(scheme, F.lit("://"), host, port_part, norm_path, query_part)
    if keep_fragment:
        base_len = F.length(_strip_fragment(url))
        frag = F.when(
            F.length(trimmed) > base_len,
            F.substring(trimmed, base_len + F.lit(2), _big()),
        ).otherwise(F.lit(""))
        canonical = F.when(frag == "", canonical).otherwise(
            F.concat(canonical, F.lit("#"), frag)
        )
    return F.when(~valid, F.lit(None).cast("string")).otherwise(canonical)


def unique_key(url: Column, explicit: Column | None = None, keep_fragment: bool = False) -> Column:
    """uniqueKey column: explicit override > canonical > raw url.

    Mirrors ``request.ts:361-375`` (computeUniqueKey falls back to the raw
    url when normalization fails).
    """
    canon = F.coalesce(canonicalize(url, keep_fragment), _ws_trim(url))
    if explicit is not None:
        return F.coalesce(explicit, canon)
    return canon


def extended_unique_key(
    url: Column, method: Column | None = None, payload: Column | None = None,
    keep_fragment: bool = False,
) -> Column:
    """useExtendedUniqueKey form: ``METHOD(payloadHash):normalizedUrl``
    (``request.ts:361-375``; payload hash = first 8 hex chars of
    sha256(payload), ``request.ts:377-384``; empty when no payload).
    """
    m = F.upper(F.coalesce(method, F.lit("GET"))) if method is not None else F.lit("GET")
    canon = F.coalesce(canonicalize(url, keep_fragment), _ws_trim(url))
    if payload is not None:
        ph = F.when(
            payload.isNull(), F.lit("")
        ).otherwise(F.substring(F.sha2(payload, 256), 1, 8))
    else:
        ph = F.lit("")
    return F.concat(m, F.lit("("), ph, F.lit("):"), canon)


def extended_unique_key_py(url: str, method: str = "GET",
                           payload: bytes | None = None,
                           keep_fragment: bool = False) -> str:
    import hashlib

    canon = canonicalize_py(url, keep_fragment) or url.strip(WS)
    ph = hashlib.sha256(payload).hexdigest()[:8] if payload else ""
    return f"{method.upper()}({ph}):{canon}"


def url_hash(key: Column) -> Column:
    """64-bit frontier key: xxhash64(uniqueKey) per BASELINE.json north_rule.

    (The reference uses base64(sha256(uniqueKey))[:15] as a *string* id,
    ``packages/core/src/storages/utils.ts:105-113``; a 64-bit key feeds the
    Bloom/cuckoo URL-seen shards and is far cheaper to shuffle.)
    """
    return F.xxhash64(key)


def host_of(url: Column) -> Column:
    """Lowercased hostname (no port, no userinfo); NULL without scheme://."""
    valid, _scheme, h, _port, _path, _query = _url_parts(url)
    return F.when((h == "") | ~valid, F.lit(None).cast("string")).otherwise(h)


def host_hash(host: Column, num_buckets: int) -> Column:
    """Frontier partition key: bucket(N, xxhash64(host)). Non-negative."""
    return F.pmod(F.xxhash64(host), F.lit(num_buckets)).cast("int")


def registrable_domain(host: Column) -> Column:
    """eTLD+1 (tldts ``getDomain`` analog) as a JVM-side expression.

    Uses the embedded multi-label suffix subset; defaults to last-2-labels.
    Reference consumer: same-domain enqueue strategy
    (``enqueue_links.ts:177-209``) and sameDomainDelaySecs keying
    (``basic-crawler.ts:1111-1138``).
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.slice(parts, -2, 2))
    last3 = F.concat_ws(".", F.slice(parts, -3, 3))
    suffixes = F.array(*[F.lit(s) for s in MULTI_LABEL_SUFFIXES])
    return (
        F.when(n <= 2, host)
        .when(F.array_contains(suffixes, last2) & (n >= 3), last3)
        .otherwise(last2)
    )


def origin_of(url: Column) -> Column:
    """scheme://host[:port] of the canonical form (same-origin strategy).

    Assembled directly from the parsed pieces — re-extracting from the
    canonical string would pay the whole parse twice."""
    valid, scheme, host, port, _path, _query = _url_parts(url)
    port_part = (
        F.when(port == "", F.lit(""))
        .when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )
    return F.when(~valid, F.lit(None).cast("string")).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part)
    )


# ---------------------------------------------------------------------------
# Pure-Python mirrors (reference simulator + datagen use these; they MUST
# produce byte-identical results to the Spark expressions — pinned by
# tests/test_urls.py parity tests).
# ---------------------------------------------------------------------------

import re as _re

_SCHEME_PAT = _re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://")


def canonicalize_py(url: str, keep_fragment: bool = False) -> str | None:
    trimmed = url.strip(WS)
    hash_idx = trimmed.find("#")
    frag = trimmed[hash_idx + 1 :] if hash_idx >= 0 else ""
    base = trimmed[:hash_idx] if hash_idx >= 0 else trimmed
    m = _SCHEME_PAT.match(base)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = base[m.end() :]
    sep = len(rest)
    for ch in "/?":
        i = rest.find(ch)
        if i >= 0:
            sep = min(sep, i)
    authority, tail = rest[:sep], rest[sep:]
    q_idx = tail.find("?")
    path = tail[:q_idx] if q_idx >= 0 else tail
    query = tail[q_idx + 1 :] if q_idx >= 0 else ""

    host_port = authority.rsplit("@", 1)[-1]
    pm = _re.search(r":([0-9]+)$", host_port)
    port = pm.group(1) if pm else ""
    # host = up to the FIRST colon (matches the Spark/DuckDB mirrors even on
    # degenerate multi-colon authorities)
    host = host_port.split(":", 1)[0].lower()
    if (scheme == "http" and port == "80") or (scheme == "https" and port == "443"):
        port = ""
    port_part = f":{port}" if port else ""

    norm_path = _re.sub(r"/+$", "", path)

    tokens = [t for t in query.split("&") if t and not t.lower().startswith("utm_")]
    sorted_q = "&".join(sorted(tokens))
    query_part = f"?{sorted_q}" if sorted_q else ""

    canonical = f"{scheme}://{host}{port_part}{norm_path}{query_part}"
    if keep_fragment and frag:
        canonical = f"{canonical}#{frag}"
    return canonical


def unique_key_py(url: str, explicit: str | None = None, keep_fragment: bool = False) -> str:
    if explicit:
        return explicit
    return canonicalize_py(url, keep_fragment) or url.strip(WS)


def host_of_py(url: str) -> str | None:
    trimmed = url.strip(WS)
    base = trimmed.split("#", 1)[0]
    m = _SCHEME_PAT.match(base)
    if not m:
        return None
    rest = base[m.end() :]
    sep = len(rest)
    for ch in "/?":
        i = rest.find(ch)
        if i >= 0:
            sep = min(sep, i)
    authority = rest[:sep]
    host_port = authority.rsplit("@", 1)[-1]
    host = _re.sub(r":[0-9]+$", "", host_port).lower()
    return host or None


def registrable_domain_py(host: str) -> str:
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    last2 = ".".join(parts[-2:])
    if last2 in MULTI_LABEL_SUFFIXES:
        return ".".join(parts[-3:])
    return last2


def resolve_href_py(base_url: str, href: str) -> str | None:
    """Absolutize an extracted href against its page/base URL.

    Mirrors ``createRequestOptions`` URL-validity filtering
    (``enqueue_links/shared.ts:211-241``): non-http(s) results (mailto:,
    javascript:) and unresolvable hrefs return None.
    """
    href = (href or "").strip()
    if not href:
        return None
    try:
        absolute = urljoin(base_url, href)
    except ValueError:
        return None
    if not absolute.lower().startswith(("http://", "https://")):
        return None
    m = _SCHEME_PAT.match(absolute)
    if not m:
        return None
    return absolute
