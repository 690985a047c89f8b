"""Cookie persistence + merge (``packages/core/src/cookie_utils.ts:1-126``,
session cookie jar at ``session.ts`` setCookiesFromResponse /
getCookieString; browser-format bridge omitted — no browser runtime).

The reference parses ``Set-Cookie`` response headers into a per-session
jar, REPLACING cookies that match on (name, domain, path), dropping
expired ones, and serializes the jar back into a ``Cookie`` request header
for same-domain requests. These are pure string/dict functions here —
the fetch runtime that would call them is the deterministic corpus join,
so the jar lives wherever session state lives (the session pool rows /
KeyValueStore); tests pin merge + scoping semantics.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Cookie:
    name: str
    value: str
    domain: str = ""       # leading-dot normalized away
    path: str = "/"
    expires: float | None = None  # epoch seconds; None = session cookie
    secure: bool = False
    # RFC 6265 host-only flag: no Domain attribute was present — the cookie
    # is sent ONLY to the exact origin host, never to subdomains (the
    # tough-cookie ``hostOnly`` flag the reference jar tracks)
    host_only: bool = False


def parse_set_cookie(header: str, default_domain: str = "",
                     now: float = 0.0) -> Cookie | None:
    """One ``Set-Cookie`` header -> Cookie (None when malformed).

    ``expires`` is stored as an absolute clock value on the caller's
    timeline: ``Max-Age`` is ``now + seconds`` (RFC 6265 §5.3: Max-Age has
    precedence over Expires), ``Expires`` is the parsed HTTP-date's epoch
    seconds (a date-expired cookie must be droppable — the reference's
    tough-cookie jar honors both attributes). Callers that keep ``now=0``
    get Max-Age as a relative offset, matching ``cookie_header(now=...)``
    on the same zero-based clock.

    ``default_domain`` is the ORIGIN host of the response. Domain scoping
    follows RFC 6265 §5.3 steps 5-6: no Domain attribute -> host-only
    cookie (sent to the exact origin only); a Domain attribute that is a
    public suffix (supercookie, e.g. ``Domain=com``) or that the origin
    host does not domain-match (cross-site set) -> the whole cookie is
    IGNORED (returns None), exactly like the reference's tough-cookie jar.
    """
    parts = [p.strip() for p in header.split(";")]
    if not parts or "=" not in parts[0]:
        return None
    name, _, value = parts[0].partition("=")
    name = name.strip()
    if not name:
        return None
    domain, path, expires, secure = "", "/", None, False
    saw_max_age = False
    for p in parts[1:]:
        k, _, v = p.partition("=")
        k = k.strip().lower()
        v = v.strip()
        if k == "domain" and v:
            domain = v.lstrip(".").lower()
        elif k == "path" and v:
            path = v
        elif k == "max-age":
            try:
                expires = now + float(v)
                saw_max_age = True
            except ValueError:
                pass
        elif k == "expires" and v and not saw_max_age:
            from email.utils import parsedate_to_datetime

            try:
                expires = parsedate_to_datetime(v).timestamp()
            except (ValueError, TypeError):
                pass
        elif k == "secure":
            secure = True
    origin = default_domain.lower()
    if not domain:
        # no Domain attribute: host-only, scoped to the exact origin
        return Cookie(name, value.strip(), origin, path, expires, secure,
                      host_only=True)
    if _is_public_suffix(domain):
        return None  # RFC 6265 §5.3 step 5: supercookie — ignore
    if origin and not _domain_matches(domain, origin):
        return None  # §5.3 step 6: origin outside the claimed domain
    return Cookie(name, value.strip(), domain, path, expires, secure)


def _is_public_suffix(domain: str) -> bool:
    """d is a public suffix iff 'probe.d' is exactly an eTLD+1."""
    from crawlee_spark.functions.psl import registrable_domain_psl_py

    probe = "probe." + domain
    return registrable_domain_psl_py(probe) == probe


def merge_cookies(jar: list[Cookie], new: list[Cookie]) -> list[Cookie]:
    """Merge semantics of ``mergeCookies`` (cookie_utils.ts): a new cookie
    REPLACES an existing one matching (name, domain, path); order is
    existing-then-appended, deterministic."""
    keyed = {(c.name, c.domain, c.path): i for i, c in enumerate(jar)}
    out = list(jar)
    for c in new:
        k = (c.name, c.domain, c.path)
        if k in keyed:
            out[keyed[k]] = c
        else:
            keyed[k] = len(out)
            out.append(c)
    return out


def _domain_matches(cookie_domain: str, host: str) -> bool:
    if not cookie_domain:
        return False
    return host == cookie_domain or host.endswith("." + cookie_domain)


def _cookie_matches_host(c: Cookie, host: str) -> bool:
    if c.host_only:
        return host == c.domain  # exact origin only (RFC 6265 §5.4)
    return _domain_matches(c.domain, host)


def _path_matches(cookie_path: str, path: str) -> bool:
    if cookie_path == "/" or path == cookie_path:
        return True
    if path.startswith(cookie_path):
        return cookie_path.endswith("/") or path[len(cookie_path)] == "/"
    return False


def cookie_header(jar: list[Cookie], url: str, now: float = 0.0) -> str:
    """``Cookie`` request-header value for ``url``: domain + path scoped,
    secure-only over https, expired dropped; jar order preserved
    (getCookieString analog)."""
    from crawlee_spark.functions.urls import host_of_py

    host = host_of_py(url) or ""
    https = url.lower().startswith("https://")
    base = url.split("#", 1)[0]
    after = base.split("://", 1)[-1]
    slash = after.find("/")
    path = after[slash:].split("?", 1)[0] if slash >= 0 else "/"
    out = []
    for c in jar:
        if c.expires is not None and c.expires <= now:
            continue
        if c.secure and not https:
            continue
        if not _cookie_matches_host(c, host):
            continue
        if not _path_matches(c.path, path or "/"):
            continue
        out.append(f"{c.name}={c.value}")
    return "; ".join(out)
