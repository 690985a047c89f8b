"""HTML anchor extraction — shared by the Spark pandas UDF and the simulator.

Reference behavior pin (``packages/cheerio-crawler/src/internals/
cheerio-crawler.ts:244-268`` extractUrlsFromCheerio): select ``a`` elements,
take ``href`` attributes, drop empties, resolve each against the page URL
honoring ``<base href>`` (the DOM's baseURI logic), drop unresolvable /
non-http(s) results (``enqueue_links/shared.ts:211-241`` createRequestOptions
filters through ``new URL``). Document order is preserved.

cheerio/htmlparser2 are not available here; a conservative regex parser over
the synthetic corpus (datagen.render_html) is exact for that grammar and
"good enough" for arbitrary HTML in the same way the reference's CSS selector
is: both enumerate <a href> in document order. The same function body runs in
the Arrow-batched UDF (operators/enqueue_links.py) and the pure-Python
simulator, so extraction parity is by construction.
"""

from __future__ import annotations

import re

from crawlee_spark.functions.urls import resolve_href_py

_BASE_RE = re.compile(r"<base\b[^>]*\bhref\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I)
_A_RE = re.compile(r"<a\b[^>]*\bhref\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I)


def _attr(m: re.Match) -> str:
    return m.group(2) if m.group(2) is not None else (
        m.group(3) if m.group(3) is not None else m.group(4)
    )


def extract_hrefs(html: str) -> tuple[str | None, list[str]]:
    """(base_href, [raw hrefs in document order]); empty hrefs dropped."""
    if not html:
        return None, []
    bm = _BASE_RE.search(html)
    base = _attr(bm).strip() if bm else None
    hrefs = [h for h in (_attr(m).strip() for m in _A_RE.finditer(html)) if h]
    return base or None, hrefs


def extract_links(page_url: str, html: str) -> list[str]:
    """Absolutized, filtered, order-preserving link list for one page.

    Mirrors the cheerio pipeline: base-aware resolution, drop fragment-only
    self-links? — no: the reference resolves ``#frag`` to the page URL itself
    and keeps it (dedup later strips the fragment anyway); only *unresolvable*
    and non-http(s) hrefs are dropped. We match that: ``#section`` resolves to
    ``page_url#section`` and survives to the canonicalizer, which fragments-
    strips it into the page's own uniqueKey (then dedup drops it).
    """
    base, hrefs = extract_hrefs(html)
    effective_base = resolve_href_py(page_url, base) if base else page_url
    if effective_base is None:
        effective_base = page_url
    out = []
    for h in hrefs:
        absolute = resolve_href_py(effective_base, h)
        if absolute is not None:
            out.append(absolute)
    return out
