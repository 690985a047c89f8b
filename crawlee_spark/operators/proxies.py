"""Proxy configuration: deterministic per-request proxy assignment.

Reference: ``packages/core/src/proxy_configuration.ts`` — a
ProxyConfiguration holds ``proxyUrls`` (rotated), an optional
``newUrlFunction`` override (``:20-22``), and ``tieredProxyUrls`` where
higher tiers are tried as a request keeps failing. ``newUrl(sessionId)``
pins a session to a proxy so retries reuse the same egress identity.

Spark mapping: proxy choice is a PURE COLUMN over (url_hash, retry_count,
session) — no state, no Python:

- flat list: proxy = proxyUrls[pmod(session_key, n)] — session-sticky
  round-robin (the reference cycles per new session; we hash, which is the
  deterministic set-based equivalent);
- tiered: tier = min(retry_count, n_tiers - 1) — each failed attempt
  escalates one tier (the reference's tier rotation raises the tier for
  domains that keep failing), then round-robin within the tier.

The engine attaches the column to the fetch set and records it in the
fetch log; with no real network the assignment is observability +
session-identity plumbing, exactly like the session pool.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class ProxyConfiguration:
    proxy_urls: list[str] = field(default_factory=list)
    # tiered_proxy_urls[tier] = list of proxies for that tier; overrides
    # proxy_urls when non-empty (proxy_configuration.ts tieredProxyUrls)
    tiered_proxy_urls: list[list[str]] = field(default_factory=list)

    def __post_init__(self):
        if not self.proxy_urls and not self.tiered_proxy_urls:
            raise ValueError("need proxy_urls or tiered_proxy_urls")
        # fail fast: an empty tier would ZeroDivisionError in new_url_py
        # and silently emit a NULL proxy column on the Spark side
        for i, tier in enumerate(self.tiered_proxy_urls or []):
            if not tier:
                raise ValueError(f"tiered_proxy_urls[{i}] is empty")

    # -- python mirror (newUrl analog) --------------------------------------

    def new_url_py(self, session_key: int, retry_count: int = 0) -> str:
        if self.tiered_proxy_urls:
            tier = min(retry_count, len(self.tiered_proxy_urls) - 1)
            urls = self.tiered_proxy_urls[tier]
        else:
            urls = self.proxy_urls
        return urls[session_key % len(urls)]

    # -- spark column --------------------------------------------------------

    def proxy_col(self, session_key: Column, retry_count: Column | None = None) -> Column:
        """Proxy URL column; session-sticky, tier-escalating on retries."""
        if self.tiered_proxy_urls:
            rc = retry_count if retry_count is not None else F.lit(0)
            tier = F.least(rc, F.lit(len(self.tiered_proxy_urls) - 1))
            expr = None
            for t, urls in enumerate(self.tiered_proxy_urls):
                arr = F.array(*[F.lit(u) for u in urls])
                pick = F.element_at(arr, (F.pmod(session_key, F.lit(len(urls))) + 1).cast("int"))
                expr = F.when(tier == t, pick) if expr is None else expr.when(tier == t, pick)
            return expr
        arr = F.array(*[F.lit(u) for u in self.proxy_urls])
        n = len(self.proxy_urls)
        return F.element_at(arr, (F.pmod(session_key, F.lit(n)) + 1).cast("int"))
