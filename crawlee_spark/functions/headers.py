"""Per-session browser-like header identity (got-scraping analog).

Reference behavior being reproduced (``packages/utils/src/internals/
gotScraping.ts``; header-generator wiring in ``packages/http-crawler/src/
internals/http-crawler.ts:560-600``): every session gets a generated
browser fingerprint — User-Agent plus the matching companion headers
(Accept-Language, sec-ch-ua for Chromium UAs) — that stays FIXED for the
session's lifetime so retries present a consistent identity, and changes
when the session rotates after a blocked response.

Spark mapping: the profile is a PURE COLUMN over the session key — no
state, no Python, exactly like the proxy assignment
(``operators/proxies.py``):

    profile_id  = pmod(session_key, len(PROFILES))
    user_agent  = PROFILES[profile_id].user_agent          (element_at)
    ...same for accept_language / sec_ch_ua

The engine feeds the same session key it feeds the proxy pick —
``pmod(url_hash, 2^31) + rotation_count`` — so a plain retry (same key)
keeps its fingerprint while a SessionError rotation (key + 1) draws a
fresh one; both facts are pinned by tests/test_proxies_cookies.py.

The profile matrix is a small deterministic grid of browser × OS combos
with UA strings composed from the public UA grammar (original data — the
reference ships a statistical header-generator model; a deterministic
grid is the set-based equivalent, and the matrix is intentionally
swappable via the module constant).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class HeaderProfile:
    browser: str
    os: str
    user_agent: str
    accept_language: str
    sec_ch_ua: str  # empty for non-Chromium browsers


def _chrome(ver: int, os_part: str) -> str:
    return (f"Mozilla/5.0 ({os_part}) AppleWebKit/537.36 (KHTML, like Gecko) "
            f"Chrome/{ver}.0.0.0 Safari/537.36")


def _firefox(ver: int, os_part: str) -> str:
    return f"Mozilla/5.0 ({os_part}; rv:{ver}.0) Gecko/20100101 Firefox/{ver}.0"


def _sec_ch_ua(ver: int, brand: str = "Google Chrome") -> str:
    return (f'"Not_A Brand";v="8", "Chromium";v="{ver}", "{brand}";v="{ver}"')


_WIN = "Windows NT 10.0; Win64; x64"
_MAC = "Macintosh; Intel Mac OS X 10_15_7"
_LINUX = "X11; Linux x86_64"

PROFILES: tuple[HeaderProfile, ...] = (
    HeaderProfile("chrome", "windows", _chrome(122, _WIN),
                  "en-US,en;q=0.9", _sec_ch_ua(122)),
    HeaderProfile("chrome", "macos", _chrome(121, _MAC),
                  "en-US,en;q=0.9", _sec_ch_ua(121)),
    HeaderProfile("chrome", "linux", _chrome(120, _LINUX),
                  "en-US,en;q=0.8", _sec_ch_ua(120)),
    HeaderProfile("firefox", "windows", _firefox(124, _WIN),
                  "en-US,en;q=0.5", ""),
    HeaderProfile("firefox", "macos", _firefox(123, _MAC),
                  "en-US,en;q=0.5", ""),
    HeaderProfile("firefox", "linux", _firefox(122, _LINUX),
                  "en-GB,en;q=0.5", ""),
    HeaderProfile("safari", "macos",
                  "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
                  "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.3 "
                  "Safari/605.1.15",
                  "en-US,en;q=0.9", ""),
    HeaderProfile("edge", "windows",
                  _chrome(121, _WIN) + " Edg/121.0.0.0",
                  "en-US,en;q=0.9", _sec_ch_ua(121, "Microsoft Edge")),
)


def profile_id_col(session_key: Column) -> Column:
    """Deterministic profile pick: ``pmod(session_key, |PROFILES|)``."""
    return F.pmod(session_key, F.lit(len(PROFILES))).cast("int")


def _indexed(values: list[str], pid: Column) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, pid + 1)


def header_profile_cols(session_key: Column) -> dict[str, Column]:
    """The header-identity columns for a session key: ``header_profile_id``,
    ``user_agent``, ``accept_language``, ``sec_ch_ua`` — all JVM-side
    array lookups, attachable to any fetch set / log projection."""
    pid = profile_id_col(session_key)
    return {
        "header_profile_id": pid,
        "user_agent": _indexed([p.user_agent for p in PROFILES], pid),
        "accept_language": _indexed([p.accept_language for p in PROFILES], pid),
        "sec_ch_ua": _indexed([p.sec_ch_ua for p in PROFILES], pid),
    }


def header_profile_py(session_key: int) -> HeaderProfile:
    """Python mirror (simulator / parity tests)."""
    return PROFILES[session_key % len(PROFILES)]
