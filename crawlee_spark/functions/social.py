"""Full-fidelity social handle / phone extraction — the complete
``packages/utils/src/internals/social.ts`` surface (round 1 shipped only
emails + simplified twitter/github patterns; this module carries the
reference's real patterns).

The reference regexes use negative lookbehind/lookahead (``(?<!\\w)``,
``(?!reserved|...)``) which Java regex (Spark) and Python ``re`` both
support but RE2 (DuckDB) does not — so this family is pinned by
Spark-vs-Python differential tests (tests/test_social.py), not by a DuckDB
oracle; the oracle-checked simplified variant remains ``q:social_extract``.

Pattern provenance: behavioral pins of ``social.ts`` constants —
  LINKEDIN/INSTAGRAM/TWITTER/FACEBOOK/YOUTUBE/TIKTOK/PINTEREST/DISCORD
  regex strings: ``social.ts:170-194`` (JS ``\\/`` unescaped, semantics
  identical; matching is case-insensitive via ``(?i)`` = the 'i' flag);
  phone patterns + min-digits + skip-dates: ``social.ts:65-139``;
  tel:/callto: URL extraction: ``social.ts:59, 149-161``;
  sort+dedup of handle lists: ``social.ts:290-293``.

All Spark paths are JVM column expressions (regexp_extract_all + array
HOFs) — one scan-project per page batch, no Python in the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- handle patterns (social.ts:170-194; JS `\/` -> `/`) -------------------

_TWITTER_RESERVED = (
    "oauth|account|tos|privacy|signup|home|hashtag|search|login|widgets|i|"
    "settings|start|share|intent|oct"
)
_FACEBOOK_RESERVED = (
    r"rsrc\.php|apps|groups|events|l\.php|friends|images|photo.php|chat|ajax|"
    r"dyi|common|policies|login|recover|reg|help|security|messages|"
    r"marketplace|pages|live|bookmarks|games|fundraisers|saved|gaming|"
    r"salesgroups|jobs|people|ads|ad_campaign|weather|offers|recommendations|"
    r"crisisresponse|onthisday|developers|settings|connect|business|plugins|"
    r"intern|sharer"
)

HANDLE_PATTERNS: dict[str, str] = {
    "linkedins": (
        r"(?<!\w)(?:(?:http(?:s)?://)?(?:(?:(?:[a-z]+\.)?linkedin\.com/"
        r"(?:in|company)/)([a-z0-9\-_%=]{2,60})(?![a-z0-9\-_%=])))(?:/)?"
    ),
    "instagrams": (
        r"(?<!\w)(?:http(?:s)?://)?(?:(?:www\.)?(?:instagram\.com|instagr\.am)/)"
        r"(?!explore|_n|_u)([a-z0-9_.]{2,30})(?![a-z0-9_.])(?:/)?"
    ),
    "twitters": (
        r"(?<!\w)(?:http(?:s)?://)?(?:www.)?(?:twitter.com)/"
        rf"(?!(?:{_TWITTER_RESERVED})(?:['\"?./]|$))"
        r"([a-z0-9_]{1,15})(?![a-z0-9_])(?:/)?"
    ),
    "facebooks": (
        r"(?<!\w)(?:http(?:s)?://)?(?:www.)?(?:facebook.com|fb.com)/"
        rf"(?!(?:{_FACEBOOK_RESERVED})(?:['\"?./]|$))"
        r"(profile\.php\?id\=[0-9]{3,20}|(?!profile\.php)[a-z0-9\.]{5,51})"
        r"(?![a-z0-9\.])(?:/)?"
    ),
    "youtubes": (
        r"(?<!\w)(?:https?://)?(?:youtu\.be/|(?:www\.|m\.)?youtube\.com"
        r"(?:/(?:watch|v|embed|user|c(?:hannel)?)(?:\.php)?)?(?:\?[^ ]*v=|/))"
        r"([a-zA-Z0-9\-_]{2,100})"
    ),
    "tiktoks": (
        r"(?<!\w)(?:http(?:s)?://)?(?:(?:www|m)\.)?(?:tiktok\.com)/"
        r"(((?:(?:v|embed|trending)(?:\?shareId=|/))[0-9]{2,50}(?![0-9]))|"
        r"(?:@)[a-z0-9\-_\.]+((?:/video/)[0-9]{2,50}(?![0-9]))?)(?:/)?"
    ),
    "pinterests": (
        r"(?<!\w)(?:http(?:s)?://)?(?:(?:(?:(?:www\.)?pinterest"
        r"(?:\.com|(?:\.[a-z]{2}){1,2}))|(?:[a-z]{2})\.pinterest\.com)(?:/))"
        r"((pin/[0-9]{2,50})|((?!pin)[a-z0-9\-_\.]+(/[a-z0-9\-_\.]+)?))(?:/)?"
    ),
    "discords": (
        r"(?<!\w)(?:https?://)?(?:www\.)?((?:(?:(?:canary|ptb).)?"
        r"(?:discord|discordapp)\.com/channels(?:/)[0-9]{2,50}(/[0-9]{2,50})*)|"
        r"(?:(?:(?:canary|ptb).)?(?:discord\.(?:com|me|li|gg|io)|"
        r"discordapp\.com)(?:/invite)?)/(?!channels)[a-z0-9\-_]{2,50})(?:/)?"
    ),
}

# --- phone patterns (social.ts:65-114) --------------------------------------

_PHONE_BODIES = [
    r"[0-9]{6,15}",
    r"([0-9]{1,4}( )?)?\([0-9]{2,4}\)( )?[0-9]{2,4}(( )?(-|.))?( )?[0-9]{2,6}",
    r"\([0-9]{2}\)( )?[0-9]{4,5}-[0-9]{4}",
    r"([0-9]{1,4}( )?)?\([0-9]{2,4}\)( )?[0-9]{2,4}(( )?(-|.))?( )?[0-9]{2,6}",
    r"[0-9]{2,4}-[0-9]{2,4}-[0-9]{2,4}-[0-9]{2,6}",
    r"[0-9]{2,4}-[0-9]{2,4}-[0-9]{2,6}",
    r"[0-9]{2,4}-[0-9]{2,6}",
    r"[0-9]{2,4}\.[0-9]{2,4}\.[0-9]{2,4}\.[0-9]{2,6}",
    r"[0-9]{2,4}\.[0-9]{2,4}\.[0-9]{2,6}",
    r"[0-9]{2,4}\.[0-9]{2,6}",
    r"[0-9]{2,4} [0-9]{2,4} [0-9]{2,4} [0-9]{2,6}",
    r"[0-9]{2,4} [0-9]{2,4} [0-9]{2,6}",
    r"[0-9]{2,4} [0-9]{3,8}",
]
PHONE_PATTERN = "(" + "|".join(rf"(00|\+)?{p}" for p in _PHONE_BODIES) + ")"
PHONE_MIN_DIGITS = 7  # social.ts:103
SKIP_PHONE_PATTERN = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"  # dates, social.ts:107
PHONE_URL_PREFIX = r"(?i)^(tel|phone|telephone|callto):(/)?(/)?"


def handles_from_text(text: Column, platform: str) -> Column:
    """Sorted-distinct full-match handles of one platform (social.ts:280-293
    match + sort + dedup). Case-insensitive like the reference's 'ig'."""
    pat = "(?i)" + HANDLE_PATTERNS[platform]
    return F.array_sort(
        F.array_distinct(F.regexp_extract_all(text, F.lit(pat), 0))
    )


def parse_handles(text: Column) -> Column:
    """All platforms at once as a struct of arrays (parseHandlesFromHtml's
    regex section; the DOM/link-walk half lives in functions/html.py)."""
    return F.struct(*[
        handles_from_text(text, p).alias(p) for p in sorted(HANDLE_PATTERNS)
    ])


def phones_from_text(text: Column) -> Column:
    """phonesFromText (social.ts:124-139): wide multi-pattern match, then
    drop matches with < 7 digits and date-shaped false positives."""
    matches = F.regexp_extract_all(text, F.lit(PHONE_PATTERN), 0)
    return F.filter(
        matches,
        lambda x: (
            F.length(F.regexp_replace(x, "[^0-9]", "")) >= PHONE_MIN_DIGITS
        ) & ~x.rlike(SKIP_PHONE_PATTERN),
    )


def phones_from_urls(urls: Column) -> Column:
    """phonesFromUrls (social.ts:149-161): tel:/phone:/telephone:/callto:
    links, prefix-stripped, full-match validated."""
    stripped = F.transform(
        F.filter(urls, lambda u: u.rlike(PHONE_URL_PREFIX)),
        lambda u: F.trim(F.regexp_replace(u, PHONE_URL_PREFIX, "")),
    )
    return F.filter(stripped, lambda p: p.rlike("^" + PHONE_PATTERN + "$"))


# --- pure-Python mirrors (differential-test twins; same patterns) -----------

def handles_from_text_py(text: str, platform: str) -> list[str]:
    rx = re.compile(HANDLE_PATTERNS[platform], re.I)
    return sorted({m.group(0) for m in rx.finditer(text or "")})


def phones_from_text_py(text: str) -> list[str]:
    out = []
    for m in re.finditer(PHONE_PATTERN, text or ""):
        s = m.group(0)
        if len(re.findall(r"[0-9]", s)) < PHONE_MIN_DIGITS:
            continue
        if re.match(SKIP_PHONE_PATTERN, s):
            continue
        out.append(s)
    return out


def phones_from_urls_py(urls: list[str]) -> list[str]:
    prefix = re.compile(r"^(tel|phone|telephone|callto):(/)?(/)?", re.I)
    full = re.compile("^" + PHONE_PATTERN + "$")
    out = []
    for u in urls:
        if not u or not prefix.match(u):
            continue
        p = prefix.sub("", u).strip()
        if full.match(p):
            out.append(p)
    return out
