"""Full-fidelity social extraction (functions/social.py): behavioral pins
from ``social.ts`` docs/constants plus Spark-vs-Python differential checks
(the patterns use lookarounds, so DuckDB can't oracle them — the Python
``re`` mirror is the second engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.functions import social as S

PAGE = """
<a href="https://www.linkedin.com/in/alan-turing">cv</a>
en.linkedin.com/in/alan-turing linkedin.com/company/linkedin/
blalinkedin.com/in/bogus-should-not-match (lookbehind blocks this)
https://www.instagram.com/old_prague/ instagr.am/old_prague
https://www.instagram.com/explore/ should not match
https://www.twitter.com/apify twitter.com/apify
twitter.com/oauth/callback should not match (reserved + /)
https://www.facebook.com/apifytech fb.com/apifytech
https://www.facebook.com/profile.php?id=123456789
facebook.com/groups/123 should not match (reserved)
https://www.youtube.com/watch?v=kM7YfhfkiEE
https://youtu.be/kM7YfhfkiEE youtube.com/c/TrapNation
https://www.tiktok.com/trending?shareId=123456789
https://m.tiktok.com/v/123456789 tiktok.com/@jack.reacher/video/123456789
https://pinterest.com/pin/123456789 pinterest.de/uzivatel/board-name
https://discord.gg/discord-developers discord.com/invite/jyEM2PRvMU
https://ptb.discord.com/channels/1234/5678
call me at 1(413)555-2378 or (51) 5667-9987, NOT 2018-11-10 or 123456
413.577.1234 and 413 577 1234 564 work too
"""

LINK_URLS = [
    "tel://123456789",
    "tel:/123456789",
    "tel:+420775123456",
    "callto:775123456",
    "phone:12",  # too wide prefix match but body still validated
    "mailto:bob@example.com",  # not a phone link
    "https://example.com",
    "",
]


def test_handles_pinned_and_parity(spark):
    df = spark.createDataFrame([(PAGE,)], "html string")
    row = df.select(S.parse_handles(F.col("html")).alias("h")).first()["h"]
    for platform in S.HANDLE_PATTERNS:
        assert list(row[platform]) == S.handles_from_text_py(PAGE, platform), platform

    got = row.asDict()
    assert "https://www.linkedin.com/in/alan-turing" in got["linkedins"]
    assert "en.linkedin.com/in/alan-turing" in got["linkedins"]
    assert not any("bogus" in h for h in got["linkedins"])
    assert any("old_prague" in h for h in got["instagrams"])
    assert not any("explore" in h for h in got["instagrams"])
    assert any(h.endswith("/apify") for h in got["twitters"])
    assert not any("oauth" in h for h in got["twitters"])
    assert any("profile.php?id=123456789" in h for h in got["facebooks"])
    assert any("apifytech" in h for h in got["facebooks"])
    assert not any("groups" in h for h in got["facebooks"])
    assert any("kM7YfhfkiEE" in h for h in got["youtubes"])
    assert any("@jack.reacher/video/123456789" in h for h in got["tiktoks"])
    assert any("pin/123456789" in h for h in got["pinterests"])
    assert any("discord.gg/discord-developers" in h for h in got["discords"])
    assert any("channels/1234/5678" in h for h in got["discords"])


def test_phones_from_text_pinned_and_parity(spark):
    df = spark.createDataFrame([(PAGE,)], "html string")
    got = list(df.select(S.phones_from_text(F.col("html")).alias("p")).first()["p"])
    assert got == S.phones_from_text_py(PAGE)
    assert "1(413)555-2378" in got
    assert "(51) 5667-9987" in got
    assert "413.577.1234" in got
    assert "413 577 1234 564" in got
    assert "2018-11-10" not in got  # skip-date pattern
    assert "123456" not in got      # < 7 digits


def test_phones_from_urls_pinned_and_parity(spark):
    df = spark.createDataFrame([(LINK_URLS,)], "urls array<string>")
    got = list(df.select(S.phones_from_urls(F.col("urls")).alias("p")).first()["p"])
    assert got == S.phones_from_urls_py(LINK_URLS)
    assert got == ["123456789", "123456789", "+420775123456", "775123456"]


def test_differential_fuzz(spark):
    """Random digit/punct/url-ish soup: Spark (Java regex) must agree with
    the Python mirror on every platform and the phone filters."""
    import random

    rng = random.Random(42)
    alphabet = list("0123456789-.() +/@:abcdefghij tw.comlinked")
    cases = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
             for _ in range(200)]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, t string"
    )
    rows = df.select(
        "i", S.phones_from_text(F.col("t")).alias("p"),
        S.handles_from_text(F.col("t"), "twitters").alias("tw"),
        S.handles_from_text(F.col("t"), "linkedins").alias("li"),
    ).collect()
    by = {r["i"]: r for r in rows}
    for i, c in enumerate(cases):
        assert list(by[i]["p"]) == S.phones_from_text_py(c), repr(c)
        assert list(by[i]["tw"]) == S.handles_from_text_py(c, "twitters"), repr(c)
        assert list(by[i]["li"]) == S.handles_from_text_py(c, "linkedins"), repr(c)
