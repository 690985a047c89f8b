"""Sitemap source (sources/sitemap.py): sitemaps.org urlset + sitemapindex
parsing, XML entity unescape, document-order preservation, and the seed
wiring into the frontier's canonicalize+dedup MERGE."""

from __future__ import annotations

from crawlee_spark.sources.sitemap import (
    parse_sitemap,
    sitemap_index_locs,
    sitemap_requests,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.test/p?x=1&amp;y=2</loc>
    <lastmod>2026-03-04</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.test/plain</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc> https://a.test/spaced </loc><priority>0.5</priority></url>
  <url>
    <loc>https://a.test/messy</loc>
    <lastmod>frequently</lastmod>
    <priority>high</priority>
  </url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.test/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>https://a.test/sitemap-2.xml?page=1&amp;tier=2</loc></sitemap>
</sitemapindex>"""


def _df(spark, xml, url="https://a.test/sitemap.xml"):
    return spark.createDataFrame([(url, xml)], "sitemap_url string, xml string")


def test_parse_urlset(spark):
    rows = parse_sitemap(_df(spark, URLSET)).orderBy("pos").collect()
    # the loc-less entry is dropped; pos is raw document order (gap at 2)
    assert [r["pos"] for r in rows] == [0, 1, 3, 4]
    assert rows[0]["url"] == "https://a.test/p?x=1&y=2"  # &amp; unescaped
    assert str(rows[0]["lastmod"]) == "2026-03-04"
    assert rows[0]["changefreq"] == "daily"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["url"] == "https://a.test/plain"
    assert rows[1]["lastmod"] is None and rows[1]["priority"] is None
    assert rows[2]["url"] == "https://a.test/spaced"  # whitespace trimmed
    assert rows[2]["priority"] == 0.5
    # real-world junk values: the FIELD goes NULL, the task survives
    # (ANSI mode would otherwise throw on to_date/cast)
    assert rows[3]["url"] == "https://a.test/messy"
    assert rows[3]["lastmod"] is None and rows[3]["priority"] is None


def test_parse_index(spark):
    rows = sitemap_index_locs(_df(spark, INDEX)).orderBy("pos").collect()
    assert [r["child_url"] for r in rows] == [
        "https://a.test/sitemap-1.xml",
        "https://a.test/sitemap-2.xml?page=1&tier=2",
    ]


def test_double_escape(spark):
    xml = "<urlset><url><loc>https://a.test/%3F?q=&amp;amp;</loc></url></urlset>"
    r = parse_sitemap(_df(spark, xml)).first()
    # &amp;amp; decodes once -> literal '&amp;' (no double decode)
    assert r["url"] == "https://a.test/%3F?q=&amp;"


ROBOTS = """# robots for a.test
User-agent: *
Disallow: /private
Sitemap: https://a.test/sitemap.xml
sitemap : https://a.test/sitemap-2.xml  # trailing comment
SITEMAP:https://a.test/sitemap-3.xml
# Sitemap: https://a.test/commented-out.xml
Sitemap:
Crawl-delay: 2
"""


def test_sitemaps_from_robots_parity(spark):
    """Spark regex path == py mirror, order preserved, comments/case/empty
    handled identically (Sitemap lines are group-independent records)."""
    from crawlee_spark.operators.robots import sitemap_urls_py
    from crawlee_spark.sources.sitemap import sitemaps_from_robots

    expected = sitemap_urls_py(ROBOTS)
    assert expected == [
        "https://a.test/sitemap.xml",
        "https://a.test/sitemap-2.xml",
        "https://a.test/sitemap-3.xml",
    ]
    df = spark.createDataFrame([("a.test", ROBOTS), ("b.test", "User-agent: *\n")],
                               "host string, robots_txt string")
    rows = sitemaps_from_robots(df).orderBy("host", "pos").collect()
    assert [r["sitemap_url"] for r in rows] == expected  # b.test yields none
    assert [r["pos"] for r in rows] == [0, 1, 2]


def test_sitemap_requests_into_frontier(spark, tmp_path):
    """Seed rows reach the frontier through the same canonicalize+dedup
    MERGE as list seeds; duplicate locs across sitemaps collapse."""
    from crawlee_spark.operators.frontier import FrontierTable

    xml2 = ("<urlset><url><loc>https://a.test/plain#frag</loc></url>"
            "<url><loc>https://b.test/only</loc></url></urlset>")
    df = spark.createDataFrame(
        [("https://a.test/sitemap.xml", URLSET),
         ("https://b.test/sitemap.xml", xml2)],
        "sitemap_url string, xml string")
    reqs = sitemap_requests(df)
    assert "user_data" in reqs.columns
    ft = FrontierTable.create(spark, str(tmp_path / "f"), num_buckets=4)
    res = ft.add_requests(reqs, step=0)
    # 6 distinct locs; a.test/plain duplicated across files (#frag stripped)
    assert res["added"] == 5
    assert res["already_present"] == 1
