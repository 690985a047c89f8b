"""Link extraction semantics (extractUrlsFromCheerio pins, SURVEY.md §2.5)."""

from __future__ import annotations

from crawlee_spark.functions.html import extract_hrefs, extract_links


def test_extract_hrefs_document_order():
    html = '<a href="/a">1</a><a href=\'/b\'>2</a><a href=/c>3</a><a>no</a><a href="">e</a>'
    base, hrefs = extract_hrefs(html)
    assert base is None
    assert hrefs == ["/a", "/b", "/c"]


def test_base_href_resolution():
    html = '<head><base href="https://x.com/dir/"></head><a href="p/1">r</a><a href="/abs">a</a>'
    links = extract_links("https://x.com/page", html)
    # doc-relative resolves against <base>, absolute-path against host root
    assert links == ["https://x.com/dir/p/1", "https://x.com/abs"]


def test_drop_non_http_and_keep_fragment_resolution():
    html = (
        '<a href="mailto:a@b.c">m</a><a href="javascript:void(0)">j</a>'
        '<a href="#frag">f</a><a href="https://y.io/p">ok</a>'
    )
    links = extract_links("https://x.com/page", html)
    # mailto/js dropped; #frag resolves to the page URL + fragment (the
    # canonicalizer later strips it back into the page's own uniqueKey —
    # matching the reference where cheerio keeps it and dedup eats it)
    assert links == ["https://x.com/page#frag", "https://y.io/p"]


def test_relative_resolution_without_base():
    links = extract_links("https://h.net/p/7", '<a href="p/5">x</a><a href="/p/9">y</a>')
    assert links == ["https://h.net/p/p/5", "https://h.net/p/9"]
