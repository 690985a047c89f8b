"""OpenGraph parsing, blocked-page heuristics, weighted avg, salted
repartition (SURVEY.md §2.6-§2.8 leftovers + §7(c) skew)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.functions.text import (
    is_blocked_page_py,
    parse_open_graph,
    weighted_avg,
)
from crawlee_spark.operators.skew import partition_histogram, salted_repartition


def test_parse_open_graph(spark):
    html = (
        '<head><meta property="og:title" content="A Page"/>'
        '<meta property="og:image" content="https://x.com/i.png">'
        '<meta property="other" content="no"></head>'
    )
    df = spark.createDataFrame([(html,), ("<p>none</p>",)], "html string")
    rows = df.select(parse_open_graph(F.col("html")).alias("og")).collect()
    assert rows[0]["og"] == {"og:title": "A Page", "og:image": "https://x.com/i.png"}
    assert rows[1]["og"] == {}


def test_blocked_page_parity(spark):
    cases = [
        "<div class='cf-challenge-running'>checking</div>",
        "<iframe id=main-iframe></iframe>",
        "<p>totally fine page</p>",
        None,
    ]
    from crawlee_spark.functions.text import is_blocked_page

    df = spark.createDataFrame([(c,) for c in cases], "html string")
    got = [r["b"] for r in df.select(is_blocked_page(F.col("html")).alias("b")).collect()]
    want = [is_blocked_page_py(c or "") for c in cases]
    assert got == want == [True, True, False, False]


def test_weighted_avg(spark):
    df = spark.createDataFrame([(10.0, 1.0), (20.0, 3.0)], "v double, w double")
    out = df.agg(weighted_avg(F.col("v"), F.col("w")).alias("wa")).first()
    assert out["wa"] == (10 * 1 + 20 * 3) / 4  # Σvw/Σw (general.ts:46-52)


def test_salted_repartition_spreads_hot_host(spark):
    # 90% of rows on one host: unsalted repartition puts them in 1 partition
    rows = [("hot.com" if i % 10 else "cold.net", i) for i in range(1000)]
    df = spark.createDataFrame(rows, "host string, url_hash long").repartition(8, "host")
    hist = partition_histogram(df)
    assert max(hist) >= 900  # the hot host concentrates

    salted = salted_repartition(df, "host", salt_n=16, num_partitions=8)
    hist_s = partition_histogram(salted)
    # spread over salt partitions: the hot host's 900-row monolith must
    # shrink substantially (hash collisions of (host, salt) pairs keep the
    # split imperfect, hence a ratio bound rather than an exact one)
    assert max(hist_s) <= 0.6 * max(hist)
    assert sum(hist_s) == 1000
