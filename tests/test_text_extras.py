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


def test_repetition_signals_pinned(spark):
    """top_ngram_frac / dup_ngram_frac / mean_token_len against hand counts
    (Gopher repetition signals; a pure-Python recount is the witness)."""
    from collections import Counter

    from crawlee_spark.functions.text import (
        dup_ngram_frac,
        mean_token_len,
        tokens_of,
        top_ngram_frac,
    )

    cases = [
        "a b a b a c",          # bigrams: ab,ba,ab,ba,ac -> top 2/5
        "x",                    # no bigrams / 5-grams
        "",                     # no tokens at all
        "one two three four five six one two three four five six",
        "same same same same same same",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    toks = tokens_of(F.col("text"))
    rows = df.select(
        top_ngram_frac(toks, 2).alias("top2"),
        dup_ngram_frac(toks, 5).alias("dup5"),
        mean_token_len(toks).alias("mlen"),
    ).collect()

    for text, row in zip(cases, rows):
        t = [w for w in text.split() if w]
        bi = [" ".join(t[i:i + 2]) for i in range(len(t) - 1)]
        five = [" ".join(t[i:i + 5]) for i in range(len(t) - 4)]
        want_top2 = (max(Counter(bi).values()) / len(bi)) if bi else 0.0
        want_dup5 = (1.0 - len(set(five)) / len(five)) if five else 0.0
        want_mlen = (sum(map(len, t)) / len(t)) if t else 0.0
        assert abs(row["top2"] - want_top2) < 1e-12, text
        assert abs(row["dup5"] - want_dup5) < 1e-12, text
        assert abs(row["mlen"] - want_mlen) < 1e-12, text


def test_scrub_pii_order_and_counts(spark):
    """Emails scrubbed before phones; digits inside an address never
    re-match as a phone; counts line up with the replaced spans."""
    from crawlee_spark.functions.text import (
        EMAIL_REGEX,
        PHONE_REGEX,
        emails_from_text,
        scrub_pii,
    )

    cases = [
        ("mail bob12345678@ex.com now", 1, 0),       # digit-run inside email only
        ("call +1 (212) 555-0100 or 020 7946 0958", 0, 2),
        ("a@b.io and +44 20 7946 0958 mixed", 1, 1),
        ("no pii here", 0, 0),
    ]
    df = spark.createDataFrame([(c,) for c, _, _ in cases], "text string")
    no_email = F.regexp_replace(F.col("text"), EMAIL_REGEX, "<EMAIL>")
    rows = df.select(
        scrub_pii(F.col("text")).alias("s"),
        F.size(emails_from_text(F.col("text"))).alias("ne"),
        F.size(F.regexp_extract_all(no_email, F.lit(PHONE_REGEX), 0)).alias("np"),
    ).collect()
    for (text, ne, np_), row in zip(cases, rows):
        assert row["ne"] == ne, text
        assert row["np"] == np_, text
        assert "<EMAIL>" in row["s"] if ne else "<EMAIL>" not in row["s"]
        assert "<PHONE>" in row["s"] if np_ else "<PHONE>" not in row["s"]
    # the digit run inside the email must NOT surface as a phone
    assert rows[0]["s"] == "mail <EMAIL> now"


def test_scrub_pii_cross_engine_fuzz(spark):
    """Differential fuzz of the PII regexes: Spark (Java regex) vs DuckDB
    (RE2) over random digit/space/paren/email-ish strings — pins the
    'portable regex subset' claim behind q:pii_scrub (backtracking
    leftmost-first must equal RE2 leftmost-longest for these shapes)."""
    import random

    import duckdb

    from crawlee_spark.functions.text import scrub_pii

    rng = random.Random(20260818)
    alphabet = list("0123456789 ()-+ab.@%_ex.comXYZ")
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, text string")
    got = {r["i"]: r["s"] for r in df.select("i", scrub_pii(F.col("text")).alias("s")).collect()}

    from crawlee_spark.functions.text import EMAIL_REGEX, PHONE_REGEX
    con = duckdb.connect()
    for i, c in enumerate(cases):
        want = con.execute(
            "select regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g')",
            [c, EMAIL_REGEX, PHONE_REGEX],
        ).fetchone()[0]
        assert got[i] == want, repr(c)


def test_repetition_gate_zero_shuffle_plan(spark):
    """The whole Gopher gate (mode via sorted-run fold, duplicate fraction,
    mean length, keep decision) must compile to a single scan-project —
    any Exchange here would shuffle one row per n-gram at corpus scale."""
    from crawlee_spark.plans.queries import q_text_repetition

    plan = q_text_repetition(spark, "/root/testdata/sf0.001")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_strip_boilerplate_pinned(spark):
    from pyspark.sql import functions as F

    from crawlee_spark.functions.text import strip_boilerplate

    body = " ".join(["word"] * 12)
    rows = spark.createDataFrame([("d1",)], "doc_id string").select(
        "doc_id",
        strip_boilerplate(F.array(
            # nav: 3 links, 3 words -> link-dense -> boilerplate
            F.lit('<a href="/">Home</a> <a href="/a">A</a> <a href="/b">B</a>'),
            F.lit(body),                       # 12 words, 0 links -> content
            F.lit("Accept all cookies"),       # 3 words -> boilerplate
            # 12 words + 1 link: 5*3=15 <= 3*14=42 -> still content
            F.lit(body + ' see <a href="/x">x</a>'),
        )).alias("s"),
    ).select("doc_id", "s.*").collect()
    r = rows[0]
    assert r["n_lines"] == 4 and r["n_kept"] == 2
    assert r["boilerplate_frac"] == 0.5
    assert r["content_text"].startswith(body)
    assert "cookies" not in r["content_text"] and "Home" not in r["content_text"]


def test_boilerplate_query_zero_shuffle(spark):
    from crawlee_spark.plans.queries import q_boilerplate

    plan = q_boilerplate(spark, "/root/testdata/sf0.001")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
