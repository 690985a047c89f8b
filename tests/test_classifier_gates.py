"""Hashed NB classifier (operators/classifier.py) and Gopher gate
(operators/gates.py). Exact output values are pinned by the DuckDB oracle
gate (q:quality_classifier, q:gopher_quality); these tests pin the
Spark-vs-pure-Python twin parity, the fixed-point log2 contract, and the
gate invariants no single-query oracle can express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crawlee_spark.operators.classifier import (
    qlog2_16,
    qlog2_16_py,
    score_hashed,
    score_hashed_py,
    train_hashed_nb,
    train_hashed_nb_py,
)
from crawlee_spark.operators.gates import gopher_gate

DOCS = [
    # (doc_id, text, label) — label arbitrary but correlated with 'good'
    (0, "the quick brown fox jumps over the lazy dog with style and grace", True),
    (1, "aaa bbb aaa bbb aaa bbb aaa bbb", False),
    (2, "data pipelines filter tokens and hash buckets of the corpus", True),
    (3, "zzz qqq xxx 111 222 333", False),
    (4, "a model that scores documents with learned weights wins", True),
    (5, "", False),
    (6, None, False),
    (7, "the of and to be that have with the of and to", True),
]


def test_qlog2_16_fixed_point_contract(spark):
    """Monotone, exact at powers of two, within 0.1 bit of 16*log2."""
    xs = list(range(1, 200)) + [2**k for k in range(4, 40)] + [10**9, 10**12]
    # python twin vs float reference
    prev = -1
    for x in sorted(xs):
        q = qlog2_16_py(x)
        assert q >= prev, f"not monotone at {x}"
        prev = q
        # floor + linear-mantissa interpolation: worst case just under
        # 2.5 sixteenths of a bit (≈0.15 bit)
        assert abs(q - 16 * math.log2(x)) <= 2.5, f"off at {x}: {q}"
        if x & (x - 1) == 0:
            assert q == 16 * int(math.log2(x))
    # spark expression == python twin, element-for-element
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {r["x"]: r["q"] for r in
           df.select("x", qlog2_16(F.col("x")).alias("q")).collect()}
    for x in xs:
        assert got[x] == qlog2_16_py(x), f"spark/py disagree at {x}"


def test_train_and_score_spark_matches_python_twin(spark):
    df = spark.createDataFrame(
        [(i, t, l) for i, t, l in DOCS], "doc_id long, text string, pos boolean")
    w_spark = {r["bucket"]: r["weight"]
               for r in train_hashed_nb(df, F.col("pos")).collect()}
    w_py = train_hashed_nb_py([(t, l) for _, t, l in DOCS])
    assert w_spark == w_py

    scored = {r["doc_id"]: (r["n_tokens"], r["score"], r["predicted"])
              for r in score_hashed(df, train_hashed_nb(df, F.col("pos"))).collect()}
    for doc_id, text, _ in DOCS:
        assert scored[doc_id] == score_hashed_py(text, w_py)


def test_score_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(i, t, l) for i, t, l in DOCS], "doc_id long, text string, pos boolean")
    scored = {r["doc_id"]: r for r in
              score_hashed(df, train_hashed_nb(df, F.col("pos"))).collect()}
    for empty_id in (5, 6):
        assert scored[empty_id]["n_tokens"] == 0
        assert scored[empty_id]["score"] == 0
        assert scored[empty_id]["predicted"] is False
    # every input row appears exactly once
    assert set(scored) == {d for d, _, _ in DOCS}


def _gate(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_gate(df).collect()[0]


def test_gopher_gate_rules(spark):
    good = ("the data of a crawl must be that clean and it should have "
            "tokens with plain words " * 3)  # >50 words, stopwords present
    r = _gate(spark, good)
    assert r["kept"] and r["reject_reason"] is None

    assert _gate(spark, "short text")["reject_reason"] == "too-few-words"
    assert _gate(spark, None)["reject_reason"] == "too-few-words"
    assert _gate(spark, "")["reject_reason"] == "too-few-words"

    # 60 single-char words -> mean word length < 3
    assert _gate(spark, "a " * 60)["reject_reason"] == "bad-mean-word-length"

    # symbol-heavy: good word count / word length but > 10% '#'
    # ('#' never tokenizes, so n_words stays 60 while n_symbols = 20)
    hashy = ("the crawler of data " * 15) + ("# " * 20)
    assert _gate(spark, hashy)["reject_reason"] == "symbol-heavy"

    # bullet-heavy: every line bullet-started
    bullets = "\n".join("- the point of and that be have with item " + "data " * 45
                        for _ in range(5))
    assert _gate(spark, bullets)["reject_reason"] == "bullet-heavy"

    # ellipsis-heavy: every line ends with ...
    dots = "\n".join("the of and that be have with line " + "word " * 45 + "..."
                     for _ in range(5))
    assert _gate(spark, dots)["reject_reason"] == "ellipsis-heavy"

    # non-alphabetic: >20% pure-digit tokens
    nums = ("the of and that be have with " * 8) + ("123 " * 40)
    assert _gate(spark, nums)["reject_reason"] == "non-alphabetic"

    # stopword floor: >=50 words, zero Gopher stopwords
    nostop = "alpha beta gamma delta epsilon zeta " * 10
    assert _gate(spark, nostop)["reject_reason"] == "too-few-stopwords"


def test_gopher_gate_first_fail_priority(spark):
    # fails BOTH word-count and stopwords -> word-count (earlier rule) wins
    assert _gate(spark, "zzz qqq")["reject_reason"] == "too-few-words"


def test_qlog2_16_duckdb_mirror_property():
    """The oracle's SQL qlog (plans/queries._qlog_sql) agrees with the
    Python twin on adversarial inputs — powers of two +/-1, mantissa
    boundaries, and a PRNG sweep (no Spark needed: this pins the
    DuckDB side of the three-way mirror)."""
    import random

    import duckdb

    from crawlee_spark.operators.classifier import qlog2_16_py
    from crawlee_spark.plans.queries import _qlog_sql

    rng = random.Random(42)
    xs = sorted({1, 2, 3, 15, 16, 17, 31, 32, 33}
                | {2**k + d for k in range(4, 62) for d in (-1, 0, 1)}
                | {rng.randrange(1, 2**61) for _ in range(500)})
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    rows = con.sql(f"SELECT x, {_qlog_sql('x')} AS q FROM t ORDER BY x").fetchall()
    for x, q in rows:
        assert q == qlog2_16_py(x), (x, q, qlog2_16_py(x))


def test_gopher_gate_duckdb_parity_adversarial(spark):
    """Spark gate == oracle SQL on an adversarial corpus (unicode, digits,
    bullets, ellipses, hash floods, whitespace shapes, NULL) — one Spark
    job, not per-row."""
    import random

    import duckdb

    from crawlee_spark.plans.queries import (
        _GOPHER_M_SQL,
        _GOPHER_REASON_SQL,
    )

    rng = random.Random(7)
    words = ["the", "of", "and", "data", "crawler", "123", "x", "éclair",
             "naïve", "#", "...", "- item", "word" * 5]
    rows = []
    for i in range(200):
        n = rng.randrange(0, 120)
        parts = [rng.choice(words) for _ in range(n)]
        sep = rng.choice([" ", "\n", "  ", " \n"])
        rows.append((i, sep.join(parts)))
    rows += [(200, None), (201, ""), (202, "\n\n\n"), (203, "# " * 80),
             (204, ("- the of and item line " + "data " * 46 + "\n") * 4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {r["doc_id"]: (r["reject_reason"], r["kept"])
           for r in gopher_gate(df).collect()}

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    sql = (f"SELECT doc_id, ({_GOPHER_REASON_SQL}) AS rr, "
           f"({_GOPHER_REASON_SQL}) IS NULL AS kept "
           f"FROM ({_GOPHER_M_SQL}) m")
    for doc_id, rr, kept in con.sql(sql).fetchall():
        assert got[doc_id] == (rr, kept), (doc_id, got[doc_id], (rr, kept))
