"""Deterministic hash sampling (operators/sampling.py). Exact output values
are pinned by the DuckDB oracle gate (q:stratified_sample, q:hash_split);
these tests pin the INVARIANTS no single-query oracle can express:
split disjointness/exhaustiveness, stability under corpus growth, and
per-stratum counts."""

from __future__ import annotations

from crawlee_spark.operators.sampling import (
    hash_split,
    sample_per_group,
    split_threshold,
)


def _docs(spark, n):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_split_disjoint_exhaustive_and_stable(spark):
    df = _docs(spark, 300)
    train = {r["doc_id"] for r in hash_split(df, 0.3, ["doc_id"]).collect()}
    test = {r["doc_id"]
            for r in hash_split(df, 0.3, ["doc_id"], complement=True).collect()}
    assert train | test == set(range(300))
    assert train & test == set()
    # ~30% within hash tolerance
    assert 0.15 < len(train) / 300 < 0.45

    # growth stability: the same rows stay on the same side when rows appear
    bigger = _docs(spark, 600)
    train2 = {r["doc_id"] for r in hash_split(bigger, 0.3, ["doc_id"]).collect()}
    assert train == {i for i in train2 if i < 300}

    # a different salt gives a different (still deterministic) split
    salted = {r["doc_id"] for r in hash_split(df, 0.3, ["doc_id"], salt="v2").collect()}
    assert salted != train


def test_split_threshold_bounds():
    assert split_threshold(0.0) == "0" * 32
    # frac=1.0 must sort AFTER every 32-char lowercase hex digest
    assert split_threshold(1.0) > "f" * 32
    assert len(split_threshold(0.25)) == 32


def test_sample_per_group_counts_and_determinism(spark):
    df = _docs(spark, 300)
    s1 = sample_per_group(df, ["lang"], 10, ["doc_id"])
    rows = s1.collect()
    per = {}
    for r in rows:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    assert per == {"en": 10, "de": 10, "fr": 10}
    # repartitioning must not change the sample (hash order, not row order)
    s2 = sample_per_group(df.repartition(7), ["lang"], 10, ["doc_id"])
    assert {(r["doc_id"], r["lang"]) for r in rows} == {
        (r["doc_id"], r["lang"]) for r in s2.collect()
    }


def test_connected_components_transitive_chain(spark):
    """a~b~c must collapse to ONE component (the case a pairwise keep-first
    sweep gets wrong), across several disjoint clusters and a long chain
    (forces >1 propagation round)."""
    from crawlee_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3),            # chain -> component 1
         (10, 11),                  # pair -> component 10
         (20, 23), (21, 23), (22, 23),  # star -> component 20
         (30, 31), (31, 32), (32, 33), (33, 34)],  # longer chain -> 30
        "id_a long, id_b long",
    )
    got = {r["id"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20,
                   30: 30, 31: 30, 32: 30, 33: 30, 34: 30}


def test_weighted_sample_rates_bounds_and_stability(spark):
    from pyspark.sql import functions as F

    from crawlee_spark.operators.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, 0.0)
         .when(F.col("id") % 4 == 1, 0.3)
         .when(F.col("id") % 4 == 2, 1.0)
         .otherwise(2.5)                      # out-of-range: clips to 1
         .alias("w"),
    )
    kept = {r["doc_id"] for r in weighted_sample(df, "w", ["doc_id"]).collect()}
    g = {m: [i for i in range(2000) if i % 4 == m] for m in range(4)}
    assert not kept & set(g[0])               # weight 0 -> never kept
    assert set(g[2]) <= kept                  # weight 1 -> always kept
    assert set(g[3]) <= kept                  # clipped weight 2.5 -> always
    rate = len(kept & set(g[1])) / len(g[1])  # weight 0.3 -> ~30%
    assert 0.2 < rate < 0.4
    # growth stability: the same doc_ids stay kept in a larger corpus
    df2 = spark.range(4000).select(
        F.col("id").alias("doc_id"), F.lit(0.3).alias("w"))
    kept_small = {r["doc_id"] for r in weighted_sample(
        df2.filter(F.col("doc_id") < 2000), "w", ["doc_id"]).collect()}
    kept_big = {r["doc_id"]
                for r in weighted_sample(df2, "w", ["doc_id"]).collect()}
    assert kept_small == {d for d in kept_big if d < 2000}
    # salt redraws an independent sample
    salted = {r["doc_id"] for r in weighted_sample(
        df2, "w", ["doc_id"], salt="v2").collect()}
    assert salted != kept_big


def test_weighted_sample_plan_is_pure_filter(spark):
    from pyspark.sql import functions as F

    from crawlee_spark.operators.sampling import weighted_sample

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(0.5).alias("w"))
    q = weighted_sample(df, "w", ["doc_id"])
    plan = spark._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan             # no shuffle: just a filter


def test_token_mix_invariants(spark):
    """Mix rebalancing (q:token_mix pins exact rows): accept rates are in
    (0, 1]; a lang at accept==1 passes whole; thinned langs keep roughly
    accept × their docs; the result is deterministic."""
    from pyspark.sql import functions as F

    from crawlee_spark.plans.queries import _MIX_TARGET, q_token_mix, _t
    from crawlee_spark.functions import text as T

    sf = "/root/testdata/sf0.01"
    out = q_token_mix(spark, sf).collect()
    assert out and {r["lang"] for r in out} <= {l for l, _ in _MIX_TARGET}
    assert all(0.0 < r["accept_rate"] <= 1.0 for r in out)

    # independent per-lang doc counts from the raw table
    d = _t(spark, sf, "documents").select(
        T.langid(F.col("text")).alias("lang"),
        F.size(T.tokens_of(F.col("text"))).alias("n"))
    totals = {r["lang"]: r["cnt"] for r in
              d.filter(F.col("n") > 0).groupBy("lang").count()
               .withColumnRenamed("count", "cnt").collect()}
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rate = rows[0]["accept_rate"]
        if rate == 1.0:
            assert len(rows) == totals[lang]      # whole language kept
        else:
            # hash draws: kept fraction within a loose binomial envelope
            frac = len(rows) / totals[lang]
            assert rate - 0.25 < frac < rate + 0.25

    again = q_token_mix(spark, sf).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_domain_cap_invariants(spark):
    """q:domain_cap pins exact rows; this pins the invariants: no
    blocklisted domain survives, no domain exceeds the cap, and ranks are
    contiguous from 1 in (quality desc, doc_id asc) order."""
    from crawlee_spark.plans.queries import (
        _BLOCKED_DOMAINS, _DOMAIN_CAP, q_domain_cap)

    rows = q_domain_cap(spark, "/root/testdata/sf0.01").collect()
    assert rows
    by_dom: dict[str, list] = {}
    for r in rows:
        assert r["domain"] not in _BLOCKED_DOMAINS
        by_dom.setdefault(r["domain"], []).append(r)
    for dom, rs in by_dom.items():
        assert len(rs) <= _DOMAIN_CAP
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: (-r["quality"], r["doc_id"]))
        assert [r["doc_id"] for r in ordered] == [r["doc_id"] for r in rs]
