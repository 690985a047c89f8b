"""Reference simulator invariants (the executable ordering spec)."""

from __future__ import annotations

from collections import Counter

from crawlee_spark import datagen
from crawlee_spark.functions.urls import canonicalize_py
from crawlee_spark.operators.politeness import PolitenessConfig
from crawlee_spark.simulator import FailureModel, SimConfig, simulate


def _fixture(n=60, hosts=5, seeds=5, seed=42):
    rows = list(datagen.gen_corpus_rows(n, hosts, seed=seed, with_bytes=False))
    corpus = {r["url"]: {"html": r["html"]} for r in rows}
    return corpus, datagen.gen_seed_rows(n, hosts, seed=seed, n_seeds=seeds)


def test_crawl_closure_and_dedup():
    corpus, seeds = _fixture()
    res = simulate(corpus, seeds, SimConfig())
    # every fetched key is unique (dedup) and comes from the canonical space
    keys = [k for _, k in res.crawl_order]
    assert len(keys) == len(set(keys))
    canon = {canonicalize_py(u) for u in corpus}
    assert set(keys) <= canon
    # seen set covers everything fetched plus dead letters
    assert set(keys) <= res.url_seen
    assert set(res.dead) <= res.url_seen
    assert res.handled and res.per_host_counts


def test_forefront_seeds_fetch_first():
    corpus, seeds = _fixture()
    ff = [s for s in seeds if s["forefront"]]
    assert ff  # fixture has at least one forefront seed
    res = simulate(corpus, seeds, SimConfig())
    first_step = [k for s, k in res.crawl_order if s == 1]
    ff_keys = {canonicalize_py(s["url"]) or s["url"] for s in ff}
    # forefront rows (negative order_no) sort before all normal rows
    assert set(first_step[: len(ff_keys)]) >= ff_keys or \
        first_step[0] in ff_keys


def test_rate_budget_one_per_step():
    corpus, seeds = _fixture()
    cfg = SimConfig(politeness=PolitenessConfig(max_requests_per_minute=1, step_secs=60.0))
    res = simulate(corpus, seeds, cfg)
    per_step = Counter(s for s, _ in res.crawl_order)
    assert all(v == 1 for v in per_step.values())


def test_domain_delay_spacing():
    corpus, seeds = _fixture()
    cfg = SimConfig(politeness=PolitenessConfig(same_domain_delay_secs=3.0, step_secs=1.0))
    res = simulate(corpus, seeds, cfg)
    last_step: dict[str, int] = {}
    for step, key in res.crawl_order:
        host = key.split("/")[2]
        if host in last_step:
            assert step - last_step[host] >= 3, (host, step, last_step[host])
        last_step[host] = step


def test_max_requests_per_crawl():
    corpus, seeds = _fixture()
    cfg = SimConfig(politeness=PolitenessConfig(max_requests_per_crawl=10))
    res = simulate(corpus, seeds, cfg)
    # handled budget includes dead letters; successful fetches can't exceed it
    assert len(res.crawl_order) <= 10


def test_retries_then_dead():
    corpus, seeds = _fixture()
    cfg = SimConfig(failures=FailureModel(dead_mod=13))
    res = simulate(corpus, seeds, cfg)
    base = simulate(corpus, seeds, SimConfig())
    # every dead_mod-hit url never appears in the crawl order...
    fetched = {k for _, k in res.crawl_order}
    from crawlee_spark.functions.hashing import xxhash64_str

    for k in base.url_seen:
        if xxhash64_str(k) % 13 == 0 and k in {kk for _, kk in base.crawl_order}:
            assert k not in fetched
            assert res.dead.get(k) in ("fetch-failed", "404-not-found")


def test_transient_failures_recover():
    corpus, seeds = _fixture()
    cfg = SimConfig(failures=FailureModel(fail_mod=7, fail_attempts=2))
    res = simulate(corpus, seeds, cfg)
    base = simulate(corpus, seeds, SimConfig())
    # transient failures retry and eventually succeed: same final fetch set
    assert {k for _, k in res.crawl_order} == {k for _, k in base.crawl_order}
    assert res.per_host_counts != base.per_host_counts  # retries were counted


def test_robots_blocks_and_crawl_delay():
    corpus, seeds = _fixture()
    robots = datagen.gen_robots_rows(5)
    res = simulate(corpus, seeds, SimConfig(), robots_rows=robots)
    assert any(v == "robots-disallowed" for v in res.dead.values())
    for k, v in res.dead.items():
        if v == "robots-disallowed":
            assert k not in {kk for _, kk in res.crawl_order}


def test_determinism():
    corpus, seeds = _fixture()
    a = simulate(corpus, seeds, SimConfig())
    b = simulate(corpus, seeds, SimConfig())
    assert a.crawl_order == b.crawl_order
    assert a.url_seen == b.url_seen
