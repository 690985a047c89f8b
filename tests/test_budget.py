"""Hamilton largest-remainder budget apportionment
(operators/budget.py): exactness invariants the single-query oracle
cannot cover — total preservation across shapes, tie-breaks at the
threshold remainder, exact division (K=0), zero weights, and the
Spark==Python-twin equality on randomized cases."""

from __future__ import annotations

import random

from crawlee_spark.operators.budget import apportion_budget, apportion_budget_py


def _run(spark, weights: dict, total: int) -> dict:
    df = spark.createDataFrame(list(weights.items()), "host string, weight long")
    rows = apportion_budget(df, total).collect()
    assert len(rows) == len(weights)
    for r in rows:
        assert r["budget"] == r["base"] + r["extra"]
        assert r["extra"] in (0, 1)
    return {r["host"]: r["budget"] for r in rows}


def test_total_preserved_and_matches_twin(spark):
    w = {"a": 5, "b": 3, "c": 2}
    got = _run(spark, w, 10)
    assert sum(got.values()) == 10
    assert got == apportion_budget_py(w, 10) == {"a": 5, "b": 3, "c": 2}


def test_largest_remainders_win_with_key_tiebreak(spark):
    # total=10, W=6: quotas a=3.33, b=3.33, c=3.33 -> bases 3,3,3, K=1;
    # equal remainders -> ascending key order wins
    w = {"b": 2, "a": 2, "c": 2}
    got = _run(spark, w, 10)
    assert sum(got.values()) == 10
    assert got == apportion_budget_py(w, 10)
    assert got["a"] == 4 and got["b"] == 3 and got["c"] == 3


def test_exact_division_no_extras(spark):
    got = _run(spark, {"a": 1, "b": 1, "c": 2}, 8)
    assert got == {"a": 2, "b": 2, "c": 4}


def test_zero_weights_get_zero(spark):
    got = _run(spark, {"a": 3, "b": 0, "c": 1}, 8)
    assert sum(got.values()) == 8
    assert got["b"] == 0
    assert got == apportion_budget_py({"a": 3, "b": 0, "c": 1}, 8)


def test_all_zero_weights_all_zero_budget(spark):
    got = _run(spark, {"a": 0, "b": 0}, 5)
    assert got == {"a": 0, "b": 0}


def test_randomized_twin_parity(spark):
    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(2, 12)
        w = {f"h{i:02d}": rng.randint(0, 50) for i in range(n)}
        total = rng.randint(1, 500)
        got = _run(spark, w, total)
        assert got == apportion_budget_py(w, total), (w, total)
        if sum(w.values()) > 0:
            assert sum(got.values()) == total


def test_all_zero_weights_agree_with_twin_even_when_hosts_exceed_total(spark):
    """Review r3 #5: W == 0 is all-zero budgets on BOTH sides, for
    #hosts < total and #hosts > total alike."""
    for n, total in ((3, 10), (12, 5)):
        w = {f"h{i}": 0 for i in range(n)}
        got = _run(spark, w, total)
        assert got == apportion_budget_py(w, total)
        assert set(got.values()) == {0}
