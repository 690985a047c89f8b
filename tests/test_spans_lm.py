"""Invariants for exact-substring span removal (Lee et al. 2021
ExactSubstr; operators/dedup.py::dup_span_removal) and the unigram-LM
quality gate (plans/queries.py::q_unigram_logprob). Exact corpus-level
values are pinned by the DuckDB oracle gate (q:dup_span_removal,
q:unigram_logprob); these tests pin hand-built semantics the oracle
comparison can't express: first-occurrence survival, overlapping-region
coverage, within-doc repeats, fully-duplicated docs, and the integer-log2
scoring rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlee_spark.operators.dedup import dup_span_removal


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_removal_keep_first_and_region_coverage(spark):
    docs = _docs(spark, [
        (0, "a b c d e"),            # first owner of "a b c d"
        (1, "z z a b c d q"),        # repeats it mid-document
        (2, "p q"),                  # shorter than the window: untouched
    ])
    out = {r["doc_id"]: r for r in dup_span_removal(docs, window=3).collect()}
    # the first occurrence keeps every token
    assert out[0]["clean_text"] == "a b c d e"
    assert (out[0]["n_tokens"], out[0]["n_kept"]) == (5, 5)
    # duplicated windows "a b c"/"b c d" overlap — the union of both spans
    # (positions 2..5) is excised, the flanks survive in order
    assert out[1]["clean_text"] == "z z q"
    assert (out[1]["n_tokens"], out[1]["n_kept"]) == (7, 3)
    # sub-window docs produce no windows and are never touched
    assert out[2]["clean_text"] == "p q"
    assert (out[2]["n_tokens"], out[2]["n_kept"]) == (2, 2)


def test_span_removal_within_doc_repeat_and_full_dup(spark):
    docs = _docs(spark, [
        (0, "m n o m n o"),          # within-doc repeat of "m n o"
        (1, "m n o m n o"),          # whole doc duplicates doc 0
    ])
    out = {r["doc_id"]: r for r in dup_span_removal(docs, window=3).collect()}
    # doc 0: the start-3 occurrence is removed, the start-0 keeper survives
    assert out[0]["clean_text"] == "m n o"
    assert (out[0]["n_tokens"], out[0]["n_kept"]) == (6, 3)
    # doc 1: every window is a later duplicate — the row survives with an
    # empty rebuild (the engine keeps the tombstone; dropping is a filter)
    assert out[1]["clean_text"] == ""
    assert (out[1]["n_tokens"], out[1]["n_kept"]) == (6, 0)


def test_span_removal_plan_is_aggregate_not_window(spark):
    docs = _docs(spark, [(0, "a b c d"), (1, "a b c d")])
    plan = dup_span_removal(docs, window=3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_unigram_logprob_integer_log2_rule(spark, tmp_path):
    # corpus: 'a' x5, 'b' x1 -> ilog2(a)=2 (bin 101), ilog2(b)=0
    docs = _docs(spark, [
        (0, "a a a a"),
        (1, "a b"),
        (2, ""),                     # zero tokens: scores 0 / 0 / 0.0
    ])
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from crawlee_spark.plans.queries import q_unigram_logprob
    out = {r["doc_id"]: r for r in q_unigram_logprob(spark, str(tmp_path)).collect()}
    assert (out[0]["n_tokens"], out[0]["sum_bits"]) == (4, 8)
    assert out[0]["bits_per_token"] == 2.0
    assert (out[1]["n_tokens"], out[1]["sum_bits"]) == (2, 2)
    assert out[1]["bits_per_token"] == 1.0
    assert (out[2]["n_tokens"], out[2]["sum_bits"], out[2]["bits_per_token"]) == (0, 0, 0.0)


def test_lsh_recall_identical_docs_and_bounds(spark, tmp_path):
    # identical docs are a Jaccard-1.0 truth pair AND an LSH-certain
    # collision (equal signatures in every band) -> recall 1.0
    docs = _docs(spark, [
        (0, "the quick brown fox jumps over the lazy dog again"),
        (1, "the quick brown fox jumps over the lazy dog again"),
        (2, "completely different words about spark shuffles here now"),
    ])
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from crawlee_spark.plans.queries import q_lsh_recall
    r = q_lsh_recall(spark, str(tmp_path)).collect()[0]
    assert r["n_true"] == 1 and r["n_found"] == 1
    assert r["recall"] == 1.0
    assert r["n_found"] <= r["n_candidates"]
    assert 0.0 <= r["precision"] <= 1.0


def test_span_removal_interval_merge_on_long_duplicate(spark):
    # a long fully-duplicated doc: every window start is a removal; the
    # interval fold must collapse them into one span and excise everything
    text = " ".join(f"t{i}" for i in range(40))
    docs = _docs(spark, [(0, text), (1, text), (2, "unrelated words only")])
    out = {r["doc_id"]: r for r in dup_span_removal(docs, window=5).collect()}
    assert (out[0]["n_tokens"], out[0]["n_kept"]) == (40, 40)
    assert (out[1]["n_tokens"], out[1]["n_kept"]) == (40, 0)
    assert out[1]["clean_text"] == ""
    assert out[2]["n_kept"] == 3


# --- property-based parity: Spark dup_span_removal vs a pure-Python twin ---

import re

from hypothesis import given, settings
from hypothesis import strategies as st


def _span_removal_py(texts: list[str], w: int) -> list[tuple[int, int, str]]:
    """Spec twin: (n_tokens, n_kept, clean_text) per doc, same keep-first
    duplicated-span semantics as operators/dedup.py::dup_span_removal."""
    toks = [
        [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t] for s in texts
    ]
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, ts in enumerate(toks):
        for s in range(max(len(ts) - w + 1, 0)):
            occ.setdefault(" ".join(ts[s : s + w]), []).append((d, s))
    removed: dict[int, set[int]] = {}
    for positions in occ.values():
        if len(positions) > 1:
            for d, s in sorted(positions)[1:]:
                removed.setdefault(d, set()).add(s)
    out = []
    for d, ts in enumerate(toks):
        cover = set()
        for s in removed.get(d, ()):  # noqa: B905
            cover.update(range(s, s + w))
        kept = [t for i, t in enumerate(ts) if i not in cover]
        out.append((len(ts), len(kept), " ".join(kept)))
    return out


_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_TEXT = st.builds(" ".join, st.lists(_WORD, min_size=0, max_size=12))


@settings(max_examples=6, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_span_removal_spark_equals_py(spark, texts):
    # tiny vocab + short docs maximize collision density: within-doc
    # repeats, cross-doc dups, and overlapping spans all occur
    docs = _docs(spark, list(enumerate(texts)))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["clean_text"])
        for r in dup_span_removal(docs, window=3).collect()
    }
    want = _span_removal_py(texts, 3)
    for d in range(len(texts)):
        assert got[d] == want[d], (d, texts)


def test_bigram_logprob_hand_computed(spark, tmp_path):
    """Stupid-Backoff bigram LM (operators/lm.py), in-corpus scoring.

    Corpus: a:3 b:2 c:1, T=6; bigrams (a,b):2 (b,a):1 (a,c):1.
    qlog2_16: q(1)=0 q(2)=16 q(3)=25 q(6)=41.
    """
    docs = _docs(spark, [
        (0, "a b a b"),
        (1, "a c"),
        (2, ""),
    ])
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from crawlee_spark.plans.queries import q_bigram_logprob
    out = {r["doc_id"]: r for r in q_bigram_logprob(spark, str(tmp_path)).collect()}
    # doc0: first a = q(3)-q(6) = -16; (a,b) = q(2)-q(3) = -9;
    #       (b,a) = q(1)-q(2) = -16; (a,b) = -9  -> sum -50 over 4 tokens
    assert (out[0]["n_tokens"], out[0]["sum_q16"]) == (4, -50)
    assert out[0]["bits_per_token"] == round(50 / 64, 6)
    # doc1: first a = -16; (a,c) = q(1)-q(3) = -25 -> sum -41 over 2
    assert (out[1]["n_tokens"], out[1]["sum_q16"]) == (2, -41)
    # doc2 empty
    assert (out[2]["n_tokens"], out[2]["sum_q16"], out[2]["bits_per_token"]) \
        == (0, 0, 0.0)


def test_bigram_backoff_cross_corpus(spark):
    """Backoff fires only for bigrams UNSEEN in training; unseen tokens get
    the count-1 smoothing."""
    from crawlee_spark.operators.lm import BACKOFF_Q16, bigram_dims, score_bigram
    from crawlee_spark.operators.classifier import qlog2_16_py as q

    train = _docs(spark, [(0, "a b a b"), (1, "a c")])  # a:3 b:2 c:1 T=6
    dims = bigram_dims(train)

    test = _docs(spark, [
        (10, "b c"),     # bigram (b,c) unseen -> backoff with cnt_u(c)=1
        (11, "a b"),     # fully in-model
        (12, "a zz"),    # zz unseen anywhere -> smoothed cnt_u=1
    ])
    out = {r["doc_id"]: r for r in score_bigram(test, dims).collect()}
    # doc10: first b = q(2)-q(6) = 16-41 = -25;
    #        (b,c) backoff = -22 + q(1)-q(6) = -22-41 = -63 -> -88
    assert (out[10]["n_tokens"], out[10]["sum_q16"]) == (2, -88)
    # doc11: first a = q(3)-q(6) = -16; (a,b) = q(2)-q(3) = -9 -> -25
    assert (out[11]["n_tokens"], out[11]["sum_q16"]) == (2, -25)
    # doc12: first a = -16; (a,zz) unseen bigram AND unseen token:
    #        backoff = -22 + q(1)-q(6) = -63 -> -79
    assert (out[12]["n_tokens"], out[12]["sum_q16"]) == (2, -79)
    assert BACKOFF_Q16 == -22 and q(6) == 41
