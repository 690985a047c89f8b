"""Stupid-Backoff bigram language model (Brants et al. 2007).

The web-scale LM scoring recipe — no discounting, no normalization:

  score(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1})   if seen
                       = 0.4 · count(w_i) / T                   otherwise

used as a fluency gate (the bigram-order upgrade of the CCNet-style
unigram gate in ``plans/queries.py::q_unigram_logprob``). All scores are
in the classifier's 1/16-bit fixed point (``qlog2_16``), so per-document
sums are order-independent INTEGERS — bit-exact across Spark, DuckDB,
and any partitioning/AQE re-plan.

Train and score are SEPARATE entry points: a production pipeline builds
the count dims once from a reference corpus and scores many candidate
corpora against them (and only cross-corpus scoring ever exercises the
backoff branch — scoring the training corpus itself never backs off,
every bigram having been counted at least once).

Plan shapes at 100 TB (docs/SCALE.md): the dims are two token-keyed
map-side-combining aggregations (Heaps-law sized); the bigram dim is
pre-joined with its PREFIX's unigram count (dim ⋈ dim — never the
corpus); scoring joins the token stream once on the bigram key and once
on the current token, both equi-joins Catalyst/AQE broadcast when the
dims allow; the per-doc sum is map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlee_spark.functions.text import tokens_of
from crawlee_spark.operators.classifier import qlog2_16
from crawlee_spark.operators.dedup import rebalance_narrow

# floor(16 * log2(0.4)) — the fixed alpha = 0.4 penalty (Brants §4)
BACKOFF_Q16 = -22


def _tokenized(docs: DataFrame, text_col: str) -> DataFrame:
    return rebalance_narrow(docs).select(
        "doc_id", tokens_of(F.col(text_col)).alias("toks"))


def _pairs(base: DataFrame) -> DataFrame:
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    return base.select(
        "doc_id",
        F.explode(F.zip_with(
            F.slice(F.col("toks"), 1, n1),
            F.slice(F.col("toks"), 2, n1),
            lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
        )).alias("pc"),
    ).select("doc_id", F.col("pc.prev").alias("prev"),
             F.col("pc.cur").alias("cur"))


def bigram_dims(
    train: DataFrame, *, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count dims from the training corpus.

    Returns ``(uni, bi_dim, total)``:

      uni(tok, cnt_u)                     — unigram counts
      bi_dim(prev, cur, cnt_b, cnt_prev)  — bigram counts with the
                                            prefix's unigram count
                                            pre-attached (dim ⋈ dim)
      total(t_all)                        — 1-row grand token count
    """
    base = _tokenized(train, text_col)
    uni = base.select(F.explode("toks").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("cnt_u"))
    total = uni.agg(F.sum("cnt_u").cast("long").alias("t_all"))
    bi = _pairs(base).groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("cnt_b"))
    bi_dim = bi.join(uni.withColumnRenamed("tok", "prev")
                        .withColumnRenamed("cnt_u", "cnt_prev"), "prev")
    return uni, bi_dim, total


def score_bigram(
    docs: DataFrame,
    dims: tuple[DataFrame, DataFrame, DataFrame],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Score documents against prebuilt ``bigram_dims``.

    One row per input doc: ``doc_id``, ``n_tokens``, ``sum_q16`` (integer
    fixed-point log-prob sum; ≤ 0), ``bits_per_token`` =
    −sum_q16/(16·n_tokens) — LOW = fluent under the training corpus,
    HIGH = unseen-bigram-heavy. Tokens absent from the training unigram
    dim contribute the maximum surprise the model can express
    (count 1 smoothing: backoff with cnt_u = 1). Empty docs score 0.
    """
    uni, bi_dim, total = dims
    base = _tokenized(docs, text_col)
    pairs = _pairs(base)
    q = qlog2_16
    # unseen CURRENT token -> smoothed cnt_u = 1 (never NULL-scored)
    cnt_cur = F.coalesce(F.col("cnt_u"), F.lit(1))
    scored_pairs = (
        pairs.join(bi_dim, ["prev", "cur"], "left")
        .join(uni.withColumnRenamed("tok", "cur"), "cur", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.when(F.col("cnt_b").isNotNull(),
                   q(F.col("cnt_b")) - q(F.col("cnt_prev")))
            .otherwise(F.lit(BACKOFF_Q16) + q(cnt_cur) - q(F.col("t_all")))
            .alias("s"),
        )
    )
    first = (
        base.filter(F.size("toks") >= 1)
        .select("doc_id", F.element_at("toks", 1).alias("cur"))
        .join(uni.withColumnRenamed("tok", "cur"), "cur", "left")
        .crossJoin(F.broadcast(total))
        .select("doc_id", (q(cnt_cur) - q(F.col("t_all"))).alias("s"))
    )
    per = scored_pairs.unionByName(first).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("s").cast("long").alias("sum_q16"),
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("sum_q16", F.lit(0)).cast("long").alias("sum_q16"),
            F.round(
                -F.coalesce("sum_q16", F.lit(0))
                / (16.0 * F.greatest(F.coalesce("n_tokens", F.lit(0)),
                                     F.lit(1))),
                6,
            ).alias("bits_per_token"),
        )
    )
