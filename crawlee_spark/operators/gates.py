"""Document-level quality gates: the published Gopher rules.

The Gopher paper (Rae et al. 2021, appendix A1.1) defined the heuristic
document filter that nearly every later pipeline (MassiveText, RefinedWeb,
Dolma, FineWeb/DataTrove) reuses verbatim:

  1. word count in [50, 100 000]
  2. mean word length in [3, 10]
  3. symbol-to-word ratio ('#' and '...') <= 0.1
  4. <= 90% of lines start with a bullet
  5. <= 30% of lines end with an ellipsis
  6. >= 80% of words contain at least one alphabetic character
  7. at least 2 stop words from {the, be, to, of, and, that, have, with}

Everything here is a single-scan column expression — ZERO shuffles, the
same zero-shuffle first-failing-gate contract as the image pair gate
(``operators/pairs.py::filter_pairs``): rows are annotated, not dropped,
so the reject histogram is one groupBy downstream and the kept subset is
``filter(kept)``.

Cross-engine exactness: every ratio gate is integer cross-multiplied
(``sum_len < 3 * n_words`` instead of ``sum_len / n_words < 3``) so there
is no float division to disagree between Spark and the DuckDB oracle.
Stop-word rule counts token OCCURRENCES (DataTrove's reading of the rule).

No reference analog (Crawlee stops at the dataset); training-pipeline
addendum op (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlee_spark.functions.text import tokens_of

# Gopher's stop-word list, verbatim (A1.1); unrelated to the langid lists.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# gate names in priority order (first failing gate is THE reject reason)
REJECT_FEW_WORDS = "too-few-words"
REJECT_MANY_WORDS = "too-many-words"
REJECT_WORD_LEN = "bad-mean-word-length"
REJECT_SYMBOLS = "symbol-heavy"
REJECT_BULLETS = "bullet-heavy"
REJECT_ELLIPSIS = "ellipsis-heavy"
REJECT_NON_ALPHA = "non-alphabetic"
REJECT_STOPWORDS = "too-few-stopwords"


def _occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of ``needle`` via replace-length
    delta (identical semantics in Spark and DuckDB)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def gopher_gate(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Annotate documents with the Gopher rule verdicts.

    Adds:

      n_words       — word-token count
      reject_reason — first failing rule in the paper's order, NULL = clean
      kept          — reject_reason IS NULL

    One scan, zero shuffles; at 100 TB this is a pure map stage that
    pipelines with the parquet read (and with any downstream gate — the
    classifier score, the LM score — in the same stage).
    """
    # NULL text gates as empty (too-few-words), not as silently kept
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_of(text)
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    n_symbols = _occurrences(text, "#") + _occurrences(text, "...")
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*GOPHER_STOPWORDS))).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: l.startswith("- ") | l.startswith("* "))
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.endswith("..."))).cast("long")

    reason = (
        F.when(n_words < min_words, F.lit(REJECT_FEW_WORDS))
        .when(n_words > max_words, F.lit(REJECT_MANY_WORDS))
        # mean word length outside [3, 10]; integer cross-multiplied
        .when((sum_len < 3 * n_words) | (sum_len > 10 * n_words),
              F.lit(REJECT_WORD_LEN))
        # symbol-to-word ratio > 0.1
        .when(10 * n_symbols > n_words, F.lit(REJECT_SYMBOLS))
        # > 90% of lines bullet-started
        .when(10 * n_bullet > 9 * n_lines, F.lit(REJECT_BULLETS))
        # > 30% of lines ellipsis-ended
        .when(10 * n_ellipsis > 3 * n_lines, F.lit(REJECT_ELLIPSIS))
        # < 80% of words contain an alphabetic char
        .when(5 * n_alpha < 4 * n_words, F.lit(REJECT_NON_ALPHA))
        .when(n_stop < 2, F.lit(REJECT_STOPWORDS))
    )
    out = docs.withColumn("n_words", n_words).withColumn(
        "reject_reason", reason)
    return out.withColumn("kept", F.col("reject_reason").isNull())
