"""Text-analysis building blocks for large-scale training-data pipelines.

Every function here is a PURE Spark column expression (whole-stage codegen,
no Python) with an exactly-matching ANSI/DuckDB SQL form used by the oracle
in ``crawlee_spark/plans/queries.py`` — the driver's correctness gate runs
both and compares value hashes, so the two forms must agree bit-for-bit.

Portability notes (why these shapes):
- the shared 63-bit hash is ``conv(substr(md5(s),1,14),16,10)`` — md5 is
  identical everywhere; 14 hex chars = 56 bits, fits signed int64 in both
  engines (Spark ``conv`` == DuckDB ``CAST('0x'||… AS BIGINT)``);
- token split is a regex both engines implement identically
  (``[^a-z0-9]+`` on lowered text, empties dropped);
- float aggregation is sequential double-precision on both sides.

These back the `documents`-table operators: language-ID (stopword n-gram
heuristic), quality scoring, token counting, and document fingerprinting —
the text half of the dedup/curation pipeline (the Crawlee reference has no
text-analysis layer; its closest analog is the regex utils surveyed in
SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_PRIME = 1_000_000_007

# Tiny embedded stopword lists (deterministic heuristic, shared with the SQL
# oracle verbatim — list contents matter only insofar as both sides match).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "no"],
}


def md5_hash64(col: Column) -> Column:
    """63-bit deterministic hash: first 14 hex chars of md5, base-16 → long.

    DuckDB mirror: ``CAST('0x' || substr(md5(x), 1, 14) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def tokens_of(text: Column) -> Column:
    """Lowercased word tokens, empties dropped.

    DuckDB mirror:
    ``list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t != '')``.
    """
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_of(text))


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-gram shingles joined by spaces; empty array when too short.

    DuckDB mirror:
    ``CASE WHEN len(t) >= n THEN list_transform(range(0, len(t)-n+1),
       i -> array_to_string(t[i+1:i+n], ' ')) ELSE [] END``.
    """
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column, n: int) -> Column:
    """Character n-grams of the lowered text (language-ID features)."""
    low = F.lower(text)
    return F.when(
        F.length(low) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(low) - n + 1),
            lambda i: F.substring(low, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(tokens: Column, lang: str) -> Column:
    """Fraction of tokens found in the language's stopword list.

    DuckDB mirror: ``len(list_filter(t, x -> list_contains([...], x)))
    / greatest(len(t), 1)``.
    """
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(tokens), F.lit(1))


def langid_scores(text: Column) -> dict[str, Column]:
    toks = tokens_of(text)
    return {lang: stopword_ratio(toks, lang) for lang in STOPWORDS}


def langid(text: Column) -> Column:
    """Predicted language: argmax stopword ratio, ties → 'und' unless a
    single language strictly wins; all-zero → 'und'. Deterministic.

    Perf note: the when-chain references each score under CASE branches
    (codegen-CSE-exempt), but the score trees are cheap enough that
    staging them behind a Generate barrier measured SLOWER (0.67 vs
    0.63 s at sf0.1) — keep inline; see q_text_langid's docstring."""
    scores = langid_scores(text)
    langs = sorted(scores)  # deterministic evaluation order
    best = F.greatest(*[scores[lang] for lang in langs])
    out = F.lit("und")
    # first language (in sorted order) achieving the max wins
    for lang in reversed(langs):
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric-non-space chars / total chars (quality signal).

    DuckDB mirror: ``length(regexp_replace(x, '[a-z0-9 ]', '', 'g')) /
    greatest(length(x), 1)`` on lowered text.
    """
    low = F.lower(text)
    stripped = F.regexp_replace(low, "[a-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(low), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + low punctuation + stopword
    presence (the classic C4/Gopher-style cheap filters, scaled down).

    Components (each 0..1, averaged, rounded to 6 dp for cross-engine hash
    stability):
      len_ok   = min(n_tokens / 50, 1)
      punct_ok = 1 - min(punct_ratio * 5, 1)
      sw_ok    = min(en_stopword_ratio * 10, 1)
    """
    toks = tokens_of(text)
    len_ok = F.least(F.size(toks) / F.lit(50.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    sw_ok = F.least(stopword_ratio(toks, "en") * 10, F.lit(1.0))
    return F.round((len_ok + punct_ok + sw_ok) / 3.0, 6)


def html_to_text(html: Column) -> Column:
    """DOM → plain text, portable core of ``packages/utils/src/internals/
    cheerio.ts:39-81`` htmlToText: script/style blocks dropped with their
    content, every other tag becomes a space, whitespace compressed, trimmed.

    DuckDB mirror: the same three ``regexp_replace(..., 'g')`` steps + trim.
    """
    t = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


EMAIL_REGEX = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# portable core of the reference's social handle regexes
# (``packages/utils/src/internals/social.ts:30-43, 243-321``)
TWITTER_REGEX = r"(?:twitter|x)\.com/([A-Za-z0-9_]{1,15})"
GITHUB_REGEX = r"github\.com/([A-Za-z0-9\-]{1,39})"


def emails_from_text(text: Column) -> Column:
    """``social.emailsFromText`` analog (``social.ts:30-43``)."""
    return F.regexp_extract_all(text, F.lit(EMAIL_REGEX), 0)


def parse_open_graph(html: Column) -> Column:
    """``parseOpenGraph`` analog (``packages/utils/src/internals/
    open_graph_parser.ts:394-405``): og:* meta properties as a
    map<string,string> (flat portable core — the reference nests known
    structured properties; consumers here read keys like 'og:title').
    """
    metas = F.regexp_extract_all(
        html,
        F.lit(r'<meta\s+property="(og:[^"]+)"\s+content="([^"]*)"'),
        0,
    )
    pairs = F.transform(
        metas,
        lambda m: F.struct(
            F.regexp_extract(m, r'property="(og:[^"]+)"', 1).alias("key"),
            F.regexp_extract(m, r'content="([^"]*)"', 1).alias("value"),
        ),
    )
    return F.map_from_entries(pairs)


# Blocked-page markers: the reference detects bot-walls via CSS selectors
# (``packages/utils/src/internals/blocked.ts:4-8`` — Cloudflare challenge,
# Google sorry page, Incapsula iframe). Portable content-match core:
BLOCKED_MARKERS = [
    "cf-challenge-running",
    "/sorry/index",
    "main-iframe",
]


def is_blocked_page(html: Column) -> Column:
    """retryOnBlocked content heuristic (``blocked.ts:4-8``;
    ``http-crawler.ts:511-518``): any marker present -> session-blocked."""
    cond = F.lit(False)
    for marker in BLOCKED_MARKERS:
        cond = cond | (F.instr(F.coalesce(html, F.lit("")), marker) > 0)
    return cond


def is_blocked_page_py(html: str) -> bool:
    return any(m in (html or "") for m in BLOCKED_MARKERS)


def dup_frac_of(grams: Column) -> Column:
    """Duplicate fraction of a pre-built gram array (``1 - distinct/total``;
    0.0 when empty). Split out so callers that MATERIALIZE the gram array
    behind a Generate barrier (q_text_repetition) don't re-inline the gram
    construction into every reference — expressions inside CASE branches
    are excluded from codegen subexpression elimination, so an inlined
    gram tree is rebuilt per reference."""
    return F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams)
    )


def dup_ngram_frac(tokens: Column, n: int) -> Column:
    """Gopher-style duplicate n-gram fraction: share of word n-grams that
    repeat an earlier occurrence (``1 - distinct/total``; 0.0 when the doc
    has fewer than n tokens). Pure in-row array math — zero shuffle.

    DuckDB mirror: ``1 - len(list_distinct(g)) / CAST(len(g) AS DOUBLE)``
    guarded by ``CASE WHEN len(g) = 0 THEN 0.0``.
    """
    return dup_frac_of(word_ngrams(tokens, n))


def top_ngram_frac(tokens: Column, n: int) -> Column:
    """Gopher-style top n-gram fraction: share of all word n-grams claimed
    by the single most frequent one. Computed without any shuffle: sort the
    in-row n-gram array, then one ``aggregate`` fold finds the longest run
    of equal neighbours (= the max multiplicity). O(k log k) per row inside
    whole-stage codegen; at corpus scale this beats the explode→groupBy
    formulation (which shuffles every n-gram) by construction — the oracle
    uses the explode form precisely because it is an independent derivation.
    """
    return top_run_frac(F.array_sort(word_ngrams(tokens, n)))


def top_run_frac(sorted_grams: Column) -> Column:
    """Max-multiplicity fraction of a PRE-SORTED gram array via a single
    longest-equal-run fold (see top_ngram_frac; split out for callers that
    materialize the sorted array behind a Generate barrier)."""

    def step(a: Column, x: Column) -> Column:
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(a["best"], run).alias("best"),
        )

    best = F.aggregate(
        sorted_grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        step,
        lambda a: a["best"],
    )
    return F.when(F.size(sorted_grams) == 0, F.lit(0.0)).otherwise(
        best / F.size(sorted_grams)
    )


def mean_token_len(tokens: Column) -> Column:
    """Mean characters per token (Gopher length-band signal).

    DuckDB mirror: ``coalesce(list_sum(list_transform(t, x -> length(x))), 0)
    / greatest(len(t), 1)`` (list_sum is NULL on empty lists there).
    """
    total = F.aggregate(tokens, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return total / F.greatest(F.size(tokens), F.lit(1))


# PII scrubbing: the regexes are the portable subset that Java regex (Spark)
# and RE2 (DuckDB) evaluate identically — no lookaround, no backreferences,
# greedy char-class quantifiers only (leftmost-first == leftmost-longest for
# these shapes). Emails are scrubbed BEFORE phones so digit runs inside a
# just-scrubbed address can never re-match as a phone.
PHONE_REGEX = r"\+?[0-9][0-9 ()\-]{6,}[0-9]"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def scrub_pii(text: Column) -> Column:
    """Redact emails then phone-like digit runs (training-data PII pass).

    DuckDB mirror: the same two ``regexp_replace(..., 'g')`` steps in the
    same order (Spark's regexp_replace is global by default).
    """
    no_email = F.regexp_replace(text, EMAIL_REGEX, EMAIL_TOKEN)
    return F.regexp_replace(no_email, PHONE_REGEX, PHONE_TOKEN)


def weighted_avg(value: Column, weight: Column) -> Column:
    """sum(v*w)/sum(w) — ``weightedAvg`` (``utils general.ts:46-52``), the
    SystemStatus overload aggregation primitive (``system_status.ts``)."""
    return F.sum(value * weight) / F.sum(weight)


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over the
    per-token md5 hashes, mod 1e9+7 — a content-defined id robust to
    whitespace/punctuation-only edits.

    DuckDB mirror: ``list_reduce(list_prepend(0, list_transform(tokens,
    t -> CAST('0x'||substr(md5(t),1,14) AS BIGINT) % 1000000007)),
    (acc, h) -> (acc * 31 + h) % 1000000007)``.
    Arithmetic stays < 31e9 + 1e9 << 2^63 — no overflow either side.
    """
    toks = tokens_of(text)
    hashes = F.transform(toks, lambda t: md5_hash64(t) % HASH_PRIME)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % HASH_PRIME,
    )


def _line_words(line: Column) -> Column:
    return F.size(F.split(F.trim(line), " +"))


def _line_link_chars(line: Column) -> Column:
    # 3 * (number of '<a ' anchor openings)
    return F.length(line) - F.length(F.regexp_replace(line, "<a ", ""))


def is_content_line(line: Column, min_words: int = 10) -> Column:
    """jusText/Arc90-style line classifier, integer-pure so the DuckDB
    mirror matches bit-for-bit: a line is CONTENT iff it has >= min_words
    whitespace words AND link density <= 0.2 — expressed without division
    as ``5 * link_chars <= 3 * words`` (each anchor contributes the 3
    characters of '<a ', and words >= 5*links <=> 5*3*links <= 3*words).

    Boilerplate (nav menus, cookie banners, footers) is short and/or
    link-dense; body prose is long and link-sparse — the two rules jusText
    (Pomikalek 2011) and Arc90 readability both build on.
    """
    return (_line_words(line) >= F.lit(min_words)) & \
        (F.lit(5) * _line_link_chars(line) <= F.lit(3) * _line_words(line))


def strip_boilerplate(lines: Column, min_words: int = 10) -> Column:
    """array<string> page lines -> struct(content_text, n_lines, n_kept,
    boilerplate_frac). Zero-shuffle: pure array HOFs (filter + array_join)
    evaluated in-row — at 100 TB this is a map-only stage, no explode.

    DuckDB mirror: ``list_filter(lines, l -> ...)`` + ``array_to_string``.
    """
    kept = F.filter(lines, lambda ln: is_content_line(ln, min_words))
    return F.struct(
        F.array_join(kept, "\n").alias("content_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        ((F.size(lines) - F.size(kept)) / F.size(lines)).alias("boilerplate_frac"),
    )
