"""Full public-suffix-list registrable-domain (eTLD+1) extraction.

The reference resolves registrable domains with tldts' bundled Mozilla PSL
(consumers: same-domain enqueue strategy ``packages/core/src/enqueue_links/
enqueue_links.ts:177-209``, sameDomainDelaySecs keying
``basic-crawler.ts:1111-1138``). Round 1 shipped a 21-suffix embedded subset
(functions/urls.py::MULTI_LABEL_SUFFIXES); this module loads the FULL list
from the OS copy (``/usr/share/publicsuffix/public_suffix_list.dat`` —
public Mozilla data shipped with Debian) so e.g. ``a.github.io`` and
``b.github.io`` are distinct registrable domains.

PSL algorithm (publicsuffix.org/list/):
- a rule matches when the host ends with it label-wise; ``*`` matches
  exactly one label; ``!rule`` is an exception;
- prevailing rule = a matching exception (public suffix = exception minus
  its first label), else the LONGEST matching rule, else the default ``*``
  (the TLD itself);
- registrable domain = public suffix + one more label; hosts that ARE a
  public suffix return themselves (mirrors functions/urls.py convention).

Both sections (ICANN + PRIVATE) are included — the private section is what
separates ``github.io`` tenants, which is exactly the isolation a polite
crawler wants.

Two consumers:
- ``registrable_domain_psl_py`` — dict-lookup matcher for the simulator /
  py mirrors (O(labels) per host);
- ``attach_registrable_domain`` — the Spark path: ONE broadcast hash join
  per rule-label-count (5 total, all map-side, no shuffle, no UDF) against
  the rules dim, then pure column logic picks the prevailing rule. This
  keeps the hot filter inside whole-stage codegen instead of a Python UDF.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PSL_PATH = "/usr/share/publicsuffix/public_suffix_list.dat"
MAX_RULE_LABELS = 5  # current list maximum; asserted at load


@dataclass(frozen=True)
class PslRules:
    exact: frozenset[str]
    wildcard_parents: frozenset[str]  # X for every "*.X" rule
    exceptions: frozenset[str]        # Y for every "!Y" rule


_RULES: PslRules | None = None


def load_rules(path: str = PSL_PATH, include_private: bool = True) -> PslRules:
    exact, wild, exc = set(), set(), set()
    in_private = False
    with open(path, encoding="utf-8") as f:
        for line in f:
            s = line.strip()
            if "===BEGIN PRIVATE DOMAINS===" in s:
                in_private = True
            if not s or s.startswith("//"):
                continue
            if in_private and not include_private:
                continue
            if s.startswith("!"):
                exc.add(s[1:])
            elif s.startswith("*."):
                wild.add(s[2:])
            else:
                exact.add(s)
    # a hard error, not an assert (asserts vanish under -O), and over ALL
    # rule kinds: the Spark path's best-k CASE chain only covers label
    # counts up to MAX_RULE_LABELS (+1 for wildcards) — a future PSL
    # revision exceeding it would otherwise silently return wrong
    # registrable domains from the Spark side while the py twin is right
    widest = max(
        max((r.count(".") + 1) for r in exact) if exact else 0,
        # a wildcard parent with k labels acts as a (k+1)-label rule;
        # exceptions match as k-label public suffixes
        max((r.count(".") + 2) for r in wild) if wild else 0,
        max((r.count(".") + 1) for r in exc) if exc else 0,
    )
    if widest > MAX_RULE_LABELS + 1:
        raise ValueError(
            f"PSL rule needs {widest} labels > MAX_RULE_LABELS+1="
            f"{MAX_RULE_LABELS + 1}; bump MAX_RULE_LABELS (functions/psl.py)"
        )
    return PslRules(frozenset(exact), frozenset(wild), frozenset(exc))


def rules() -> PslRules:
    global _RULES
    if _RULES is None:
        if os.path.exists(PSL_PATH):
            _RULES = load_rules()
        else:  # container without the OS list: degrade to the embedded subset
            from crawlee_spark.functions.urls import MULTI_LABEL_SUFFIXES

            _RULES = PslRules(frozenset(MULTI_LABEL_SUFFIXES), frozenset(), frozenset())
    return _RULES


def registrable_domain_psl_py(host: str) -> str:
    """eTLD+1 under the full PSL (tldts ``getDomain`` analog; returns the
    host itself when it IS a public suffix)."""
    r = rules()
    labels = host.split(".")
    n = len(labels)
    best = 1  # default rule "*": the TLD is a public suffix
    for k in range(min(n, MAX_RULE_LABELS + 1), 0, -1):
        sfx = ".".join(labels[n - k:])
        if sfx in r.exceptions:
            # public suffix = exception minus first label -> registrable = sfx
            return sfx
        if sfx in r.exact and k > best:
            best = k
        if k < n and sfx in r.wildcard_parents and k + 1 > best:
            best = k + 1
    if n <= best:
        return host
    return ".".join(labels[n - (best + 1):])


# -- Spark path -------------------------------------------------------------

# cached ON the session object: an id(spark)-keyed module dict would pin
# every SparkSession (including stopped ones) for the process lifetime and
# could spuriously hit after id reuse — same fix as engine._robots_delays_dim
_DIMS_ATTR = "_crawlee_psl_dims"


def _dims(spark: SparkSession) -> list[tuple[int, DataFrame]]:
    """Per-label-count rule dims (suffix, is_exact, is_wild_parent, is_exc),
    built once per session and broadcast at join time."""
    cached = getattr(spark, _DIMS_ATTR, None)
    if cached is not None:
        return cached
    r = rules()
    by_k: dict[int, dict[str, list[bool]]] = {}
    for s in r.exact:
        by_k.setdefault(s.count(".") + 1, {}).setdefault(s, [False] * 3)[0] = True
    for s in r.wildcard_parents:
        by_k.setdefault(s.count(".") + 1, {}).setdefault(s, [False] * 3)[1] = True
    for s in r.exceptions:
        by_k.setdefault(s.count(".") + 1, {}).setdefault(s, [False] * 3)[2] = True
    out = []
    for k in sorted(by_k):
        rows = [(s, f[0], f[1], f[2]) for s, f in by_k[k].items()]
        df = spark.createDataFrame(
            rows, f"_sfx{k} string, _ex{k} boolean, _wp{k} boolean, _xc{k} boolean"
        )
        out.append((k, df))
    try:
        setattr(spark, _DIMS_ATTR, out)
    except AttributeError:
        pass  # exotic session proxies without attribute support: just rebuild
    return out


def _lastk(parts: Column, k: int) -> Column:
    return F.concat_ws(".", F.slice(parts, -k, k))


def attach_registrable_domain(
    df: DataFrame, host_col: Column | str, out_col: str
) -> DataFrame:
    """Add ``out_col`` = registrable domain of ``host_col`` (full PSL).

    Plan shape: one broadcast hash join per rule label count (<= 5) on the
    host's last-k-labels string — all map-side, no shuffle, no Python.
    NULL hosts yield NULL.
    """
    spark = df.sparkSession
    host = F.col(host_col) if isinstance(host_col, str) else host_col
    tmp = "_rd_host"
    work = df.withColumn(tmp, F.lower(host))
    parts = F.split(F.col(tmp), r"\.")
    n = F.size(parts)

    dims = _dims(spark)
    for k, dim in dims:
        work = work.join(
            F.broadcast(dim), on=_lastk(parts, k) == F.col(f"_sfx{k}"), how="left"
        ).drop(f"_sfx{k}")

    # prevailing public-suffix label count (exceptions handled separately)
    best = F.lit(1)
    for k, _ in dims:
        ex = F.coalesce(F.col(f"_ex{k}"), F.lit(False))
        wp = F.coalesce(F.col(f"_wp{k}"), F.lit(False)) & (n > k)
        best = F.greatest(
            best,
            F.when(ex, F.lit(k)).otherwise(F.lit(1)),
            F.when(wp, F.lit(k + 1)).otherwise(F.lit(1)),
        )
    # registrable = last (best+1) labels, the host itself when too short.
    # best ranges over 1..MAX_RULE_LABELS+1 (a wildcard on a k-label parent
    # yields k+1), so the chained when must cover one past the dim keys.
    reg = F.col(tmp)
    for k in range(1, MAX_RULE_LABELS + 2):
        reg = F.when(best == k, _lastk(parts, k + 1)).otherwise(reg)
    reg = F.when(n <= best, F.col(tmp)).otherwise(reg)
    # exception rules override everything: registrable = the exception itself
    for k, _ in dims:
        xc = F.coalesce(F.col(f"_xc{k}"), F.lit(False))
        reg = F.when(xc, _lastk(parts, k)).otherwise(reg)
    reg = F.when(host.isNull(), F.lit(None).cast("string")).otherwise(reg)

    drop = [tmp] + [c for k, _ in dims for c in (f"_ex{k}", f"_wp{k}", f"_xc{k}")]
    return work.withColumn(out_col, reg).drop(*drop)
