"""Cardinality sketches: a portable HyperLogLog built from column
expressions.

Counting distinct keys is the frontier's oldest scale problem — "how many
unique URLs have we seen per host / per domain / overall" — and at 10^10
keys an exact count_distinct is a full shuffle of every key. HyperLogLog
(Flajolet et al. 2007) answers it in m registers (here 2^p); Spark's own
``approx_count_distinct`` is HLL++, but its register layout is opaque to
any second engine, so it can't be oracle-checked. This implementation
builds the SAME sketch in plain expressions both engines share:

    h       = md5_hash64(key)              (56-bit portable hash)
    bucket  = h % 2^p                      (register index)
    w       = h >> p                       ((56-p)-bit remainder)
    rho     = (56-p) - bitlen(w) + 1       (leading-zero rank; bitlen via
                                            length(bin(w)) in BOTH engines)

Register state is ``max(rho)`` per bucket — a hash aggregate with map-side
combine, the whole point at scale: the shuffle carries at most m rows per
group, never the keys. The harmonic estimate is computed WITHOUT float
summation-order hazards: each register contributes the exact integer
``2^(56 - max_rho)`` and the sum runs in DECIMAL(38,0) (exact, order-
independent; int64 would overflow at 2^12 registers × 2^56). The single
int→double conversion happens once on the final scalar, so the estimate is
bit-identical across engines. This is the RAW HLL estimate (no small/large-
range corrections — those need ln(), whose last bit differs across libms
and would break the value-hash oracle); ``n_empty`` is emitted so a consumer
can apply linear counting where it applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlee_spark.functions.text import md5_hash64

HASH_BITS = 56  # md5_hash64 = 14 hex chars


def hll_rho(key: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rho) pair for one key under a 2^p-register HLL."""
    h = md5_hash64(key)
    bucket = F.pmod(h, F.lit(1 << p))
    w = F.shiftright(h, p)
    width = HASH_BITS - p
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(w)) + 1
    )
    return bucket, rho


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Per-group (or global) HLL distinct-count estimate of ``key_col``.

    Output: group cols + (n_registers, n_empty, hll_estimate). The estimate
    is the raw harmonic mean ``alpha_m * m^2 / Σ 2^-M_j`` with empty
    registers contributing 2^0 — accurate to ~1.04/sqrt(m) once the
    cardinality exceeds ~2.5m; below that, apply linear counting
    ``m * ln(m / n_empty)`` downstream (deliberately not computed here; see
    module docstring).
    """
    group_cols = list(group_cols or [])
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    bucket, rho = hll_rho(F.col(key_col), p)
    regs = (
        df.select(*group_cols, bucket.alias("_b"), rho.alias("_r"))
        .groupBy(*group_cols, "_b")
        .agg(F.max("_r").alias("_mr"))
    )
    # exact integer register mass: 2^(56 - max_rho), summed in decimal
    # (shiftleft via expr: the builtin wrapper takes only a literal numBits)
    mass = F.expr(f"shiftleft(1L, {HASH_BITS} - _mr)")
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(mass.cast("decimal(38,0)")).alias("_s"),
    )
    scale = float(1 << HASH_BITS)
    total = (
        F.col("_s")
        + (F.lit(m) - F.col("_present")).cast("decimal(38,0)")
        * F.lit(1 << HASH_BITS).cast("decimal(38,0)")
    )
    est = F.lit(alpha * m * m) / (total.cast("double") / F.lit(scale))
    return agg.select(
        *group_cols,
        F.lit(m).cast("long").alias("n_registers"),
        (F.lit(m) - F.col("_present")).cast("long").alias("n_empty"),
        F.round(est, 2).alias("hll_estimate"),
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    k: int = 20,
) -> DataFrame:
    """Top-k heavy hitters of ``key_col`` by count-min-sketch estimate
    (Cormode & Muthukrishnan 2005): d=4 hash rows x w=1024 counters.

    Sketch build is ONE pass: each occurrence increments d counters, i.e. a
    groupBy (row, bucket) count whose state is bounded by d*w cells no
    matter the key cardinality — the point at 10^10 URLs, where an exact
    per-key count shuffles every key. The estimate of a key is the MIN of
    its d counters (never an under-count; over-counts decay with w). The
    candidate pass (distinct keys -> estimate join -> top-k) exists to
    DEMONSTRATE estimate accuracy against the exact oracle; a production
    heavy-hitter pipeline keeps candidates from a per-partition pre-pass.

    Row r's hash is ``md5_hash64(key || '#cms<r>') % w`` — portable to the
    DuckDB oracle verbatim. Output: (key, est_count, rank), rank 1..k by
    (est_count desc, key asc); ties beyond position k are CUT by the rank
    window (deterministic because the full order is total).
    """
    rows_arr = F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(
                md5_hash64(F.concat(F.col(key_col), F.lit(f"#cms{r}"))),
                F.lit(w),
            ).alias("b"),
        )
        for r in range(d)
    ])
    occ = df.select(F.col(key_col).alias("key"), F.explode(rows_arr).alias("rb"))
    counters = (
        occ.groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # estimate every distinct key: join its d (r, b) cells, take the min
    # (rows_arr references key_col, so alias to "key" in the same select)
    cand = df.select(F.col(key_col)).distinct().select(
        F.col(key_col).alias("key"), F.explode(rows_arr).alias("rb"))
    est = (
        cand.join(counters, (F.col("rb.r") == F.col("r")) & (F.col("rb.b") == F.col("b")))
        .groupBy("key")
        .agg(F.min("c").alias("est_count"))
    )
    from pyspark.sql import Window

    # global top-k as orderBy().limit(): Spark plans TakeOrderedAndProject
    # (per-partition partial top-k, no single-partition sort of the
    # estimate table); the rank window then orders only the k survivors
    top = est.orderBy(F.col("est_count").desc(), F.col("key").asc()).limit(k)
    rk = Window.orderBy(F.col("est_count").desc(), F.col("key").asc())
    return top.withColumn("rank", F.row_number().over(rk))
