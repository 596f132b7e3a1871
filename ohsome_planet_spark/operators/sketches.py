"""Deterministic HyperLogLog distinct-count sketches.

Flajolet–Fuss–Gandouet–Meunier 2007 (public algorithm), built on the
engine's deterministic 60-bit md5 hash so the sketch — registers and
estimate — is replayable bit-for-bit in the DuckDB oracle, unlike the
engines' built-in ``approx_count_distinct`` implementations, which are
library-specific and can't be cross-checked.

Why a sketch here at all: at 100 TB, ``count(DISTINCT x)`` per group
shuffles every distinct value; the HLL register table is ``m`` rows per
group regardless of cardinality, the per-bucket ``max(rho)`` is a
map-side-combinable aggregation, and register tables from disjoint
partitions/datasets merge by element-wise max — the standard
pre-aggregated-rollup shape.

The leading-zero count uses the binary-string length of the hash's high
bits (integer-exact in both engines) rather than ``floor(log2(w))``,
which is NOT safe: ``log2`` is a correctly-rounded double only per-libm,
and Spark computes it as ``ln(w)/ln(2)`` where powers of two can land a
ulp below the integer and floor off-by-one the register.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_estimate",
    "HLL_HASH_BITS",
    "cms_build",
    "cms_query",
]

HLL_HASH_BITS = 60  # width of hash60


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    return 0.673


def rho_expr(w: Column, width: int) -> Column:
    """1 + number of leading zeros of ``w`` in a ``width``-bit window.

    ``length(bin(w))`` is exactly ``floor(log2(w)) + 1`` with none of the
    float hazards; ``w = 0`` (all bits zero) maps to ``width + 1`` per the
    paper.
    """
    return F.when(
        w > 0, F.lit(width + 1) - F.length(F.bin(w))
    ).otherwise(F.lit(width + 1))


def hll_registers(
    df: DataFrame, group_cols: list[str], key_hash_col: str, p: int = 8
) -> DataFrame:
    """Per-(group, bucket) register values: ``max(rho)``.

    Bucket = low ``p`` bits of the hash; the remaining ``60 - p`` bits
    feed the leading-zero rank. Only non-zero registers materialize
    (absent buckets are implicitly 0 and reconstructed in the estimate).
    """
    m = 1 << p
    h = F.col(key_hash_col)
    # h >> p, exact: double division would lose bits above 2^53
    w = F.shiftright(h, p)
    bucket = F.pmod(h, F.lit(m))
    return (
        df.select(*group_cols, bucket.alias("bucket"),
                  rho_expr(w, HLL_HASH_BITS - p).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Group → cardinality estimate, with the paper's small-range
    (linear counting) correction. Deterministic given the registers."""
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("_sum_present"),
        F.count(F.lit(1)).alias("_n_present"),
    )
    # absent buckets contribute 2^0 = 1 each; V = number of zero registers
    z = F.col("_sum_present") + (F.lit(m) - F.col("_n_present"))
    raw = F.lit(alpha * m * m) / z
    v = F.lit(m) - F.col("_n_present")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((raw <= 2.5 * m) & (v > 0), linear).otherwise(raw)
    return agg.select(
        *group_cols,
        F.round(est, 6).alias("hll_estimate"),
        F.col("_n_present").alias("n_registers"),
    )


def _floor_div_sql(h: str, m: int) -> str:
    return f"CAST(({h}) // {m} AS BIGINT)"


def registers_sql(key_hash_sql: str, m: int, width: int) -> tuple[str, str]:
    """DuckDB twins of (bucket, rho) for the oracle."""
    w = _floor_div_sql(key_hash_sql, m)
    bucket = f"({key_hash_sql}) % {m}"
    rho = (
        f"CASE WHEN {w} > 0 THEN {width + 1} - length(bin({w})) "
        f"ELSE {width + 1} END"
    )
    return bucket, rho


def estimate_sql(m: int) -> str:
    """DuckDB estimate expression over columns ``_sum_present`` /
    ``_n_present`` (same branch structure as :func:`hll_estimate`)."""
    alpha = _alpha(m)
    z = f"(_sum_present + ({m} - _n_present))"
    raw = f"({alpha * m * m!r} / {z})"
    v = f"({m} - _n_present)"
    linear = f"({float(m)!r} * ln({float(m)!r} / {v}))"
    return (
        f"round(CASE WHEN {raw} <= {2.5 * m!r} AND {v} > 0 "
        f"THEN {linear} ELSE {raw} END, 6)"
    )


# --- Count-Min sketch (Cormode & Muthukrishnan 2005, public) ----------------
#
# Frequency estimation with bounded memory: d hash rows × w buckets of
# counters. Distributed build = explode each key occurrence into its d
# (row, bucket) cells and count — map-side combine collapses every
# partition to ≤ d·w cells before the shuffle, so the exchange is
# sketch-sized, not data-sized. Point query = min over the key's d cells
# (always an overestimate, never an under). Same Carter–Wegman affine
# hash family as the Bloom filter, so the oracle replays it exactly.


def _cms_coeff(i: int, which: str) -> int:
    import hashlib

    h = int(hashlib.md5(f"cms:{which}:{i}".encode()).hexdigest()[:15], 16)
    return (h % (1 << 31)) | 1


def cms_bucket_expr(key_hash: Column, row: int, w: int) -> Column:
    from .dedup import MINHASH_PRIME

    p = F.lit(MINHASH_PRIME)
    return (
        (F.lit(_cms_coeff(row, "a")) * (key_hash % p) + F.lit(_cms_coeff(row, "b")))
        % p
        % w
    ).cast("int")


def cms_bucket_sql(key_hash_sql: str, row: int, w: int) -> str:
    from .dedup import MINHASH_PRIME

    return (
        f"CAST(({_cms_coeff(row, 'a')} * (({key_hash_sql}) % {MINHASH_PRIME})"
        f" + {_cms_coeff(row, 'b')}) % {MINHASH_PRIME} % {w} AS INT)"
    )


def cms_build(
    df: DataFrame, key_hash_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Counter table: one row per non-zero (sketch row, bucket) cell."""
    h = F.col(key_hash_col)
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("row"), cms_bucket_expr(h, i, w).alias("bucket"))
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_query(
    keys: DataFrame, key_hash_col: str, cms: DataFrame, d: int = 4, w: int = 1024
) -> DataFrame:
    """Append ``cms_estimate`` (min over the key's d cells) to each key row.

    Duplicate key rows are preserved: estimates are computed once per
    distinct key and joined back to the input frame (same shape as
    ``probe_bloom``), so the output has exactly the input's rows
    (round-6 ADVICE: the previous groupBy-only form collapsed duplicates).

    The counter table is ≤ d·w rows — broadcast; the keys side never
    shuffles for the lookup.
    """
    cols = keys.columns
    h = F.col(key_hash_col)
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("row"), cms_bucket_expr(h, i, w).alias("bucket"))
            for i in range(d)
        ]
    )
    slots = keys.select(*cols, F.explode(cells).alias("c")).select(
        *cols, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    )
    estimates = (
        slots.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(*cols)
        .agg(F.min(F.coalesce("counter", F.lit(0))).alias("cms_estimate"))
    )
    return keys.join(estimates, cols, "left")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta) sketch: mergeable distinct counting WITH
# set-operation estimates (union, intersection, difference) — the piece
# HLL lacks (HLL unions trivially but cannot intersect).
# ---------------------------------------------------------------------------

KMV_SPACE = float(1 << 60)


def kmv_sketch(df, key: Column, k: int = 256) -> "DataFrame":
    """Build one KMV sketch row: the k smallest 60-bit hashes of the key
    (deterministic md5-based hash, so the sketch is bit-reproducible and
    SQL-replayable). Returns a 1-row frame (ks array<long>, n_keys long).

    Scale shape — the TWO-STAGE order-statistic form: the distinct hash
    frame first reduces to k candidates PER PARTITION (groupBy
    spark_partition_id, sorted slice), and only those ≤ k·partitions
    survivors reach the final single-row agg. The global k smallest are
    guaranteed to be among the per-partition k smallest, so the result
    is exact; no stage ever materializes the full distinct set on one
    task (a single-row collect_list over a 10⁹-key corpus would). The
    exact distinct count rides the same distinct frame as a separate
    map-side-combinable count.
    """
    from ..functions.text import hash60_expr

    h = hash60_expr(key.cast("string"))
    hashes = df.select(h.alias("_h")).distinct()
    per_part = (
        hashes.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .agg(F.slice(F.sort_array(F.collect_list("_h")), 1, k).alias("_ks"))
        .select(F.explode("_ks").alias("_h"))
    )
    topk = per_part.select(
        F.slice(F.sort_array(F.collect_list("_h")), 1, k).alias("ks"),
        F.lit(1).alias("_j"),
    )
    counts = hashes.agg(F.count(F.lit(1)).alias("n_keys")).withColumn(
        "_j", F.lit(1)
    )
    return topk.join(F.broadcast(counts), "_j").select("ks", "n_keys")


def kmv_estimate_expr(ks: Column, k: int) -> Column:
    """Distinct-count estimate: (k-1) / theta where theta = kth smallest
    hash / hash-space size; exact count when fewer than k values exist."""
    n = F.size(ks)
    kth = F.element_at(ks, k)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / kth.cast("double")
    )


def kmv_merge_expr(a: Column, b: Column, k: int) -> Column:
    """Union of two sketches: merge, dedup, keep the k smallest — closed
    under the sketch invariant, pure array expressions."""
    return F.slice(F.sort_array(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_intersect_estimate_expr(a: Column, b: Column, k: int) -> Column:
    """Intersection estimate (theta-sketch style): form the union sketch,
    take its theta (the kth smallest union hash), count common hashes
    below theta, and scale by 1/theta. Exact when the union has fewer
    than k values. Pure array expressions — mergeable and shuffle-free
    once the per-side sketches exist."""
    u = kmv_merge_expr(a, b, k)
    n_u = F.size(u)
    kth = F.element_at(u, k)
    common_all = F.array_intersect(a, b)
    common_below = F.size(F.filter(common_all, lambda x: x < kth))
    return F.when(n_u < k, F.size(common_all).cast("double")).otherwise(
        common_below.cast("double") * F.lit(KMV_SPACE) / kth.cast("double")
    )
