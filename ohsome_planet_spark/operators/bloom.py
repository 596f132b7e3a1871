"""Distributed Bloom-filter membership for holdout decontamination.

The exact decontamination join (``plans/queries.py::decontamination``)
shuffles every training-side shingle. At 100 TB the training side is the
planet; the holdout/benchmark side is tiny. The Bloom shape fixes the
asymmetry: k hash positions per holdout shingle are folded into a *set of
set bit positions* — at most ``m`` rows, bounded by the filter size, not
the data — broadcast to every executor, and the training side is probed
map-side with no shuffle of its shingle stream at all. False positives
only (bounded by the classic ``(1-e^{-kn/m})^k``), never false negatives,
so the flagged set is a certified superset of the exact overlap — the
right direction for contamination removal.

The bit positions use the same public affine family as MinHash
(``a_i * (h % P) + b_i) % P % m``, Carter–Wegman universal hashing), so
the whole construction is replayable bit-for-bit in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import MINHASH_PRIME

__all__ = ["bloom_positions_expr", "build_bloom", "probe_bloom"]


def _coeff(i: int, which: str) -> int:
    # distinct seed family from minhash so the two operators are
    # statistically independent when used together
    import hashlib

    h = int(hashlib.md5(f"bloom:{which}:{i}".encode()).hexdigest()[:15], 16)
    return (h % (1 << 31)) | 1


def bloom_positions_expr(key_hash: Column, m: int, k: int) -> Column:
    """Array of ``k`` bit positions in ``[0, m)`` for a 60-bit key hash."""
    p = F.lit(MINHASH_PRIME)
    return F.array(
        *[
            (
                (F.lit(_coeff(i, "a")) * (key_hash % p) + F.lit(_coeff(i, "b")))
                % p
                % m
            ).cast("int")
            for i in range(k)
        ]
    )


def positions_sql(key_hash_sql: str, m: int, k: int) -> str:
    """DuckDB twin of :func:`bloom_positions_expr` (a LIST literal)."""
    terms = ", ".join(
        f"CAST(({_coeff(i, 'a')} * (({key_hash_sql}) % {MINHASH_PRIME})"
        f" + {_coeff(i, 'b')}) % {MINHASH_PRIME} % {m} AS INT)"
        for i in range(k)
    )
    return f"[{terms}]"


def build_bloom(
    keys: DataFrame, key_hash_col: str, m: int = 1 << 18, k: int = 3
) -> DataFrame:
    """The filter as a relation: DISTINCT set bit positions (≤ m rows).

    One map-side-combinable aggregation over the (small) holdout side;
    the result is dimension-sized by construction and safe to broadcast.
    """
    return (
        keys.select(
            F.explode(
                bloom_positions_expr(F.col(key_hash_col), m, k)
            ).alias("pos")
        )
        .distinct()
    )


def probe_bloom(
    probes: DataFrame, key_hash_col: str, bloom: DataFrame, m: int = 1 << 18, k: int = 3
) -> DataFrame:
    """Append ``maybe_member`` to each probe row.

    Each probe key expands to its k (slot, position) pairs; a broadcast
    join against the set-bit relation hits each slot at most once, so a
    key is a (possible) member iff all k DISTINCT slots joined. Counting
    distinct slots (not rows) keeps the guarantee under duplicate probe
    rows: groupBy(*cols) collapses duplicates, so a plain count(*) would
    see 2k hits for a twice-probed member and wrongly report
    ``maybe_member = False`` — a false NEGATIVE, the one failure mode a
    Bloom filter must never have (round-6 ADVICE, medium). The big probe
    side never shuffles — the only exchange is the final groupBy back to
    one row per probe, keyed identically to the input.
    """
    cols = probes.columns
    slots = probes.select(
        *cols,
        F.posexplode(
            bloom_positions_expr(F.col(key_hash_col), m, k)
        ).alias("_slot", "pos"),
    )
    hits = (
        slots.join(F.broadcast(bloom), "pos")
        .groupBy(*cols)
        .agg(F.countDistinct("_slot").alias("_n_hit"))
    )
    return (
        probes.join(hits, cols, "left")
        .withColumn("maybe_member", F.coalesce(F.col("_n_hit") == k, F.lit(False)))
        .drop("_n_hit")
    )
