"""Z-order (Morton) interleaving as native Column expressions — the
multi-dimensional data-layout key used to cluster 100 TB tables so that
range predicates on ANY of the interleaved dimensions prune row groups
(the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``; the domain
sibling of the XZ space-filling curve in ``functions/xz.py``).

Everything is closed-form integer arithmetic (shift/mask/or), so the
key stays inside whole-stage codegen and the DuckDB oracle replays it
bit-for-bit. No UDFs, no driver work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key_expr(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one Morton key: bit ``i`` of column ``d`` lands at
    position ``i * len(cols) + d``. With two 16-bit dimensions the key
    fits 32 bits; three fit 48 — always inside an int64 for
    ``bits * len(cols) <= 63``."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError("interleaved key must fit a signed int64")
    key = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for d, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(one), i * n + d)
            )
    return key


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB twin of :func:`zorder_key_expr` (same bit layout)."""
    n = len(cols)
    terms = []
    for d, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + d})")
    return "(" + " | ".join(terms) + ")"


def quantize_expr(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a double in [lo, hi] onto the ``bits``-bit integer grid
    (clamped), the step before interleaving continuous dimensions."""
    span = hi - lo
    cells = (1 << bits) - 1
    q = F.floor((c - F.lit(lo)) / F.lit(span) * F.lit(cells)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(cells), q))


def quantize_sql(c: str, lo: float, hi: float, bits: int = 16) -> str:
    cells = (1 << bits) - 1
    return (
        f"greatest(0, least({cells}, "
        f"CAST(floor(({c} - {lo!r}) / {hi - lo!r} * {cells}) AS BIGINT)))"
    )
