"""Explicit skew handling: salted equi-joins.

AQE's skew-join splitting (on in ``session.get_spark``) handles most skew
at runtime by splitting oversized partitions, but it only works for
sort-merge joins it can re-plan, and it cannot help when a single HOT KEY
exceeds one task's memory on the build side of a shuffle. Salting is the
explicit, planner-independent form: the fact side spreads each hot key
over ``n_salt`` sub-keys, the dimension side is replicated once per salt,
and the join runs on (key, salt) — no single reducer ever sees a whole
hot key.

Cost model: dimension side is multiplied by ``n_salt`` (keep it the small
side), fact side gets one extra narrow column. Equivalent to the plain
equi-join for inner/left-semi/left joins on the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["replicate_salted", "with_salt", "salted_join"]


def _hashable(dt) -> bool:
    # Spark's hash expressions reject MapType anywhere in the tree
    # (HASH_MAP_TYPE); skip such columns when deriving the salt
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    return True


def with_salt(df: DataFrame, keys: list[str], n_salt: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salt): xxhash64 over every
    hashable column, so rows sharing a hot key still spread (identical
    full rows share a salt, which is harmless — they land in the same
    split). Map-typed columns are excluded (Spark cannot hash them); a
    frame with no hashable columns falls back to the partition row id."""
    cols = [f.name for f in df.schema.fields if _hashable(f.dataType)]
    src = (
        F.xxhash64(*[F.col(c) for c in cols])
        if cols
        else F.xxhash64(F.monotonically_increasing_id())
    )
    return df.withColumn(salt_col, F.pmod(src, F.lit(n_salt)))


def replicate_salted(dim: DataFrame, n_salt: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate the dimension side once per salt value (the build-side
    half of a salted join): one narrow ``explode(sequence)`` — n_salt×
    rows, no shuffle."""
    return dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("bigint"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the hot-key shuffle spread
    over ``n_salt`` sub-keys. Result is column-identical to
    ``fact.join(dim, on, how)`` for inner/left/left_semi joins."""
    f = with_salt(fact, on, n_salt)
    d = replicate_salted(dim, n_salt)
    out = f.join(d, on + ["_salt"], how)
    return out.drop("_salt")
