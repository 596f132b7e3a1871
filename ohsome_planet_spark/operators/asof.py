"""Generic as-of (temporal) join — the relational essence of the reference's
temporal member merge (SURVEY.md J3, ``ContributionsEntity.java:82-96``:
"initialize members as-of the parent version's timestamp").

Implemented as **union + last-value window**, not a range join: both sides
are tagged and unioned, partitioned by key, ordered by (ts, side), and each
probe row picks up the most recent state row via ``last(..., ignorenulls)``.

Scale properties: exactly ONE shuffle (by key), no interval explosion, no
broadcast requirement, skew handled by AQE. A naive
``left.ts BETWEEN right.ts AND right.next_ts`` range join would shuffle both
sides AND risk O(n·m) per key; this stays O((n+m) log(n+m)) sort-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when ``strict``) per key.

    Right-side value columns come back null when no state row precedes the
    probe. Key/value column name collisions with the left side must be
    resolved by the caller beforehand.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [c for c in right.columns if c not in keys and c != right_ts]

    left_struct = F.struct(*[F.col(c) for c in left.columns]).alias("_left")
    state_struct = F.struct(*[F.col(c) for c in value_cols]).alias("_state")

    # probes sort after states at equal ts (inclusive <=); before when strict
    probe_side = 1 if not strict else -1
    probes = left.select(
        *keys, F.col(left_ts).alias("_ts"), F.lit(probe_side).alias("_side"), left_struct
    )
    states = right.select(
        *keys, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"), state_struct
    )

    unioned = probes.withColumn(
        "_state", F.lit(None).cast(states.schema["_state"].dataType)
    ).unionByName(
        states.withColumn("_left", F.lit(None).cast(probes.schema["_left"].dataType))
    )

    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn("_asof", F.last("_state", ignorenulls=True).over(w))
        .filter(F.col("_left").isNotNull())
        .select(
            F.col("_left.*"),
            *[F.col("_asof").getField(c).alias(c) for c in value_cols],
        )
    )
