"""Bucketed state tables (SURVEY.md §4 'Bulk-load sorted state' and the
scale plan's co-located joins).

The reference bulk-loads sorted SSTs into RocksDB so later lookups are
cheap (``SstWriter.java``, ``Transformer.java:163-179``). The Spark
equivalent for repeatedly-joined state (latest entities, node location
history, back-references) is a **bucketed, sorted table**: written once
with ``bucketBy(n, key)``, every later equi-join or groupBy on that key
reads co-located buckets and skips the shuffle entirely — on a 100 TB
latest-state table that is the difference between re-shuffling the planet
per replication batch and touching only matching buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...] = ("osm_id",),
    n_buckets: int = 64,
    sort_cols: tuple[str, ...] | None = None,
    path: str | None = None,
) -> None:
    """Persist a state DataFrame as a bucketed+sorted managed table."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_state(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True if the physical plan contains a join with no exchange beneath
    it on either side (the bucketed co-located case) — used by tests to
    assert the shuffle actually disappeared."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan:
        return False
    # in a bucket-joined plan the join's children scan the bucketed files
    # directly: the plan shows the join but no hash exchange above the scans
    return "Exchange hashpartitioning" not in plan


def write_zordered(
    df: DataFrame,
    path: str,
    dims: tuple[str, ...],
    bits: int = 16,
    n_files: int = 8,
    curve: str = "morton",
) -> None:
    """Write ``df`` clustered by the Z-order key of ``dims`` (non-negative
    integer columns) — the OPTIMIZE ZORDER BY layout: range-partition by
    the Morton key so files cover disjoint key ranges, then sort within
    each file. Parquet column min/max statistics then bound EVERY
    interleaved dimension tightly per row group, so a range predicate on
    any one of them prunes files/row groups at scan time (the multi-dim
    generalization of a single sort key). The key column itself is not
    persisted — the layout is the artifact.

    ``curve``: ``morton`` (any dimension count) or ``hilbert`` (2-D only,
    tighter chunk spans — no quadrant seam jumps).
    """
    from pyspark.sql import functions as F

    from ..functions.zorder import with_hilbert_key, zorder_key_expr

    if curve == "hilbert":
        if len(dims) != 2:
            raise ValueError("hilbert layout is 2-D")
        keyed = with_hilbert_key(df, dims[0], dims[1], bits=bits, out="_zkey")
    elif curve == "morton":
        keyed = df.withColumn(
            "_zkey", zorder_key_expr([F.col(d) for d in dims], bits=bits)
        )
    else:
        raise ValueError(f"unknown curve {curve!r}")
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
