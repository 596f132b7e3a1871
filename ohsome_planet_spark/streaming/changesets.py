"""Changeset replication (R5): minutely batch ingest + upsert-merge +
open-changeset reconciliation.

Reference behavior being re-expressed:

- ``ohsome-changesets/.../ChangesetDB.java:131-186`` — the upsert is
  ``INSERT … ON CONFLICT (id) DO UPDATE SET … WHERE changesets.open``:
  a changeset that the store already saw **closed** is immutable; open
  rows are replaced by the newest replica. Because JDBC ``executeBatch``
  applies rows in order, *within* one batch the first row that closes a
  changeset freezes it — later rows for the same id in the same batch are
  no-ops. The Spark shape is a single full-outer merge (one shuffle per
  side) after a window picks each id's within-batch winner; on a managed
  table this is exactly a ``MERGE INTO … WHEN MATCHED AND target.open``.
- ``ChangesetDB.java:276-296`` — ``pendingChangesets``: placeholder rows
  (epoch-2000 created_at, open) inserted with ``ON CONFLICT DO NOTHING``
  for ids referenced by contributions before their changeset replica
  arrived.
- ``ChangesetDB.java:250-266`` — open changesets older than two hours are
  re-fetched from the API (they may have closed without a replication
  entry) — ``ChangesetStateManager.java:118-140``.
- ``ChangesetStateManager.java:79-115`` — catch-up loop: sequences are
  processed in batches of 500; each batch's files are fetched
  concurrently, parsed, upserted, and the local state row advances to the
  batch's last sequence (so a crash resumes at a batch boundary).

Scale shape: the store is a DataFrame/table keyed by ``id``; each batch
touches |batch| + |matching ids| rows. The full-outer merge shuffles the
*batch* (small) and the state once — on a bucketed/Delta table the state
side is co-located and the merge is shuffle-free on the big side.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.osmxml import parse_changesets_bytes
from .replication import ReplicationState
from .server import Server

__all__ = [
    "CHANGESET_STORE_SCHEMA",
    "bbox_geom_udf",
    "batch_winner",
    "upsert_changesets",
    "pending_changesets",
    "open_changesets_older_than",
    "ChangesetStateManager",
]

# Store columns mirror the reference's ``changesets`` table
# (setupChangesetDB.sql): id, user_id, created_at, closed_at, open,
# user_name, tags, hashtags, plus the raw bbox coords and the
# PostGIS-equivalent bbox polygon (``geom Polygon 4326``) as WKB.
CHANGESET_STORE_SCHEMA = (
    "id bigint, user_id bigint, created_at timestamp, closed_at timestamp,"
    " open boolean, user_name string, tags map<string,string>,"
    " hashtags array<string>,"
    " min_lon double, min_lat double, max_lon double, max_lat double,"
    " geom binary"
)


def bbox_geom_udf():
    """WKB bbox polygon from min/max lon/lat — the store-write equivalent
    of the reference's ``getBBOXasWKT``
    (``OSMChangesets.java:81-88`` / ``ChangesetDB.java:178``): CCW ring
    (min,min) → (max,min) → (max,max) → (min,max) → close, NULL when any
    coordinate is missing. Arrow-batched (no native double→IEEE-bytes
    expression exists); runs once per store write, off the query hot path.
    """
    import math
    import struct

    from pyspark.sql.functions import pandas_udf

    # little-endian WKB: byteOrder=1, type=3 (Polygon), 1 ring, 5 points
    header = b"\x01\x03\x00\x00\x00\x01\x00\x00\x00\x05\x00\x00\x00"

    @pandas_udf("binary")
    def _bbox_wkb(
        min_lon: pd.Series, min_lat: pd.Series, max_lon: pd.Series, max_lat: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, c, d in zip(min_lon, min_lat, max_lon, max_lat):
            if any(v is None or (isinstance(v, float) and math.isnan(v)) for v in (a, b, c, d)):
                out.append(None)
            else:
                out.append(header + struct.pack("<10d", a, b, c, b, c, d, a, d, a, b))
        return pd.Series(out, dtype=object)

    return _bbox_wkb

_PLACEHOLDER_CREATED_AT = "2000-01-01 00:00:00"


def batch_winner(batch: DataFrame, pos_col: str = "_pos") -> DataFrame:
    """Per id, the row that survives sequential ``ON CONFLICT … WHERE
    open`` application of the batch: the **first closing** row if any row
    closes the changeset (everything after it is blocked), else the
    **last** row. ``pos_col`` is the apply order (sequence-major, then
    position within the replication file)."""
    order = F.when(F.col("open"), -F.col(pos_col)).otherwise(F.col(pos_col))
    w = W.partitionBy("id").orderBy(F.col("open").asc(), order.asc())
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", pos_col)
    )


def upsert_changesets(
    state: DataFrame, batch: DataFrame, pos_col: str = "_pos"
) -> DataFrame:
    """The ``ON CONFLICT (id) DO UPDATE … WHERE changesets.open`` merge
    (``ChangesetDB.java:131-160``) as one full-outer join:

    - id only in the batch → inserted;
    - id in the store and **closed** → store row kept (immutable);
    - id in the store and open → batch winner replaces it;
    - id only in the store → kept.
    """
    if pos_col in batch.columns:
        batch = batch_winner(batch, pos_col)
    cols = [c for c in state.columns if c != "id"]
    s = state.select("id", F.struct(*cols).alias("_s"))
    b = batch.select("id", F.struct(*cols).alias("_b"))
    merged = s.join(b, "id", "full_outer").select(
        "id",
        F.when(
            F.col("_s").isNotNull() & ~F.col("_s.open"), F.col("_s")
        )
        .otherwise(F.coalesce("_b", "_s"))
        .alias("_r"),
    )
    return merged.select("id", *[F.col(f"_r.{c}").alias(c) for c in cols])


def pending_changesets(state: DataFrame, ids: DataFrame) -> DataFrame:
    """``ChangesetDB.pendingChangesets`` (``:276-296``): insert open
    placeholder rows (created_at = 2000-01-01, empty user/tags) for ids not
    yet in the store — ``ON CONFLICT (id) DO NOTHING`` = left-anti + union.
    ``ids`` needs a single ``id`` column."""
    missing = ids.select("id").distinct().join(state.select("id"), "id", "left_anti")
    placeholders = missing.select(
        "id",
        F.lit(0).cast("bigint").alias("user_id"),
        F.lit(_PLACEHOLDER_CREATED_AT).cast("timestamp").alias("created_at"),
        F.lit(None).cast("timestamp").alias("closed_at"),
        F.lit(True).alias("open"),
        F.lit("").alias("user_name"),
        F.create_map().cast("map<string,string>").alias("tags"),
        F.array().cast("array<string>").alias("hashtags"),
        *[
            F.lit(None).cast("double").alias(c)
            for c in ("min_lon", "min_lat", "max_lon", "max_lat")
        ],
        F.lit(None).cast("binary").alias("geom"),
    )
    return state.unionByName(placeholders.select(*state.columns))


def open_changesets_older_than(
    state: DataFrame, now: datetime, hours: float = 2.0
) -> DataFrame:
    """Ids of open changesets created more than ``hours`` ago
    (``ChangesetDB.java:250-266`` — candidates for API reconciliation)."""
    cutoff = now - timedelta(hours=hours)
    return state.filter(
        F.col("open") & (F.col("created_at") < F.lit(cutoff.replace(tzinfo=None)))
    ).select("id")


def _rows_to_df(
    spark: SparkSession, rows: list[dict], with_pos: bool = True
) -> DataFrame:
    """Parsed changeset dicts (``parse_changesets_bytes`` shape) → store
    DataFrame, with derived hashtags/editor-adjacent columns and the apply
    order preserved in ``_pos``."""
    from ..functions.hashtags import hashtags_from_tags_expr

    pdf = pd.DataFrame(rows)
    schema = CHANGESET_STORE_SCHEMA.replace(
        " hashtags array<string>,", ""
    ).replace(", geom binary", "") + (", _pos bigint" if with_pos else "")
    cols = [
        "id", "user_id", "created_at", "closed_at", "open", "user_name",
        "tags", "min_lon", "min_lat", "max_lon", "max_lat",
    ] + (["_pos"] if with_pos else [])
    if len(pdf):
        if with_pos:
            pdf["_pos"] = range(len(pdf))
        df = spark.createDataFrame(pdf[cols], schema)
    else:
        df = spark.createDataFrame([], schema)
    return df.withColumn(
        "hashtags", hashtags_from_tags_expr(F.col("tags"))
    ).withColumn(
        "geom", bbox_geom_udf()("min_lon", "min_lat", "max_lon", "max_lat")
    )


@dataclass
class ChangesetStateManager:
    """Driver-side orchestration of the changeset stream
    (``ChangesetStateManager.java``). The store itself is a DataFrame the
    caller owns (load → update → write back, or checkpoint per batch);
    the manager only sequences fetch/parse/upsert and tracks the
    replication state row."""

    server: Server
    spark: SparkSession
    local_state: ReplicationState | None = None
    batch_size: int = 500
    api_batch_size: int = 100
    closed_ids: set[int] = field(default_factory=set)
    # optional S16 drop-in: every upserted batch is mirrored into
    # PostgreSQL (sources.jdbc.ChangesetJdbcSink or compatible)
    jdbc_sink: object | None = None

    # -- state bootstrap (ChangesetStateManager.java:44-57) ----------------

    def initialize_local_state(self, max_local_timestamp: datetime | None) -> None:
        """If no persisted state row exists, estimate the starting sequence
        from the newest changeset already in the store."""
        if self.local_state is not None:
            return
        if max_local_timestamp is None:
            raise ValueError(
                "empty changeset store and no state: run the bulk changeset "
                "load first (reference: 'run changeset command first')"
            )
        remote = self.server.get_latest_remote_state()
        self.local_state = self.server.find_start_state_by_timestamp(
            max_local_timestamp, remote
        )

    # -- catch-up loop (ChangesetStateManager.java:79-115) -----------------

    def update_to_remote_state(
        self, state: DataFrame, remote: ReplicationState | None = None
    ) -> DataFrame:
        """Apply every sequence in (local, remote] in batches of
        ``batch_size``; each batch is one upsert-merge and one state
        advance. Returns the new store DataFrame."""
        if self.local_state is None:
            raise ValueError("initialize_local_state first")
        remote = remote or self.server.get_latest_remote_state()
        first = self.local_state.sequence + 1 + self.server.replication_offset
        steps = remote.sequence - self.local_state.sequence
        seqs = list(range(first, first + steps))
        for i in range(0, len(seqs), self.batch_size):
            state = self._update_batch(state, seqs[i : i + self.batch_size])
        return state

    def _update_batch(self, state: DataFrame, batch: Sequence[int]) -> DataFrame:
        rows: list[dict] = []
        for seq in batch:  # files are km-scale; fetch serially on the driver
            for row in parse_changesets_bytes(self.server.get_replication_file(seq)):
                rows.append(row)
        for row in rows:
            if not row["open"]:
                self.closed_ids.add(row["id"])
        batch_df = _rows_to_df(self.spark, rows)
        state = upsert_changesets(state, batch_df)
        if self.jdbc_sink is not None:
            self.jdbc_sink.upsert(batch_winner(batch_df))
        self.local_state = self.server.get_remote_state(batch[-1])
        return state

    # -- >2h reconciliation (ChangesetStateManager.java:118-140) -----------

    def update_unclosed_changesets(
        self,
        state: DataFrame,
        now: datetime,
        api_fetch: Callable[[Iterable[int]], bytes] | None = None,
    ) -> DataFrame:
        """Re-fetch open changesets older than two hours from the API in
        id-batches of 100 and upsert the replies (they may have closed
        without a replication entry). ``api_fetch(ids) -> bytes`` is the
        injectable equivalent of the reference's
        ``/api/0.6/changesets?closed=true&changesets=…`` GET."""
        if api_fetch is None:
            api_fetch = self._osm_api_fetch
        ids = [r.id for r in open_changesets_older_than(state, now).collect()]
        rows: list[dict] = []
        for i in range(0, len(ids), self.api_batch_size):
            chunk = ids[i : i + self.api_batch_size]
            try:
                rows.extend(parse_changesets_bytes(api_fetch(chunk)))
            except FileNotFoundError:
                # API endpoint not reachable through this transport (offline
                # mirror / tests): leave the rows open, reconcile next pass
                continue
        if rows:
            batch_df = _rows_to_df(self.spark, rows)
            state = upsert_changesets(state, batch_df)
            if self.jdbc_sink is not None:
                self.jdbc_sink.upsert(batch_winner(batch_df))
        return state

    def _osm_api_fetch(self, ids: Iterable[int]) -> bytes:
        url = (
            "https://www.openstreetmap.org/api/0.6/changesets?closed=true"
            "&changesets=" + ",".join(str(i) for i in ids)
        )
        return self.server.fetch(url)
