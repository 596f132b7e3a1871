"""Custom stateful streaming operators (``applyInPandasWithState``).

Two state machines a continuous ingest pipeline needs and no built-in
streaming operator expresses:

- :func:`dedup_stream` — cross-micro-batch exact dedup: the first row per
  key ever seen is emitted, every later arrival is dropped. Built-in
  ``dropDuplicates`` on a stream keeps state forever (or needs an
  event-time column for ``dropDuplicatesWithinWatermark``);  this variant
  bounds state with a processing-time TTL per key, the right trade for
  training-data ingest where re-crawls of the same document cluster in
  time.
- :func:`latest_state_stream` — the streaming form of the replication
  latest-state store (SURVEY.md §2.8 R4, reference
  ``UpdateStoreRocksDb.java:200-230``): emits a row whenever a key's
  version advances, suppressing stale or duplicate versions that arrive
  late or out of order within/between batches.

Both run per-key with Arrow-batched pandas; state is a single fixed-width
row per key, so executor state size is O(live keys), partitioned by the
grouping key — the same sharding a 1000-executor cluster needs. The same
functions run on a batch DataFrame's groupBy for unit parity (tested via
``trigger(availableNow)`` file streams + memory sink).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def _ttl_ms(ttl: str | None) -> int | None:
    if ttl is None:
        return None
    n, unit = ttl.split()
    mult = {"seconds": 1_000, "minutes": 60_000, "hours": 3_600_000}[unit]
    return int(n) * mult


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    state_ttl: str | None = "1 hours",
) -> DataFrame:
    """First-seen-wins streaming dedup over ``key_cols``.

    State per key: one boolean-shaped row (``seen``). With ``state_ttl``
    set, a key's state is dropped after that much processing time without
    new arrivals — later re-arrivals then pass again (bounded-memory,
    approximate over horizons longer than the TTL; exact within it).
    """
    out_schema = df.schema
    state_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "seen", "type": "boolean", "nullable": False, "metadata": {}},
        ]}
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl is not None
        else GroupStateTimeout.NoTimeout
    )
    ttl = _ttl_ms(state_ttl)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        if not state.exists:
            for pdf in pdfs:
                if len(pdf) and first is None:
                    first = pdf.iloc[[0]]
        else:
            for _ in pdfs:  # drain; key already seen
                pass
        state.update((True,))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        if first is not None:
            yield first

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def latest_state_stream(
    df: DataFrame,
    id_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Emit a key's row only when ``version_col`` strictly advances past
    everything previously seen for that key (late/duplicate versions are
    suppressed). Within one batch, only the final winning version is
    emitted — the streaming analogue of the replication store's
    last-new-version-per-id upsert."""
    out_schema = df.schema
    state_schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "max_version", "type": "long", "nullable": False, "metadata": {}},
        ]}
    )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout
            state.remove()
            return
        prev = state.get[0] if state.exists else None
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.loc[pdf[version_col].idxmax()]
            if best is None or cand[version_col] > best[version_col]:
                best = cand
        if best is not None and (prev is None or int(best[version_col]) > prev):
            state.update((int(best[version_col]),))
            yield pd.DataFrame([best])

    return df.groupBy(*id_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
