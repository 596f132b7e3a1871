"""Structured Streaming tests: the windowed operators run in a real
streaming query (memory source → memory sink) AND as batch (unified API)."""

import datetime as dt
import time

from ohsome_planet_spark.streaming.windows import session_windows, windowed_event_counts


def ts(s):
    return dt.datetime.fromisoformat(s)


ROWS = [
    (ts("2024-01-01T00:01:00"), "click", 1.0, 1),
    (ts("2024-01-01T00:05:00"), "click", 2.0, 1),
    (ts("2024-01-01T00:12:00"), "view", 3.0, 1),
    (ts("2024-01-01T01:00:00"), "click", 4.0, 2),
]
SCHEMA = "ts timestamp, event_type string, value double, user_id int"


def test_windowed_counts_batch(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {
        (r.window_start, r.event_type): r.n_events
        for r in windowed_event_counts(df).collect()
    }
    assert out[(ts("2024-01-01T00:00:00"), "click")] == 2
    assert out[(ts("2024-01-01T00:10:00"), "view")] == 1
    assert out[(ts("2024-01-01T01:00:00"), "click")] == 1


def test_session_windows_batch(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rows = session_windows(df).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    # user 1: events at 00:01/00:05/00:12 all within 30-min gaps -> 1 session
    assert len(by_user[1]) == 1 and by_user[1][0].n_events == 3
    assert len(by_user[2]) == 1


def test_streaming_query_end_to_end(spark, tmp_path):
    """Real streaming execution: file source -> windowed agg -> memory sink."""
    import json
    import os

    src = tmp_path / "stream_in"
    src.mkdir()
    with open(src / "batch1.json", "w") as f:
        for t, et, v, u in ROWS:
            f.write(json.dumps({"ts": t.isoformat(), "event_type": et, "value": v, "user_id": u}) + "\n")

    stream = (
        spark.readStream.schema(SCHEMA)
        .json(str(src))
    )
    assert stream.isStreaming
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    # append mode only emits closed windows (watermark passed); force one
    # more batch with a late-enough event to close earlier windows
    with open(src / "batch2.json", "w") as f:
        f.write(json.dumps({"ts": "2024-01-01T09:00:00", "event_type": "click", "value": 0.0, "user_id": 3}) + "\n")
    q2 = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql("select * from win_counts2").collect()
    got = {(r.window_start, r.event_type): r.n_events for r in rows}
    assert got[(ts("2024-01-01T00:00:00"), "click")] == 2
    assert got[(ts("2024-01-01T00:10:00"), "view")] == 1
