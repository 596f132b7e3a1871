"""Replication / incremental tests (FIXTURES.md §5 scenarios;
``ContributionUpdaterTest.java:20-56``)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.sources.osmxml import (
    parse_changesets_bytes,
    parse_osc_bytes,
    read_osc,
    split_bz2_streams,
)
from ohsome_planet_spark.streaming.replication import (
    ReplicationState,
    bisect_sequence,
    dirty_parents,
    filter_diff_against_state,
    latest_state,
    merge_latest_state,
    rebuild_affected_ways,
    sequence_path,
)
from ohsome_planet_spark.schemas import NODE_SCHEMA, WAY_SCHEMA


def ts(sec):
    return dt.datetime.fromtimestamp(sec, dt.timezone.utc).replace(tzinfo=None)


OSC = b"""<osmChange version="0.6">
  <create>
    <node id="1" version="1" timestamp="2024-01-01T00:00:00Z" changeset="5" uid="1" user="u" lat="49.0" lon="8.0">
      <tag k="amenity" v="cafe"/>
    </node>
  </create>
  <modify>
    <way id="10" version="2" timestamp="2024-01-01T00:01:00Z" changeset="6" uid="1" user="u">
      <nd ref="1"/><nd ref="2"/>
      <tag k="highway" v="path"/>
    </way>
  </modify>
  <delete>
    <node id="3" version="4" timestamp="2024-01-01T00:02:00Z" changeset="7" uid="2" user="v"/>
  </delete>
</osmChange>"""


def test_parse_osc():
    ents = parse_osc_bytes(OSC)
    assert len(ents) == 3
    assert ents[0]["visible"] is True and ents[0]["tags"] == {"amenity": "cafe"}
    assert ents[1]["refs"] == [1, 2]
    assert ents[2]["visible"] is False and ents[2]["osm_type"] == "node"


def test_read_osc_spark(spark, tmp_path):
    import gzip

    p = tmp_path / "001.osc.gz"
    p.write_bytes(gzip.compress(OSC))
    df = read_osc(spark, str(p))
    rows = {(r.osm_type, r.osm_id): r for r in df.collect()}
    assert rows[("node", 3)].visible is False
    assert rows[("way", 10)].refs == [1, 2]


def test_parse_changesets():
    xml = b"""<osm><changeset id="42" created_at="2024-01-01T00:00:00Z"
        closed_at="2024-01-01T01:00:00Z" open="false" uid="7" user="u"
        min_lon="8.0" min_lat="49.0" max_lon="8.1" max_lat="49.1"
        num_changes="25" comments_count="3">
        <tag k="comment" v="mapping #streets today"/>
        <tag k="created_by" v="JOSM"/></changeset></osm>"""
    rows = parse_changesets_bytes(xml)
    assert rows[0]["id"] == 42
    assert rows[0]["tags"]["created_by"] == "JOSM"
    assert rows[0]["open"] is False
    # ChangesetXmlReader.java:65-66
    assert rows[0]["num_changes"] == 25
    assert rows[0]["comments_count"] == 3
    # absent attributes default to 0, matching the reference's int fields
    bare = parse_changesets_bytes(b'<osm><changeset id="1"/></osm>')
    assert bare[0]["num_changes"] == 0 and bare[0]["comments_count"] == 0


def test_split_bz2_streams_roundtrip():
    import bz2

    s1 = bz2.compress(b"<osm>part one</osm>")
    s2 = bz2.compress(b"<osm>part two</osm>")
    streams = split_bz2_streams(s1 + s2)
    assert len(streams) == 2
    assert bz2.decompress(streams[0]) == b"<osm>part one</osm>"
    assert bz2.decompress(streams[1]) == b"<osm>part two</osm>"


def _node(nid, version, sec, visible=True, lon=8.0, lat=49.0, tags=None):
    return (nid, version, ts(sec), 1, 1, "u", visible, tags or {"a": "b"}, lon, lat)


class TestStateAndDiff:
    def test_diff_filter_semantics(self, spark):
        state = spark.createDataFrame(
            [_node(1, 2, 10), _node(2, 1, 10)], NODE_SCHEMA
        ).withColumn("osm_type", F.lit("node"))
        diff = spark.createDataFrame(
            [
                _node(1, 2, 10),  # replay (<= stored version) -> dropped
                _node(1, 3, 20),  # genuine new version -> kept
                _node(9, 5, 20, visible=False),  # delete without before -> dropped
                _node(8, 1, 20),  # brand-new create -> kept
            ],
            NODE_SCHEMA,
        ).withColumn("osm_type", F.lit("node"))
        kept = filter_diff_against_state(diff, state)
        assert {(r.osm_id, r.version) for r in kept.collect()} == {(1, 3), (8, 1)}

    def test_merge_latest_state(self, spark):
        state = spark.createDataFrame([_node(1, 2, 10)], NODE_SCHEMA).withColumn(
            "osm_type", F.lit("node")
        )
        new = spark.createDataFrame([_node(1, 3, 20), _node(2, 1, 20)], NODE_SCHEMA).withColumn(
            "osm_type", F.lit("node")
        )
        merged = {r.osm_id: r.version for r in merge_latest_state(state, new).collect()}
        assert merged == {1: 3, 2: 1}

    def test_dirty_propagation(self, spark):
        """Changed node dirties its way; way (changed or dirty) and node
        dirty their relations — transitively (ContributionUpdaterTest)."""
        ways = spark.createDataFrame(
            [
                (10, 1, ts(1), 1, 1, "u", True, {"h": "x"}, [1, 2]),
                (11, 1, ts(1), 1, 1, "u", True, {"h": "x"}, [5, 6]),
            ],
            WAY_SCHEMA,
        ).withColumn("osm_type", F.lit("way"))
        rels = spark.createDataFrame(
            [
                (20, 1, ts(1), 1, 1, "u", True, {"type": "route"},
                 [("way", 10, ""), ("node", 7, "stop")]),
                (21, 1, ts(1), 1, 1, "u", True, {"type": "route"},
                 [("way", 11, "")]),
            ],
            "osm_id bigint, version int, ts timestamp, changeset bigint, user_id int,"
            "user_name string, visible boolean, tags map<string,string>,"
            "members array<struct<type:string,id:bigint,role:string>>",
        ).withColumn("osm_type", F.lit("relation"))
        changed_nodes = spark.createDataFrame([(1,)], "osm_id bigint")
        changed_ways = spark.createDataFrame([], "osm_id bigint")
        dw, dr = dirty_parents(changed_nodes, changed_ways, ways, rels)
        assert {r.osm_id for r in dw.collect()} == {10}
        assert {r.osm_id for r in dr.collect()} == {20}

    def test_incremental_way_rebuild_minor_continuation(self, spark):
        """Node-only diff dirties a way; rebuilding the affected id yields
        the continued minor-version counter (scenario: minor continuation
        across batches)."""
        nodes_before = [
            _node(1, 1, 1, lon=0.0, lat=0.0, tags={}),
            _node(2, 1, 1, lon=1.0, lat=0.0, tags={}),
        ]
        ways = spark.createDataFrame(
            [(10, 1, ts(2), 1, 1, "u", True, {"highway": "x"}, [1, 2])], WAY_SCHEMA
        )
        # batch arrives: node 2 moves (changeset 9)
        node_hist = spark.createDataFrame(
            nodes_before + [(2, 2, ts(50), 9, 1, "u", True, {}, 2.0, 0.0)], NODE_SCHEMA
        )
        affected = spark.createDataFrame([(10,)], "osm_id bigint")
        out = sorted(
            rebuild_affected_ways(ways, node_hist, affected).collect(),
            key=lambda r: r.osm_edits,
        )
        assert [r.osm_minor_version for r in out] == [0, 1]
        assert out[1].valid_from == ts(50)
        assert out[0].valid_to == ts(50)
        assert out[1].contrib_type == "GEOMETRY"


def test_state_txt_roundtrip():
    text = "#Mon Jan 01 00:00:00 UTC 2024\nsequenceNumber=6824839\ntimestamp=2024-01-01T00\\:00\\:00Z\n"
    st = ReplicationState.parse(text)
    assert st.sequence == 6824839
    assert st.timestamp == "2024-01-01T00:00:00Z"
    assert ReplicationState.parse(st.format()) == st


def test_sequence_path():
    assert sequence_path(6824839) == "006/824/839"
    assert sequence_path(42) == "000/000/042"


def test_bisection():
    # timestamps = seq * 10; find greatest seq with ts <= target
    get = lambda s: s * 10
    assert bisect_sequence(get, 0, 100, 555) == 55
    assert bisect_sequence(get, 0, 100, 9999) == 100
    assert bisect_sequence(get, 0, 100, 0) == 0


def test_changeset_lag_holdback():
    """R2: contributions gated by the changeset stream unless lag > 180 s."""
    from ohsome_planet_spark.streaming.replication import (
        process_until,
        select_target_state,
    )

    contrib_ts = ts(10_000)
    # changeset stream close behind (lag 60 s) -> process to contrib ts
    assert process_until(contrib_ts, ts(9_940)) == contrib_ts
    # changeset stream far behind (lag 300 s) -> hold back to changeset ts
    assert process_until(contrib_ts, ts(9_700)) == ts(9_700)

    states = [(100, ts(9_000)), (101, ts(9_600)), (102, ts(10_000))]
    assert select_target_state(states, ts(9_700)) == (101, ts(9_600))
    assert select_target_state(states, ts(8_000)) is None


# --- Waiter (reference utils/Waiter.java, pinned by WaiterTest.java) --------


def test_not_waiting_for_changesets_contributions_older():
    from datetime import datetime
    from ohsome_planet_spark.streaming.waiter import not_waiting_for_changesets

    # contributions behind changesets -> nothing to wait for
    assert not_waiting_for_changesets(
        datetime(2025, 12, 1, 9, 54), datetime(2025, 12, 1, 9, 56)
    )


def test_waiting_for_changesets_within_two_minutes():
    from datetime import datetime
    from ohsome_planet_spark.streaming.waiter import not_waiting_for_changesets

    # contributions ahead by <= 120s -> hold back for the changeset stream
    assert not not_waiting_for_changesets(
        datetime(2025, 12, 1, 9, 59), datetime(2025, 12, 1, 9, 58)
    )


def test_not_waiting_for_changesets_beyond_escape_window():
    from datetime import datetime
    from ohsome_planet_spark.streaming.waiter import not_waiting_for_changesets

    # changesets lag > 120s -> escape valve, proceed without them
    assert not_waiting_for_changesets(
        datetime(2025, 12, 1, 10, 57), datetime(2025, 12, 1, 9, 59, 30)
    )


def test_waiter_backoff_doubles_and_caps():
    from ohsome_planet_spark.streaming.waiter import Waiter

    w = Waiter(clock=lambda: None)  # no real sleeping
    for _ in range(6):
        w.wait_for_retry()
    assert [s for s, _ in w.waits] == [5, 10, 20, 40, 60, 60]
    w.reset_retry()
    w.wait_for_retry()
    assert w.waits[-1][0] == 5


def test_waiter_sleep_interruptible():
    import threading
    import pytest
    from ohsome_planet_spark.streaming.waiter import Waiter

    stop = threading.Event()
    stop.set()
    w = Waiter(shutdown_event=stop, clock=lambda: None)
    with pytest.raises(InterruptedError):
        w.sleep(5, "test")
