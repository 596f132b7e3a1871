"""S12 end-to-end: drive the incremental update loop from the vendored
public replication fixtures (reference test resources
``ohsome-replication-update/src/test/resources/replication/minute``),
reproducing the reference's minor/edits continuation behavior
(``ContributionUpdaterTest.java:20-56``)."""

import os

import pytest

from ohsome_planet_spark.streaming.replication import (
    IncrementalUpdater,
    ReplicationState,
)
from ohsome_planet_spark.streaming.server import entity_server, file_fetch

FIXTURES = (
    "/root/reference/ohsome-replication-update/src/test/resources/replication/minute"
)

NODE_HIST_SCHEMA = (
    "osm_type string, osm_id bigint, version int, ts timestamp,"
    " changeset bigint, user_id int, user_name string, visible boolean,"
    " tags map<string,string>, lon double, lat double"
)
WAY_HIST_SCHEMA = (
    "osm_type string, osm_id bigint, version int, ts timestamp,"
    " changeset bigint, user_id int, user_name string, visible boolean,"
    " tags map<string,string>, refs array<bigint>"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present"
)


@pytest.fixture()
def server():
    return entity_server("https://fixture/", fetch=file_fetch(FIXTURES))


def test_fixture_states_parse(server):
    top = server.get_latest_remote_state()
    assert top.sequence == 6824842
    st = server.get_remote_state(6824839)
    assert st.sequence == 6824839
    assert st.timestamp.startswith("2025-10-22T09:01:43")


def test_multi_batch_same_changeset_squash(spark, server):
    """Apply 840→842 one batch at a time. In the fixtures, node 2's moves
    share changeset 1 with way 1's creation, so the minors are squashed
    into the creation contribution (F4) and its geometry updates in place
    — the same collapse the reference's contribution builder performs for
    edits within one changeset."""
    upd = IncrementalUpdater(
        spark,
        spark.createDataFrame([], NODE_HIST_SCHEMA),
        spark.createDataFrame([], WAY_HIST_SCHEMA),
    )
    local = ReplicationState(6824839, "2025-10-22T09:01:43Z")
    remote = server.get_latest_remote_state()
    seqs = range(local.sequence + 1, remote.sequence + 1)
    results = upd.apply_sequences(server, seqs)
    assert len(results) == 3

    # way 1 stays one squashed contribution whose centroid tracks node 2
    centroids = []
    for _, way_c in results:
        rows = sorted(way_c.collect(), key=lambda r: r.osm_edits)
        assert [(r.osm_version, r.osm_minor_version, r.osm_edits) for r in rows] == [
            (1, 0, 1)
        ]
        assert rows[0].contrib_type == "CREATION" and rows[0].status == "latest"
        centroids.append(rows[0].centroid.y)
    assert centroids == [1.0, 1.5, 2.0]

    # node 2's own history is fully rebuilt (its versions are distinct
    # contributions: version bump defeats the squash)
    node_c, _ = results[2]
    n2 = sorted(
        (r for r in node_c.collect() if r.osm_id == 2), key=lambda r: r.osm_edits
    )
    assert [r.osm_version for r in n2] == [1, 2, 3]

    # final latest state: node 2 at version 3, lat 3.0
    from ohsome_planet_spark.streaming.replication import latest_state

    final = {r.osm_id: r for r in latest_state(upd.node_history).collect()}
    assert final[2].version == 3 and final[2].lat == 3.0
    assert sorted(final) == [1, 2, 3]


def test_multi_batch_minor_continuation_distinct_changesets(spark, server):
    """ContributionUpdaterTest-shaped scenario with *distinct* changesets
    per batch: each node move lands as a new minor version of the way and
    the edit counter continues across batches."""
    import gzip

    from ohsome_planet_spark.streaming.server import entity_server

    def osc(seq, body):
        return (
            f"{sequence_path_key(seq)}",
            gzip.compress(
                f'<osmChange version="0.6">{body}</osmChange>'.encode()
            ),
        )

    def sequence_path_key(seq):
        from ohsome_planet_spark.streaming.replication import sequence_path

        return sequence_path(seq) + ".osc.gz"

    def node(nid, v, minute, cs, lat):
        return (
            f'<node id="{nid}" version="{v}" timestamp="2025-10-01T00:{minute:02d}:00Z"'
            f' uid="1" user="u" changeset="{cs}" lat="{lat}" lon="{nid}.0"/>'
        )

    files = dict(
        [
            osc(1, "<create>" + node(1, 1, 0, 1, 1.0) + node(2, 1, 0, 1, 1.0)
                + '<way id="23" version="1" timestamp="2025-10-01T00:00:00Z" uid="1"'
                ' user="u" changeset="1"><nd ref="1"/><nd ref="2"/></way>'
                + "</create>"),
            osc(2, "<modify>" + node(1, 2, 2, 2, 2.0) + "</modify>"),
            osc(3, "<modify>" + node(1, 3, 3, 3, 3.0) + "</modify>"),
            osc(4, "<modify>" + node(1, 4, 4, 4, 4.0)
                + '<way id="23" version="2" timestamp="2025-10-01T00:04:00Z" uid="1"'
                ' user="u" changeset="4"><nd ref="1"/><nd ref="2"/><tag k="h" v="x"/></way>'
                + "</modify>"),
        ]
    )

    def fetch(url):
        for suffix, data in files.items():
            if url.endswith(suffix):
                return data
        raise FileNotFoundError(url)

    srv = entity_server("https://synthetic/", fetch=fetch)
    upd = IncrementalUpdater(
        spark,
        spark.createDataFrame([], NODE_HIST_SCHEMA),
        spark.createDataFrame([], WAY_HIST_SCHEMA),
    )
    results = upd.apply_sequences(srv, [1, 2, 3, 4])

    def way_rows(way_c):
        return sorted(
            ((r.osm_version, r.osm_minor_version, r.osm_edits, r.contrib_type)
             for r in way_c.collect()),
            key=lambda t: t[2],
        )

    assert way_rows(results[0][1]) == [(1, 0, 1, "CREATION")]
    # batch 2: node 1 moved in cs 2 -> minor 1, edits continue at 2
    assert way_rows(results[1][1]) == [(1, 0, 1, "CREATION"), (1, 1, 2, "GEOMETRY")]
    # batch 3: another move -> minor 2, edits 3
    assert way_rows(results[2][1]) == [
        (1, 0, 1, "CREATION"), (1, 1, 2, "GEOMETRY"), (1, 2, 3, "GEOMETRY"),
    ]
    # batch 4: way major v2 (tag added) + node move in the same changeset:
    # the squash folds the simultaneous member move into the major edit
    rows = way_rows(results[3][1])
    assert rows[:3] == [
        (1, 0, 1, "CREATION"), (1, 1, 2, "GEOMETRY"), (1, 2, 3, "GEOMETRY"),
    ]
    assert rows[3][0] == 2 and rows[3][1] == 0 and rows[3][2] == 4  # major v2, edits 4


def test_replay_batch_is_idempotent(spark, server):
    upd = IncrementalUpdater(
        spark,
        spark.createDataFrame([], NODE_HIST_SCHEMA),
        spark.createDataFrame([], WAY_HIST_SCHEMA),
    )
    upd.apply_sequences(server, [6824840, 6824841])
    before = upd.node_history.count()
    # replaying 840 adds nothing: every version is <= the stored latest
    node_c, way_c = upd.apply_sequences(server, [6824840])[0]
    assert upd.node_history.count() == before
    assert node_c.count() == 0  # no affected ids -> no rebuild work
