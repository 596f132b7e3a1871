"""Way pipeline tests — ports of the reference's temporal-merge spec
(``ContributionsWayTest.java:51-414``, FIXTURES.md §1 scenarios 1-6, 9).

Each test builds the same node/way histories as the Java fixture and checks
the synthesized contribution stream: instant timestamps, changesets, minor
version counters, and as-of member versions (via centroid coordinates)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.contributions import (
    synthesize_contributions,
    way_contribution_events,
)
from ohsome_planet_spark.operators.temporal_merge import (
    minor_relevant_node_versions,
    way_contribution_instants,
)
from ohsome_planet_spark.schemas import NODE_SCHEMA, WAY_SCHEMA


def ts(sec):
    return dt.datetime.fromtimestamp(sec, dt.timezone.utc).replace(tzinfo=None)


def node(nid, version, sec, cs, lon, lat, visible=True, tags=None, uid=1):
    return (nid, version, ts(sec), cs, uid, "", visible, tags or {}, lon, lat)


def way(wid, version, sec, cs, refs, visible=True, tags=None, uid=1):
    return (wid, version, ts(sec), cs, uid, "", visible, tags or {}, refs)


def run_instants(spark, nodes, ways):
    ndf = spark.createDataFrame(nodes, NODE_SCHEMA)
    wdf = spark.createDataFrame(ways, WAY_SCHEMA)
    rows = way_contribution_instants(wdf, ndf).collect()
    return sorted(rows, key=lambda r: (r.ts, r.osm_version, r.changeset))


def member_versions(row):
    return [s["version"] if s is not None else None for s in row.member_states]


def test_node_versions_before_way(spark):
    """testNodeVersionsBeforeWay: member state = latest version as-of."""
    out = run_instants(
        spark,
        [node(1, 1, 0, 1, 0.0, 0.0), node(1, 2, 1, 2, 1.0, 0.0)],
        [way(10, 1, 2, 1, [1])],
    )
    assert len(out) == 1
    assert member_versions(out[0]) == [2]


def test_way_exists_before_node_same_changeset(spark):
    """testWayExistsBeforeNode: node created AFTER the way but in the same
    changeset folds into the major version (init OR-condition)."""
    out = run_instants(
        spark,
        [node(1, 1, 2, 1, 1.0, 0.0)],
        [way(10, 1, 1, 1, [1])],
    )
    assert len(out) == 1
    assert out[0].ts == ts(1)
    assert member_versions(out[0]) == [1]


def test_referenced_node_newer_same_changeset(spark):
    """testReferencedNodeHasOlderTimestampThanWay: mixed — one node older,
    one newer but same changeset; single contribution."""
    out = run_instants(
        spark,
        [node(1, 1, 1, 1, 1.0, 0.0), node(2, 1, 3, 1, 2.0, 0.0)],
        [way(10, 1, 2, 1, [1, 2])],
    )
    assert len(out) == 1
    assert out[0].ts == ts(2)
    assert member_versions(out[0]) == [1, 1]


def test_minor_versions_and_next_major(spark):
    """testNodeVersionsBeforePlusMinorVersionWay: minors at node edits
    between majors; second major picks latest state."""
    out = run_instants(
        spark,
        [
            node(1, 1, 0, 1, 1.0, 0.0),
            node(1, 2, 1, 2, 2.0, 0.0),
            node(1, 3, 5, 5, 3.0, 0.0),
            node(1, 4, 6, 6, 4.0, 0.0),
        ],
        [way(10, 1, 2, 1, [1]), way(10, 2, 7, 1, [1])],
    )
    assert [(r.osm_version, r.run_idx, r.ts, member_versions(r)) for r in out] == [
        (1, 0, ts(2), [2]),
        (1, 1, ts(5), [3]),
        (1, 2, ts(6), [4]),
        (2, 0, ts(7), [4]),
    ]


def test_two_nodes_moved_in_different_changesets_same_ts(spark):
    """testTwoNodesMovedInDifferentChangesets: same instant, two changesets
    → TWO minors, ordered by changeset."""
    out = run_instants(
        spark,
        [
            node(1, 1, 1, 1, 1.0, 0.0),
            node(1, 2, 2, 2, 1.1, 0.0),
            node(2, 1, 1, 1, 2.0, 0.0),
            node(2, 2, 2, 3, 2.2, 0.0),
        ],
        [way(12, 1, 1, 1, [1, 2])],
    )
    assert [(r.ts, r.changeset, member_versions(r)) for r in out] == [
        (ts(1), 1, [1, 1]),
        (ts(2), 2, [2, 1]),
        (ts(2), 3, [2, 2]),
    ]


def test_node_moved_multiple_times_one_changeset(spark):
    """testNodeMovedMultipleTimesWithinOneChangeset: one minor at the LAST
    ts of the same-changeset run."""
    out = run_instants(
        spark,
        [
            node(1, 1, 1, 1, 1.0, 0.0),
            node(1, 2, 2, 2, 2.0, 0.0),
            node(1, 3, 3, 2, 3.0, 0.0),
        ],
        [way(10, 1, 1, 1, [1])],
    )
    assert [(r.ts, r.changeset, member_versions(r)) for r in out] == [
        (ts(1), 1, [1]),
        (ts(3), 2, [3]),
    ]


def test_two_nodes_reverse_order_one_changeset(spark):
    """testMultipleNodesMovedInReverseOrderWithinOneChangeset."""
    out = run_instants(
        spark,
        [
            node(1, 1, 1, 1, 1.0, 0.0),
            node(1, 2, 3, 2, 1.1, 0.0),
            node(2, 1, 1, 1, 2.0, 0.0),
            node(2, 2, 2, 2, 2.2, 0.0),
        ],
        [way(12, 1, 1, 1, [1, 2])],
    )
    assert [(r.ts, r.changeset) for r in out] == [(ts(1), 1), (ts(3), 2)]
    assert member_versions(out[1]) == [2, 2]


def test_tag_only_node_edits_produce_no_minors(spark):
    """disabled testWays / testNodeTagsModified…: location-identical node
    versions are compacted away (MinorNode dedup) → single contribution."""
    out = run_instants(
        spark,
        [
            node(1, 1, 1, 1, 0.0, 0.0, tags={}),
            node(1, 2, 2, 2, 0.0, 0.0, tags={"x": "1"}),
            node(2, 1, 1, 1, 1.0, 0.0),
            node(2, 2, 2, 2, 1.0, 0.0),
        ],
        [way(10, 1, 1, 1, [1, 2])],
    )
    assert len(out) == 1


def test_way_before_node_exists_null_member(spark):
    """testWayExistsBeforeNode variant with DIFFERENT changesets: member
    contrib is null at the major, then a minor when the node appears."""
    out = run_instants(
        spark,
        [node(1, 1, 2, 9, 1.0, 0.0)],
        [way(10, 1, 1, 1, [1])],
    )
    assert [(r.ts, r.changeset, member_versions(r)) for r in out] == [
        (ts(1), 1, [None]),
        (ts(2), 9, [1]),
    ]


def test_full_way_pipeline_geometry_and_status(spark):
    """End-to-end: line way, minor version via node move, geodesic length
    and contrib types through synthesize_contributions."""
    nodes = spark.createDataFrame(
        [
            node(1, 1, 1, 1, 0.0, 0.0),
            node(2, 1, 1, 1, 1.0, 0.0),
            node(2, 2, 5, 7, 2.0, 0.0),
        ],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [way(10, 1, 2, 1, [1, 2], tags={"highway": "residential"})],
        WAY_SCHEMA,
    )
    contribs = synthesize_contributions(way_contribution_events(ways, nodes))
    rows = sorted(contribs.collect(), key=lambda r: r.valid_from)
    assert len(rows) == 2
    major, minor = rows
    assert major.geometry_type == "LineString"
    assert major.contrib_type == "CREATION"
    assert major.osm_minor_version == 0
    assert minor.osm_minor_version == 1
    assert minor.contrib_type == "GEOMETRY"
    assert minor.status == "latest"
    assert major.status == "history"
    assert major.refs == [1, 2]
    assert major.refs_count == 2
    # 1 degree at equator ≈ 111.19 km; minor doubles it
    assert major.length == pytest.approx(111195.08, rel=1e-4)
    assert minor.length == pytest.approx(2 * 111195.08, rel=1e-4)
    assert minor.length_delta == pytest.approx(111195.08, rel=1e-4)


def test_closed_way_polygon_area(spark):
    """Closed building way → Polygon with geodesic area; area=no kills it."""
    sq = [
        node(1, 1, 1, 1, 0.0, 0.0),
        node(2, 1, 1, 1, 0.009, 0.0),
        node(3, 1, 1, 1, 0.009, 0.009),
        node(4, 1, 1, 1, 0.0, 0.009),
    ]
    nodes = spark.createDataFrame(sq, NODE_SCHEMA)
    ways = spark.createDataFrame(
        [
            way(10, 1, 2, 1, [1, 2, 3, 4, 1], tags={"building": "yes"}),
            way(11, 1, 2, 1, [1, 2, 3, 4, 1], tags={"building": "yes", "area": "no"}),
            way(12, 1, 2, 1, [1, 2, 3, 4, 1], tags={"nopoly": "yes"}),
        ],
        WAY_SCHEMA,
    )
    contribs = synthesize_contributions(way_contribution_events(ways, nodes))
    by_id = {r.osm_id: r for r in contribs.collect()}
    assert by_id[10].geometry_type == "Polygon"
    assert by_id[10].area == pytest.approx(1.0e6, rel=0.01)
    assert by_id[10].length == 0.0
    # area=no and non-polygon-feature tags stay linestrings (closed ring)
    assert by_id[11].geometry_type == "LineString"
    assert by_id[12].geometry_type == "LineString"
    assert by_id[11].area == 0.0


def test_minor_relevance_filter(spark):
    ndf = spark.createDataFrame(
        [
            node(1, 1, 1, 1, 0.0, 0.0),
            node(1, 2, 2, 2, 0.0, 0.0, tags={"a": "b"}),  # tag-only
            node(1, 3, 3, 3, 1.0, 0.0),  # moved
            node(1, 4, 4, 4, 1.0, 0.0, visible=False),  # deleted
        ],
        NODE_SCHEMA,
    )
    kept = {r.version for r in minor_relevant_node_versions(ndf).collect()}
    assert kept == {1, 3, 4}


# --- the reference's own @Disabled cases: intended semantics, green here -----
#
# Two ContributionsWayTest cases are @Disabled upstream ("Missing logic to
# pick up minor contributions based only on changes in geometry" /
# "Missing logic to discard geometry-unrelated edits to node"). They test
# the RAW ContributionsWay iterator, which indeed lacks that logic — but
# the reference's production pipeline runs MinorNode compaction BEFORE the
# iterator (minor/MinorNode.java:55-64: keep only node versions whose
# (lon, lat, visible) changed), which delivers exactly the intended
# semantics. This engine ports the composed production path
# (minor_relevant_node_versions -> temporal merge), so both cases pass:
# the @Disabled expectations are met end-to-end, pinning that the gap is
# an artifact of the reference's unit-test layering, not of its shipped
# behavior — and that this engine must keep meeting them.


def test_disabled_testWays_geometry_unchanged_minor(spark):
    """ContributionsWayTest.java:19 @Disabled testWays: two member nodes
    each get a v2 at t=2 with IDENTICAL coordinates; only the creation
    contribution must be emitted."""
    out = run_instants(
        spark,
        [
            node(1, 1, 1, 1, 0.0, 0.0), node(1, 2, 2, 2, 0.0, 0.0),
            node(2, 1, 1, 1, 0.0, 0.0), node(2, 2, 2, 2, 0.0, 0.0),
        ],
        [way(10, 1, 1, 1, [1, 2])],
    )
    assert len(out) == 1
    assert out[0].ts == ts(1)
    assert out[0].changeset == 1
    assert len(out[0].member_states) == 2


def test_disabled_node_tags_modified_within_one_changeset(spark):
    """ContributionsWayTest.java:269 @Disabled
    testNodeTagsModifiedMultipleTimesWithinOneChangeset: node v2/v3 at
    t=2,3 (same changeset 2) never move; only the way creation at t=1
    must be emitted (geometry-unrelated edits discarded by the MinorNode
    compaction)."""
    out = run_instants(
        spark,
        [
            node(1, 1, 1, 1, 1.0, 0.0),
            node(1, 2, 2, 2, 1.0, 0.0),
            node(1, 3, 3, 2, 1.0, 0.0),
        ],
        [way(10, 1, 1, 1, [1])],
    )
    assert len(out) == 1
    assert out[0].ts == ts(1)
    assert out[0].changeset == 1
