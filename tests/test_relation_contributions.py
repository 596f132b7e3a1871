"""Relation pipeline tests — multipolygon relations, collection fallbacks,
member propagation (FIXTURES.md §1-2; ``ContributionsRelationTest.java``)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.contributions import (
    relation_contribution_events,
    synthesize_contributions,
)
from ohsome_planet_spark.schemas import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA


def ts(sec):
    return dt.datetime.fromtimestamp(sec, dt.timezone.utc).replace(tzinfo=None)


def node(nid, version, sec, cs, lon, lat, visible=True, tags=None):
    return (nid, version, ts(sec), cs, 1, "", visible, tags or {}, lon, lat)


def way(wid, version, sec, cs, refs, visible=True, tags=None):
    return (wid, version, ts(sec), cs, 1, "", visible, tags or {}, refs)


def rel(rid, version, sec, cs, members, visible=True, tags=None):
    return (rid, version, ts(sec), cs, 1, "", visible, tags or {}, members)


SQUARE_NODES = [
    node(1, 1, 1, 1, 0.0, 0.0),
    node(2, 1, 1, 1, 10.0, 0.0),
    node(3, 1, 1, 1, 10.0, 10.0),
    node(4, 1, 1, 1, 0.0, 10.0),
    # hole
    node(5, 1, 1, 1, 2.0, 2.0),
    node(6, 1, 1, 1, 4.0, 2.0),
    node(7, 1, 1, 1, 4.0, 4.0),
    node(8, 1, 1, 1, 2.0, 4.0),
]


def run(spark, nodes, ways, rels, limit=500):
    ndf = spark.createDataFrame(nodes, NODE_SCHEMA)
    wdf = spark.createDataFrame(ways, WAY_SCHEMA)
    rdf = spark.createDataFrame(rels, RELATION_SCHEMA)
    ev = relation_contribution_events(rdf, wdf, ndf, member_limit=limit)
    return sorted(
        synthesize_contributions(ev).collect(), key=lambda r: (r.osm_id, r.osm_edits)
    )


def test_multipolygon_with_hole(spark):
    ways = [
        way(20, 1, 2, 1, [1, 2, 3, 4, 1]),
        way(21, 1, 2, 1, [5, 6, 7, 8, 5]),
    ]
    rels = [
        rel(
            30,
            1,
            3,
            2,
            [("way", 20, "outer"), ("way", 21, "inner")],
            tags={"type": "multipolygon", "landuse": "forest"},
        )
    ]
    rows = run(spark, SQUARE_NODES, ways, rels)
    assert len(rows) == 1
    r = rows[0]
    assert r.geometry_type == "MultiPolygon"
    assert r.status == "latest"
    assert r.members_count == 2
    assert r.area > 0
    assert r.bbox.xmax == 10.0
    # member entries carry geometry + role
    roles = {m["id"]: m["role"] for m in r.members}
    assert roles == {20: "outer", 21: "inner"}
    assert all(m["geometry"] is not None for m in r.members)


def test_swapped_roles_still_builds(spark):
    ways = [
        way(20, 1, 2, 1, [1, 2, 3, 4, 1]),
        way(21, 1, 2, 1, [5, 6, 7, 8, 5]),
    ]
    rels = [
        rel(
            30,
            1,
            3,
            2,
            [("way", 20, "inner"), ("way", 21, "outer")],  # swapped!
            tags={"type": "multipolygon"},
        )
    ]
    rows = run(spark, SQUARE_NODES, ways, rels)
    assert rows[0].geometry_type == "MultiPolygon"
    assert rows[0].status == "latest"
    assert rows[0].area > 0


def test_non_mp_relation_collection(spark):
    """type!=multipolygon → GeometryCollection: stored geometry is the
    envelope polygon, area/length 0."""
    ways = [way(20, 1, 2, 1, [1, 2])]
    rels = [
        rel(
            31,
            1,
            3,
            2,
            [("way", 20, ""), ("node", 3, "stop")],
            tags={"type": "route", "route": "bus"},
        )
    ]
    rows = run(spark, SQUARE_NODES, ways, rels)
    r = rows[0]
    assert r.geometry_type == "GeometryCollection"
    assert r.area == 0.0 and r.length == 0.0
    assert r.status == "latest"
    assert r.bbox is not None
    # stored WKB is the envelope polygon (type code 3 big-endian)
    assert r.geometry[0] == 0 and r.geometry[4] == 3


def test_member_node_move_produces_relation_minor(spark):
    """A node move inside a member way propagates up through the way's
    contribution stream into a relation minor version."""
    nodes = SQUARE_NODES + [node(2, 2, 10, 9, 11.0, 0.0)]
    ways = [way(20, 1, 2, 1, [1, 2, 3, 4, 1])]
    rels = [rel(32, 1, 3, 2, [("way", 20, "outer")], tags={"type": "multipolygon"})]
    rows = run(spark, nodes, ways, rels)
    assert len(rows) == 2
    assert rows[0].osm_minor_version == 0
    assert rows[1].osm_minor_version == 1
    assert rows[1].valid_from == ts(10)
    assert rows[1].contrib_type == "GEOMETRY"
    assert rows[1].bbox.xmax == 11.0
    assert rows[0].valid_to == ts(10)


def test_member_limit_fallback(spark):
    """members > limit → history rows fall back to GeometryCollection; the
    LATEST contribution still builds the multipolygon (the reference's
    'latest' override, ContributionsAvroConverter.java:110-113)."""
    ways = [way(20, 1, 2, 1, [1, 2, 3, 4, 1]), way(21, 1, 2, 1, [5, 6, 7, 8, 5])]
    rels = [
        rel(
            33,
            1,
            3,
            2,
            [("way", 20, "outer"), ("way", 21, "inner")],
            tags={"type": "multipolygon"},
        ),
        rel(
            33,
            2,
            10,
            3,
            [("way", 20, "outer"), ("way", 21, "inner")],
            tags={"type": "multipolygon"},
        ),
    ]
    rows = run(spark, SQUARE_NODES, ways, rels, limit=1)
    assert len(rows) == 2
    history, latest = rows
    assert history.status == "history"
    assert history.geometry_type == "GeometryCollection"
    assert history.area == 0.0
    assert history.bbox is not None and history.bbox.xmax == 10.0
    assert latest.status == "latest"
    assert latest.geometry_type == "MultiPolygon"
    assert latest.area > 0


def test_nested_relation_member_ignored_but_listed(spark):
    ways = [way(20, 1, 2, 1, [1, 2, 3, 4, 1])]
    rels = [
        rel(
            34,
            1,
            3,
            2,
            [("way", 20, "outer"), ("relation", 99, "sub")],
            tags={"type": "multipolygon"},
        )
    ]
    rows = run(spark, SQUARE_NODES, ways, rels)
    r = rows[0]
    assert r.members_count == 2
    sub = [m for m in r.members if m["type"] == "relation"][0]
    assert sub["geometry"] is None
    assert sub["timestamp"] == dt.datetime(1970, 1, 1)
    assert r.geometry_type == "MultiPolygon"


# --- ports of ContributionsRelationTest.java (the relation merge spec) ------

NODE_A = [node(1, 1, 1, 1, 0.0, 0.0), node(1, 2, 2, 2, 1.0, 0.0)]
NODE_B = [node(2, 1, 1, 1, 0.0, 0.5), node(2, 2, 2, 2, 0.0, 1.0)]
NODE_C = [node(3, 1, 1, 1, 0.0, 2.0)]
WAY_AB = [way(12, 1, 1, 1, [1, 2])]
WAY_BC = [way(23, 1, 1, 1, [2, 3])]
WAY_CA = [way(31, 1, 2, 2, [3, 1]), way(31, 2, 3, 3, [3, 1])]


def instants(rows):
    # pre-enrichment rows carry the raw changeset id as changeset_id
    return [(r.valid_from, r.changeset_id, r.osm_version, r.osm_minor_version, r.members_count)
            for r in rows]


def test_single_node_relation(spark):
    """testSingleNodeRelation: node member edit → relation minor."""
    rows = run(spark, NODE_A, [], [rel(1, 1, 1, 1, [("node", 1, "busstop")])])
    assert instants(rows) == [(ts(1), 1, 1, 0, 1), (ts(2), 2, 1, 1, 1)]


def test_two_nodes_relation_no_minor(spark):
    """testTwoNodesRelation: member edits at/before the relation ts fold
    into the major — single contribution."""
    rows = run(spark, NODE_B + NODE_C, [], [rel(23, 1, 2, 2, [("node", 2, "busstop"), ("node", 3, "busstop")])])
    assert instants(rows) == [(ts(2), 2, 1, 0, 2)]


def test_two_ways_relation_single_minor(spark):
    """testTwoWaysRelation: both member ways get minors in the SAME
    changeset at ts=2 → ONE relation minor (run grouping across members)."""
    rows = run(
        spark,
        NODE_A + NODE_B + NODE_C,
        WAY_AB + WAY_BC,
        [rel(123, 1, 1, 1, [("way", 12, "busline"), ("way", 23, "busline")])],
    )
    assert instants(rows) == [(ts(1), 1, 1, 0, 2), (ts(2), 2, 1, 1, 2)]


def test_minor_versions_from_nodes_and_ways(spark):
    """testMinorVersions: minor 1 from node edits (cs2, incl. way CA's
    creation), minor 2 from way CA's next major (cs3)."""
    rows = run(
        spark,
        NODE_A + NODE_B + NODE_C,
        WAY_AB + WAY_BC + WAY_CA,
        [rel(123, 1, 1, 1,
             [("way", 12, "busline"), ("way", 23, "busline"), ("way", 31, "busline")])],
    )
    assert instants(rows) == [
        (ts(1), 1, 1, 0, 3),
        (ts(2), 2, 1, 1, 3),
        (ts(3), 3, 1, 2, 3),
    ]


def test_major_versions_with_different_members(spark):
    """testMajorVersionsWithDifferentMembers: v2 drops a member; way CA's
    cs3 event at the v2 instant folds into the major."""
    rows = run(
        spark,
        NODE_A + NODE_B + NODE_C,
        WAY_AB + WAY_BC + WAY_CA,
        [
            rel(123, 1, 2, 2,
                [("way", 12, "busline"), ("way", 23, "busline"), ("way", 31, "busline")]),
            rel(123, 2, 3, 3, [("way", 12, "busline"), ("way", 23, "busline")]),
        ],
    )
    assert instants(rows) == [(ts(2), 2, 1, 0, 3), (ts(3), 3, 2, 0, 2)]
