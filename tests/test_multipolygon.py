"""Multipolygon assembly tests — the FIXTURES.md §2 scenario matrix
(mirroring the reference's osm-testdata 7xx harness semantics,
``GeometryBuilderTest.java:35-118``)."""

import pytest

from ohsome_planet_spark.functions.multipolygon import (
    MultipolygonError,
    build_multipolygon,
)
from ohsome_planet_spark.functions.wkb import centroid

SQ_OUTER = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
SQ_INNER = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)]


def ring_set(ring):
    return set(ring)


def test_simple_outer():
    g = build_multipolygon([SQ_OUTER], [])
    assert g["type"] == "MultiPolygon"
    assert len(g["coords"]) == 1
    assert len(g["coords"][0]) == 1
    assert ring_set(g["coords"][0][0]) == ring_set(SQ_OUTER)


def test_outer_with_inner():
    g = build_multipolygon([SQ_OUTER], [SQ_INNER])
    assert len(g["coords"]) == 1
    assert len(g["coords"][0]) == 2  # exterior + hole


def test_swapped_roles_still_build():
    """osm-testdata case 720: roles are ignored — nesting by containment."""
    g = build_multipolygon([SQ_INNER], [SQ_OUTER])
    assert len(g["coords"]) == 1
    assert len(g["coords"][0]) == 2


def test_ring_split_across_ways():
    w1 = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    w2 = [(10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    g = build_multipolygon([w1, w2], [])
    assert len(g["coords"]) == 1
    assert ring_set(g["coords"][0][0]) == ring_set(SQ_OUTER)


def test_ring_split_reversed_way():
    w1 = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    w2 = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0)]  # same endpoints, reversed walk
    g = build_multipolygon([w1, w2], [])
    assert len(g["coords"]) == 1


def test_duplicate_way_dropped():
    g = build_multipolygon([SQ_OUTER, list(SQ_OUTER)], [])
    assert len(g["coords"]) == 1


def test_two_disjoint_outers():
    far = [(100.0, 0.0), (110.0, 0.0), (110.0, 10.0), (100.0, 10.0), (100.0, 0.0)]
    g = build_multipolygon([SQ_OUTER, far], [])
    assert len(g["coords"]) == 2
    assert all(len(p) == 1 for p in g["coords"])


def test_hole_of_hole_becomes_outer():
    nested = [(2.5, 2.5), (3.5, 2.5), (3.5, 3.5), (2.5, 3.5), (2.5, 2.5)]
    g = build_multipolygon([SQ_OUTER], [SQ_INNER, nested])
    # nested ring sits inside the hole → new outer polygon
    assert len(g["coords"]) == 2
    sizes = sorted(len(p) for p in g["coords"])
    assert sizes == [1, 2]


def test_unclosed_parity_raises():
    dangling = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]  # not closed
    with pytest.raises(MultipolygonError, match="parity"):
        build_multipolygon([dangling], [])


def test_overlapping_outers_invalid():
    shifted = [(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0)]
    with pytest.raises(MultipolygonError):
        build_multipolygon([SQ_OUTER, shifted], [])


def test_touching_at_node_ok():
    """Two outers sharing exactly one vertex are legal."""
    other = [(10.0, 10.0), (20.0, 10.0), (20.0, 20.0), (10.0, 20.0), (10.0, 10.0)]
    g = build_multipolygon([SQ_OUTER, other], [])
    assert len(g["coords"]) == 2


def test_self_intersecting_ring_invalid():
    bowtie = [(0.0, 0.0), (10.0, 10.0), (10.0, 0.0), (0.0, 10.0), (0.0, 0.0)]
    with pytest.raises(MultipolygonError):
        build_multipolygon([bowtie], [])


def test_centroid_of_result():
    g = build_multipolygon([SQ_OUTER], [])
    assert centroid(g) == pytest.approx((5.0, 5.0))


def test_legacy_mode_salvages_dangling_way():
    """LEGACY mode (GeometryBuilder.java:12-15,177-183): a dangling extra
    way creates odd parity; DEFAULT raises, LEGACY removes the mismatched
    segments and still builds the closed ring."""
    dangling = [(0.0, 0.0), (-5.0, -5.0)]  # open spur off a ring vertex
    with pytest.raises(MultipolygonError, match="parity"):
        build_multipolygon([SQ_OUTER, dangling], [])
    g = build_multipolygon([SQ_OUTER, dangling], [], legacy=True)
    assert g["type"] == "MultiPolygon"
    assert len(g["coords"]) == 1
    assert ring_set(g["coords"][0][0]) == ring_set(SQ_OUTER)


def test_legacy_mode_duplicate_segment():
    """Duplicate segments at an odd node get filtered before ring joining."""
    # ring where one edge is traced twice via an extra 2-node way
    dup_edge = [(0.0, 0.0), (10.0, 0.0)]
    g = build_multipolygon([SQ_OUTER, dup_edge], [], legacy=True)
    assert len(g["coords"]) == 1
