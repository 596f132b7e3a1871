"""Golden multipolygon corpus: the reference's ``mod/`` variants of the
osm-testdata 7xx grid, run exactly like ``GeometryBuilderTest.test7xx``
(``osm-geometry/src/test/java/.../GeometryBuilderTest.java:35-118``):
parse data.osm, split members into outer/inner by role, build with the
LEGACY salvage mode, and compare against test.json's expected WKT with
topology equality (or expect failure for "INVALID").

The reference's full 7xx grid lives in an osm-testdata submodule that is
not vendored (the directory is empty); the runnable golden set is the 8
``mod/`` cases, which exercise exactly the repair paths: touching outers,
swapped roles, inners splitting an outer, nested outers, spikes, inners
touching the outer in a line, and unclosed inners.
"""

from __future__ import annotations

import json
import os
import re
import xml.etree.ElementTree as ET

import pytest

from ohsome_planet_spark.functions.multipolygon import (
    MultipolygonError,
    build_multipolygon,
)

MOD_DIR = "/root/reference/osm-geometry/src/test/resources/mod"

CASES = sorted(os.listdir(MOD_DIR)) if os.path.isdir(MOD_DIR) else []


def load_case(case: str):
    """data.osm → (outer_ways, inner_ways) exactly like the reference test:
    relation members of type way, role outer/blank vs inner."""
    root = ET.parse(os.path.join(MOD_DIR, case, "data.osm")).getroot()
    nodes = {
        int(n.get("id")): (float(n.get("lon")), float(n.get("lat")))
        for n in root.iter("node")
    }
    ways = {
        int(w.get("id")): [nodes[int(nd.get("ref"))] for nd in w.iter("nd")]
        for w in root.iter("way")
    }
    rel = next(root.iter("relation"), None)
    if rel is None:
        assert len(ways) == 1
        return list(ways.values()), []
    outer, inner = [], []
    for m in rel.iter("member"):
        if m.get("type") != "way":
            continue
        role = (m.get("role") or "").strip()
        if role in ("outer", ""):
            outer.append(ways[int(m.get("ref"))])
        elif role == "inner":
            inner.append(ways[int(m.get("ref"))])
    return outer, inner


def expected_wkt(case: str) -> str:
    doc = json.load(open(os.path.join(MOD_DIR, case, "test.json")))
    areas = doc["areas"]
    for key in ("fix", "location", "default"):
        if key in areas:
            return areas[key][0]["wkt"]
    raise AssertionError(f"no expected wkt in {case}")


def parse_wkt_multipolygon(wkt: str):
    """MULTIPOLYGON(((x y, ...),(hole ...)),((...))) → polys->rings->coords."""
    body = wkt.strip()
    assert body.upper().startswith("MULTIPOLYGON"), wkt
    body = body[len("MULTIPOLYGON"):].strip()
    polys = []
    for poly_txt in re.findall(r"\(\(.*?\)\)", body, flags=re.S):
        rings = []
        for ring_txt in re.findall(r"\(([^()]*)\)", poly_txt):
            ring = []
            for pair in ring_txt.split(","):
                x, y = pair.split()
                ring.append((float(x), float(y)))
            rings.append(ring)
        polys.append(rings)
    return polys


def _canon_ring(ring):
    """Canonical form for topology comparison: drop closing dup, drop
    collinear midpoints, fix orientation + rotation."""
    pts = list(ring)
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    # drop collinear vertices (topology-preserving)
    out = []
    n = len(pts)
    for i in range(n):
        a, b, c = pts[i - 1], pts[i], pts[(i + 1) % n]
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if cross != 0:
            out.append(b)
    pts = out or pts
    # orientation: force CCW by shoelace
    area2 = sum(
        pts[i][0] * pts[(i + 1) % len(pts)][1] - pts[(i + 1) % len(pts)][0] * pts[i][1]
        for i in range(len(pts))
    )
    if area2 < 0:
        pts = pts[::-1]
    # rotation: start at lexicographically smallest vertex
    k = min(range(len(pts)), key=lambda i: pts[i])
    return tuple(pts[k:] + pts[:k])


def canon_multipolygon(polys):
    """polys->rings->coords → frozenset of (exterior, frozenset(holes))."""
    out = set()
    for rings in polys:
        ext = _canon_ring(rings[0])
        holes = frozenset(_canon_ring(r) for r in rings[1:])
        out.add((ext, holes))
    return frozenset(out)


@pytest.mark.parametrize("case", CASES)
def test_mod_corpus(case):
    outer, inner = load_case(case)
    wkt = expected_wkt(case)
    if wkt == "INVALID":
        with pytest.raises(MultipolygonError):
            build_multipolygon(outer, inner, legacy=True)
        return
    got = build_multipolygon(outer, inner, legacy=True)
    assert got["type"] == "MultiPolygon"
    assert canon_multipolygon(got["coords"]) == canon_multipolygon(
        parse_wkt_multipolygon(wkt)
    ), f"{case}: built geometry differs from golden WKT"
