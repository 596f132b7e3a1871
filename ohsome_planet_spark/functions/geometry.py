"""Way geometry construction (SURVEY.md §2.7 'Geometry construction').

Ports the reference's rules (``ContributionGeometry.java:131-176``):

- coordinates = as-of member states that exist, are visible, and have valid
  coordinates, in ref order;
- a way is an *area* iff tags['area'] != 'no', it has > 2 refs with
  first == last, and any tag matches the polygon-feature rules;
- area + closed valid ring (≥ 4 coords, first == last, simple) → Polygon,
  else ≥ 2 coords → LineString, exactly 1 → Point, 0 → empty (invalid);
- geodesic area for polygons, geodesic length for linestrings (polygons
  have length 0 and linestrings area 0 — the reference's switch dispatch).

Implemented as ONE Arrow-batched pandas UDF returning the full geometry
bundle (wkb, type, bbox, centroid, area, length) so the per-way Python cost
is paid once; everything downstream is native Spark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import wkb as wkblib
from .geodesic import line_length, polygon_area
from .polygon_features import tags_have_polygon_feature

GEOM_BUNDLE_TYPE = T.StructType(
    [
        T.StructField("geom_valid", T.BooleanType()),
        T.StructField("geom_wkb", T.BinaryType()),
        T.StructField("geom_type", T.StringType()),
        T.StructField(
            "geom_bbox",
            T.StructType(
                [
                    T.StructField("xmin", T.DoubleType()),
                    T.StructField("ymin", T.DoubleType()),
                    T.StructField("xmax", T.DoubleType()),
                    T.StructField("ymax", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "geom_centroid",
            T.StructType(
                [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
            ),
        ),
        T.StructField("geom_area", T.DoubleType()),
        T.StructField("geom_length", T.DoubleType()),
        # change-detection key: the FULL geometry (not the stored form) —
        # for collections the stored WKB is only the envelope, but the
        # reference's GEOMETRY contrib-type compares the real collection
        # (ContributionsAvroConverter.java:176)
        T.StructField("geom_key", T.BinaryType()),
    ]
)

_NULL_BUNDLE = (False, None, None, None, None, None, None, None)
_BUNDLE_COLS = [
    "geom_valid",
    "geom_wkb",
    "geom_type",
    "geom_bbox",
    "geom_centroid",
    "geom_area",
    "geom_length",
    "geom_key",
]


def _segments_intersect(p1, p2, p3, p4) -> bool:
    """Proper or improper intersection of segments p1p2 and p3p4, excluding
    shared endpoints."""

    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    shared = p1 == p3 or p1 == p4 or p2 == p3 or p2 == p4
    if shared:
        return False
    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True

    def on_seg(a, b, c):
        return (
            orient(a, b, c) == 0
            and min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    return on_seg(p1, p2, p3) or on_seg(p1, p2, p4) or on_seg(p3, p4, p1) or on_seg(p3, p4, p2)


def ring_is_simple(coords: list[tuple[float, float]]) -> bool:
    """JTS-validity approximation for a single closed ring: no repeated
    consecutive points, no self-intersection between non-adjacent edges,
    non-zero area."""
    n = len(coords) - 1  # closed: last == first
    if n < 3:
        return False
    for i in range(n):
        if coords[i] == coords[i + 1]:
            return False
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or abs(i - j) == 1 or (i == 0 and j == n - 1):
                continue
            if _segments_intersect(coords[i], coords[i + 1], coords[j], coords[j + 1]):
                return False
    ring = np.asarray(coords)
    a2 = (
        ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1]
    ).sum()
    return a2 != 0.0


def build_way_geometry(
    tags: dict | None,
    refs: list | None,
    states: list | None,
) -> tuple:
    """Pure-Python core: one way instant → geometry bundle tuple."""
    # Arrow hands arrays as numpy ndarrays — no implicit truthiness
    tags = tags if isinstance(tags, dict) else {}
    refs = list(refs) if refs is not None else []
    states = list(states) if states is not None else []

    coords: list[tuple[float, float]] = []
    for st in states:
        if st is None:
            continue
        vis, lon, lat = st["visible"], st["lon"], st["lat"]
        if not vis or lon is None or lat is None:
            continue
        if lon < -180.0 or lon > 180.0 or lat < -90.0 or lat > 90.0:
            continue
        coords.append((float(lon), float(lat)))

    geom = None
    area = 0.0
    length = 0.0

    is_area = (
        str(tags.get("area", "")).lower() != "no"
        and len(refs) > 2
        and refs[0] == refs[-1]
        and tags_have_polygon_feature(tags)
    )
    is_ring = len(coords) >= 4 and coords[0] == coords[-1]
    if is_area and is_ring and ring_is_simple(coords):
        geom = {"type": "Polygon", "coords": [coords]}
        xs = np.array([c[0] for c in coords])
        ys = np.array([c[1] for c in coords])
        area = polygon_area([(xs, ys)])
    elif len(coords) >= 2:
        geom = {"type": "LineString", "coords": coords}
        xs = np.array([c[0] for c in coords])
        ys = np.array([c[1] for c in coords])
        length = line_length(xs, ys)
    elif len(coords) == 1:
        geom = {"type": "Point", "coords": coords[0]}
    else:
        return _NULL_BUNDLE

    buf = wkblib.encode(geom)
    bb = wkblib.bbox(geom)
    cen = wkblib.centroid(geom)
    return (
        True,
        buf,
        geom["type"],
        {"xmin": bb[0], "ymin": bb[1], "xmax": bb[2], "ymax": bb[3]},
        {"x": cen[0], "y": cen[1]},
        float(area),
        float(length),
        buf,
    )


@F.pandas_udf(GEOM_BUNDLE_TYPE)
def way_geom_bundle(
    tags: pd.Series, refs: pd.Series, states: pd.Series
) -> pd.DataFrame:
    rows = [build_way_geometry(t, r, s) for t, r, s in zip(tags, refs, states)]
    return pd.DataFrame(rows, columns=_BUNDLE_COLS)


# ---------------------------------------------------------------------------
# relation geometry (ContributionGeometry.relGeometry*, lines 58-129 +
# converter handling ContributionsAvroConverter.java:110-157)
# ---------------------------------------------------------------------------

_EMPTY_MP_WKB = b"\x00" + (6).to_bytes(4, "big") + (0).to_bytes(4, "big")


def _flatten_coords(geom: dict) -> list[tuple[float, float]]:
    """JTS Geometry.getCoordinates(): all coordinates in order (a Polygon
    yields exterior then interior ring coords)."""
    t, c = geom["type"], geom["coords"]
    if t == "Point":
        return [c]
    if t == "LineString":
        return list(c)
    if t == "Polygon":
        return [pt for ring in c for pt in ring]
    if t == "MultiPolygon":
        return [pt for poly in c for ring in poly for pt in ring]
    if t == "GeometryCollection":
        return [pt for g in c for pt in _flatten_coords(g)]
    return []


def build_relation_geometry(
    tags: dict | None,
    members: list | None,
    is_latest: bool = True,
    member_limit: int = 500,
) -> tuple:
    """One relation instant → geometry bundle.

    members: list of dicts {mtype, mid, role, state{geom_wkb, geom_type,…}}.
    type=multipolygon/boundary relations assemble member ways into a
    MultiPolygon when under the member limit OR when this is the latest
    contribution (``ContributionsAvroConverter.java:110-113``); everything
    else (or failed assembly) follows the reference's GeometryCollection /
    empty-multipolygon fallback paths.
    """
    from .geodesic import multipolygon_area
    from .multipolygon import MultipolygonError, build_multipolygon

    tags = tags if isinstance(tags, dict) else {}
    members = list(members) if members is not None else []

    def member_geoms():
        out = []
        for m in members:
            st = m["state"] if isinstance(m, dict) else m
            if st is None or st["geom_wkb"] is None:
                continue
            out.append(wkblib.decode(bytes(st["geom_wkb"])))
        return out

    rel_type = str(tags.get("type", "")).lower()
    is_mp = rel_type in ("multipolygon", "boundary")

    build_mp = member_limit != 0 and (bool(is_latest) or len(members) <= member_limit)
    if is_mp and build_mp:
        outer, inner = [], []
        for m in members:
            st = m["state"]
            if m["mtype"] != "way" or st is None or st["geom_wkb"] is None:
                continue
            coords = _flatten_coords(wkblib.decode(bytes(st["geom_wkb"])))
            role = (m["role"] or "").strip()
            if role in ("outer", ""):
                outer.append(coords)
            elif role == "inner":
                inner.append(coords)
        try:
            mp = build_multipolygon(outer, inner)
        except MultipolygonError:
            mp = {"type": "MultiPolygon", "coords": []}
        if mp["coords"]:
            buf = wkblib.encode(mp)
            bb = wkblib.bbox(mp)
            cen = wkblib.centroid(mp)
            area = multipolygon_area(
                [
                    [(np.array([p[0] for p in ring]), np.array([p[1] for p in ring])) for ring in poly]
                    for poly in mp["coords"]
                ]
            )
            return (
                True,
                buf,
                "MultiPolygon",
                {"xmin": bb[0], "ymin": bb[1], "xmax": bb[2], "ymax": bb[3]},
                {"x": cen[0], "y": cen[1]},
                float(area),
                0.0,
                buf,
            )
        # empty multipolygon: invalid, but bbox/centroid derive from the
        # member-geometry collection when present (converter lines 139-150)
        geoms = member_geoms()
        if geoms:
            coll = {"type": "GeometryCollection", "coords": geoms}
            bb = wkblib.bbox(coll)
            cen = wkblib.centroid(coll)
            return (
                False,
                _EMPTY_MP_WKB,
                "MultiPolygon",
                {"xmin": bb[0], "ymin": bb[1], "xmax": bb[2], "ymax": bb[3]},
                {"x": cen[0], "y": cen[1]} if cen else None,
                0.0,
                0.0,
                _EMPTY_MP_WKB,
            )
        return (False, _EMPTY_MP_WKB, "MultiPolygon", None, None, 0.0, 0.0, _EMPTY_MP_WKB)

    # GeometryCollection path: stored geometry is the ENVELOPE polygon of
    # the collection (converter lines 121-123), area/length 0
    geoms = member_geoms()
    if not geoms:
        return _NULL_BUNDLE
    coll = {"type": "GeometryCollection", "coords": geoms}
    bb = wkblib.bbox(coll)
    cen = wkblib.centroid(coll)
    env = wkblib.envelope_polygon(bb)
    return (
        True,
        wkblib.encode(env),
        "GeometryCollection",
        {"xmin": bb[0], "ymin": bb[1], "xmax": bb[2], "ymax": bb[3]},
        {"x": cen[0], "y": cen[1]} if cen else None,
        0.0,
        0.0,
        wkblib.encode(coll),
    )


def relation_geom_bundle(member_limit: int = 500):
    @F.pandas_udf(GEOM_BUNDLE_TYPE)
    def _udf(tags: pd.Series, members: pd.Series, is_latest: pd.Series) -> pd.DataFrame:
        rows = [
            build_relation_geometry(t, m, bool(il), member_limit)
            for t, m, il in zip(tags, members, is_latest)
        ]
        return pd.DataFrame(rows, columns=_BUNDLE_COLS)

    return _udf


# ---------------------------------------------------------------------------
# bbox clipping (the ohsome API's clipGeometry parameter: features reported
# inside a boundary are clipped to it before geometry/area are returned)
# ---------------------------------------------------------------------------


def clip_ring_rect(
    coords: list[tuple[float, float]],
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
) -> list[tuple[float, float]] | None:
    """Sutherland–Hodgman clip of one closed ring against an axis-aligned
    rectangle. Input/output rings are closed (last == first); returns
    None when the intersection is empty or degenerate (< 3 distinct
    vertices). Plane order: x>=xmin, x<=xmax, y>=ymin, y<=ymax; each
    plane pass walks edges (v[i], v[i+1 mod n]) over the OPEN ring and
    emits the crossing point and/or the inside endpoint — the vertex
    sequence is therefore deterministic (pinned by the extraction
    oracle's byte-level WKB replay). A ring ENTIRELY inside the window
    short-circuits to the input vertices unchanged (ohsome clipGeometry
    returns the original geometry for untouched features — without the
    short-circuit the all-inside plane passes would rotate an n-gon's
    vertex sequence and change its WKB bytes)."""
    pts = list(coords[:-1]) if coords and coords[0] == coords[-1] else list(coords)

    if all(xmin <= x <= xmax and ymin <= y <= ymax for x, y in pts):
        if len(set(pts)) < 3:
            return None
        return pts + [pts[0]]

    planes = (
        (lambda p: p[0] >= xmin, lambda a, b: _x_cross(a, b, xmin)),
        (lambda p: p[0] <= xmax, lambda a, b: _x_cross(a, b, xmax)),
        (lambda p: p[1] >= ymin, lambda a, b: _y_cross(a, b, ymin)),
        (lambda p: p[1] <= ymax, lambda a, b: _y_cross(a, b, ymax)),
    )
    for inside, cross in planes:
        if not pts:
            return None
        out: list[tuple[float, float]] = []
        n = len(pts)
        for i in range(n):
            a, b = pts[i], pts[(i + 1) % n]
            a_in, b_in = inside(a), inside(b)
            if b_in:
                if not a_in:
                    out.append(cross(a, b))
                out.append(b)
            elif a_in:
                out.append(cross(a, b))
        pts = out
    if len({p for p in pts}) < 3:
        return None
    return pts + [pts[0]]


def _ring_shoelace(ring: list[tuple[float, float]]) -> float:
    """Signed planar shoelace area ×2 of a closed ring (sign carries
    orientation; callers take ``abs`` for coverage comparisons)."""
    a = 0.0
    for i in range(len(ring) - 1):
        a += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return a


def _x_cross(a, b, x):
    t = (x - a[0]) / (b[0] - a[0])
    return (x, a[1] + t * (b[1] - a[1]))


def _y_cross(a, b, y):
    t = (y - a[1]) / (b[1] - a[1])
    return (a[0] + t * (b[0] - a[0]), y)


def clip_segment_rect(
    x1: float, y1: float, x2: float, y2: float,
    xmin: float, ymin: float, xmax: float, ymax: float,
) -> tuple[float, float, float, float, float, float] | None:
    """Liang–Barsky clip of one segment; returns (t0, t1, cx1, cy1, cx2,
    cy2) or None when the segment misses the window. Endpoints with
    t == 0 / t == 1 are the ORIGINAL coordinates (no re-interpolation
    round-off), so untouched interior vertices stay bit-identical —
    the property the length oracle's replay depends on."""
    dx, dy = x2 - x1, y2 - y1
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, x1 - xmin), (dx, xmax - x1), (-dy, y1 - ymin), (dy, ymax - y1)):
        if p == 0.0:
            if q < 0.0:
                return None
            continue
        r = q / p
        if p < 0.0:
            if r > t0:
                t0 = r
        else:
            if r < t1:
                t1 = r
    if t0 > t1:
        return None
    cx1 = x1 if t0 == 0.0 else x1 + t0 * dx
    cy1 = y1 if t0 == 0.0 else y1 + t0 * dy
    cx2 = x2 if t1 == 1.0 else x1 + t1 * dx
    cy2 = y2 if t1 == 1.0 else y1 + t1 * dy
    return t0, t1, cx1, cy1, cx2, cy2


def clip_polyline_rect(
    coords: list[tuple[float, float]],
    xmin: float, ymin: float, xmax: float, ymax: float,
) -> list[list[tuple[float, float]]]:
    """Clip a polyline to a rectangle: per-segment Liang–Barsky, with
    consecutive surviving segments CHAINED into parts whenever the
    previous segment leaves uncut (t1 == 1) and the current enters uncut
    (t0 == 0). Returns the (possibly empty) list of parts."""
    parts: list[list[tuple[float, float]]] = []
    prev_kept, prev_t1 = False, 0.0
    for i in range(len(coords) - 1):
        x1, y1 = coords[i]
        x2, y2 = coords[i + 1]
        hit = clip_segment_rect(x1, y1, x2, y2, xmin, ymin, xmax, ymax)
        if hit is None:
            prev_kept = False
            continue
        t0, t1, cx1, cy1, cx2, cy2 = hit
        if prev_kept and prev_t1 == 1.0 and t0 == 0.0:
            parts[-1].append((cx2, cy2))
        else:
            parts.append([(cx1, cy1), (cx2, cy2)])
        prev_kept, prev_t1 = True, t1
    return [p for p in parts if len(p) >= 2]


def clip_geometry_bbox(geom: dict | None, bbox: tuple[float, float, float, float]):
    """Clip a geometry dict to a bbox (ohsome clipGeometry semantics).
    Polygons/MultiPolygons clip ring-wise (a clipped-away exterior drops
    the polygon part); LineStrings clip segment-wise into a
    MultiLineString; Points pass through iff inside. Returns None for an
    empty intersection."""
    if geom is None:
        return None
    xmin, ymin, xmax, ymax = bbox
    t = geom["type"]
    if t == "Point":
        x, y = geom["coords"]
        if xmin <= x <= xmax and ymin <= y <= ymax:
            return geom
        return None
    if t == "Polygon":
        rings = [
            clip_ring_rect(r, xmin, ymin, xmax, ymax) for r in geom["coords"]
        ]
        if not rings or rings[0] is None:
            return None
        ext = rings[0]
        holes = [r for r in rings[1:] if r]
        # bbox entirely inside a hole: the clipped hole covers the clipped
        # exterior (both collapse to the window rectangle) — the true
        # intersection is empty, so emit nothing rather than a degenerate
        # zero-area polygon. Relative epsilon absorbs crossing-point
        # round-off; a legitimate remainder sliver below 1e-12 of the
        # exterior is degenerate anyway.
        ext_area = abs(_ring_shoelace(ext))
        if any(abs(_ring_shoelace(h)) >= ext_area * (1.0 - 1e-12) for h in holes):
            return None
        return {"type": "Polygon", "coords": [ext] + holes}
    if t == "MultiPolygon":
        polys = []
        for poly in geom["coords"]:
            c = clip_geometry_bbox({"type": "Polygon", "coords": poly}, bbox)
            if c is not None:
                polys.append(c["coords"])
        if not polys:
            return None
        return {"type": "MultiPolygon", "coords": polys}
    if t == "LineString":
        parts = clip_polyline_rect(geom["coords"], xmin, ymin, xmax, ymax)
        if not parts:
            return None
        return {"type": "MultiLineString", "coords": parts}
    if t == "MultiLineString":
        parts = []
        for line in geom["coords"]:
            parts.extend(clip_polyline_rect(line, xmin, ymin, xmax, ymax))
        if not parts:
            return None
        return {"type": "MultiLineString", "coords": parts}
    raise NotImplementedError(f"clipGeometry for {t}")


def _segment_geodesic_m(x1: float, y1: float, x2: float, y2: float) -> float:
    """Scalar geodesic segment length (the ``segment_length_expr`` /
    ``line_length`` formula) via libm scalars — the per-segment form an
    SQL oracle replays term-for-term (numpy's SIMD tan can differ from
    libm by 1 ulp, so the clip kernel stays scalar)."""
    import math

    from .geodesic import EARTH_RADIUS_MEAN, SPHERE_FACT

    lat1 = math.atan(SPHERE_FACT * math.tan(math.radians(y1)))
    lat2 = math.atan(SPHERE_FACT * math.tan(math.radians(y2)))
    dlon = (math.radians(x2) - math.radians(x1)) * math.cos((lat1 + lat2) / 2)
    dlat = lat2 - lat1
    return EARTH_RADIUS_MEAN * math.sqrt(dlon * dlon + dlat * dlat)


def geojson_geometry_udf(ndp: int = 7):
    """pandas UDF factory: stored WKB → GeoJSON geometry-object string
    (``wkb.geometry_to_geojson``), Arrow-batched — the serialization leg
    of the ohsome extraction endpoints' GeoJSON response contract."""

    @F.pandas_udf(T.StringType())
    def _geojson(wkb_col: pd.Series) -> pd.Series:
        return wkb_col.map(
            lambda buf: None
            if buf is None
            else wkblib.geometry_to_geojson(wkblib.decode(bytes(buf)), ndp=ndp)
        )

    return _geojson


def clip_to_bbox_udf(xmin: float, ymin: float, xmax: float, ymax: float):
    """pandas UDF factory: stored WKB -> clipped WKB (null = empty
    intersection) plus the re-measured geodesic area (areal), geodesic
    length (lineal, accumulated per original segment left-to-right) and
    part count — Arrow-batched, decode/encode per batch."""

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("wkb", T.BinaryType()),
                T.StructField("area", T.DoubleType()),
                T.StructField("length", T.DoubleType()),
                T.StructField("n_parts", T.IntegerType()),
            ]
        )
    )
    def _clip(wkb_col: pd.Series) -> pd.DataFrame:
        rows = []
        for buf in wkb_col:
            if buf is None:
                rows.append((None, None, None, None))
                continue
            geom = wkblib.decode(bytes(buf))
            clipped = clip_geometry_bbox(geom, (xmin, ymin, xmax, ymax))
            if clipped is None:
                rows.append((None, None, None, None))
                continue
            if clipped["type"] == "Polygon":
                polys = [clipped["coords"]]
            elif clipped["type"] == "MultiPolygon":
                polys = clipped["coords"]
            elif clipped["type"] == "MultiLineString":
                length = 0.0
                for part in clipped["coords"]:
                    for i in range(len(part) - 1):
                        length += _segment_geodesic_m(*part[i], *part[i + 1])
                rows.append(
                    (wkblib.encode(clipped), 0.0, length, len(clipped["coords"]))
                )
                continue
            else:
                rows.append((wkblib.encode(clipped), 0.0, 0.0, 1))
                continue
            area = 0.0
            for poly in polys:
                area += polygon_area(
                    [
                        (
                            np.array([p[0] for p in ring]),
                            np.array([p[1] for p in ring]),
                        )
                        for ring in poly
                    ]
                )
            rows.append((wkblib.encode(clipped), float(area), 0.0, len(polys)))
        return pd.DataFrame(rows, columns=["wkb", "area", "length", "n_parts"])

    return _clip
