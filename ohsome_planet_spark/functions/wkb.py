"""WKB encode/decode + planar centroid (SURVEY.md §2.7 geometry functions).

The reference serializes geometries with JTS ``WKBWriter`` defaults
(``ContributionsAvroConverter.java:37``) — 2D, **big-endian** (XDR). We match
that byte order for parity. Format per OGC Simple Features / ISO 19125.

Internal geometry value: a small dict
``{"type": <Point|LineString|Polygon|MultiPolygon|GeometryCollection>,
"coords": ...}`` with coords nesting point→(x,y), line→[pt], polygon→[ring],
multipolygon→[polygon], collection→[geom].

Centroid follows JTS semantics (``Geometry.getCentroid``): the highest
topological dimension present wins — areal centroid if any polygonal
component has non-zero area, else length-weighted lineal centroid, else
point average.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

_TYPE_CODE = {
    "Point": WKB_POINT,
    "LineString": WKB_LINESTRING,
    "Polygon": WKB_POLYGON,
    "MultiPoint": WKB_MULTIPOINT,
    "MultiLineString": WKB_MULTILINESTRING,
    "MultiPolygon": WKB_MULTIPOLYGON,
    "GeometryCollection": WKB_GEOMETRYCOLLECTION,
}
_CODE_TYPE = {v: k for k, v in _TYPE_CODE.items()}

# big-endian, matching JTS WKBWriter's default ByteOrderValues.BIG_ENDIAN
_BO = ">"
_BO_FLAG = b"\x00"  # 0 = XDR / big-endian


def _enc_coords(pts) -> bytes:
    arr = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    return arr.astype(">f8").tobytes()


def encode(geom: dict[str, Any] | None) -> bytes | None:
    """Geometry dict → WKB bytes (JTS-compatible)."""
    if geom is None:
        return None
    t, coords = geom["type"], geom["coords"]
    code = _TYPE_CODE[t]
    head = _BO_FLAG + struct.pack(_BO + "I", code)
    if t == "Point":
        return head + _enc_coords([coords])
    if t == "LineString":
        return head + struct.pack(_BO + "I", len(coords)) + _enc_coords(coords)
    if t == "Polygon":
        out = [head, struct.pack(_BO + "I", len(coords))]
        for ring in coords:
            out.append(struct.pack(_BO + "I", len(ring)))
            out.append(_enc_coords(ring))
        return b"".join(out)
    if t == "MultiPolygon":
        out = [head, struct.pack(_BO + "I", len(coords))]
        for poly in coords:
            out.append(encode({"type": "Polygon", "coords": poly}))
        return b"".join(out)
    if t in ("MultiPoint", "MultiLineString"):
        sub = "Point" if t == "MultiPoint" else "LineString"
        out = [head, struct.pack(_BO + "I", len(coords))]
        for c in coords:
            out.append(encode({"type": sub, "coords": c}))
        return b"".join(out)
    if t == "GeometryCollection":
        out = [head, struct.pack(_BO + "I", len(coords))]
        for g in coords:
            out.append(encode(g))
        return b"".join(out)
    raise ValueError(f"unsupported geometry type {t}")


def decode(buf: bytes | None) -> dict[str, Any] | None:
    """WKB bytes → geometry dict. Accepts either byte order."""
    if buf is None:
        return None
    geom, _ = _decode_at(memoryview(buf), 0)
    return geom


def _decode_at(mv: memoryview, off: int):
    bo = "<" if mv[off] == 1 else ">"
    code = struct.unpack_from(bo + "I", mv, off + 1)[0]
    t = _CODE_TYPE[code & 0xFF]
    off += 5

    def read_pts(n, off):
        arr = np.frombuffer(mv, dtype=bo + "f8", count=2 * n, offset=off)
        return [tuple(p) for p in arr.reshape(-1, 2)], off + 16 * n

    if t == "Point":
        pts, off = read_pts(1, off)
        return {"type": t, "coords": pts[0]}, off
    if t == "LineString":
        n = struct.unpack_from(bo + "I", mv, off)[0]
        pts, off = read_pts(n, off + 4)
        return {"type": t, "coords": pts}, off
    if t == "Polygon":
        nr = struct.unpack_from(bo + "I", mv, off)[0]
        off += 4
        rings = []
        for _ in range(nr):
            n = struct.unpack_from(bo + "I", mv, off)[0]
            pts, off = read_pts(n, off + 4)
            rings.append(pts)
        return {"type": t, "coords": rings}, off
    # multi / collection types
    n = struct.unpack_from(bo + "I", mv, off)[0]
    off += 4
    parts = []
    for _ in range(n):
        g, off = _decode_at(mv, off)
        parts.append(g)
    if t == "GeometryCollection":
        return {"type": t, "coords": parts}, off
    return {"type": t, "coords": [g["coords"] for g in parts]}, off


# --- analytic helpers (planar, JTS semantics) --------------------------------


def bbox(geom: dict[str, Any] | None) -> tuple[float, float, float, float] | None:
    if geom is None:
        return None
    xs, ys = _all_coords(geom)
    if xs.size == 0:
        return None
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def _all_coords(geom) -> tuple[np.ndarray, np.ndarray]:
    pts: list[tuple[float, float]] = []

    def walk(g):
        t, c = g["type"], g["coords"]
        if t == "Point":
            pts.append(c)
        elif t in ("LineString", "MultiPoint"):
            pts.extend(c)
        elif t in ("Polygon", "MultiLineString"):
            for ring in c:
                pts.extend(ring)
        elif t == "MultiPolygon":
            for poly in c:
                for ring in poly:
                    pts.extend(ring)
        elif t == "GeometryCollection":
            for sub in c:
                walk(sub)

    walk(geom)
    if not pts:
        return np.empty(0), np.empty(0)
    arr = np.asarray(pts, dtype=np.float64)
    return arr[:, 0], arr[:, 1]


def _ring_moments(pts) -> tuple[float, float, float, float, float]:
    """For a closed ring: (a2, mx, my, bx, by) where a2 = signed doubled
    area and ring centroid = base + (mx, my) / (3 * a2).

    Computed base-relative (triangle fan from the first vertex) for
    numerical stability — the same scheme JTS ``Centroid`` uses.
    """
    ring = np.asarray(pts, dtype=np.float64)
    if ring.shape[0] < 3:
        return 0.0, 0.0, 0.0, 0.0, 0.0
    base = ring[0]
    p1 = ring[:-1] - base
    p2 = ring[1:] - base
    cross = p1[:, 0] * p2[:, 1] - p2[:, 0] * p1[:, 1]
    a2 = float(cross.sum())
    mx = float((cross * (p1[:, 0] + p2[:, 0])).sum())
    my = float((cross * (p1[:, 1] + p2[:, 1])).sum())
    return a2, mx, my, float(base[0]), float(base[1])


def centroid(geom: dict[str, Any] | None) -> tuple[float, float] | None:
    """Planar centroid with JTS dimension-priority semantics."""
    if geom is None:
        return None
    # areal accumulators: A = Σ signed doubled areas (holes negative),
    # (MX, MY) = Σ a2_eff * ring_centroid  (so C = M / A)
    A = MX = MY = 0.0
    # lineal accumulators
    L = LX = LY = 0.0
    # puntal accumulators
    NP = PX = PY = 0.0

    def add_ring(pts, hole: bool):
        nonlocal A, MX, MY
        a2, mx, my, bx, by = _ring_moments(pts)
        if a2 == 0.0:
            return
        # normalize orientation: exterior contributes +|a2|, holes -|a2|
        sign = -1.0 if hole else 1.0
        eff = sign * abs(a2)
        cx = bx + mx / (3.0 * a2)
        cy = by + my / (3.0 * a2)
        A += eff
        MX += eff * cx
        MY += eff * cy

    def add_line(pts):
        nonlocal L, LX, LY, NP, PX, PY
        arr = np.asarray(pts, dtype=np.float64)
        if arr.shape[0] < 2:
            if arr.shape[0] == 1:
                NP += 1
                PX += arr[0, 0]
                PY += arr[0, 1]
            return
        seg = np.sqrt(((arr[1:] - arr[:-1]) ** 2).sum(axis=1))
        mid = (arr[1:] + arr[:-1]) / 2
        line_len = float(seg.sum())
        L += line_len
        LX += float((seg * mid[:, 0]).sum())
        LY += float((seg * mid[:, 1]).sum())
        if line_len == 0.0:
            # JTS Centroid.addLineSegments: zero-length line falls back to
            # its first point
            NP += 1
            PX += arr[0, 0]
            PY += arr[0, 1]

    def walk(g):
        nonlocal NP, PX, PY
        t, c = g["type"], g["coords"]
        if t == "Point":
            NP += 1
            PX += c[0]
            PY += c[1]
        elif t == "MultiPoint":
            for p in c:
                NP += 1
                PX += p[0]
                PY += p[1]
        elif t == "LineString":
            add_line(c)
        elif t == "MultiLineString":
            for line in c:
                add_line(line)
        elif t == "Polygon":
            if c:
                add_ring(c[0], hole=False)
                for h in c[1:]:
                    add_ring(h, hole=True)
        elif t == "MultiPolygon":
            for poly in c:
                walk({"type": "Polygon", "coords": poly})
        elif t == "GeometryCollection":
            for sub in c:
                walk(sub)

    walk(geom)
    if A != 0.0:
        return MX / A, MY / A
    if L > 0.0:
        return LX / L, LY / L
    if NP > 0:
        return PX / NP, PY / NP
    return None


def envelope_polygon(b: tuple[float, float, float, float]) -> dict[str, Any]:
    """bbox → Polygon (used for GeometryCollection storage fallback,
    ``ContributionsAvroConverter.java:121-123``)."""
    xmin, ymin, xmax, ymax = b
    ring = [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)]
    return {"type": "Polygon", "coords": [ring]}
