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


def geometry_to_geojson(geom: dict[str, Any] | None, ndp: int = 7) -> str | None:
    """Geometry dict → canonical GeoJSON geometry-object string (RFC 7946),
    coordinates formatted ``%.<ndp>f`` (fixed decimals, ohsome-API style)
    so the byte sequence is deterministic and SQL-replayable — Python's
    shortest-round-trip float repr has no cross-engine counterpart."""
    if geom is None:
        return None
    t = geom["type"]

    def pt(p) -> str:
        return f"[{p[0]:.{ndp}f},{p[1]:.{ndp}f}]"

    def chain(pts) -> str:
        return "[" + ",".join(pt(p) for p in pts) + "]"

    def rings(rs) -> str:
        return "[" + ",".join(chain(r) for r in rs) + "]"

    if t == "Point":
        coords = pt(geom["coords"])
    elif t in ("LineString", "MultiPoint"):
        coords = chain(geom["coords"])
    elif t in ("Polygon", "MultiLineString"):
        coords = rings(geom["coords"])
    elif t == "MultiPolygon":
        coords = "[" + ",".join(rings(poly) for poly in geom["coords"]) + "]"
    else:
        raise ValueError(f"GeoJSON serialization for {t}")
    return '{"type":"' + t + '","coordinates":' + coords + "}"


# --- batched flat decode (Arrow-batch scale path) ----------------------------

# part kinds in FlatGeomBatch.part_kind
PART_LINEAL = 0  # point / linestring vertex chain
PART_POLY_EXT = 1  # polygon exterior ring
PART_POLY_HOLE = 2  # polygon hole ring


class FlatGeomBatch:
    """Column-oriented decode of a batch of WKB buffers.

    All vertex chains ("parts": each polygon ring, each linestring, each
    point) of every row live in two flat float64 arrays plus part-level
    bookkeeping — the layout consumed by the vectorized spatial join
    (``operators/spatial.py``). No per-row Python objects are built.

    Attributes
    ----------
    n         : number of input rows
    vx, vy    : (V,) all vertices, part-contiguous
    part_off  : (P+1,) vertex offsets; part p = slice(part_off[p], part_off[p+1])
    part_row  : (P,) input-row index of each part
    part_kind : (P,) PART_LINEAL / PART_POLY_EXT / PART_POLY_HOLE
    empty     : (n,) bool — row was NULL or had no coordinates
    row_bbox  : (n, 4) xmin/ymin/xmax/ymax per row (NaN where empty)
    """

    __slots__ = ("n", "vx", "vy", "part_off", "part_row", "part_kind", "empty", "row_bbox")

    def __init__(self, n, vx, vy, part_off, part_row, part_kind, empty, row_bbox):
        self.n = n
        self.vx = vx
        self.vy = vy
        self.part_off = part_off
        self.part_row = part_row
        self.part_kind = part_kind
        self.empty = empty
        self.row_bbox = row_bbox

    def vrow(self) -> np.ndarray:
        """(V,) row index per vertex."""
        return np.repeat(self.part_row, np.diff(self.part_off))

    def edges(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Within-part edges as flat arrays (ex1, ey1, ex2, ey2, erow) —
        consecutive vertex pairs that do not span a part boundary."""
        V = len(self.vx)
        if V == 0:
            z = np.empty(0, dtype=np.float64)
            return z, z, z, z, np.empty(0, dtype=np.int64)
        first = np.ones(V, dtype=bool)  # True where edge (i, i+1) is valid
        first[self.part_off[1:] - 1] = False  # last vertex of each part
        first = first[:-1] if V else first
        i1 = np.nonzero(first)[0]
        return (
            self.vx[i1],
            self.vy[i1],
            self.vx[i1 + 1],
            self.vy[i1 + 1],
            self.vrow()[i1],
        )

    def parts_of_row(self, row: int, kind: int | None = None) -> list[np.ndarray]:
        """(N,2) arrays of the row's parts (optionally one kind) — rare-path
        helper; do not call per row in hot loops."""
        sel = self.part_row == row
        if kind is not None:
            sel &= self.part_kind == kind
        out = []
        for p in np.nonzero(sel)[0]:
            s, e = self.part_off[p], self.part_off[p + 1]
            out.append(np.column_stack([self.vx[s:e], self.vy[s:e]]))
        return out


def _geom_polylines(geom: dict | None) -> list[tuple[int, np.ndarray]]:
    """Per-part vertex chains of a geometry dict as (kind, (N,2)) pairs —
    the row-at-a-time twin of the flat batch layout, used as the
    GeometryCollection fallback."""
    out: list[tuple[int, np.ndarray]] = []
    if geom is None:
        return out
    t, c = geom["type"], geom["coords"]
    if t == "Point":
        out.append((PART_LINEAL, np.asarray([c], dtype=np.float64)))
    elif t == "LineString":
        if len(c):
            out.append((PART_LINEAL, np.asarray(c, dtype=np.float64)))
    elif t == "MultiPoint":
        for p in c:
            out.append((PART_LINEAL, np.asarray([p], dtype=np.float64)))
    elif t == "MultiLineString":
        for ln in c:
            if len(ln):
                out.append((PART_LINEAL, np.asarray(ln, dtype=np.float64)))
    elif t == "Polygon":
        for k, r in enumerate(c):
            if len(r):
                out.append(
                    (PART_POLY_EXT if k == 0 else PART_POLY_HOLE, np.asarray(r, dtype=np.float64))
                )
    elif t == "MultiPolygon":
        for poly in c:
            for k, r in enumerate(poly):
                if len(r):
                    out.append(
                        (
                            PART_POLY_EXT if k == 0 else PART_POLY_HOLE,
                            np.asarray(r, dtype=np.float64),
                        )
                    )
    elif t == "GeometryCollection":
        for sub in c:
            out.extend(_geom_polylines(sub))
    return out


def _u32_at(big: np.ndarray, offs: np.ndarray, be: bool) -> np.ndarray:
    """Vectorized uint32 reads at arbitrary byte offsets."""
    b = big[offs[:, None] + np.arange(4)]
    return (
        b.reshape(-1, 4).view(">u4" if be else "<u4").ravel().astype(np.int64)
    )


def _ragged_gather(big: np.ndarray, starts: np.ndarray, nbytes: np.ndarray) -> np.ndarray:
    """Concatenated bytes of [starts[i], starts[i]+nbytes[i]) slices."""
    total = int(nbytes.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    shift = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
    idx = np.repeat(starts - shift, nbytes) + np.arange(total)
    return big[idx]


def decode_flat_batch(bufs) -> FlatGeomBatch:
    """Batch WKB decode straight into flat numpy arrays.

    The per-row scalar work is limited to building the concatenated byte
    buffer; everything else — type dispatch, ring counts, coordinate
    extraction — runs vectorized over all rows of a type at once, with
    Python loops only over NESTING DEPTH (ring index within polygons, part
    index within multis), never over rows. GeometryCollections (rare in
    OSM-shaped data) fall back to the recursive decoder row-at-a-time.

    Both WKB byte orders are accepted (rows may mix); Z/M dimensions are
    not (matching ``decode``'s 2D-only contract).
    """
    n = len(bufs)
    empty = np.zeros(n, dtype=bool)
    chunks: list[bytes] = []
    rows: list[int] = []
    lens = np.zeros(n, dtype=np.int64)
    for i, b in enumerate(bufs):
        if b is None or len(b) == 0:
            empty[i] = True
            continue
        chunks.append(bytes(b))
        rows.append(i)
        lens[i] = len(b)
    row_idx = np.asarray(rows, dtype=np.int64)

    # accumulators: (coords_f64 flat xy, npts_per_part, row_per_part, kind)
    acc_coords: list[np.ndarray] = []
    acc_npts: list[np.ndarray] = []
    acc_prow: list[np.ndarray] = []
    acc_kind: list[np.ndarray] = []

    def emit(coords: np.ndarray, npts: np.ndarray, prow: np.ndarray, kind: int):
        keep = npts > 0
        if not keep.all():
            # zero-length parts contribute zero coord floats, so dropping
            # their bookkeeping keeps offsets aligned
            npts, prow = npts[keep], prow[keep]
        if len(npts) == 0:
            return
        acc_coords.append(coords)
        acc_npts.append(npts)
        acc_prow.append(prow)
        acc_kind.append(np.full(len(npts), kind, dtype=np.int8))

    if len(row_idx):
        big = np.frombuffer(b"".join(chunks), dtype=np.uint8)
        off = np.concatenate([[0], np.cumsum(lens[row_idx])[:-1]])

        bo_le = big[off] == 1
        for be in (True, False):
            bsel = ~bo_le if be else bo_le
            if not bsel.any():
                continue
            boff = off[bsel]
            brow = row_idx[bsel]
            code = _u32_at(big, boff + 1, be) & 0xFF
            fdt = ">f8" if be else "<f8"

            def f8(u8: np.ndarray) -> np.ndarray:
                return u8.view(fdt).astype(np.float64)

            # ---- Point: fixed 16-byte payload at off+5 ------------------
            sel = code == WKB_POINT
            if sel.any():
                s = boff[sel] + 5
                u8 = big[s[:, None] + np.arange(16)].reshape(-1)
                emit(f8(u8), np.ones(int(sel.sum()), dtype=np.int64), brow[sel], PART_LINEAL)
            # ---- LineString: count at off+5, coords at off+9 ------------
            sel = code == WKB_LINESTRING
            if sel.any():
                s = boff[sel]
                npts = _u32_at(big, s + 5, be)
                emit(f8(_ragged_gather(big, s + 9, 16 * npts)), npts, brow[sel], PART_LINEAL)
            # ---- Polygon: ring loop, vectorized over rows ---------------
            sel = code == WKB_POLYGON
            if sel.any():
                s = boff[sel]
                nr = _u32_at(big, s + 5, be)
                cur = s + 9
                prow = brow[sel]
                k = 0
                while (nr > k).any():
                    act = nr > k
                    npts = _u32_at(big, cur[act], be)
                    emit(
                        f8(_ragged_gather(big, cur[act] + 4, 16 * npts)),
                        npts,
                        prow[act],
                        PART_POLY_EXT if k == 0 else PART_POLY_HOLE,
                    )
                    cur[act] += 4 + 16 * npts
                    k += 1
            # ---- MultiPoint: fixed 21-byte sub-geoms --------------------
            sel = code == WKB_MULTIPOINT
            if sel.any():
                s = boff[sel]
                cnt = _u32_at(big, s + 5, be)
                k = 0
                while (cnt > k).any():
                    act = cnt > k
                    sub = s[act] + 9 + 21 * k + 5  # skip sub header
                    u8 = big[sub[:, None] + np.arange(16)].reshape(-1)
                    emit(
                        f8(u8), np.ones(int(act.sum()), dtype=np.int64), brow[sel][act], PART_LINEAL
                    )
                    k += 1
            # ---- MultiLineString: sub loop ------------------------------
            sel = code == WKB_MULTILINESTRING
            if sel.any():
                s = boff[sel]
                cnt = _u32_at(big, s + 5, be)
                cur = s + 9
                prow = brow[sel]
                k = 0
                while (cnt > k).any():
                    act = cnt > k
                    npts = _u32_at(big, cur[act] + 5, be)
                    emit(
                        f8(_ragged_gather(big, cur[act] + 9, 16 * npts)),
                        npts,
                        prow[act],
                        PART_LINEAL,
                    )
                    cur[act] += 9 + 16 * npts
                    k += 1
            # ---- MultiPolygon: poly loop × ring loop --------------------
            sel = code == WKB_MULTIPOLYGON
            if sel.any():
                s = boff[sel]
                cnt = _u32_at(big, s + 5, be)
                cur = s + 9
                prow = brow[sel]
                p = 0
                while (cnt > p).any():
                    pact = cnt > p
                    nr = _u32_at(big, cur[pact] + 5, be)
                    rcur = cur[pact] + 9
                    rrow = prow[pact]
                    k = 0
                    while (nr > k).any():
                        act = nr > k
                        npts = _u32_at(big, rcur[act], be)
                        emit(
                            f8(_ragged_gather(big, rcur[act] + 4, 16 * npts)),
                            npts,
                            rrow[act],
                            PART_POLY_EXT if k == 0 else PART_POLY_HOLE,
                        )
                        rcur[act] += 4 + 16 * npts
                        k += 1
                    cur[pact] = rcur  # past this sub-polygon
                    p += 1
            # ---- GeometryCollection: rare, recursive fallback -----------
            sel = code == WKB_GEOMETRYCOLLECTION
            if sel.any():
                for s, r in zip(boff[sel], brow[sel]):
                    geom, _ = _decode_at(memoryview(big[int(s):].tobytes()), 0)
                    for kind, arr in _geom_polylines(geom):
                        emit(
                            arr.reshape(-1).astype(np.float64),
                            np.array([len(arr)], dtype=np.int64),
                            np.array([int(r)], dtype=np.int64),
                            kind,
                        )

    if acc_npts:
        npts = np.concatenate(acc_npts)
        part_row = np.concatenate(acc_prow)
        part_kind = np.concatenate(acc_kind)
        xy = np.concatenate(acc_coords).reshape(-1, 2)
        vx, vy = np.ascontiguousarray(xy[:, 0]), np.ascontiguousarray(xy[:, 1])
        part_off = np.concatenate([[0], np.cumsum(npts)])
    else:
        vx = vy = np.empty(0, dtype=np.float64)
        part_row = np.empty(0, dtype=np.int64)
        part_kind = np.empty(0, dtype=np.int8)
        part_off = np.zeros(1, dtype=np.int64)

    # rows that decoded to no coordinates are empty too
    has_part = np.zeros(n, dtype=bool)
    has_part[part_row] = True
    empty |= ~has_part

    row_bbox = np.full((n, 4), np.nan)
    if len(part_row):
        # per-part extrema via contiguous reduceat, then scatter per row
        # over P parts (≪ V vertices — ufunc.at is the slow path)
        seg = part_off[:-1]
        pmnx = np.minimum.reduceat(vx, seg)
        pmny = np.minimum.reduceat(vy, seg)
        pmxx = np.maximum.reduceat(vx, seg)
        pmxy = np.maximum.reduceat(vy, seg)
        mnx = np.full(n, np.inf)
        mny = np.full(n, np.inf)
        mxx = np.full(n, -np.inf)
        mxy = np.full(n, -np.inf)
        np.minimum.at(mnx, part_row, pmnx)
        np.minimum.at(mny, part_row, pmny)
        np.maximum.at(mxx, part_row, pmxx)
        np.maximum.at(mxy, part_row, pmxy)
        row_bbox[has_part, 0] = mnx[has_part]
        row_bbox[has_part, 1] = mny[has_part]
        row_bbox[has_part, 2] = mxx[has_part]
        row_bbox[has_part, 3] = mxy[has_part]

    return FlatGeomBatch(n, vx, vy, part_off, part_row, part_kind, empty, row_bbox)


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
