"""Broadcast spatial join (SURVEY.md J5): geometry × country polygons.

The reference builds a quadtree grid of cells fully covered by one country
set, with an HPRtree + prepared-geometry check for residual candidates
(``spatialjoin/SpatialGridJoiner.java:18-98``, ``GridIndex.java``). The Spark
shape of that idea: the country table is tiny and static → broadcast an
index to every task and evaluate point-in-polygon vectorized (numpy) inside
an Arrow-batched pandas UDF. No shuffle at all — the big side streams.

Boundary semantics follow JTS ``intersects``: a point ON a polygon boundary
matches (two countries share their border line, so border points report
both — FIXTURES.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Feature:
    """One polygonal feature: id + list of rings (first = exterior) per part."""

    feature_id: str
    # parts -> rings -> (N,2) float arrays of lon/lat
    parts: list[list[np.ndarray]]

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        xs = np.concatenate([r[:, 0] for p in self.parts for r in p])
        ys = np.concatenate([r[:, 1] for p in self.parts for r in p])
        return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def rect_feature(feature_id: str, xmin: float, ymin: float, xmax: float, ymax: float) -> Feature:
    ring = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]], dtype=np.float64
    )
    return Feature(feature_id, [[ring]])


def polygon_feature(feature_id: str, rings: list[list[tuple[float, float]]]) -> Feature:
    return Feature(feature_id, [[np.asarray(r, dtype=np.float64) for r in rings]])


def _ring_test(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized even-odd crossing test. Returns (inside, on_edge) — the
    crossing count treats boundary points inconsistently, so callers combine
    the two masks per the semantics they need."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px_ = px[:, None]
    py_ = py[:, None]

    # crossing-number: edge straddles the horizontal ray through the point
    cond = (y1[None, :] > py_) != (y2[None, :] > py_)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py_ - y1[None, :]) * (x2 - x1)[None, :] / (y2 - y1)[None, :]
    crossings = (cond & (px_ < xint)).sum(axis=1)
    inside = (crossings % 2) == 1

    # boundary: point collinear with the edge and within its bbox
    dx, dy = (x2 - x1)[None, :], (y2 - y1)[None, :]
    cross = (px_ - x1[None, :]) * dy - (py_ - y1[None, :]) * dx
    within = (
        (np.minimum(x1, x2)[None, :] <= px_)
        & (px_ <= np.maximum(x1, x2)[None, :])
        & (np.minimum(y1, y2)[None, :] <= py_)
        & (py_ <= np.maximum(y1, y2)[None, :])
    )
    on_edge = ((cross == 0) & within).any(axis=1)
    return inside, on_edge


def points_in_feature(px: np.ndarray, py: np.ndarray, feat: Feature) -> np.ndarray:
    """JTS-intersects semantics: interior or boundary of any part, minus
    strict hole interiors (hole boundaries still intersect)."""
    out = np.zeros(px.shape, dtype=bool)
    for part in feat.parts:
        if not part:
            continue
        inside, on_edge = _ring_test(px, py, part[0])
        in_part = inside | on_edge
        for hole in part[1:]:
            h_inside, h_edge = _ring_test(px, py, hole)
            in_part &= ~(h_inside & ~h_edge)
        out |= in_part
    return out


def countries_udf(features: list[Feature]):
    """Returns a pandas UDF (lon, lat) -> sorted array<string> of matching
    feature ids. The feature list travels in the UDF closure — the Spark
    equivalent of a broadcast dimension."""
    bboxes = [(f.feature_id, f.bbox, f) for f in features]

    @F.pandas_udf("array<string>")
    def _join(lon: pd.Series, lat: pd.Series) -> pd.Series:
        px = lon.to_numpy(dtype=np.float64, na_value=np.nan)
        py = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        n = len(px)
        hits: list[list[str]] = [[] for _ in range(n)]
        for fid, (bx0, by0, bx1, by1), feat in bboxes:
            cand = (px >= bx0) & (px <= bx1) & (py >= by0) & (py <= by1)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            mask = points_in_feature(px[idx], py[idx], feat)
            for i in idx[mask]:
                hits[i].append(fid)
        return pd.Series([sorted(h) for h in hits])

    return _join


def join_countries(
    df: DataFrame, features: list[Feature], lon: Column | str = "lon", lat: Column | str = "lat"
) -> DataFrame:
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    return df.withColumn("countries", countries_udf(features)(lon, lat))


# --- full-geometry intersects (reference SpatialJoiner.join(Geometry)) -------


def _segments_cross_ring(gx: "np.ndarray", gy: "np.ndarray", ring: "np.ndarray") -> bool:
    """Any geometry edge properly crossing any ring edge (vectorized over
    ring edges per geometry edge)."""
    rx1, ry1 = ring[:-1, 0], ring[:-1, 1]
    rx2, ry2 = ring[1:, 0], ring[1:, 1]
    for i in range(len(gx) - 1):
        p1 = (gx[i], gy[i])
        p2 = (gx[i + 1], gy[i + 1])
        d1 = (rx2 - rx1) * (p1[1] - ry1) - (ry2 - ry1) * (p1[0] - rx1)
        d2 = (rx2 - rx1) * (p2[1] - ry1) - (ry2 - ry1) * (p2[0] - rx1)
        d3 = (p2[0] - p1[0]) * (ry1 - p1[1]) - (p2[1] - p1[1]) * (rx1 - p1[0])
        d4 = (p2[0] - p1[0]) * (ry2 - p1[1]) - (p2[1] - p1[1]) * (rx2 - p1[0])
        if (((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))).any():
            return True
        # touching (collinear endpoints) counts as intersecting too
        if ((d1 == 0) | (d2 == 0) | (d3 == 0) | (d4 == 0)).any():
            # cheap bbox confirmation to avoid false hits from collinear
            # but-disjoint edges
            minx, maxx = min(p1[0], p2[0]), max(p1[0], p2[0])
            miny, maxy = min(p1[1], p2[1]), max(p1[1], p2[1])
            touch = (
                (np.minimum(rx1, rx2) <= maxx)
                & (np.maximum(rx1, rx2) >= minx)
                & (np.minimum(ry1, ry2) <= maxy)
                & (np.maximum(ry1, ry2) >= miny)
                & ((d1 == 0) | (d2 == 0))
            )
            if touch.any():
                return True
    return False


def _polygon_rings_of(geom: dict) -> list["np.ndarray"]:
    """Exterior rings of any polygonal parts of a geometry dict."""
    t, c = geom["type"], geom["coords"]
    if t == "Polygon":
        return [np.asarray(c[0], dtype=np.float64)] if c else []
    if t == "MultiPolygon":
        return [np.asarray(poly[0], dtype=np.float64) for poly in c if poly]
    if t == "GeometryCollection":
        out = []
        for sub in c:
            out.extend(_polygon_rings_of(sub))
        return out
    return []


def geometry_intersects_feature(
    coords_xy: "np.ndarray", feat: Feature, geom: dict | None = None
) -> bool:
    """JTS-intersects approximation for an arbitrary geometry: any geometry
    vertex inside/on the feature, any proper/touching edge crossing, or —
    for polygonal geometries — any feature vertex inside the geometry
    (covers geometry-contains-feature)."""
    px, py = coords_xy[:, 0], coords_xy[:, 1]
    if points_in_feature(px, py, feat).any():
        return True
    for part in feat.parts:
        for ring in part[:1]:  # exterior ring crossing suffices
            if _segments_cross_ring(px, py, ring):
                return True
    if geom is not None:
        for gring in _polygon_rings_of(geom):
            for part in feat.parts:
                if not part:
                    continue
                fx, fy = part[0][:, 0], part[0][:, 1]
                inside, on_edge = _ring_test(fx, fy, gring)
                if (inside | on_edge).any():
                    return True
    return False


def _part_polylines(geom: dict) -> list["np.ndarray"]:
    """Per-part vertex chains: each polygon ring (exterior AND holes), each
    linestring, each point becomes its own (N,2) array. Edges never span
    part boundaries — a MultiLineString's gap is not an edge."""
    t, c = geom["type"], geom["coords"]
    if t == "Point":
        return [np.asarray([c], dtype=np.float64)]
    if t == "LineString":
        return [np.asarray(c, dtype=np.float64)] if len(c) else []
    if t == "Polygon":
        return [np.asarray(r, dtype=np.float64) for r in c if len(r)]
    if t == "MultiPoint":
        return [np.asarray([p], dtype=np.float64) for p in c]
    if t == "MultiLineString":
        return [np.asarray(ln, dtype=np.float64) for ln in c if len(ln)]
    if t == "MultiPolygon":
        return [np.asarray(r, dtype=np.float64) for poly in c for r in poly if len(r)]
    if t == "GeometryCollection":
        out: list[np.ndarray] = []
        for sub in c:
            out.extend(_part_polylines(sub))
        return out
    return []


class FeatureGrid:
    """Covered-cell fast path (reference ``SpatialGridJoiner.java:18-98``):
    a regular lon/lat grid where every cell NOT crossed by any feature
    boundary has one uniform membership, resolved once from the cell
    center. A geometry whose bbox fits inside one uncrossed cell gets its
    countries by dict lookup, skipping every geometry test. Built once on
    the driver and shipped in the UDF closure (the Spark equivalent of the
    reference's broadcast grid index)."""

    # BOUNDARY / EMPTY are codes in the dense membership raster; codes >= 0
    # index ``memb_sets`` (interned uniform feature-index sets)
    BOUNDARY = -1
    EMPTY = -2

    def __init__(self, features: list[Feature], cell_deg: float = 0.1):
        self.cell = float(cell_deg)
        self.fids = np.array([f.feature_id for f in features])
        eps = 1e-9  # grid-aligned boundary edges mark BOTH adjacent cells

        boundary: set[tuple[int, int]] = set()
        for f in features:
            for part in f.parts:
                for ring in part:
                    x1, y1 = ring[:-1, 0], ring[:-1, 1]
                    x2, y2 = ring[1:, 0], ring[1:, 1]
                    ix0 = np.floor((np.minimum(x1, x2) - eps) / self.cell).astype(np.int64)
                    ix1 = np.floor((np.maximum(x1, x2) + eps) / self.cell).astype(np.int64)
                    iy0 = np.floor((np.minimum(y1, y2) - eps) / self.cell).astype(np.int64)
                    iy1 = np.floor((np.maximum(y1, y2) + eps) / self.cell).astype(np.int64)
                    # dense rings: most edges stay inside one cell — mark
                    # those in one vectorized unique; loop only spanners
                    single = (ix0 == ix1) & (iy0 == iy1)
                    if single.any():
                        boundary.update(
                            zip(ix0[single].tolist(), iy0[single].tolist())
                        )
                    for a0, a1, b0, b1 in zip(
                        ix0[~single], ix1[~single], iy0[~single], iy1[~single]
                    ):
                        for ix in range(a0, a1 + 1):
                            for iy in range(b0, b1 + 1):
                                boundary.add((ix, iy))

        # dense raster over the union extent of all features (+1 cell halo);
        # anything outside the extent is EMPTY by construction
        if features:
            bbs = np.array([f.bbox for f in features])
            self.gx0 = int(np.floor(bbs[:, 0].min() / self.cell)) - 1
            self.gy0 = int(np.floor(bbs[:, 1].min() / self.cell)) - 1
            nx = int(np.floor(bbs[:, 2].max() / self.cell)) + 2 - self.gx0
            ny = int(np.floor(bbs[:, 3].max() / self.cell)) + 2 - self.gy0
        else:
            self.gx0 = self.gy0 = 0
            nx = ny = 1
        memb = np.full((nx, ny), self.EMPTY, dtype=np.int32)
        for ix, iy in boundary:
            if self.gx0 <= ix < self.gx0 + nx and self.gy0 <= iy < self.gy0 + ny:
                memb[ix - self.gx0, iy - self.gy0] = self.BOUNDARY

        # uniform membership of every uncrossed cell, by scanline
        # rasterization: per cell row, ring crossings of the horizontal
        # line through the centers → sorted x crossings → parity via
        # searchsorted. O(rows × edges) instead of O(cells × edges), which
        # keeps fine grids buildable (0.1° world grid in ~1 s, not minutes).
        # Membership codes evolve IN the raster per feature via an interned
        # (old_sid, feature) → new_sid transition table, so the inner work
        # per row is one vectorized crossing test + one remap per DISTINCT
        # prior code (usually 1-2) — never a Python op per inside cell.
        # A world-spanning feature (millions of inside cells) costs the
        # same Python overhead as a city-sized one.
        sets: dict[tuple[int, ...], int] = {}
        self.memb_sets: list[np.ndarray] = []

        def _intern(idxs: tuple[int, ...]) -> int:
            sid = sets.get(idxs)
            if sid is None:
                sid = len(self.memb_sets)
                sets[idxs] = sid
                self.memb_sets.append(np.asarray(idxs, dtype=np.int64))
            return sid

        trans: dict[tuple[int, int], int] = {}
        for j, f in enumerate(features):
            bx0, by0, bx1, by1 = f.bbox
            ix_lo, ix_hi = int(np.floor(bx0 / self.cell)), int(np.floor(bx1 / self.cell))
            iy_lo, iy_hi = int(np.floor(by0 / self.cell)), int(np.floor(by1 / self.cell))
            centers_x = (np.arange(ix_lo, ix_hi + 1) + 0.5) * self.cell
            col0 = ix_lo - self.gx0
            for iy in range(iy_lo, iy_hi + 1):
                cy = (iy + 0.5) * self.cell
                inside_union = np.zeros(len(centers_x), dtype=bool)
                for part in f.parts:
                    xs = []
                    for ring in part:  # even-odd over exterior + holes
                        y1, y2 = ring[:-1, 1], ring[1:, 1]
                        c = (y1 > cy) != (y2 > cy)
                        if c.any():
                            x1, x2 = ring[:-1, 0], ring[1:, 0]
                            xs.append(
                                x1[c] + (cy - y1[c]) * (x2[c] - x1[c]) / (y2[c] - y1[c])
                            )
                    if xs:
                        xcr = np.sort(np.concatenate(xs))
                        inside_union |= (np.searchsorted(xcr, centers_x) % 2) == 1
                if not inside_union.any():
                    continue
                row = memb[col0 : col0 + len(centers_x), iy - self.gy0]
                sel = inside_union & (row != self.BOUNDARY)
                if not sel.any():
                    continue
                old = row[sel]
                new = old.copy()
                for o in np.unique(old):
                    key = (int(o), j)
                    sid = trans.get(key)
                    if sid is None:
                        base = (
                            ()
                            if o == self.EMPTY
                            else tuple(self.memb_sets[o].tolist())
                        )
                        sid = _intern(base + (j,))
                        trans[key] = sid
                    new[old == o] = sid
                row[sel] = new
        self.memb = memb

    def codes_at(self, ix: "np.ndarray", iy: "np.ndarray") -> "np.ndarray":
        """Vectorized raster lookup of cell codes (EMPTY outside extent)."""
        out = np.full(ix.shape, self.EMPTY, dtype=np.int32)
        nx, ny = self.memb.shape
        inb = (
            (ix >= self.gx0)
            & (ix < self.gx0 + nx)
            & (iy >= self.gy0)
            & (iy < self.gy0 + ny)
        )
        out[inb] = self.memb[ix[inb] - self.gx0, iy[inb] - self.gy0]
        return out

    def lookup(self, gx0: float, gy0: float, gx1: float, gy1: float):
        """Uniform membership (tuple of feature ids) if the bbox fits in
        one uncrossed cell, else None (→ caller runs geometry tests)."""
        ix, iy = int(np.floor(gx0 / self.cell)), int(np.floor(gy0 / self.cell))
        if int(np.floor(gx1 / self.cell)) != ix or int(np.floor(gy1 / self.cell)) != iy:
            return None
        code = self.codes_at(np.array([ix]), np.array([iy]))[0]
        if code == self.BOUNDARY:
            return None
        if code == self.EMPTY:
            return ()
        return tuple(sorted(self.fids[self.memb_sets[code]].tolist()))


def _edges_cross_ring_batch(
    ex1: "np.ndarray",
    ey1: "np.ndarray",
    ex2: "np.ndarray",
    ey2: "np.ndarray",
    ring: "np.ndarray",
    chunk: int = 2048,
) -> "np.ndarray":
    """Per-edge boolean: geometry edge properly crosses or touches any ring
    edge. Same orientation/bbox semantics as ``_segments_cross_ring``, but
    vectorized over (edges × ring edges) in bounded-memory chunks."""
    rx1, ry1 = ring[:-1, 0], ring[:-1, 1]
    rx2, ry2 = ring[1:, 0], ring[1:, 1]
    rminx, rmaxx = np.minimum(rx1, rx2), np.maximum(rx1, rx2)
    rminy, rmaxy = np.minimum(ry1, ry2), np.maximum(ry1, ry2)
    out = np.zeros(ex1.shape, dtype=bool)
    for s in range(0, len(ex1), chunk):
        e = slice(s, s + chunk)
        a1x, a1y = ex1[e][:, None], ey1[e][:, None]
        a2x, a2y = ex2[e][:, None], ey2[e][:, None]
        d1 = (rx2 - rx1) * (a1y - ry1) - (ry2 - ry1) * (a1x - rx1)
        d2 = (rx2 - rx1) * (a2y - ry1) - (ry2 - ry1) * (a2x - rx1)
        d3 = (a2x - a1x) * (ry1 - a1y) - (a2y - a1y) * (rx1 - a1x)
        d4 = (a2x - a1x) * (ry2 - a1y) - (a2y - a1y) * (rx2 - a1x)
        proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
        overlap = (
            (rminx <= np.maximum(a1x, a2x))
            & (rmaxx >= np.minimum(a1x, a2x))
            & (rminy <= np.maximum(a1y, a2y))
            & (rmaxy >= np.minimum(a1y, a2y))
        )
        touch = overlap & ((d1 == 0) | (d2 == 0))
        out[e] = (proper | touch).any(axis=1)
    return out


# The grid is a pure function of (features, cell) and driver-built; a
# session that enriches several frames against the same country table
# (bench runs every gate query 5×, the CLI tags nodes/ways/relations in
# one process) must not rebuild it per call — at planet configs the build
# is seconds of driver time. Keyed by a content fingerprint, not object
# identity, so reloaded-but-identical feature lists still hit.
_GRID_CACHE: dict[tuple, "FeatureGrid"] = {}


def get_feature_grid(features: list[Feature], cell_deg: float = 0.1) -> FeatureGrid:
    """Memoized :class:`FeatureGrid` build."""
    import hashlib

    h = hashlib.md5(repr(float(cell_deg)).encode())
    for f in features:
        h.update(f.feature_id.encode())
        for part in f.parts:
            h.update(b"p")
            for ring in part:
                h.update(np.ascontiguousarray(ring, dtype=np.float64).tobytes())
    key = (float(cell_deg), h.hexdigest())
    grid = _GRID_CACHE.get(key)
    if grid is None:
        grid = _GRID_CACHE.setdefault(key, FeatureGrid(features, cell_deg))
    return grid


def geometry_countries_udf(features: list[Feature], grid: FeatureGrid | None = None):
    """pandas UDF over WKB geometries → sorted array<string> of feature ids
    whose polygons intersect the geometry (the reference joins the FULL
    geometry, ``ContributionsAvroConverter.java:130``).

    Scale shape: per Arrow batch, geometries decode ONCE into flat vertex/
    edge arrays; each feature then tests the whole batch vectorized
    (vertex-in-polygon over all candidate vertices, edge-crossing over all
    candidate edges) — no per-row Python in the hot path. Rows whose bbox
    fits inside an uncrossed ``FeatureGrid`` cell skip the tests entirely
    via dict lookup, mirroring the reference's covered-cell grid."""
    from ..functions import wkb as wkblib

    bboxes = [(f.feature_id, f.bbox, f) for f in features]
    grid = get_feature_grid(features) if grid is None else grid

    @F.pandas_udf("array<string>")
    def _join(wkb_col: pd.Series) -> pd.Series:
        # --- decode the whole Arrow batch into flat arrays (no per-row
        # Python — see wkb.decode_flat_batch) -----------------------------
        batch = wkblib.decode_flat_batch(wkb_col.tolist())
        n = batch.n
        result: list = [None] * n
        for i in np.nonzero(batch.empty)[0]:
            result[i] = []

        # --- vectorized grid fast path: bbox fits in one uncrossed cell --
        bb = batch.row_bbox
        live = ~batch.empty
        ix0 = np.zeros(n, dtype=np.int64)
        iy0 = np.zeros(n, dtype=np.int64)
        single = np.zeros(n, dtype=bool)
        if live.any():
            ix0[live] = np.floor(bb[live, 0] / grid.cell).astype(np.int64)
            iy0[live] = np.floor(bb[live, 1] / grid.cell).astype(np.int64)
            single[live] = (
                (np.floor(bb[live, 2] / grid.cell).astype(np.int64) == ix0[live])
                & (np.floor(bb[live, 3] / grid.cell).astype(np.int64) == iy0[live])
            )
        codes = np.full(n, FeatureGrid.BOUNDARY, dtype=np.int32)
        codes[single] = grid.codes_at(ix0[single], iy0[single])
        fast = single & (codes != FeatureGrid.BOUNDARY)
        for i in np.nonzero(fast & (codes == FeatureGrid.EMPTY))[0]:
            result[i] = []
        pos_fast = fast & (codes >= 0)
        if pos_fast.any():
            for sid in np.unique(codes[pos_fast]):
                memb = sorted(grid.fids[grid.memb_sets[sid]].tolist())
                for i in np.nonzero(pos_fast & (codes == sid))[0]:
                    result[i] = list(memb)

        slow_mask = live & ~fast
        slow_rows = np.nonzero(slow_mask)[0]
        if len(slow_rows):
            m = len(slow_rows)
            rb = bb[slow_rows]
            # remap original row ids → dense slow indices for the flat
            # vertex/edge arrays
            slow_of = np.full(n, -1, dtype=np.int64)
            slow_of[slow_rows] = np.arange(m)
            all_vrow = batch.vrow()
            vsel_rows = slow_of[all_vrow] >= 0
            vx = batch.vx[vsel_rows]
            vy = batch.vy[vsel_rows]
            vrow = slow_of[all_vrow[vsel_rows]]
            aex1, aey1, aex2, aey2, aerow = batch.edges()
            esel_rows = slow_of[aerow] >= 0
            ex1, ey1 = aex1[esel_rows], aey1[esel_rows]
            ex2, ey2 = aex2[esel_rows], aey2[esel_rows]
            erow = slow_of[aerow[esel_rows]]

            # --- grid classification: a vertex in an uncrossed cell gets
            # that cell's uniform membership with NO ring test; only
            # boundary-cell vertices need point-in-polygon. Same for edges:
            # a crossing's intersection point always lies in a
            # boundary-marked cell, so single-cell edges in uncrossed cells
            # can't cross anything.
            hitmat = np.zeros((m, len(bboxes)), dtype=bool)
            ncode = max(1, len(grid.memb_sets))
            vcode = grid.codes_at(
                np.floor(vx / grid.cell).astype(np.int64),
                np.floor(vy / grid.cell).astype(np.int64),
            )
            pos = vcode >= 0
            if pos.any():
                for key in np.unique(
                    vrow[pos].astype(np.int64) * ncode + vcode[pos]
                ):
                    r, sid = divmod(int(key), ncode)
                    hitmat[r, grid.memb_sets[sid]] = True
            vbound = vcode == FeatureGrid.BOUNDARY
            if len(ex1):
                eix0 = np.floor(np.minimum(ex1, ex2) / grid.cell).astype(np.int64)
                eix1 = np.floor(np.maximum(ex1, ex2) / grid.cell).astype(np.int64)
                eiy0 = np.floor(np.minimum(ey1, ey2) / grid.cell).astype(np.int64)
                eiy1 = np.floor(np.maximum(ey1, ey2) / grid.cell).astype(np.int64)
                esingle = (eix0 == eix1) & (eiy0 == eiy1)
                enear = np.ones(len(ex1), dtype=bool)
                enear[esingle] = (
                    grid.codes_at(eix0[esingle], eiy0[esingle])
                    == FeatureGrid.BOUNDARY
                )
            else:
                enear = np.empty(0, dtype=bool)

            for j, (_fid, (bx0, by0, bx1, by1), feat) in enumerate(bboxes):
                cand = (
                    (rb[:, 0] <= bx1)
                    & (rb[:, 2] >= bx0)
                    & (rb[:, 1] <= by1)
                    & (rb[:, 3] >= by0)
                )
                if not cand.any():
                    continue
                # stage A: boundary-cell vertices inside/on the feature
                vsel = (
                    vbound & cand[vrow]
                    & (vx >= bx0) & (vx <= bx1) & (vy >= by0) & (vy <= by1)
                )
                if vsel.any():
                    idx = np.nonzero(vsel)[0]
                    mk = points_in_feature(vx[idx], vy[idx], feat)
                    hitmat[vrow[idx[mk]], j] = True
                # stage B: near-boundary geometry edges crossing/touching an
                # exterior ring (exterior crossing suffices, as before)
                pend = cand & ~hitmat[:, j]
                if pend.any() and len(ex1):
                    esel = pend[erow] & enear
                    if esel.any():
                        eidx = np.nonzero(esel)[0]
                        for part in feat.parts:
                            if not part:
                                continue
                            cr = _edges_cross_ring_batch(
                                ex1[eidx], ey1[eidx], ex2[eidx], ey2[eidx], part[0]
                            )
                            hitmat[erow[eidx[cr]], j] = True
                # stage C (rare): polygonal geometry fully containing the
                # feature — test feature vertices against geometry rings
                pend = np.nonzero(cand & ~hitmat[:, j])[0]
                for r in pend:
                    done = False
                    for gring in batch.parts_of_row(
                        int(slow_rows[r]), wkblib.PART_POLY_EXT
                    ):
                        for part in feat.parts:
                            if not part:
                                continue
                            fx, fy = part[0][:, 0], part[0][:, 1]
                            inside, on_edge = _ring_test(fx, fy, gring)
                            if (inside | on_edge).any():
                                hitmat[r, j] = True
                                done = True
                                break
                        if done:
                            break

            fids = np.array([fid for fid, _b, _f in bboxes])
            for r, i in enumerate(slow_rows):
                result[i] = sorted(fids[hitmat[r]].tolist())

        return pd.Series(result)

    return _join


def join_countries_geometry(
    df: DataFrame,
    features: list[Feature],
    wkb_col: Column | str = "geometry",
    grid_cell_deg: float = 0.1,
) -> DataFrame:
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    grid = get_feature_grid(features, grid_cell_deg)
    return df.withColumn("countries", geometry_countries_udf(features, grid)(wkb_col))
