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


def geometry_countries_udf(features: list[Feature]):
    """pandas UDF over WKB geometries → sorted array<string> of feature ids
    whose polygons intersect the geometry (the reference joins the FULL
    geometry, ``ContributionsAvroConverter.java:130``)."""
    from ..functions import wkb as wkblib
    from ..functions.wkb import _all_coords

    bboxes = [(f.feature_id, f.bbox, f) for f in features]

    @F.pandas_udf("array<string>")
    def _join(wkb_col: pd.Series) -> pd.Series:
        out = []
        for buf in wkb_col:
            if buf is None:
                out.append([])
                continue
            geom = wkblib.decode(bytes(buf))
            xs, ys = _all_coords(geom)
            if xs.size == 0:
                out.append([])
                continue
            coords = np.column_stack([xs, ys])
            gx0, gy0, gx1, gy1 = xs.min(), ys.min(), xs.max(), ys.max()
            hits = []
            for fid, (bx0, by0, bx1, by1), feat in bboxes:
                if gx1 < bx0 or gx0 > bx1 or gy1 < by0 or gy0 > by1:
                    continue
                if geometry_intersects_feature(coords, feat, geom):
                    hits.append(fid)
            out.append(sorted(hits))
        return pd.Series(out)

    return _join


def join_countries_geometry(
    df: DataFrame, features: list[Feature], wkb_col: Column | str = "geometry"
) -> DataFrame:
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    return df.withColumn("countries", geometry_countries_udf(features)(wkb_col))
