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
