"""Geodesic length & area on WGS84 (SURVEY.md A8).

Ports the published formulas the reference uses
(``ohsome-contributions/.../util/GeometryTools.java:29-237``):

- length: spherical distance with WGS84 latitude correction
  ``lat' = atan((1-1/f)^1.5 * tan(lat))`` and mean radius 6371000 m;
- area: Chamberlain & Duquette (JPL Publication 07-03, 2007) spherical-excess
  ring area with equatorial radius 6378137 m and a mid-latitude flattening
  correction ``(1 - cos^2(midLat)/f_inv)``.

Polygon area = |outer| − Σ|inner|, clamped ≥ 0; multipolygon area = Σ parts.
These constants must match bit-for-bit for delta-column oracle parity.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_MEAN = 6371000.0
EARTH_RADIUS_EQUATOR = 6378137.0
EARTH_INVERSE_FLATTENING = 298.257223563
F_UNDERSCORE = 1.0 - 1.0 / EARTH_INVERSE_FLATTENING
SPHERE_FACT = F_UNDERSCORE**1.5


def line_length(xs: np.ndarray, ys: np.ndarray) -> float:
    """Geodesic length in meters of one linestring (lon/lat degree arrays)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if xs.size < 2:
        return 0.0
    lon = np.radians(xs)
    lat = np.arctan(SPHERE_FACT * np.tan(np.radians(ys)))
    dlon = np.diff(lon) * np.cos((lat[1:] + lat[:-1]) / 2)
    dlat = np.diff(lat)
    return float(np.sqrt(dlon * dlon + dlat * dlat).sum() * EARTH_RADIUS_MEAN)


def ring_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Signed spherical-excess area in m² of one closed ring.

    The summation walks consecutive coordinate triples (p1, p2, p3) with
    wrap-around exactly like the reference so floating-point order (and thus
    the bits) match: sum of dlon(p3,p1) * sin(spherical_lat(p2)).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = xs.size
    if n <= 2:
        return 0.0
    lower = np.arange(n)
    middle = (lower + 1) % n
    upper = (lower + 2) % n
    x = F_UNDERSCORE * np.tan(np.radians(ys[middle]))
    sin_lat = x / np.sqrt(x * x + 1.0)
    terms = np.radians(xs[upper] - xs[lower]) * sin_lat
    area = float(terms.sum())
    mid_lat = (ys.max() + ys.min()) / 2.0
    area *= (
        0.5
        * EARTH_RADIUS_EQUATOR
        * EARTH_RADIUS_EQUATOR
        * (1 - 1 / EARTH_INVERSE_FLATTENING * np.cos(np.radians(mid_lat)) ** 2)
    )
    return area


def polygon_area(rings: list[tuple[np.ndarray, np.ndarray]]) -> float:
    """|outer| − Σ|inners|, clamped at 0 (first ring is the exterior)."""
    if not rings:
        return 0.0
    area = abs(ring_area(*rings[0]))
    for hole in rings[1:]:
        area -= abs(ring_area(*hole))
    return max(0.0, area)


def multipolygon_area(polys: list[list[tuple[np.ndarray, np.ndarray]]]) -> float:
    return sum(polygon_area(p) for p in polys)


def segment_length_expr(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Native Spark Column: geodesic length in meters of one segment — the
    same formula as :func:`line_length`, usable with lag() to sum tracks
    entirely inside whole-stage codegen.

    DuckDB twin (for oracles)::

        6371000.0 * sqrt(
          pow((radians(lon2)-radians(lon1))
              * cos((atan(SF*tan(radians(lat1))) + atan(SF*tan(radians(lat2))))/2), 2)
          + pow(atan(SF*tan(radians(lat2))) - atan(SF*tan(radians(lat1))), 2))
    """
    sf = F.lit(SPHERE_FACT)
    p_lat1 = F.atan(sf * F.tan(F.radians(lat1)))
    p_lat2 = F.atan(sf * F.tan(F.radians(lat2)))
    dlon = (F.radians(lon2) - F.radians(lon1)) * F.cos((p_lat1 + p_lat2) / F.lit(2.0))
    dlat = p_lat2 - p_lat1
    return F.sqrt(dlon * dlon + dlat * dlat) * F.lit(EARTH_RADIUS_MEAN)
