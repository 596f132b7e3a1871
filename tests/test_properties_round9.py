"""Hypothesis property tests for the round-9 geometry operators — an
INDEPENDENT referee for the clipGeometry kernels (their gate oracles
replay the same formulas, so a shared-semantics bug would hash-match;
these properties don't reuse any clip arithmetic):

- ring clip: every output vertex lies inside the window (closed test);
  planar area never grows; a window containing the ring is the identity;
  clipping is idempotent; the clipped planar area equals the exact
  rectangle-intersection area for axis-aligned rectangle inputs;
- polyline clip: every output vertex inside the window; total planar
  length never grows; parts are chains of >= 2 points; windows containing
  the line reproduce it verbatim; idempotent on each part;
- segment clip: endpoints inside => identity; both endpoints on one side
  of the window on any axis => rejected.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ohsome_planet_spark.functions.geometry import (
    clip_polyline_rect,
    clip_ring_rect,
    clip_segment_rect,
)

SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

coord = st.floats(-170.0, 170.0, allow_nan=False).map(
    lambda v: round(v, 3)
)


def _planar_ring_area(ring):
    a = 0.0
    for i in range(len(ring) - 1):
        a += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return abs(a) / 2.0


def _planar_length(pts):
    return sum(
        math.hypot(pts[i + 1][0] - pts[i][0], pts[i + 1][1] - pts[i][1])
        for i in range(len(pts) - 1)
    )


@st.composite
def rect_ring(draw):
    x0, y0 = draw(coord), draw(coord)
    w = draw(st.floats(0.01, 30.0).map(lambda v: round(v, 3)))
    h = draw(st.floats(0.01, 30.0).map(lambda v: round(v, 3)))
    return [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]


@st.composite
def window(draw):
    x0, y0 = draw(coord), draw(coord)
    w = draw(st.floats(0.01, 60.0).map(lambda v: round(v, 3)))
    h = draw(st.floats(0.01, 60.0).map(lambda v: round(v, 3)))
    return (x0, y0, x0 + w, y0 + h)


EPS = 1e-9


@given(ring=rect_ring(), win=window())
@settings(**SETTINGS)
def test_rect_clip_matches_interval_intersection(ring, win):
    xmin, ymin, xmax, ymax = win
    out = clip_ring_rect(ring, xmin, ymin, xmax, ymax)
    rx0, ry0, rx1, ry1 = ring[0][0], ring[0][1], ring[2][0], ring[2][1]
    ix = max(0.0, min(rx1, xmax) - max(rx0, xmin))
    iy = max(0.0, min(ry1, ymax) - max(ry0, ymin))
    expected = ix * iy
    if out is None:
        assert expected <= EPS
        return
    # every vertex inside the window
    for x, y in out:
        assert xmin - EPS <= x <= xmax + EPS
        assert ymin - EPS <= y <= ymax + EPS
    got = _planar_ring_area(out)
    assert abs(got - expected) <= 1e-6 * max(1.0, expected)
    # never grows
    assert got <= _planar_ring_area(ring) + EPS
    # idempotent
    again = clip_ring_rect(out, xmin, ymin, xmax, ymax)
    assert again is not None
    assert _planar_ring_area(again) == got  # same region, exact re-clip


@given(ring=rect_ring())
@settings(**SETTINGS)
def test_ring_clip_identity_when_contained(ring):
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    out = clip_ring_rect(
        ring, min(xs) - 1.0, min(ys) - 1.0, max(xs) + 1.0, max(ys) + 1.0
    )
    assert out == ring


@st.composite
def polyline(draw):
    n = draw(st.integers(2, 8))
    pts = [(draw(coord), draw(coord)) for _ in range(n)]
    # drop duplicate consecutive points (zero-length segments are a
    # degenerate input the OSM pipeline never produces for refs)
    dedup = [pts[0]]
    for p in pts[1:]:
        if p != dedup[-1]:
            dedup.append(p)
    if len(dedup) < 2:
        dedup.append((dedup[0][0] + 1.0, dedup[0][1]))
    return dedup


@given(line=polyline(), win=window())
@settings(**SETTINGS)
def test_polyline_clip_properties(line, win):
    xmin, ymin, xmax, ymax = win
    parts = clip_polyline_rect(line, xmin, ymin, xmax, ymax)
    total = 0.0
    for part in parts:
        assert len(part) >= 2
        for x, y in part:
            assert xmin - EPS <= x <= xmax + EPS
            assert ymin - EPS <= y <= ymax + EPS
        total += _planar_length(part)
        # re-clipping a clipped part is the identity up to chaining
        again = clip_polyline_rect(part, xmin, ymin, xmax, ymax)
        assert abs(sum(_planar_length(p) for p in again) - _planar_length(part)) <= 1e-9 * max(
            1.0, _planar_length(part)
        )
    assert total <= _planar_length(line) * (1 + 1e-12) + EPS


@given(line=polyline())
@settings(**SETTINGS)
def test_polyline_clip_identity_when_contained(line):
    xs = [p[0] for p in line]
    ys = [p[1] for p in line]
    parts = clip_polyline_rect(
        line, min(xs) - 1.0, min(ys) - 1.0, max(xs) + 1.0, max(ys) + 1.0
    )
    assert parts == [line]


@given(
    x1=coord, y1=coord, x2=coord, y2=coord, win=window()
)
@settings(**SETTINGS)
def test_segment_clip_inside_and_outside(x1, y1, x2, y2, win):
    xmin, ymin, xmax, ymax = win
    hit = clip_segment_rect(x1, y1, x2, y2, xmin, ymin, xmax, ymax)
    inside1 = xmin <= x1 <= xmax and ymin <= y1 <= ymax
    inside2 = xmin <= x2 <= xmax and ymin <= y2 <= ymax
    if inside1 and inside2:
        assert hit is not None
        t0, t1, cx1, cy1, cx2, cy2 = hit
        assert (t0, t1) == (0.0, 1.0)
        assert (cx1, cy1, cx2, cy2) == (x1, y1, x2, y2)
    if (
        (x1 < xmin and x2 < xmin)
        or (x1 > xmax and x2 > xmax)
        or (y1 < ymin and y2 < ymin)
        or (y1 > ymax and y2 > ymax)
    ):
        assert hit is None
    if hit is not None:
        t0, t1, cx1, cy1, cx2, cy2 = hit
        assert 0.0 <= t0 <= t1 <= 1.0
        for x, y in ((cx1, cy1), (cx2, cy2)):
            assert xmin - EPS <= x <= xmax + EPS
            assert ymin - EPS <= y <= ymax + EPS
