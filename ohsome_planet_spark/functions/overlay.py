"""Pure-Python polygon overlay for the multipolygon repair paths.

The reference repairs degenerate multipolygon relations with JTS overlay
operations — ``GeometryBuilder.java:53-110`` uses ``difference`` /
``union`` / ``intersection`` on touching or overlapping rings, and
``handleIntersectingAndTouchingPolygons`` (``:113-159``) classifies ring
boundary intersections as Point / MultiPoint / LineString to decide
between repair and rejection. This module is the minimal overlay engine
those repairs need, shapely/JTS-free:

1. ``align_many``: mutual vertex insertion — every boundary crossing,
   vertex-on-edge touch, and collinear-overlap endpoint becomes a SHARED
   vertex of all rings (each point computed once, so the floats are
   bit-identical everywhere it appears);
2. ``arrangement_overlay``: a predicate-based boolean — each unique edge
   of the aligned arrangement is kept iff the caller's region predicate
   holds on exactly one side (sampled at a small perpendicular offset),
   directed interior-on-left;
3. kept edges are stitched into cycles with a clockwise-successor walk
   (half-edge face traversal), split into shells (CCW) and holes (CW) by
   signed area, holes attached to their smallest containing shell.

Any boolean over any number of polygons-with-holes reduces to the region
predicate, which is how ``difference(outer, [inner, inner, ...])`` — the
repair JTS expresses as ``outerPoly.difference(createMultiPolygon(...))``
— stays one code path. Coordinates are float lon/lat pairs.
"""

from __future__ import annotations

import math
from collections import defaultdict

Coord = tuple[float, float]
# polygon = (shell, [holes...]); rings open or closed, any orientation
Poly = tuple[list[Coord], list[list[Coord]]]

EPS = 1e-12
AREA_EPS = 1e-13


class OverlayError(ValueError):
    pass


class OnBoundary(Exception):
    """Sample point fell on a ring boundary — retry with another offset."""


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------


def _cross(o: Coord, a: Coord, b: Coord) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _on_segment(p: Coord, a: Coord, b: Coord) -> bool:
    """p lies on closed segment [a, b] (within EPS)."""
    if abs(_cross(a, b, p)) > EPS:
        return False
    return (
        min(a[0], b[0]) - EPS <= p[0] <= max(a[0], b[0]) + EPS
        and min(a[1], b[1]) - EPS <= p[1] <= max(a[1], b[1]) + EPS
    )

def _t_along(p: Coord, a: Coord, b: Coord) -> float:
    """Parameter of p along a→b (projection on the dominant axis)."""
    dx, dy = b[0] - a[0], b[1] - a[1]
    if abs(dx) >= abs(dy):
        return (p[0] - a[0]) / dx if dx else 0.0
    return (p[1] - a[1]) / dy if dy else 0.0


def _seg_points(p1: Coord, p2: Coord, q1: Coord, q2: Coord) -> list[Coord]:
    """All points where segment p meets segment q: proper crossings,
    endpoint-on-interior touches, collinear-overlap endpoints. Endpoints
    shared by both segments are included (dedup happens at insertion)."""
    d1 = _cross(q1, q2, p1)
    d2 = _cross(q1, q2, p2)
    d3 = _cross(p1, p2, q1)
    d4 = _cross(p1, p2, q2)
    out: list[Coord] = []
    if abs(d1) <= EPS and abs(d2) <= EPS:
        # collinear: overlap endpoints are whichever endpoints lie on the
        # other segment
        for pt in (p1, p2):
            if _on_segment(pt, q1, q2):
                out.append(pt)
        for pt in (q1, q2):
            if _on_segment(pt, p1, p2):
                out.append(pt)
        return out
    # endpoint touches
    for pt, da in ((p1, d1), (p2, d2)):
        if abs(da) <= EPS and _on_segment(pt, q1, q2):
            out.append(pt)
    for pt, da in ((q1, d3), (q2, d4)):
        if abs(da) <= EPS and _on_segment(pt, p1, p2):
            out.append(pt)
    if out:
        return out
    # proper crossing
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        t = d1 / (d1 - d2)
        out.append((p1[0] + t * (p2[0] - p1[0]), p1[1] + t * (p2[1] - p1[1])))
    return out


def ring_area2(ring: list[Coord]) -> float:
    """Twice the signed area (CCW positive). Ring open or closed."""
    pts = ring[:-1] if ring[0] == ring[-1] else ring
    s = 0.0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        s += x1 * y2 - x2 * y1
    return s


def point_in_ring(pt: Coord, ring: list[Coord]) -> int:
    """1 strictly inside, 0 on boundary, -1 outside (even-odd)."""
    x, y = pt
    pts = ring if ring[0] == ring[-1] else ring + [ring[0]]
    inside = False
    for i in range(len(pts) - 1):
        (x1, y1), (x2, y2) = pts[i], pts[i + 1]
        if _on_segment(pt, (x1, y1), (x2, y2)):
            return 0
        if (y1 > y) != (y2 > y):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xint:
                inside = not inside
    return 1 if inside else -1


def in_polygon(pt: Coord, poly: Poly) -> bool:
    """Strict interior test for a polygon-with-holes; raises
    :class:`OnBoundary` when pt lies on any ring."""
    shell, holes = poly
    side = point_in_ring(pt, shell)
    if side == 0:
        raise OnBoundary
    if side < 0:
        return False
    for h in holes:
        side = point_in_ring(pt, h)
        if side == 0:
            raise OnBoundary
        if side > 0:
            return False
    return True


# ---------------------------------------------------------------------------
# alignment
# ---------------------------------------------------------------------------


def _closed(ring: list[Coord]) -> list[Coord]:
    return ring if ring[0] == ring[-1] else list(ring) + [ring[0]]


def _dedup_key(p: Coord) -> Coord:
    # quantize so points computed through different float paths still merge
    return (round(p[0], 12), round(p[1], 12))


def align_many(rings: list[list[Coord]]) -> list[list[Coord]]:
    """Insert every mutual intersection point into every ring it lies on,
    computing each point once so all rings carry identical floats."""
    rings = [_closed(r) for r in rings]
    ins: list[dict[int, list[Coord]]] = [defaultdict(list) for _ in rings]
    for ri in range(len(rings)):
        a = rings[ri]
        for rj in range(ri + 1, len(rings)):
            b = rings[rj]
            for i in range(len(a) - 1):
                p1, p2 = a[i], a[i + 1]
                for j in range(len(b) - 1):
                    q1, q2 = b[j], b[j + 1]
                    if (
                        min(p1[0], p2[0]) > max(q1[0], q2[0]) + EPS
                        or max(p1[0], p2[0]) < min(q1[0], q2[0]) - EPS
                        or min(p1[1], p2[1]) > max(q1[1], q2[1]) + EPS
                        or max(p1[1], p2[1]) < min(q1[1], q2[1]) - EPS
                    ):
                        continue
                    for pt in _seg_points(p1, p2, q1, q2):
                        if pt != p1 and pt != p2:
                            ins[ri][i].append(pt)
                        if pt != q1 and pt != q2:
                            ins[rj][j].append(pt)
    return [_rebuild(rings[k], ins[k]) for k in range(len(rings))]


def _rebuild(ring: list[Coord], ins: dict[int, list[Coord]]) -> list[Coord]:
    out: list[Coord] = []
    for i in range(len(ring) - 1):
        out.append(ring[i])
        if i in ins:
            seen = {_dedup_key(ring[i]), _dedup_key(ring[i + 1])}
            pts = []
            for pt in sorted(ins[i], key=lambda p: _t_along(p, ring[i], ring[i + 1])):
                k = _dedup_key(pt)
                if k not in seen:
                    seen.add(k)
                    pts.append(pt)
            out.extend(pts)
    out.append(ring[-1])
    return out


def align_rings(a: list[Coord], b: list[Coord]) -> tuple[list[Coord], list[Coord]]:
    a2, b2 = align_many([a, b])
    return a2, b2


# ---------------------------------------------------------------------------
# boundary classification (JTS ring.intersection(ring) equivalent)
# ---------------------------------------------------------------------------


def boundary_intersection(
    a: list[Coord], b: list[Coord]
) -> tuple[list[Coord], list[tuple[Coord, Coord]], list[Coord]]:
    """(isolated common points, overlap line chains, ALL intersection
    coordinates) of two ring boundaries — the classification
    ``handleIntersectingAndTouchingPolygons`` reads off
    ``ringA.intersection(ringB)``. Overlap chains are maximal runs of
    aligned edges shared by both rings; isolated points are shared
    vertices not on any shared edge. The third element mirrors JTS
    ``getCoordinates()`` on the intersection — every shared vertex,
    including chain interiors — for the common-node membership check."""
    a2, b2 = align_rings(a, b)
    edges_b = set()
    for j in range(len(b2) - 1):
        e = (_dedup_key(b2[j]), _dedup_key(b2[j + 1]))
        edges_b.add(e)
        edges_b.add((e[1], e[0]))
    lines: list[tuple[Coord, Coord]] = []
    on_line: set[Coord] = set()
    for i in range(len(a2) - 1):
        e = (_dedup_key(a2[i]), _dedup_key(a2[i + 1]))
        if e in edges_b:
            lines.append((a2[i], a2[i + 1]))
            on_line.add(e[0])
            on_line.add(e[1])
    verts_b = {_dedup_key(p) for p in b2}
    pts: list[Coord] = []
    seen: set[Coord] = set()
    for p in a2[:-1]:
        k = _dedup_key(p)
        if k in verts_b and k not in on_line and k not in seen:
            seen.add(k)
            pts.append(p)
    all_coords = pts + [pt for pt, _k in _chain_vertices(a2, edges_b)]
    return pts, _merge_lines(lines), all_coords


def _chain_vertices(a2: list[Coord], edges_b: set) -> list[tuple[Coord, Coord]]:
    out = []
    seen: set[Coord] = set()
    for i in range(len(a2) - 1):
        e = (_dedup_key(a2[i]), _dedup_key(a2[i + 1]))
        if e in edges_b:
            for p, k in ((a2[i], e[0]), (a2[i + 1], e[1])):
                if k not in seen:
                    seen.add(k)
                    out.append((p, k))
    return out


def _merge_lines(lines: list[tuple[Coord, Coord]]) -> list[tuple[Coord, Coord]]:
    """Merge shared edges into maximal chains (JTS would return one
    LineString per chain); only the COUNT and endpoints matter to callers."""
    if not lines:
        return []
    nbr: dict[Coord, list[Coord]] = defaultdict(list)
    for p, q in lines:
        nbr[_dedup_key(p)].append(_dedup_key(q))
        nbr[_dedup_key(q)].append(_dedup_key(p))
    visited: set[tuple[Coord, Coord]] = set()
    chains = []
    for p, q in lines:
        kp, kq = _dedup_key(p), _dedup_key(q)
        if (kp, kq) in visited or (kq, kp) in visited:
            continue
        # grow in both directions through degree-2 nodes
        chain = [kp, kq]
        visited.add((kp, kq))
        for end_idx in (0, -1):
            while True:
                end = chain[end_idx]
                prev = chain[1] if end_idx == 0 else chain[-2]
                nxts = [
                    n
                    for n in nbr[end]
                    if n != prev
                    and (end, n) not in visited
                    and (n, end) not in visited
                ]
                if len(nbr[end]) != 2 or not nxts:
                    break
                nxt = nxts[0]
                visited.add((end, nxt))
                if end_idx == 0:
                    chain.insert(0, nxt)
                else:
                    chain.append(nxt)
        chains.append((chain[0], chain[-1]))
    return chains


# ---------------------------------------------------------------------------
# overlay core
# ---------------------------------------------------------------------------


def _classify_edge(p: Coord, q: Coord, inside) -> str | None:
    """Which side of arrangement edge p→q is in the region: 'left',
    'right', or None (both or neither — interior/exterior edge). Samples
    the predicate at perpendicular offsets from points along the edge,
    retrying outward when a sample lands on a boundary and inward when
    the two sides disagree about whether the edge bounds anything."""
    dx, dy = q[0] - p[0], q[1] - p[1]
    length = math.hypot(dx, dy)
    if length == 0.0:
        return None
    nx, ny = -dy / length, dx / length
    base = max(length * 1e-7, 1e-12)
    for t in (0.5, 0.3179, 0.6827):
        mx, my = p[0] + t * dx, p[1] + t * dy
        for scale in (1.0, 10.0, 100.0):  # outward retries for boundary hits
            eps = base * scale
            try:
                li = inside((mx + eps * nx, my + eps * ny))
                ri = inside((mx - eps * nx, my - eps * ny))
            except OnBoundary:
                continue
            if li != ri:
                return "left" if li else "right"
            # both sides agree: the region may simply be thinner than eps —
            # retry inward with shrinking offsets before concluding None
            for shrink in (0.1, 0.01, 0.001):
                s_eps = base * shrink
                try:
                    li = inside((mx + s_eps * nx, my + s_eps * ny))
                    ri = inside((mx - s_eps * nx, my - s_eps * ny))
                except OnBoundary:
                    break
                if li != ri:
                    return "left" if li else "right"
            return None
    raise OverlayError("cannot classify edge side")


def _stitch(edges: list[tuple[Coord, Coord]]) -> list[list[Coord]]:
    """Stitch directed edges into cycles. At a multi-degree vertex the next
    edge is the clockwise successor of the incoming twin — the half-edge
    face walk that keeps each bounded face's interior on the left."""
    out_edges: dict[Coord, list[int]] = defaultdict(list)
    for idx, (p, q) in enumerate(edges):
        out_edges[_dedup_key(p)].append(idx)
    used = [False] * len(edges)
    cycles: list[list[Coord]] = []
    for start in range(len(edges)):
        if used[start]:
            continue
        cycle: list[Coord] = []
        idx = start
        while not used[idx]:
            used[idx] = True
            p, q = edges[idx]
            cycle.append(p)
            cands = [c for c in out_edges[_dedup_key(q)] if not used[c]]
            if not cands and _dedup_key(q) == _dedup_key(edges[start][0]):
                break  # closed
            if not cands:
                raise OverlayError("dangling edge in overlay graph")
            if len(cands) == 1:
                idx = cands[0]
                continue
            # clockwise successor of the reversed incoming direction
            ang_in = math.atan2(p[1] - q[1], p[0] - q[0])

            def ang_of(c):
                cp, cq = edges[c]
                a = math.atan2(cq[1] - cp[1], cq[0] - cp[0])
                d = ang_in - a  # clockwise distance from twin
                while d <= 1e-12:
                    d += 2 * math.pi
                return d

            idx = min(cands, key=ang_of)
        if len(cycle) >= 3:
            cycles.append(cycle + [cycle[0]])
    return cycles


def _split_pinches(cycle: list[Coord]) -> list[list[Coord]]:
    """Split a closed cycle that revisits a vertex (figure-eight through a
    pinch point) into simple sub-cycles — JTS overlay emits each loop as
    its own valid ring, e.g. two holes touching at a node stay two holes."""
    out: list[list[Coord]] = []
    pos: dict[Coord, int] = {}
    cur: list[Coord] = []
    for p in cycle[:-1]:
        k = _dedup_key(p)
        if k in pos:
            i = pos[k]
            loop = cur[i:]
            for q in loop:
                pos.pop(_dedup_key(q), None)
            cur = cur[:i]
            if len(loop) >= 3:
                out.append(loop + [loop[0]])
        pos[k] = len(cur)
        cur.append(p)
    if len(cur) >= 3:
        out.append(cur + [cur[0]])
    return out


def _assemble(cycles: list[list[Coord]]) -> list[Poly]:
    """Signed-area split into shells/holes; each hole attached to the
    smallest shell that contains it."""
    shells = [c for c in cycles if ring_area2(c) > 0]
    holes = [c for c in cycles if ring_area2(c) < 0]
    result: list[tuple[list[Coord], list[list[Coord]]]] = [(s, []) for s in shells]
    for h in holes:
        best = None
        best_area = math.inf
        for i, (s, _hs) in enumerate(result):
            sides = [point_in_ring(p, s) for p in h[:-1]]
            if all(x >= 0 for x in sides) and any(x > 0 for x in sides):
                area = ring_area2(s)
                if area < best_area:
                    best, best_area = i, area
        if best is None:
            raise OverlayError("hole outside every shell")
        result[best][1].append(h)
    return result


def arrangement_overlay(rings: list[list[Coord]], inside) -> list[Poly]:
    """Boolean overlay driven by a region predicate: keep each unique edge
    of the aligned arrangement of ``rings`` iff ``inside`` holds on exactly
    one of its sides, directed interior-on-left, then stitch faces.

    ``inside(pt) -> bool`` may raise :class:`OnBoundary` (the sampler
    retries with a different offset). Returns [(shell CCW, holes CW)].
    """
    aligned = align_many(rings)
    uniq: dict[tuple[Coord, Coord], tuple[Coord, Coord]] = {}
    for r in aligned:
        for i in range(len(r) - 1):
            p, q = r[i], r[i + 1]
            kp, kq = _dedup_key(p), _dedup_key(q)
            if kp == kq:
                continue
            key = (kp, kq) if kp <= kq else (kq, kp)
            uniq.setdefault(key, (p, q))
    kept: list[tuple[Coord, Coord]] = []
    for p, q in uniq.values():
        side = _classify_edge(p, q, inside)
        if side == "left":
            kept.append((p, q))
        elif side == "right":
            kept.append((q, p))
    cycles = [
        s
        for c in _stitch(kept)
        for s in _split_pinches(c)
        if abs(ring_area2(s)) > AREA_EPS
    ]
    return _assemble(cycles)


def _poly_rings(poly: Poly) -> list[list[Coord]]:
    shell, holes = poly
    return [shell] + list(holes)


def polygon_difference(a: Poly, bs: list[Poly]) -> list[Poly]:
    """a minus the union of bs — JTS ``polyA.difference(multiPolygon)``."""
    rings = _poly_rings(a)
    for b in bs:
        rings.extend(_poly_rings(b))

    def inside(pt: Coord) -> bool:
        return in_polygon(pt, a) and not any(in_polygon(pt, b) for b in bs)

    return arrangement_overlay(rings, inside)


def polygon_union(a: Poly, b: Poly) -> list[Poly]:
    rings = _poly_rings(a) + _poly_rings(b)

    def inside(pt: Coord) -> bool:
        try:
            if in_polygon(pt, a):
                return True
        except OnBoundary:
            # on a's boundary: union-interior iff inside b
            return in_polygon(pt, b)
        # outside a: union membership is b's call (OnBoundary propagates —
        # a point on b's boundary and outside a is ON the union boundary)
        return in_polygon(pt, b)

    return arrangement_overlay(rings, inside)


def polygon_intersection(a: Poly, b: Poly) -> list[Poly]:
    rings = _poly_rings(a) + _poly_rings(b)

    def inside(pt: Coord) -> bool:
        return in_polygon(pt, a) and in_polygon(pt, b)

    return arrangement_overlay(rings, inside)


def interiors_overlap(a: Poly, b: Poly) -> bool:
    """True if the polygon interiors share area (not just boundary)."""
    try:
        inter = polygon_intersection(a, b)
    except OverlayError:
        return True  # conservatively treat degenerate cases as overlapping
    return any(abs(ring_area2(s)) > AREA_EPS for s, _h in inter)
