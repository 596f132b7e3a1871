"""Multipolygon assembly from member way geometries (SURVEY.md §2.7).

Python port of the reference's ring-assembly pipeline
(``osm-geometry/.../GeometryBuilder.java:17-284``, ``NodeSegments.java:11-135``,
``Segment.java``), shapely/JTS-free:

1. split member ways into 2-node segments, dropping duplicate ways (same
   coordinate set) and self-loop segments;
2. node→segments map; duplicate segments tracked; redundant duplicates
   removed at odd-parity nodes (``filterOutRedundantSegments``);
3. chains of degree-2 nodes joined into intermediate segments; closed
   chains (> 3 coords) become rings (``joinItermediateSegments``);
4. parity check: every node must touch an even number of segments, else
   "Mismatched segments parity";
5. remaining segments walked into rings (``buildRings`` tail loop);
6. rings → polygons (validity-checked), sorted by area, nested by
   containment: largest-first, each ring becomes a hole of the nearest
   containing OUTER ring, holes-of-holes start new outers
   (role tags are intentionally ignored — swapped inner/outer still builds,
   osm-testdata case 720);
7. shared-node touches are accepted; proper edge crossings raise.

Degenerate relations are REPAIRED the way the reference repairs them
(``GeometryBuilder.java:53-110`` main flow,
``handleIntersectingAndTouchingPolygons:113-159``): outers that overlap
through common nodes are replaced by their mutual differences, inners
touching at points mark the outer for an n-ary difference (enclosed
areas become holes or split the outer), line-touching inners are merged
(unioned) among themselves or subtracted from the outer when they touch
its boundary in a line — all on the pure-Python arrangement overlay in
:mod:`.overlay` instead of JTS. Unrepairable inputs raise
:class:`MultipolygonError` with the reference's error conditions
("Touching polygons without common node", "Overlapping polygons",
"Overlapping outer rings").

Intentional divergence from the reference: when a repair difference
produces pieces that already carry holes and a piece re-enters the
worklist, those holes are KEPT as hole candidates
(``GeometryBuilder.java:74,109`` takes only ``getExteriorRing()`` plus
matched inners, silently dropping difference-created holes). Keeping them
preserves area correctness for doubly-degenerate relations; every golden
``mod/`` corpus case still matches the reference byte-for-byte because the
divergent path only triggers where the reference would drop real interior
area.
"""

from __future__ import annotations

import numpy as np

from .geometry import ring_is_simple
from .overlay import (
    OverlayError,
    _dedup_key,
    boundary_intersection,
    polygon_difference,
    polygon_union,
    interiors_overlap,
)
from .wkb import _ring_moments

Coord = tuple[float, float]


class MultipolygonError(ValueError):
    pass


class _Segment:
    __slots__ = ("coords", "way_id", "reversed")

    def __init__(self, coords: list[Coord], way_id: int):
        self.coords = list(coords)
        self.way_id = way_id
        self.reversed = False

    def first(self) -> Coord:
        return self.coords[-1] if self.reversed else self.coords[0]

    def last(self) -> Coord:
        return self.coords[0] if self.reversed else self.coords[-1]

    def other(self, c: Coord) -> Coord:
        return self.last() if self.first() == c else self.first()

    def set_first(self, c: Coord) -> None:
        if self.first() != c:
            self.reversed = not self.reversed

    def get_coords(self) -> list[Coord]:
        return list(reversed(self.coords)) if self.reversed else list(self.coords)

    def same(self, other: "_Segment") -> bool:
        a, b = self.get_coords(), other.get_coords()
        return len(a) == len(b) and (a == b or a == b[::-1])


def _split_ways(ways: list[list[Coord]]) -> list[_Segment]:
    segments: list[_Segment] = []
    seen: set[frozenset[Coord]] = set()
    way_id = 0
    for way in ways:
        if len(way) < 2:
            continue
        key = frozenset(way)
        if key in seen:
            continue
        seen.add(key)
        for i in range(1, len(way)):
            segments.append(_Segment([way[i - 1], way[i]], way_id))
        way_id += 1
    return segments


class _NodeSegments:
    def __init__(self):
        self.map: dict[Coord, list[_Segment]] = {}
        self.dup: dict[Coord, list[_Segment]] = {}

    def add(self, seg: _Segment) -> None:
        a = self.map.setdefault(seg.first(), [])
        b = self.map.setdefault(seg.last(), [])
        in_a = any(s.same(seg) for s in a)
        in_b = any(s.same(seg) for s in b)
        if not in_a:
            a.append(seg)
        if not in_b:
            b.append(seg)
        if in_a and in_b:
            self.dup.setdefault(seg.first(), []).append(seg)
            self.dup.setdefault(seg.last(), []).append(seg)

    def _remove_from(self, mp: dict, node: Coord, seg: _Segment) -> None:
        segs = mp.get(node)
        if segs is None:
            return
        for i, s in enumerate(segs):
            if s is seg or s.same(seg):
                del segs[i]
                break
        if not segs:
            mp.pop(node, None)

    def remove(self, seg: _Segment) -> None:
        self._remove_from(self.map, seg.first(), seg)
        self._remove_from(self.map, seg.last(), seg)

    def is_valid(self) -> bool:
        return all(len(s) % 2 == 0 for s in self.map.values())

    def filter_redundant(self) -> None:
        changed = True
        while changed:
            changed = False
            for node in list(self.dup.keys()):
                if node not in self.map or len(self.map[node]) % 2 == 0:
                    continue
                candidates = self.dup.get(node, [])
                if not candidates:
                    continue
                seg = candidates[0]
                for c in candidates:
                    othe = c.other(node)
                    if othe in self.map and len(self.map[othe]) % 2 == 1:
                        seg = c
                        break
                self._remove_from(self.dup, seg.first(), seg)
                self._remove_from(self.dup, seg.last(), seg)
                self.remove(seg)
                changed = True
                break

    def join_intermediate(self) -> list[list[_Segment]]:
        """Chain degree-2 nodes into merged segments; closed chains become
        rings. Faithful to ``NodeSegments.joinItermediateSegments``:
        emptied node entries stay in the map during the walk (a dead-ended
        chain is re-added under its endpoints, so the parity check still
        sees the odd node)."""
        rings: list[list[_Segment]] = []

        def local_remove(node: Coord, seg: _Segment) -> None:
            segs = self.map.get(node)
            if segs is None:
                return
            for i, s in enumerate(segs):
                if s is seg:
                    del segs[i]
                    return

        for start in list(self.map.keys()):
            if start not in self.map:
                continue
            for seg in list(self.map.get(start, [])):
                if not any(s is seg for s in self.map.get(start, [])):
                    continue  # consumed by an earlier chain
                end = seg.last()
                if end == start:
                    continue  # reverse-oriented: walked from the other node
                local_remove(start, seg)
                local_remove(end, seg)
                while end in self.map:
                    if len(self.map[end]) != 1:
                        self.map.setdefault(start, []).append(seg)
                        self.map.setdefault(end, []).append(seg)
                        break
                    nxt = self.map.pop(end)[0]
                    nxt.set_first(end)
                    seg.coords = seg.get_coords() + nxt.get_coords()[1:]
                    seg.reversed = False
                    end = seg.last()
                    local_remove(end, nxt)
                    if end == start:
                        if start in self.map and not self.map[start]:
                            self.map.pop(start)
                        if len(seg.coords) > 3:
                            rings.append([seg])
                        break
        return rings

    def purge_empty(self) -> None:
        for node in [n for n, s in self.map.items() if not s]:
            self.map.pop(node)

    def remove_mismatched(self) -> bool:
        mismatched: list[_Segment] = []
        for segs in self.map.values():
            if len(segs) % 2 == 0:
                continue
            ids: dict[int, _Segment] = {}
            for seg in segs:
                if any(seg is m for m in mismatched):
                    continue
                if seg.way_id in ids:
                    ids.pop(seg.way_id)
                else:
                    ids[seg.way_id] = seg
            if len(ids) == 1:
                mismatched.append(next(iter(ids.values())))
        if not mismatched:
            return False
        for seg in mismatched:
            self.remove(seg)
        return True


def _merge_segments(segments: list[_Segment]) -> list[Coord]:
    coords: list[Coord] = []
    for seg in segments:
        c = seg.get_coords()
        coords.extend(c[:-1])
    # remove backtracking (collinear overlapping) consecutive segments
    def collinear_covers(p, q, r, s) -> bool:
        # does segment pq cover rs or rs cover pq (collinear overlap)?
        def cross(a, b, c):
            return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

        if cross(p, q, r) != 0 or cross(p, q, s) != 0:
            return False

        def within(a, b, c):
            return (
                min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
            )

        return (within(p, q, r) and within(p, q, s)) or (within(r, s, p) and within(r, s, q))

    # The reference's single pass starts from HashMap-order-dependent chain
    # starts, so whether a seam spike is caught depends on where the ring
    # happened to begin (743_mod only builds for lucky starts). Scanning the
    # triple window CYCLICALLY until stable removes every backtracking
    # spike regardless of start vertex — the behavior the golden fix WKT
    # pins down.
    changed = True
    while changed and len(coords) >= 3:
        changed = False
        n = len(coords)
        for i in range(n):
            a, b, c = coords[i - 2], coords[i - 1], coords[i % n]
            if collinear_covers(a, b, b, c):
                # delete by index: value-based remove() would strike the
                # FIRST occurrence, corrupting rings with repeated
                # (pinch-point) vertices
                del coords[(i - 1) % n]
                changed = True
                break
    coords.append(coords[0])
    return coords


def _rings(ways: list[list[Coord]], legacy: bool = False) -> list[list[Coord]]:
    ns = _NodeSegments()
    for seg in _split_ways(ways):
        if seg.first() == seg.last():
            continue
        ns.add(seg)
    ns.filter_redundant()
    ring_chains = ns.join_intermediate()

    if not ns.is_valid():
        if not legacy:
            raise MultipolygonError("Mismatched segments parity")
        if ns.remove_mismatched():
            ring_chains.extend(ns.join_intermediate())

    ns.purge_empty()
    while ns.map:
        seg = next(iter(ns.map.values()))[0]
        start = seg.first()
        nxt_node = seg.last()
        nxt_segments = ns.map.get(nxt_node, [])
        ns.remove(seg)
        if not nxt_segments:
            continue
        chain = [seg]
        ring_chains.append(chain)
        found = None
        for cand in list(nxt_segments):
            if cand.other(nxt_node) == start:
                found = cand
                if seg.way_id == cand.way_id:
                    break
        if found is None:
            raise MultipolygonError("Failed to find next segment")
        found.set_first(nxt_node)
        chain.append(found)
        ns.remove(found)

    return [_merge_segments(chain) for chain in ring_chains]


def _ring_area_planar(ring: list[Coord]) -> float:
    a2, _, _, _, _ = _ring_moments(ring)
    return abs(a2) / 2.0


def _point_in_ring(pt: Coord, ring: list[Coord]) -> int:
    """1 = strictly inside, 0 = on boundary, -1 = outside."""
    x, y = pt
    arr = np.asarray(ring)
    x1, y1 = arr[:-1, 0], arr[:-1, 1]
    x2, y2 = arr[1:, 0], arr[1:, 1]
    cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
    on = (
        (cross == 0)
        & (np.minimum(x1, x2) <= x)
        & (x <= np.maximum(x1, x2))
        & (np.minimum(y1, y2) <= y)
        & (y <= np.maximum(y1, y2))
    )
    if on.any():
        return 0
    cond = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    inside = ((cond) & (x < xint)).sum() % 2 == 1
    return 1 if inside else -1


def _ring_contains_ring(outer: list[Coord], inner: list[Coord]) -> bool:
    """JTS-contains approximation: every inner vertex inside-or-on, at
    least one strictly inside."""
    results = [_point_in_ring(p, outer) for p in inner[:-1]]
    if any(r == -1 for r in results):
        return False
    return any(r == 1 for r in results)


# polygon = (shell, [holes...]) throughout the repair stage
_Poly = tuple[list[Coord], list[list[Coord]]]


def _ring_bbox(ring: list[Coord]) -> tuple[float, float, float, float]:
    arr = np.asarray(ring)
    return arr[:, 0].min(), arr[:, 1].min(), arr[:, 0].max(), arr[:, 1].max()


def _bboxes_disjoint(a: list[Coord], b: list[Coord]) -> bool:
    ax0, ay0, ax1, ay1 = _ring_bbox(a)
    bx0, by0, bx1, by1 = _ring_bbox(b)
    return ax0 > bx1 or bx0 > ax1 or ay0 > by1 or by0 > ay1


def _envelope_may_touch(inner: list[Coord], outer: list[Coord]) -> bool:
    """Conservative stand-in for JTS ``inner.getEnvelope().intersects(outer)``
    — true iff any outer edge's bbox overlaps the inner ring's bbox (no
    false negatives; the exact test follows only when this passes)."""
    ix0, iy0, ix1, iy1 = _ring_bbox(inner)
    arr = np.asarray(outer)
    x1, y1 = arr[:-1, 0], arr[:-1, 1]
    x2, y2 = arr[1:, 0], arr[1:, 1]
    hit = (
        (np.minimum(x1, x2) <= ix1)
        & (np.maximum(x1, x2) >= ix0)
        & (np.minimum(y1, y2) <= iy1)
        & (np.maximum(y1, y2) >= iy0)
    )
    return bool(hit.any())


def _poly_verts(poly: _Poly) -> set:
    return {_dedup_key(p) for ring in [poly[0]] + list(poly[1]) for p in ring}


def _poly_contains(outer: _Poly, inner: _Poly) -> bool:
    """JTS ``Polygon.contains`` approximation on the repair polygons."""
    if not _ring_contains_ring(outer[0], _closed_ring(inner[0])):
        return False
    probe = inner[0][0]
    for hole in outer[1]:
        if _point_in_ring(probe, _closed_ring(hole)) > 0:
            return False
    return True


def _closed_ring(ring: list[Coord]) -> list[Coord]:
    return ring if ring[0] == ring[-1] else list(ring) + [ring[0]]


def _difference(a: _Poly, bs: list[_Poly]) -> list[_Poly]:
    try:
        return polygon_difference(a, bs)
    except OverlayError as exc:
        raise MultipolygonError(f"multipolygon difference failed: {exc}") from exc


def _handle_intersecting(polys: list[_Poly], merge_touching: bool) -> bool:
    """Port of ``handleIntersectingAndTouchingPolygons`` (GeometryBuilder.java
    :113-159): pairwise boundary classification of exterior rings —

    - intersection coordinates not all common nodes → "Touching polygons
      without common node" (single point) / "Overlapping polygons" (points);
    - point touches mark enclosed areas (caller switches to n-ary
      difference);
    - multi-point touches with interior overlap → both replaced by their
      mutual differences (each must stay a single polygon);
    - line touches → union (inner rings, ``mergeTouching``) or
      "Overlapping outer rings" (outer rings).

    Mutates ``polys`` in place like the Java list; returns
    ``formsEnclosedAreas``.
    """
    forms_enclosed = False
    i = 0
    while i < len(polys):
        j = i + 1
        while j < len(polys):
            pa, pb = polys[i], polys[j]
            ra, rb = _closed_ring(pa[0]), _closed_ring(pb[0])
            if _bboxes_disjoint(ra, rb):
                j += 1
                continue
            pts, chains, all_coords = boundary_intersection(ra, rb)
            if not pts and not chains:
                j += 1
                continue
            single_point = len(pts) == 1 and not chains
            multi_point = len(pts) > 1 and not chains
            va, vb = _poly_verts(pa), _poly_verts(pb)
            if any(_dedup_key(c) not in va or _dedup_key(c) not in vb for c in all_coords):
                if single_point:
                    raise MultipolygonError("Touching polygons without common node")
                if multi_point:
                    raise MultipolygonError("Overlapping polygons")
            if single_point:
                forms_enclosed = True
            elif multi_point:
                forms_enclosed = True
                if interiors_overlap(pa, pb):
                    da = _difference(pa, [pb])
                    db = _difference(pb, [pa])
                    if len(da) != 1 or len(db) != 1:
                        raise MultipolygonError(
                            "Unexpected result of multipolygon subtraction"
                        )
                    polys[i], polys[j] = da[0], db[0]
            elif not pts:
                # pure line intersection; mixed point+line (JTS
                # GeometryCollection) matches no branch and is left alone
                if merge_touching:
                    try:
                        u = polygon_union(pa, pb)
                    except OverlayError as exc:
                        raise MultipolygonError(f"union failed: {exc}") from exc
                    if len(u) != 1:
                        raise MultipolygonError("Unexpected union result")
                    polys[i] = u[0]
                    del polys[j]
                    continue  # re-examine the element shifted into j
                raise MultipolygonError("Overlapping outer rings")
            j += 1
        i += 1
    return forms_enclosed


def build_multipolygon(
    outer_ways: list[list[Coord]], inner_ways: list[list[Coord]], legacy: bool = False
) -> dict:
    """outer/inner member-way coordinate lists → MultiPolygon geometry dict.

    Mirrors ``GeometryBuilder.buildMultiPolygon`` (GeometryBuilder.java
    :25-111) including the repair paths. Raises :class:`MultipolygonError`
    for unbuildable inputs (parity failures, overlapping rings without
    common nodes, invalid polygons) — callers map that to the reference's
    empty-multipolygon fallback.
    """
    merged = list(outer_ways) + list(inner_ways)
    rings = _rings(merged, legacy=legacy)
    for ring in rings:
        if not ring_is_simple(ring):
            raise MultipolygonError("Invalid polygon")

    # nest by containment, largest-first (roles intentionally ignored)
    rings.sort(key=_ring_area_planar, reverse=True)
    is_inner = [False] * len(rings)
    owner: list[int | None] = [None] * len(rings)
    for i, ring in enumerate(rings):
        for j in range(i - 1, -1, -1):
            if _ring_contains_ring(rings[j], ring):
                if not is_inner[j]:
                    is_inner[i] = True
                    owner[i] = j
                break

    outer_idx = [i for i in range(len(rings)) if not is_inner[i]]
    outer_polys: list[_Poly] = [(rings[i], []) for i in outer_idx]
    inners_of: list[list[_Poly]] = [
        [(rings[k], []) for k in range(len(rings)) if is_inner[k] and owner[k] == oi]
        for oi in outer_idx
    ]

    # repair overlapping outers (GeometryBuilder.java:53-68)
    originals = list(outer_polys)
    if _handle_intersecting(outer_polys, merge_touching=False):
        for k in range(len(originals)):
            if outer_polys[k] is originals[k]:
                continue
            for inner in inners_of[k]:
                if not _poly_contains(outer_polys[k], inner):
                    raise MultipolygonError(
                        "Overlapping outer rings with an inner ring at intersection"
                    )

    # main loop (GeometryBuilder.java:70-109), worklist instead of map
    work: list[tuple[_Poly, list[_Poly]]] = list(zip(outer_polys, inners_of))
    result: list[_Poly] = []
    while work:
        outer, inners = work.pop(0)
        if _handle_intersecting(inners, merge_touching=True):
            # point-touching inners enclose areas: subtract them all at once
            result.extend(_difference(outer, inners))
            continue
        hole_rings = list(outer[1])
        restart = False
        i = 0
        while i < len(inners):
            inner = inners[i]
            ir, orr = _closed_ring(inner[0]), _closed_ring(outer[0])
            pts: list[Coord] = []
            chains: list = []
            if _envelope_may_touch(ir, orr):
                pts, chains, _ = boundary_intersection(ir, orr)
            if (pts or chains) and not (len(pts) == 1 and not chains):
                # inner touches the outer boundary in more than a point:
                # subtract it; extra pieces become new outers that steal
                # the inners they contain, piece 0 keeps the rest
                del inners[i]
                pieces = _difference(outer, [inner])
                if not pieces:
                    raise MultipolygonError("inner ring consumed the outer")
                for piece in pieces[1:]:
                    stolen: list[_Poly] = []
                    k = 0
                    while k < len(inners):
                        if _poly_contains(piece, inners[k]):
                            stolen.append(inners.pop(k))
                        else:
                            k += 1
                    work.append((piece, stolen))
                work.append((pieces[0], inners))
                restart = True
                break
            hole_rings.append(inner[0])
            i += 1
        if restart:
            continue
        result.append((outer[0], hole_rings))

    return {
        "type": "MultiPolygon",
        "coords": [[shell] + list(holes) for shell, holes in result],
    }
