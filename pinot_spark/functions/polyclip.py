"""Boolean polygon clipping: union / intersection of simple polygons.

Greiner & Hormann, "Efficient clipping of arbitrary polygons" (ACM TOG
1998) — a public algorithm: insert the pairwise edge-intersection points
into both polygons' circular vertex rings, mark each as entry or exit
w.r.t. the other polygon, then trace result contours switching rings at
every intersection (entry → walk forward, exit → walk backward for
intersection; roles swap for union).

Scope and honesty boundary (backing ST_Union of OVERLAPPING polygons in
functions/scalar.py):

- simple polygons (no self-intersections), holes in INPUTS unsupported;
  union OUTPUT may legitimately contain holes — those are returned as
  additional rings (caller emits them as polygon holes).
- DEGENERATE configurations — a vertex of one polygon exactly on an
  edge of the other, collinear overlapping edges, coincident vertices —
  raise ``DegenerateGeometry`` (a NotImplementedError): real-valued
  data essentially never hits exact degeneracy, and a loud error beats
  the silently-wrong output epsilon-perturbation schemes produce.
  Since round 13 this is a ROUTING signal, not a user-facing boundary:
  ``scalar.st_union_wkt`` catches it and falls back to the
  exact-rational planar overlay in ``functions/pinot_geometry.py``
  (validated against the reference GeoSpatialTest STUnion byte golden),
  keeping this fast float path for the common non-degenerate case.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class DegenerateGeometry(NotImplementedError):
    pass


_EPS = 1e-12


@dataclass
class _V:
    x: float
    y: float
    nxt: "_V | None" = None
    prv: "_V | None" = None
    neighbor: "_V | None" = None
    is_intersection: bool = False
    entry: bool = False
    visited: bool = False
    alpha: float = field(default=0.0)


def _ring(points) -> _V:
    """Doubly-linked circular list from [(x, y)] (closing dup dropped)."""
    pts = list(points)
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) < 3:
        raise DegenerateGeometry("polygon needs >= 3 distinct vertices")
    verts = [_V(x, y) for x, y in pts]
    for i, v in enumerate(verts):
        v.nxt = verts[(i + 1) % len(verts)]
        v.prv = verts[(i - 1) % len(verts)]
    return verts[0]


def _vertices(head: _V):
    v = head
    while True:
        yield v
        v = v.nxt
        if v is head:
            break


def _edges(head: _V):
    for v in _vertices(head):
        if not v.is_intersection:
            # edge from this source vertex to the next SOURCE vertex
            w = v.nxt
            while w.is_intersection:
                w = w.nxt
            yield v, w


def _intersect(p1: _V, p2: _V, q1: _V, q2: _V):
    """Proper intersection of segments p1p2 and q1q2 → (alphaP, alphaQ)
    or None; touching/collinear → DegenerateGeometry."""
    dpx, dpy = p2.x - p1.x, p2.y - p1.y
    dqx, dqy = q2.x - q1.x, q2.y - q1.y
    denom = dpx * dqy - dpy * dqx
    wx, wy = p1.x - q1.x, p1.y - q1.y
    if abs(denom) < _EPS:
        # parallel: overlapping collinear segments are degenerate
        if abs(dpx * wy - dpy * wx) < _EPS:
            # collinear — overlap check via projections
            def t(px, py):
                return ((px - p1.x) * dpx + (py - p1.y) * dpy) / max(
                    dpx * dpx + dpy * dpy, _EPS
                )

            t1, t2 = t(q1.x, q1.y), t(q2.x, q2.y)
            if max(min(t1, t2), 0.0) <= min(max(t1, t2), 1.0):
                raise DegenerateGeometry("collinear overlapping edges")
        return None
    ta = (dqx * wy - dqy * wx) / denom
    tb = (dpx * wy - dpy * wx) / denom
    if -_EPS < ta < _EPS or 1 - _EPS < ta < 1 + _EPS or -_EPS < tb < _EPS or 1 - _EPS < tb < 1 + _EPS:
        if 0 <= ta <= 1 and 0 <= tb <= 1:
            raise DegenerateGeometry("intersection at a vertex / edge endpoint")
        return None
    if 0 < ta < 1 and 0 < tb < 1:
        return ta, tb
    return None


def _point_in(x: float, y: float, head: _V) -> bool:
    inside = False
    for a, b in _edges(head):
        if (a.y > y) != (b.y > y):
            xint = a.x + (y - a.y) * (b.x - a.x) / (b.y - a.y)
            if abs(x - xint) < _EPS:
                raise DegenerateGeometry("query point on polygon boundary")
            if x < xint:
                inside = not inside
    return inside


def _insert_sorted(start: _V, end_source: _V, node: _V) -> None:
    """Insert intersection ``node`` between source vertices keeping
    alpha order among intersections on the same edge."""
    cur = start
    while cur.nxt is not end_source and cur.nxt.is_intersection and cur.nxt.alpha < node.alpha:
        cur = cur.nxt
    node.nxt = cur.nxt
    node.prv = cur
    cur.nxt.prv = node
    cur.nxt = node


def _build(subject_pts, clip_pts):
    s_head, c_head = _ring(subject_pts), _ring(clip_pts)
    found = False
    for sv, sw in list(_edges(s_head)):
        for cv, cw in list(_edges(c_head)):
            r = _intersect(sv, sw, cv, cw)
            if r is None:
                continue
            ta, tb = r
            x = sv.x + ta * (sw.x - sv.x)
            y = sv.y + ta * (sw.y - sv.y)
            a = _V(x, y, is_intersection=True, alpha=ta)
            b = _V(x, y, is_intersection=True, alpha=tb)
            a.neighbor, b.neighbor = b, a
            _insert_sorted(sv, sw, a)
            _insert_sorted(cv, cw, b)
            found = True
    return s_head, c_head, found


def _mark_entries(head: _V, other: _V, for_union: bool) -> None:
    start = next(v for v in _vertices(head) if not v.is_intersection)
    status = _point_in(start.x, start.y, other)  # True → next crossing exits
    entry = not status
    if for_union:
        entry = not entry
    for v in _vertices(head):
        if v.is_intersection:
            v.entry = entry
            entry = not entry


def _trace(s_head: _V, operation: str) -> list[list[tuple[float, float]]]:
    results = []
    while True:
        start = next(
            (v for v in _vertices(s_head) if v.is_intersection and not v.visited), None
        )
        if start is None:
            break
        ring: list[tuple[float, float]] = []
        cur = start
        while True:
            cur.visited = True
            if cur.neighbor:
                cur.neighbor.visited = True
            forward = cur.entry
            while True:
                ring.append((cur.x, cur.y))
                cur = cur.nxt if forward else cur.prv
                if cur.is_intersection:
                    break
                if len(ring) > 100_000:
                    raise DegenerateGeometry("runaway trace")
            cur = cur.neighbor
            if cur is start or cur.neighbor is start:
                break
            if len(results) > 10_000:
                raise DegenerateGeometry("runaway result")
        results.append(ring)
    return results


def _area(ring) -> float:
    s = 0.0
    for i in range(len(ring)):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % len(ring)]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def clip(subject, clip_poly, operation: str):
    """Boolean op on two simple rings ([(x, y)]): operation ∈
    {"union", "intersection"} → list of result rings (positive-area
    outers first; union may append negative-area hole rings)."""
    if operation not in ("union", "intersection"):
        raise ValueError(operation)
    s_head, c_head, crossed = _build(subject, clip_poly)
    if not crossed:
        sx, sy = next(iter(_vertices(s_head))).x, next(iter(_vertices(s_head))).y
        cx, cy = next(iter(_vertices(c_head))).x, next(iter(_vertices(c_head))).y
        s_in_c = _point_in(sx, sy, c_head)
        c_in_s = _point_in(cx, cy, s_head)
        subj = [(v.x, v.y) for v in _vertices(s_head)]
        clp = [(v.x, v.y) for v in _vertices(c_head)]
        if operation == "intersection":
            return [subj] if s_in_c else [clp] if c_in_s else []
        if s_in_c:
            return [clp]
        if c_in_s:
            return [subj]
        return [subj, clp]  # disjoint union → two outers
    for_union = operation == "union"
    _mark_entries(s_head, c_head, for_union)
    _mark_entries(c_head, s_head, for_union)
    rings = _trace(s_head, operation)
    # orient: outers CCW-positive first, holes (union of concave shapes
    # can enclose voids) after
    rings.sort(key=lambda r: -abs(_area(r)))
    return rings
