"""Geometry repair (make_valid) without GEOS — node-and-split + face
tracing + even-odd classification.

Reference: gdal_boots/geometry.py:166-193 — CloseRings + GEOS MakeValid;
when the result is a collection, only polygonal parts are kept and the
result is re-cast (geometry.py:172-191).  Goldens:
tests/test_geometry.py:184-635 (bowtie -> MultiPolygon, self-touching
ring -> polygon-with-hole, nested invalid multipolygon).

Algorithm (the standard arrangement approach, scoped per SURVEY §7 to
even-odd self-intersection repair — full OGC validity is out of scope):

1. close rings; collect every ring segment;
2. node: split all segments at pairwise intersections (inc. collinear
   overlap endpoints), snap vertices to a 1e-9 grid;
3. build the planar arrangement (half-edges, angle-sorted around each
   vertex) and trace faces (next = clockwise-most turn);
4. classify each bounded face by even-odd ray parity of an interior
   point against the ORIGINAL rings: odd = filled;
5. filled faces become shells; bounded even faces directly enclosed by
   a shell become its holes; walks through pinch vertices are split
   into shell + hole rings.
"""

from __future__ import annotations

import math

import numpy as np

from .packed import GTYPE_IDS, PackedGeometry, from_geojson, to_geojson
from .pip import points_in_polygon

_SNAP = 1e-9


def _key(x: float, y: float):
    return (round(x / _SNAP) * _SNAP, round(y / _SNAP) * _SNAP)


def _seg_intersections(segs: np.ndarray) -> list[list[float]]:
    """For each segment, the sorted list of parameters t where another
    segment crosses/touches it (0 < t < 1 interior splits)."""
    n = len(segs)
    ts: list[list[float]] = [[] for _ in range(n)]
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    for i in range(n):
        dxi, dyi = x2[i] - x1[i], y2[i] - y1[i]
        # vectorized over all j > i
        j = np.arange(i + 1, n)
        if len(j) == 0:
            continue
        dxj, dyj = x2[j] - x1[j], y2[j] - y1[j]
        denom = dxi * dyj - dyi * dxj
        wx, wy = x1[j] - x1[i], y1[j] - y1[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (wx * dyj - wy * dxj) / denom
            u = (wx * dyi - wy * dxi) / denom
        ok = (np.abs(denom) > 1e-15) & (t > -1e-12) & (t < 1 + 1e-12) & (u > -1e-12) & (u < 1 + 1e-12)
        for jj, tt, uu in zip(j[ok], t[ok], u[ok]):
            if 1e-12 < tt < 1 - 1e-12:
                ts[i].append(float(tt))
            if 1e-12 < uu < 1 - 1e-12:
                ts[int(jj)].append(float(uu))
    return ts


def _ring_segments(pg: PackedGeometry) -> np.ndarray:
    c = pg.coords.reshape(-1, 2)
    out = []
    ro = pg.ring_offsets
    for r in range(len(ro) - 1):
        lo, hi = int(ro[r]), int(ro[r + 1])
        if hi - lo < 2:
            continue
        ring = c[lo:hi]
        if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
            ring = np.vstack([ring, ring[:1]])  # CloseRings
        for k in range(len(ring) - 1):
            if ring[k, 0] != ring[k + 1, 0] or ring[k, 1] != ring[k + 1, 1]:
                out.append([ring[k, 0], ring[k, 1], ring[k + 1, 0], ring[k + 1, 1]])
    return np.asarray(out, dtype=np.float64)


def _ring_area(ring: list[tuple[float, float]]) -> float:
    a = 0.0
    for i in range(len(ring) - 1):
        a += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return a / 2.0


def _interior_point(ring: list[tuple[float, float]]):
    """A point strictly inside a simple ring: midpoint of the widest
    even-odd span on a horizontal scanline through the ring interior."""
    ys = sorted({p[1] for p in ring})
    best = None
    for k in range(len(ys) - 1):
        ymid = (ys[k] + ys[k + 1]) / 2.0
        xs = []
        for i in range(len(ring) - 1):
            (ax, ay), (bx, by) = ring[i], ring[i + 1]
            if (ay > ymid) != (by > ymid):
                xs.append(ax + (ymid - ay) * (bx - ax) / (by - ay))
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            if xs[i + 1] - xs[i] > 1e-12:
                cand = ((xs[i] + xs[i + 1]) / 2.0, ymid, xs[i + 1] - xs[i])
                if best is None or cand[2] > best[2]:
                    best = cand
    return (best[0], best[1]) if best else None


def _split_pinched(walk: list[tuple[float, float]]) -> list[list[tuple[float, float]]]:
    """Split a closed walk that revisits vertices into simple rings."""
    rings = []
    stack: list[tuple[float, float]] = []
    seen: dict[tuple[float, float], int] = {}
    for p in walk[:-1]:
        if p in seen:
            i = seen[p]
            sub = stack[i:] + [p]
            if len(sub) >= 4:
                rings.append(sub)
            for q in stack[i:]:
                seen.pop(q, None)
            stack = stack[:i]
        seen[p] = len(stack)
        stack.append(p)
    if len(stack) >= 3:
        rings.append(stack + [stack[0]])
    return rings


def make_valid_packed(pg: PackedGeometry) -> PackedGeometry:
    """Repair a Polygon/MultiPolygon by arrangement + even-odd parity."""
    if pg.gtype not in (GTYPE_IDS["Polygon"], GTYPE_IDS["MultiPolygon"]):
        return pg
    segs = _ring_segments(pg)
    if len(segs) == 0:
        return pg

    # --- node ---
    ts = _seg_intersections(segs)
    edges: set[tuple] = set()
    for i, (x1, y1, x2, y2) in enumerate(segs):
        params = sorted({0.0, 1.0, *ts[i]})
        pts = [_key(x1 + t * (x2 - x1), y1 + t * (y2 - y1)) for t in params]
        for a, b in zip(pts[:-1], pts[1:]):
            if a != b:
                edges.add((a, b) if a <= b else (b, a))

    # --- arrangement: angle-sorted outgoing half-edges per vertex ---
    out_edges: dict[tuple, list[tuple]] = {}
    for a, b in edges:
        out_edges.setdefault(a, []).append(b)
        out_edges.setdefault(b, []).append(a)
    ang = {}
    for v, nbrs in out_edges.items():
        nbrs.sort(key=lambda w: math.atan2(w[1] - v[1], w[0] - v[0]))
        for w in nbrs:
            ang[(v, w)] = math.atan2(w[1] - v[1], w[0] - v[0])

    def next_half_edge(u, v):
        """Arriving u->v: leave v by the next edge clockwise from v->u
        (traces faces to the LEFT of the walk)."""
        nbrs = out_edges[v]
        back = math.atan2(u[1] - v[1], u[0] - v[0])
        best, bestd = None, None
        for w in nbrs:
            a = ang[(v, w)]
            d = (back - a) % (2 * math.pi)
            if d < 1e-14:
                d = 2 * math.pi
            if bestd is None or d < bestd:
                best, bestd = w, d
        return v, best

    used: set[tuple] = set()
    faces: list[list[tuple[float, float]]] = []
    for a, b in list(edges):
        for (u0, v0) in ((a, b), (b, a)):
            if (u0, v0) in used:
                continue
            walk = [u0]
            u, v = u0, v0
            while True:
                used.add((u, v))
                walk.append(v)
                u, v = next_half_edge(u, v)
                if (u, v) == (u0, v0):
                    break
            faces.append(walk)

    # --- classify bounded faces ---
    filled, voids = [], []
    for walk in faces:
        if _ring_area(walk) <= 1e-18:  # unbounded face traces clockwise
            continue
        rings = _split_pinched(walk)
        if not rings:
            continue
        shell = max(rings, key=lambda r: abs(_ring_area(r)))
        ip = _interior_point(shell)
        if ip is None:
            continue
        inner = [r for r in rings if r is not shell]
        parity = bool(
            points_in_polygon(np.array([ip[0]]), np.array([ip[1]]), pg.coords, pg.ring_offsets)[0]
        )
        rec = {"shell": shell, "holes": inner, "ip": ip}
        (filled if parity else voids).append(rec)

    # even bounded faces directly inside a filled shell become holes —
    # unless that region is already a hole (pinched walks split above
    # yield the hole ring directly, and the void face would repeat it)
    def _inside(pt, ring):
        arr = np.asarray(ring, dtype=np.float64).ravel()
        ro = np.asarray([0, len(ring)], dtype=np.int32)
        return bool(points_in_polygon(np.array([pt[0]]), np.array([pt[1]]), arr, ro)[0])

    for v_ in voids:
        for f in filled:
            if _inside(v_["ip"], f["shell"]):
                if not any(_inside(v_["ip"], h) for h in f["holes"]):
                    f["holes"].append(v_["shell"])
                break

    if not filled:
        return pg
    polys = []
    for f in filled:
        rings = [[list(p) for p in f["shell"]]]
        for h in f["holes"]:
            rings.append([list(p) for p in h])
        polys.append(rings)
    gj = (
        {"type": "Polygon", "coordinates": polys[0]}
        if len(polys) == 1
        else {"type": "MultiPolygon", "coordinates": polys}
    )
    return from_geojson(gj)


def make_valid_geojson(geometry, precision: int = 15) -> dict:
    """dict/str GeoJSON in -> repaired GeoJSON dict (reference
    make_valid_geojson, geometry.py:160-163)."""
    return to_geojson(make_valid_packed(from_geojson(geometry)), precision=precision)
