"""Polygonize kernels: connected components + exact boundary tracing.

Reference: ``RasterDataset.to_vector`` (gdal.py:609-623) wraps
gdal.Polygonize — connected regions (4-connectivity) of equal pixel
value become polygons.  This module provides the per-tile NumPy pieces;
the distributed stitch lives in operators/polygonize.py.

Geometry model: pixel (r, c) is the unit square [c, c+1] x [r, r+1] in
grid corner coordinates.  A component's polygon boundary is the set of
unit edges between a component pixel and a different-valued neighbour
(or the outside).  Edges are DIRECTED interior-on-the-left, so tracing
successor edges yields shells and holes with opposite orientations, and
cross-tile merging is pure edge-set union (shared tile-border edges of
the same component appear twice with opposite directions and cancel).
"""

from __future__ import annotations

import numpy as np


def label_components(arr: np.ndarray, exclude=None) -> tuple[np.ndarray, int]:
    """4-connected labeling of equal-valued regions.  Pixels equal to
    `exclude` get label 0.  Returns (labels int32 (h,w), n_labels)."""
    h, w = arr.shape
    labels = np.zeros((h, w), dtype=np.int32)
    valid = np.ones((h, w), dtype=bool) if exclude is None else (arr != exclude)
    # union-find over pixel indices, vectorized merge passes
    parent = np.arange(h * w, dtype=np.int64)

    def find(idx):
        idx = np.asarray(idx)
        while True:
            p = parent[idx]
            pp = parent[p]
            done = (p == pp).all()
            parent[idx] = pp
            idx = pp
            if done:
                return parent[idx]

    # horizontal merges
    same_h = valid[:, 1:] & valid[:, :-1] & (arr[:, 1:] == arr[:, :-1])
    a = (np.arange(h)[:, None] * w + np.arange(w - 1)[None, :])[same_h]
    b = a + 1
    # vertical merges
    same_v = valid[1:, :] & valid[:-1, :] & (arr[1:, :] == arr[:-1, :])
    c = (np.arange(h - 1)[:, None] * w + np.arange(w)[None, :])[same_v]
    d = c + w
    pairs = np.concatenate([np.stack([a, b], 1), np.stack([c, d], 1)]) if len(a) + len(c) else np.empty((0, 2), np.int64)
    # iterate unions until stable (log passes)
    for _ in range(64):
        if len(pairs) == 0:
            break
        ra, rb = find(pairs[:, 0]), find(pairs[:, 1])
        diff = ra != rb
        if not diff.any():
            break
        lo = np.minimum(ra[diff], rb[diff])
        hi = np.maximum(ra[diff], rb[diff])
        # attach hi -> lo; duplicates resolved by np.minimum reduce
        np.minimum.at(parent, hi, lo)

    roots = find(np.arange(h * w))
    roots[~valid.ravel()] = -1
    uniq, inv = np.unique(roots, return_inverse=True)
    lab = inv.reshape(h, w).astype(np.int32)
    if uniq.size and uniq[0] == -1:
        labels = lab  # label 0 = excluded
    else:
        labels = lab + 1  # no excluded pixels: labels start at 1
    return labels, int(labels.max())


def boundary_edges(labels: np.ndarray, label: int, r0: int = 0, c0: int = 0) -> np.ndarray:
    """Directed boundary edges of one component, interior-left, in
    GLOBAL corner coordinates (offset by r0/c0).

    Returns int64 array (n, 4): x1, y1, x2, y2  (x=col, y=row).
    Conventions (y grows downward):
      top    edge -> direction +x   (interior below)
      bottom edge -> direction -x
      left   edge -> direction -y (upward... interior right of -y walk)
      right  edge -> direction +y
    These make shells trace clockwise in (x, y-down) = CCW in world
    (north-up rasters flip y), and holes opposite.
    """
    m = labels == label
    h, w = m.shape
    up = np.zeros_like(m)
    up[1:, :] = m[:-1, :]
    down = np.zeros_like(m)
    down[:-1, :] = m[1:, :]
    left = np.zeros_like(m)
    left[:, 1:] = m[:, :-1]
    right = np.zeros_like(m)
    right[:, :-1] = m[:, 1:]

    es = []
    rr, cc = np.nonzero(m & ~up)  # top edges: (c, r) -> (c+1, r)
    es.append(np.stack([cc, rr, cc + 1, rr], 1))
    rr, cc = np.nonzero(m & ~down)  # bottom: (c+1, r+1) -> (c, r+1)
    es.append(np.stack([cc + 1, rr + 1, cc, rr + 1], 1))
    rr, cc = np.nonzero(m & ~left)  # left: (c, r+1) -> (c, r)
    es.append(np.stack([cc, rr + 1, cc, rr], 1))
    rr, cc = np.nonzero(m & ~right)  # right: (c+1, r) -> (c+1, r+1)
    es.append(np.stack([cc + 1, rr, cc + 1, rr + 1], 1))
    e = np.concatenate(es).astype(np.int64)
    e[:, 0] += c0
    e[:, 2] += c0
    e[:, 1] += r0
    e[:, 3] += r0
    return e


def cancel_paired_edges(edges: np.ndarray) -> np.ndarray:
    """Remove edge pairs that appear in both directions (internal
    tile-border seams after a cross-tile merge)."""
    if len(edges) == 0:
        return edges
    fwd = edges
    key = np.core.records.fromarrays(fwd.T, formats="i8,i8,i8,i8")
    rev = np.stack([edges[:, 2], edges[:, 3], edges[:, 0], edges[:, 1]], 1)
    rkey = np.core.records.fromarrays(rev.T, formats="i8,i8,i8,i8")
    kill = np.isin(key, rkey)
    return edges[~kill]


def trace_rings(edges: np.ndarray) -> list[np.ndarray]:
    """Assemble directed edges into closed rings.

    At degree>1 vertices, prefer the sharpest LEFT turn relative to the
    incoming direction — keeps 4-connected components that touch only
    diagonally as separate rings.  Collinear points are dropped.
    Returns list of (n, 2) int arrays (closed: first == last).
    """
    if len(edges) == 0:
        return []
    out_map: dict[tuple, list[int]] = {}
    for i, (x1, y1, *_rest) in enumerate(edges):
        out_map.setdefault((int(x1), int(y1)), []).append(i)
    used = np.zeros(len(edges), dtype=bool)
    rings = []
    # direction priority: for incoming dir d, try left turn, straight,
    # right turn, back
    LEFT = {(1, 0): (0, -1), (0, -1): (-1, 0), (-1, 0): (0, 1), (0, 1): (1, 0)}
    RIGHT = {v: k for k, v in LEFT.items()}
    for start in range(len(edges)):
        if used[start]:
            continue
        ring = [(int(edges[start, 0]), int(edges[start, 1]))]
        cur = start
        while True:
            used[cur] = True
            x1, y1, x2, y2 = (int(v) for v in edges[cur])
            ring.append((x2, y2))
            d = (x2 - x1, y2 - y1)
            cands = [i for i in out_map.get((x2, y2), []) if not used[i]]
            if not cands:
                break
            prefs = [LEFT[d], d, RIGHT[d]]

            def rank(i):
                dx = int(edges[i, 2] - edges[i, 0])
                dy = int(edges[i, 3] - edges[i, 1])
                dd = (dx, dy)
                return prefs.index(dd) if dd in prefs else 3

            cur = min(cands, key=rank)
        # drop collinear interior points
        pts = ring
        res = [pts[0]]
        for k in range(1, len(pts) - 1):
            ax, ay = res[-1]
            bx, by = pts[k]
            cx, cy = pts[k + 1]
            if (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) != 0:
                res.append(pts[k])
        res.append(pts[-1])
        if len(res) >= 4:
            rings.append(np.asarray(res, dtype=np.int64))
    return rings


def ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float((x[:-1] * y[1:] - x[1:] * y[:-1]).sum()) / 2.0
