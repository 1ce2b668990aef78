"""Hierarchical quad cell index over lon/lat (H3/S2-style, pure NumPy).

The engine-only index the north rule requires (SURVEY.md §2.9).  A cell
at resolution ``res`` is one square of the 2^res x 2^res grid over the
lon/lat plane ([-180,180] x [-90,90]).  Cell ids are 64-bit, arithmetic
(not bit-interleaved) so the *same id* is computable in ANSI SQL for
the DuckDB oracle:

    ix = floor((lon + 180) / 360 * 2^res)   clamped to [0, 2^res-1]
    iy = floor((lat +  90) / 180 * 2^res)   clamped to [0, 2^res-1]
    cell_id = res * 2^58 + ix * 2^29 + iy       (res <= 28)

Deterministic, versioned (v1): ids appear in persisted outputs
(tile-to-cell assignments) and must stay stable across releases.

``ring(cell, k)`` gives the Chebyshev-distance-k neighbourhood used by
the grid-pruned kNN expansion; ix wraps across the antimeridian, iy
clamps at the poles.
"""

from __future__ import annotations

import numpy as np

CELL_RES_BITS = 58
_IX_SHIFT = 2**29
_RES_SHIFT = 2**58
MAX_RES = 28


def _grid(lon, lat, res: int):
    n = 1 << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    return ix, iy


def cell_id(lon, lat, res: int):
    """lon/lat arrays -> int64 cell ids at resolution `res`."""
    if not (0 <= res <= MAX_RES):
        raise ValueError(f"res must be in [0,{MAX_RES}]")
    ix, iy = _grid(lon, lat, res)
    return np.int64(res) * _RES_SHIFT + ix * _IX_SHIFT + iy


def compose(res, ix, iy):
    return np.int64(res) * _RES_SHIFT + np.asarray(ix, np.int64) * _IX_SHIFT + np.asarray(iy, np.int64)


def cell_decode(cid):
    """int64 cell ids -> (res, ix, iy) arrays."""
    cid = np.asarray(cid, dtype=np.int64)
    res = cid // _RES_SHIFT
    rem = cid - res * _RES_SHIFT
    ix = rem // _IX_SHIFT
    iy = rem - ix * _IX_SHIFT
    return res.astype(np.int64), ix, iy


def cell_bounds(cid):
    """Cell ids -> (minlon, minlat, maxlon, maxlat) arrays."""
    res, ix, iy = cell_decode(cid)
    n = np.power(2.0, res.astype(np.float64))
    w, h = 360.0 / n, 180.0 / n
    minlon = -180.0 + ix * w
    minlat = -90.0 + iy * h
    return minlon, minlat, minlon + w, minlat + h


def cover_bbox(minx, miny, maxx, maxy, res: int) -> np.ndarray:
    """All cell ids at `res` whose boxes intersect the bbox (inclusive).

    This is the safe (no-false-negative) covering used as the join
    pre-filter; exact refinement happens in the PIP kernel.
    """
    ix0, iy0 = _grid(minx, miny, res)
    ix1, iy1 = _grid(maxx, maxy, res)
    ixs = np.arange(int(ix0), int(ix1) + 1, dtype=np.int64)
    iys = np.arange(int(iy0), int(iy1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(ixs, iys, indexing="ij")
    return compose(res, gx.ravel(), gy.ravel())


def pick_res(minx, miny, maxx, maxy, max_cells: int = 64) -> int:
    """Coarsest-enough resolution so the bbox cover has <= max_cells
    cells — the per-geometry heuristic of SURVEY.md §4 item 1."""
    for res in range(MAX_RES, -1, -1):
        n = 1 << res
        cw, ch = 360.0 / n, 180.0 / n
        est = (int((maxx - minx) / cw) + 2) * (int((maxy - miny) / ch) + 2)
        if est <= max_cells:
            return res
    return 0


def cover_geometry(pg, res: int) -> np.ndarray:
    """Bbox cover of a PackedGeometry (safe superset)."""
    from .packed import bounds

    minx, miny, maxx, maxy = bounds(pg)
    if np.isnan(minx):
        return np.empty(0, dtype=np.int64)
    return cover_bbox(minx, miny, maxx, maxy, res)


def ring(cid: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of `cid` (the (2k+1)^2
    block), ix wrapped mod 2^res, iy clamped — kNN ring expansion."""
    res, ix, iy = cell_decode(np.asarray([cid]))
    res, ix, iy = int(res[0]), int(ix[0]), int(iy[0])
    n = 1 << res
    dxs = np.arange(-k, k + 1, dtype=np.int64)
    gx, gy = np.meshgrid((ix + dxs) % n, iy + dxs, indexing="ij")
    keep = (gy >= 0) & (gy < n)
    return compose(res, gx[keep], gy[keep])
