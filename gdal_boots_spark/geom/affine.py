"""6-coefficient affine georeferencing math (pure NumPy, batch).

The transform is GDAL/affine-style ``(a, b, c, d, e, f)`` mapping pixel
(col, row) -> world (x, y):

    x = a*col + b*row + c
    y = d*col + e*row + f

Reference: gdal_boots/gdal.py:123 stores ``affine.Affine``; world->pixel
uses gdal.InvGeoTransform + ApplyGeoTransform + floor
(gdal.py:904,919-921); snap-to-grid semantics from fast_warp_as_array
(gdal.py:769-777).

Note on coefficient order: ``affine.Affine(a, b, c, d, e, f)`` is the
row-major 2x3 matrix; GDAL's GetGeoTransform tuple is ``(c, a, b, f, d,
e)``.  We store the affine (row-major) order everywhere, matching the
reference's use of ``Affine.from_gdal`` (gdal.py:165).
"""

from __future__ import annotations

import math

import numpy as np


def apply_transform(t, col, row):
    """Pixel -> world. `col`/`row` may be scalars or arrays."""
    a, b, c, d, e, f = (float(v) for v in t)
    col = np.asarray(col, dtype=np.float64)
    row = np.asarray(row, dtype=np.float64)
    return a * col + b * row + c, d * col + e * row + f


def invert_transform(t):
    """Inverse affine (world -> pixel), same 6-tuple layout."""
    a, b, c, d, e, f = (float(v) for v in t)
    det = a * e - b * d
    if det == 0:
        raise ValueError("singular transform")
    ia = e / det
    ib = -b / det
    id_ = -d / det
    ie = a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    return (ia, ib, ic, id_, ie, if_)


def pixel_of(t, x, y):
    """World -> integer pixel (col, row) with floor — exactly the
    reference's values_by_points mapping (gdal.py:919-921)."""
    ia, ib, ic, id_, ie, if_ = invert_transform(t)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    col = np.floor(ia * x + ib * y + ic).astype(np.int64)
    row = np.floor(id_ * x + ie * y + if_).astype(np.int64)
    return col, row


def transform_from_bounds(minx, miny, maxx, maxy, width, height):
    """Axis-aligned north-up transform covering the bbox — reference
    set_bounds (gdal.py:364-377): resolution = extent / size, origin at
    top-left (minx, maxy), negative y pixel size."""
    rx = (maxx - minx) / float(width)
    ry = (maxy - miny) / float(height)
    return (rx, 0.0, float(minx), 0.0, -ry, float(maxy))


def bounds_from_transform(t, width, height):
    """Envelope of a north-up-or-rotated raster — reference bounds
    (gdal.py:301-342): corners of the pixel grid through the affine."""
    cols = np.array([0, width, 0, width], dtype=np.float64)
    rows = np.array([0, 0, height, height], dtype=np.float64)
    xs, ys = apply_transform(t, cols, rows)
    return (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))


def snap_bbox_to_grid(t, minx, miny, maxx, maxy):
    """Snap a world bbox outward to the pixel grid of transform `t` and
    return ``(col0, row0, col1, row1, sminx, sminy, smaxx, smaxy)``.

    Matches fast_warp_as_array (gdal.py:769-777): floor the min corner
    to the grid, ceil the max corner, y-axis flipped (row 0 at maxy).
    Pixel window is [col0, col1) x [row0, row1).
    """
    a, b, c, d, e, f = (float(v) for v in t)
    if b != 0 or d != 0:
        raise ValueError("snap requires an axis-aligned transform")
    rx, ry = a, -e  # ry > 0 for north-up
    col0 = math.floor((minx - c) / rx)
    col1 = math.ceil((maxx - c) / rx)
    row0 = math.floor((f - maxy) / ry)
    row1 = math.ceil((f - miny) / ry)
    sminx = c + col0 * rx
    smaxx = c + col1 * rx
    smaxy = f - row0 * ry
    sminy = f - row1 * ry
    return col0, row0, col1, row1, sminx, sminy, smaxx, smaxy
