"""Window slicing (fast_warp) and the shared regrid machinery.

``fast_warp`` (reference gdal.py:739-817) is the cheap read path: an
axis-aligned bbox in the native CRS snapped outward to the pixel grid,
then a pure slice — no resampling.  Goldens: test_raster.py:309-365
(exact output shapes and snapped bounds at 10/20/60 m).

Engine shape: the window is computed on the driver (snap_bbox_to_grid,
identical floor/ceil semantics), input tiles are pruned by a native
tile-range filter (the pushdown the reference lacks — Catalyst turns it
into parquet min/max pruning when tiles are read from disk), and output
tiles are assembled by a groupBy(out tile) applyInPandas paste.  An
input tile contributes to at most 4 output tiles when tile sizes match,
so shuffle volume is O(window bytes).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.affine import snap_bbox_to_grid
from ..sources.tiles import TILE_SCHEMA, RasterGrid


def window_of_bbox(grid: RasterGrid, bbox, clip: bool = False):
    """bbox (minx,miny,maxx,maxy world) -> (col0,row0,col1,row1) snapped
    outward to the pixel grid.  Reference validates the bbox lies inside
    the raster (gdal.py:749-757); `clip=True` instead intersects with
    the raster extent (the crop_by_geometry `actual_bounds` behavior,
    gdal.py:848-855)."""
    minx, miny, maxx, maxy = bbox
    col0, row0, col1, row1, *_ = snap_bbox_to_grid(grid.transform, minx, miny, maxx, maxy)
    if clip:
        col0, row0 = max(0, col0), max(0, row0)
        col1, row1 = min(grid.width, col1), min(grid.height, row1)
        if col0 >= col1 or row0 >= row1:
            raise ValueError("window does not intersect raster")
    elif col0 < 0 or row0 < 0 or col1 > grid.width or row1 > grid.height:
        raise ValueError("bbox outside raster bounds")
    return int(col0), int(row0), int(col1), int(row1)


def sliced_grid(grid: RasterGrid, window, raster_id: str | None = None) -> RasterGrid:
    col0, row0, col1, row1 = window
    a, b, c, d, e, f = grid.transform
    return RasterGrid(
        raster_id=raster_id or (grid.raster_id + "_win"),
        epsg=grid.epsg,
        transform=(a, b, a * col0 + b * row0 + c, d, e, d * col0 + e * row0 + f),
        width=col1 - col0,
        height=row1 - row0,
        tile_w=grid.tile_w,
        tile_h=grid.tile_h,
        bands=grid.bands,
        dtype=grid.dtype,
        nodata=grid.nodata,
    )


def slice_window(tiles: DataFrame, grid: RasterGrid, window) -> tuple[DataFrame, RasterGrid]:
    """fast_warp: -> (out tile table, out grid).  Pure slice, exact
    pixel values (reference asserts fast_warp == warp output on aligned
    reads, test_raster.py:326-331)."""
    col0, row0, col1, row1 = window
    out = sliced_grid(grid, window)
    g, og = grid, out

    # prune input tiles to the window (native; becomes min/max file
    # pruning on a persisted tile table)
    tx0, tx1 = col0 // g.tile_w, (col1 - 1) // g.tile_w
    ty0, ty1 = row0 // g.tile_h, (row1 - 1) // g.tile_h
    pruned = tiles.where(
        (F.col("tile_x") >= tx0) & (F.col("tile_x") <= tx1) & (F.col("tile_y") >= ty0) & (F.col("tile_y") <= ty1)
    )

    # native contribution explode: each input tile -> its out-tile range
    gx0 = F.greatest(F.col("tile_x") * g.tile_w, F.lit(col0))
    gx1 = F.least(F.col("tile_x") * g.tile_w + F.col("width"), F.lit(col1))
    gy0 = F.greatest(F.col("tile_y") * g.tile_h, F.lit(row0))
    gy1 = F.least(F.col("tile_y") * g.tile_h + F.col("height"), F.lit(row1))
    cand = pruned.where((gx0 < gx1) & (gy0 < gy1)).select(
        "band", "tile_x", "tile_y", "width", "height", "dtype", "data",
        F.explode(
            F.sequence(
                F.floor((gx0 - col0) / og.tile_w).cast("int"),
                F.floor((gx1 - 1 - col0) / og.tile_w).cast("int"),
            )
        ).alias("otx"),
        gy0.alias("_gy0"), gy1.alias("_gy1"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor((F.col("_gy0") - row0) / og.tile_h).cast("int"),
                F.floor((F.col("_gy1") - 1 - row0) / og.tile_h).cast("int"),
            )
        ).alias("oty"),
    ).drop("_gy0", "_gy1")

    def assemble(key, pdf):
        import pandas as pd

        band, otx, oty = int(key[0]), int(key[1]), int(key[2])
        oh, ow = og.tile_shape(otx, oty)
        arr = np.zeros((oh, ow), dtype=np.dtype(og.dtype))
        if og.nodata is not None:
            arr[:] = og.nodata
        # out tile's global pixel range (input raster frame)
        ox0, oy0 = col0 + otx * og.tile_w, row0 + oty * og.tile_h
        for _, r in pdf.iterrows():
            src = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])).reshape(r["height"], r["width"])
            sx0, sy0 = int(r["tile_x"]) * g.tile_w, int(r["tile_y"]) * g.tile_h
            x0 = max(sx0, ox0, col0)
            x1 = min(sx0 + int(r["width"]), ox0 + ow, col1)
            y0 = max(sy0, oy0, row0)
            y1 = min(sy0 + int(r["height"]), oy0 + oh, row1)
            if x0 >= x1 or y0 >= y1:
                continue
            arr[y0 - oy0 : y1 - oy0, x0 - ox0 : x1 - ox0] = src[y0 - sy0 : y1 - sy0, x0 - sx0 : x1 - sx0]
        return pd.DataFrame(
            [
                {
                    "tile_key": og.tile_key(band, oty, otx),
                    "raster_id": og.raster_id,
                    "band": band,
                    "tile_x": otx,
                    "tile_y": oty,
                    "epsg": og.epsg,
                    "transform": list(og.tile_transform(otx, oty)),
                    "width": ow,
                    "height": oh,
                    "dtype": og.dtype,
                    "nodata": og.nodata,
                    "data": arr.tobytes(),
                }
            ]
        )

    out_tiles = cand.groupBy("band", "otx", "oty").applyInPandas(assemble, schema=TILE_SCHEMA)
    return out_tiles, out


def fast_warp(tiles: DataFrame, grid: RasterGrid, bbox, clip: bool = False) -> tuple[DataFrame, RasterGrid]:
    """bbox slice in native CRS — the reference fast_warp
    (gdal.py:808-817) routed through the engine's regrid."""
    return slice_window(tiles, grid, window_of_bbox(grid, bbox, clip=clip))
