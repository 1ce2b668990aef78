"""Vector -> raster burn as a distributed tile render.

Reference: ``Layer.rasterize`` (gdal.py:1092-1107) burns features into
an existing raster via gdal.RasterizeLayer (default burn value 1,
ALL_TOUCHED toggle).  Engine shape (SURVEY §2.7):

    polys (dimension) ── driver: pixel-bbox -> touched-tile explode ──┐
                                                                      │
    spark.range(touched tiles) ── groupBy(tile) applyInPandas ────────┘
         scanline fill of every contributing polygon on the tile's
         pixel-center lattice (geom.raster_kernels)

Only touched tiles are rendered (sparse by default — at 100 TB most of
the world is empty); ``dense=True`` additionally emits zero tiles so
the result is a complete mask raster.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..geom.affine import invert_transform
from ..geom.packed import from_geojson
from ..geom.raster_kernels import rasterize_mask
from ..sources.tiles import TILE_SCHEMA, RasterGrid, generate_tiles


def _pixel_bbox(pg, transform):
    ia, ib, ic, id_, ie, if_ = invert_transform(transform)
    c = pg.coords.reshape(-1, 2)
    px = ia * c[:, 0] + ib * c[:, 1] + ic
    py = id_ * c[:, 0] + ie * c[:, 1] + if_
    return px.min(), py.min(), px.max(), py.max()


def rasterize(
    spark: SparkSession,
    polys: DataFrame,
    grid: RasterGrid,
    all_touched: bool = False,
    burn: int = 1,
    dense: bool = False,
) -> DataFrame:
    """polys(poly_id, geojson) -> uint8 mask tile table on `grid`.

    Deterministic under parallelism: within a tile, polygons burn in
    poly_id order (they all burn the same value by default, but custom
    per-poly burn values stay reproducible).
    """
    mask_grid = RasterGrid(
        raster_id=grid.raster_id + "_mask",
        epsg=grid.epsg,
        transform=grid.transform,
        width=grid.width,
        height=grid.height,
        tile_w=grid.tile_w,
        tile_h=grid.tile_h,
        bands=1,
        dtype="uint8",
    )
    rows = polys.select("poly_id", "geojson").collect()
    packed = {}
    contribs = []  # (tile_index, poly_id)
    ntx = mask_grid.n_tiles_x
    for r in rows:
        pg = from_geojson(r["geojson"])
        if pg.n_points == 0:
            continue
        pid = int(r["poly_id"])
        packed[pid] = (pg.coords, pg.ring_offsets)
        minpx, minpy, maxpx, maxpy = _pixel_bbox(pg, grid.transform)
        tx0 = max(0, int(np.floor(minpx)) // grid.tile_w)
        tx1 = min(ntx - 1, int(np.ceil(maxpx) - 1) // grid.tile_w)
        ty0 = max(0, int(np.floor(minpy)) // grid.tile_h)
        ty1 = min(mask_grid.n_tiles_y - 1, int(np.ceil(maxpy) - 1) // grid.tile_h)
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                contribs.append((ty * ntx + tx, pid))

    if not contribs:
        touched = spark.createDataFrame([], "tile_index long, poly_id long")
    else:
        touched = spark.createDataFrame(contribs, "tile_index long, poly_id long")

    bpolys = spark.sparkContext.broadcast(packed)
    g = mask_grid
    at, bv = all_touched, burn

    # NOT groupBy().applyInPandas(): contribution rows are a few bytes
    # but each group is heavy CPU (a full scanline render), so AQE's
    # byte-based partition coalescing would collapse the render stage
    # onto one task.  An explicit repartition-by-number is exempt from
    # AQE coalescing and spreads the tiles across all cores.
    n_touched = len({t for t, _ in contribs}) or 1
    n_parts = max(min(spark.sparkContext.defaultParallelism * 2, n_touched), 2)

    def render_partition(batches):
        import pandas as pd

        pdfs = list(batches)  # contributions are tiny; buffer the partition
        if not pdfs:
            return
        allc = pd.concat(pdfs, ignore_index=True)
        rows = []
        for ti, grp in allc.groupby("tile_index"):
            ti = int(ti)
            ty, tx = ti // g.n_tiles_x, ti % g.n_tiles_x
            h, w = g.tile_shape(tx, ty)
            t = g.tile_transform(tx, ty)
            out = np.zeros((h, w), dtype=np.uint8)
            for pid in sorted(grp["poly_id"].tolist()):
                coords, ro = bpolys.value[int(pid)]
                rasterize_mask(coords, ro, t, h, w, all_touched=at, out=out, burn=bv)
            rows.append(
                {
                    "tile_key": g.tile_key(0, ty, tx),
                    "raster_id": g.raster_id,
                    "band": 0,
                    "tile_x": tx,
                    "tile_y": ty,
                    "epsg": g.epsg,
                    "transform": list(t),
                    "width": w,
                    "height": h,
                    "dtype": "uint8",
                    "nodata": None,
                    "data": out.tobytes(),
                    "meta": g.meta_encoded,
                }
            )
        if rows:
            yield pd.DataFrame(rows)

    burned = touched.repartition(n_parts, "tile_index").mapInPandas(render_partition, schema=TILE_SCHEMA)
    if not dense:
        return burned

    zeros = generate_tiles(spark, g, lambda b, ty, tx, h, w, gg: np.zeros((h, w), np.uint8))
    touched_keys = burned.select("tile_key")
    empty = zeros.join(touched_keys, "tile_key", "left_anti")
    return burned.unionByName(empty)
