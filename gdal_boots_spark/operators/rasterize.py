"""Vector -> raster burn as a distributed tile render.

Reference: ``Layer.rasterize`` (gdal.py:1092-1107) burns features into
an existing raster via gdal.RasterizeLayer (default burn value 1,
ALL_TOUCHED toggle).  Engine shape (SURVEY §2.7):

    polys (dimension) ── (tile, poly) contribution rows ──┐
       broadcast path: driver bbox loop + broadcast dict  │
       distributed path: operators.cover (no collect)     │
                                                          │
    repartition(tile) ── mapInPandas ─────────────────────┘
         scanline fill of every contributing polygon on the tile's
         pixel-center lattice (geom.raster_kernels)

Only tiles with at least one burned pixel are emitted in sparse mode
(at 100 TB most of the world is empty); ``dense=True`` additionally
emits zero tiles so the result is a complete mask raster.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.raster_kernels import rasterize_mask
from ..sources.tiles import TILE_SCHEMA, RasterGrid, generate_tiles
from .cover import contribs_broadcast, contribs_distributed, geom_arrays, polys_fit_broadcast


def rasterize(
    spark: SparkSession,
    polys: DataFrame,
    grid: RasterGrid,
    all_touched: bool = False,
    burn: int = 1,
    dense: bool = False,
    distributed: bool | None = None,
) -> DataFrame:
    """polys(poly_id, geojson) -> uint8 mask tile table on `grid`.

    Deterministic under parallelism: within a tile, polygons burn in
    poly_id order (they all burn the same value by default, but custom
    per-poly burn values stay reproducible).

    ``distributed=True`` switches the polygon side to the no-collect
    cover explode (operators.cover) — required when the polygon table
    is too large to broadcast; output is identical (pytest-asserted).
    Default ``None`` auto-picks from a cheap dimension-size probe
    (cover.polys_fit_broadcast); pass an explicit bool to override.
    """
    from dataclasses import replace

    if distributed is None:
        distributed = not polys_fit_broadcast(polys)

    mask_grid = replace(
        grid, raster_id=grid.raster_id + "_mask", bands=1, dtype="uint8", nodata=None
    )
    g = mask_grid
    at, bv = all_touched, burn
    ntx = g.n_tiles_x

    # NOT groupBy().applyInPandas(): contribution rows are a few bytes
    # but each group is heavy CPU (a full scanline render), so AQE's
    # byte-based partition coalescing would collapse the render stage
    # onto one task.  An explicit repartition-by-number is exempt from
    # AQE coalescing and spreads the tiles across all cores.
    def tile_row(ti: int, out: np.ndarray):
        ty, tx = ti // ntx, ti % ntx
        return {
            "tile_key": g.tile_key(0, ty, tx),
            "raster_id": g.raster_id,
            "band": 0,
            "tile_x": tx,
            "tile_y": ty,
            "epsg": g.epsg,
            "transform": list(g.tile_transform(tx, ty)),
            "width": out.shape[1],
            "height": out.shape[0],
            "dtype": "uint8",
            "nodata": None,
            "data": out.tobytes(),
            "meta": g.meta_encoded,
        }

    if distributed:
        contribs = contribs_distributed(polys, grid).withColumn(
            "tile_index", F.col("tile_y").cast("long") * ntx + F.col("tile_x")
        )
        n_parts = max(spark.sparkContext.defaultParallelism * 2, 2)

        def render_partition(batches):
            import pandas as pd

            pdfs = list(batches)
            if not pdfs:
                return
            allc = pd.concat(pdfs, ignore_index=True)
            cache: dict = {}  # decode each polygon once per partition (zonal's pattern, commit 3874102)
            rows = []
            for ti, grp in allc.groupby("tile_index"):
                ti = int(ti)
                ty, tx = ti // ntx, ti % ntx
                h, w = g.tile_shape(tx, ty)
                t = g.tile_transform(tx, ty)
                out = np.zeros((h, w), dtype=np.uint8)
                grp = grp.sort_values("poly_id")
                for pid, gg in zip(grp["poly_id"].to_numpy(), grp["geom"]):
                    arrays = cache.get(int(pid))
                    if arrays is None:
                        arrays = cache[int(pid)] = geom_arrays(gg)
                    coords, ro = arrays
                    rasterize_mask(coords, ro, t, h, w, all_touched=at, out=out, burn=bv)
                if out.any():
                    rows.append(tile_row(ti, out))
            if rows:
                yield pd.DataFrame(rows)

        burned = contribs.repartition(n_parts, "tile_index").mapInPandas(
            render_partition, schema=TILE_SCHEMA
        )
    else:
        packed, pairs = contribs_broadcast(spark, polys, grid)
        contrib_rows = [(ty * ntx + tx, pid) for tx, ty, pid in pairs]
        if not contrib_rows:
            touched = spark.createDataFrame([], "tile_index long, poly_id long")
        else:
            touched = spark.createDataFrame(contrib_rows, "tile_index long, poly_id long")
        bpolys = spark.sparkContext.broadcast(packed)
        n_touched = len({t for t, _ in contrib_rows}) or 1
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
                ty, tx = ti // ntx, ti % ntx
                h, w = g.tile_shape(tx, ty)
                t = g.tile_transform(tx, ty)
                out = np.zeros((h, w), dtype=np.uint8)
                for pid in sorted(grp["poly_id"].tolist()):
                    coords, ro = bpolys.value[int(pid)]
                    rasterize_mask(coords, ro, t, h, w, all_touched=at, out=out, burn=bv)
                if out.any():
                    rows.append(tile_row(ti, out))
            if rows:
                yield pd.DataFrame(rows)

        burned = touched.repartition(n_parts, "tile_index").mapInPandas(
            render_partition, schema=TILE_SCHEMA
        )

    if not dense:
        return burned

    zeros = generate_tiles(spark, g, lambda b, ty, tx, h, w, gg: np.zeros((h, w), np.uint8))
    # broadcast the key side: the anti-join must not shuffle the zero
    # tiles' pixel payloads just to subtract a handful of keys
    touched_keys = burned.select("tile_key")
    empty = zeros.join(F.broadcast(touched_keys), "tile_key", "left_anti")
    return burned.unionByName(empty)
