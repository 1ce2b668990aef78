"""Zonal statistics: per-polygon aggregates over raster pixels.

The classic raster x vector operator (the Raptor use case, PAPERS.md):
for every polygon, aggregate the raster values whose pixel CENTER falls
inside it (same coverage rule as rasterize all_touched=False).

Physical shape:
    polys (dimension, driver-collected + broadcast)
      -> touched-tile contribution rows (tile bbox intersect, driver)
    contributions ⋈ tiles on (band, tile_x, tile_y)   (hash join)
      -> mapInPandas: scanline mask per (poly, tile), masked partial
         aggregates (count/sum/min/max) — one NumPy pass per pair
      -> groupBy(poly_id, band) final combine  (shuffle of tiny rows)

The partial+final split means pixel bytes never shuffle: only
O(polys x touched tiles) aggregate rows do.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.packed import from_geojson
from ..geom.raster_kernels import rasterize_mask
from ..sources.tiles import RasterGrid
from .rasterize import _pixel_bbox


def zonal_stats(
    spark: SparkSession,
    tiles: DataFrame,
    grid: RasterGrid,
    polys: DataFrame,
) -> DataFrame:
    """-> (poly_id, band, n_pixels, sum, min, max, mean) per polygon
    over all raster bands; polygons with no covered pixel are absent
    (the reference's GDAL zonal workflows behave the same)."""
    rows = polys.select("poly_id", "geojson").collect()
    packed, contribs = {}, []
    for r in rows:
        pg = from_geojson(r["geojson"])
        if pg.n_points == 0:
            continue
        pid = int(r["poly_id"])
        packed[pid] = (pg.coords, pg.ring_offsets)
        minpx, minpy, maxpx, maxpy = _pixel_bbox(pg, grid.transform)
        tx0 = max(0, int(np.floor(minpx)) // grid.tile_w)
        tx1 = min(grid.n_tiles_x - 1, int(np.ceil(maxpx) - 1) // grid.tile_w)
        ty0 = max(0, int(np.floor(minpy)) // grid.tile_h)
        ty1 = min(grid.n_tiles_y - 1, int(np.ceil(maxpy) - 1) // grid.tile_h)
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                contribs.append((tx, ty, pid))
    if not contribs:
        return spark.createDataFrame(
            [], "poly_id long, band int, n_pixels long, sum double, min double, max double, mean double"
        )
    cdf = spark.createDataFrame(contribs, "tile_x int, tile_y int, poly_id long")
    joined = tiles.join(F.broadcast(cdf), ["tile_x", "tile_y"])

    bpolys = spark.sparkContext.broadcast(packed)
    g = grid

    def partial(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])).reshape(r["height"], r["width"])
                coords, ro = bpolys.value[int(r["poly_id"])]
                t = g.tile_transform(int(r["tile_x"]), int(r["tile_y"]))
                m = rasterize_mask(coords, ro, t, r["height"], r["width"]).astype(bool)
                if not m.any():
                    continue
                vals = arr[m].astype(np.float64)
                out.append(
                    {
                        "poly_id": int(r["poly_id"]),
                        "band": int(r["band"]),
                        "n_pixels": int(vals.size),
                        "sum": float(vals.sum()),
                        "min": float(vals.min()),
                        "max": float(vals.max()),
                    }
                )
            if out:
                yield pd.DataFrame(out)

    partials = joined.mapInPandas(
        partial, schema="poly_id long, band int, n_pixels long, sum double, min double, max double"
    )
    return partials.groupBy("poly_id", "band").agg(
        F.sum("n_pixels").alias("n_pixels"),
        F.sum("sum").alias("sum"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        (F.sum("sum") / F.sum("n_pixels")).alias("mean"),
    )
