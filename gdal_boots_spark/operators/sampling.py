"""Point-in-raster sampling — reference ``values_by_points``
(gdal.py:897-931) as a distributed point x tile join.

Reference semantics (golden: test_raster.py:648-677): world -> pixel by
inverse affine + floor (gdal.py:919-921); bounds check 0<=px<w,
0<=py<h (gdal.py:924); out-of-bounds points yield NULL (left outer
join); multiband rasters yield one value per band.

Physical shape (ONE shuffle of each side, no second pass):

    points ── native inverse-affine pixel math (codegen) ──┐
       │  tile_key = f(band, px/tw, py/th) in bounds,      │
       │  salted "oob/<h>" sentinel outside                │
       └── groupBy(tile_key) COGROUP applyInPandas ────────┤
    tiles ── groupBy(tile_key) ────────────────────────────┘
                      │ one Arrow transfer of each tile blob per task,
                      │ vectorized fancy-index gather per tile group;
                      │ groups with no tile row (sentinel or missing
                      │ tile) emit NULL — the cogroup IS the left join
              (point_id, band, value | NULL)

The reference loops per point in Python (gdal.py:911); here the pixel
math is whole-stage codegen and the gather touches each tile's bytes
once per group.  Tile blobs never ride on candidate rows, so the
shuffle volume is O(points) keys + O(tiles) blobs, each shuffled once
— the pattern that survives 10^12 points.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.affine import invert_transform
from ..sources.tiles import RasterGrid


def values_by_points(
    points: DataFrame,
    tiles: DataFrame,
    grid: RasterGrid,
    id_col: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """-> (point_id, band, value:double); value NULL when outside."""
    spark = points.sparkSession
    ia, ib, ic, id_, ie, if_ = invert_transform(grid.transform)
    x, y = F.col(x_col), F.col(y_col)
    px = F.floor(F.lit(ia) * x + F.lit(ib) * y + F.lit(ic)).cast("int")
    py = F.floor(F.lit(id_) * x + F.lit(ie) * y + F.lit(if_)).cast("int")

    # Out-of-bounds points are NOT filtered out: they ride the same
    # cogroup under a salted sentinel key (no tile row exists there, so
    # the gather emits NULL).  That makes the cogroup itself the left
    # outer join — the old shape re-shuffled every (point, band) row a
    # SECOND time through a final join just to backfill NULLs, doubling
    # the O(points) shuffle volume at 10^12 points.  Salting spreads a
    # mostly-out-of-bounds workload across reducers.
    in_bounds = (
        (F.col("px") >= 0) & (F.col("px") < grid.width) & (F.col("py") >= 0) & (F.col("py") < grid.height)
    )
    pts = points.select(F.col(id_col).alias("point_id"), px.alias("px"), py.alias("py"), in_bounds.alias("ok"))
    bands = spark.range(grid.bands).select(F.col("id").cast("int").alias("band"))
    cand = pts.crossJoin(F.broadcast(bands)).select(
        "point_id",
        "band",
        F.when(
            F.col("ok"),
            F.format_string(
                f"{grid.raster_id}/%d/%d/%d",
                F.col("band"),
                (F.col("py") / grid.tile_h).cast("int"),
                (F.col("px") / grid.tile_w).cast("int"),
            ),
        )
        .otherwise(F.format_string("oob/%d", F.pmod(F.xxhash64("point_id"), F.lit(64))))
        .alias("tile_key"),
        (F.col("px") % grid.tile_w).alias("ix"),
        (F.col("py") % grid.tile_h).alias("iy"),
    )

    tile_side = tiles.select("tile_key", "width", "dtype", "data")

    def gather(key, pts_pdf, tiles_pdf):
        import pandas as pd

        if len(pts_pdf) == 0:
            return pd.DataFrame({"point_id": [], "band": [], "value": []}).astype(
                {"point_id": "int64", "band": "int32", "value": "float64"}
            )
        if len(tiles_pdf) == 0:
            # out-of-bounds sentinel group or a tile absent from the
            # raster table: left-outer semantics, NULL values
            return pd.DataFrame(
                {
                    "point_id": pts_pdf["point_id"].to_numpy(),
                    "band": pts_pdf["band"].to_numpy(),
                    "value": pd.array([None] * len(pts_pdf), dtype="Float64"),
                }
            )
        t = tiles_pdf.iloc[0]
        arr = np.frombuffer(t["data"], dtype=np.dtype(t["dtype"])).reshape(-1, t["width"])
        vals = arr[pts_pdf["iy"].to_numpy(), pts_pdf["ix"].to_numpy()].astype(np.float64)
        return pd.DataFrame(
            {"point_id": pts_pdf["point_id"].to_numpy(), "band": pts_pdf["band"].to_numpy(), "value": vals}
        )

    return (
        cand.groupBy("tile_key")
        .cogroup(tile_side.groupBy("tile_key"))
        .applyInPandas(gather, schema="point_id long, band int, value double")
        .select("point_id", "band", "value")
    )
