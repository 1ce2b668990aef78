"""The reference's one-call ``warp`` (gdal.py:653-737) as a composition
of engine primitives:

    warp(bbox, resampling, extra_ds, resolution, out_epsg/out_proj4,
         nodata, width/height, cutline)
      = mosaic(extra_ds)                       (gdal.py:712-714)
      -> slice_window(bbox)                    (crop arm)
      -> reproject(out_epsg|out_proj4)         (gdal.py:716-719)
      -> resample(resolution|width/height)     (gdal.py:716-723)
      -> cutline mask                          (gdal.py:691-710, 727-729)

Each arm is an independent lazy DataFrame stage; Catalyst fuses the
narrow parts and the only shuffles are the regrid groupBys actually
requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tiles import RasterGrid
from .crop import crop_by_geometry
from .mosaic import mosaic
from .reproject import reproject
from .warp import fast_warp, resample


def warp(
    spark: SparkSession,
    tiles: DataFrame,
    grid: RasterGrid,
    bbox=None,
    resampling: str = "nearest",
    extra: list[tuple[DataFrame, RasterGrid]] | None = None,
    resolution=None,
    out_epsg: int | None = None,
    out_proj4: str | None = None,
    size=None,
    cutline=None,
    cutline_epsg: int = 4326,
    apply_mask_flag: bool = True,
) -> tuple[DataFrame, RasterGrid]:
    if extra:
        tiles, grid = mosaic(spark, [(tiles, grid)] + list(extra))
    if bbox is not None:
        tiles, grid = fast_warp(tiles, grid, bbox, clip=True)
    dst = out_proj4 if out_proj4 is not None else out_epsg
    if dst is not None and str(dst) != str(grid.epsg):
        tiles, grid = reproject(tiles, grid, dst, resolution=resolution, kernel=resampling)
    elif resolution is not None or size is not None:
        tiles, grid = resample(tiles, grid, kernel=resampling, resolution=resolution, size=size)
    if cutline is not None:
        tiles, _, grid = crop_by_geometry(
            spark, tiles, grid, cutline, epsg=cutline_epsg, apply_mask_flag=apply_mask_flag
        )
    return tiles, grid
