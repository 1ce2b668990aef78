"""Raster statistics over tile tables.

The reference's tests verify rasterize/cutline output by exact value
histograms (np.unique, test_vector.py:76-78, test_raster.py:267-281);
this is the distributed equivalent: per-tile partial histograms
(map-side, one np.unique per blob) combined by a groupBy sum — the
partial+final aggregation pattern, shuffle volume O(distinct values),
never O(pixels).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tile_histogram(tiles: DataFrame) -> DataFrame:
    """-> (value double, cnt long), exact counts over all tile pixels."""

    def partial(batches):
        import pandas as pd

        for pdf in batches:
            vals, cnts = [], []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.data, dtype=np.dtype(r.dtype))
                v, c = np.unique(arr, return_counts=True)
                vals.append(v.astype(np.float64))
                cnts.append(c.astype(np.int64))
            if vals:
                yield pd.DataFrame({"value": np.concatenate(vals), "cnt": np.concatenate(cnts)})

    partials = tiles.select("data", "dtype").mapInPandas(partial, schema="value double, cnt long")
    return partials.groupBy("value").agg(F.sum("cnt").alias("cnt"))


def tile_checksum(tiles: DataFrame) -> DataFrame:
    """Per-tile crc32 — the engine's is_valid analogue (gdal.py:537-544)
    and the lineage metric the resumable runner records per partition."""

    def crc(batches):
        import pandas as pd
        import zlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "tile_key": pdf["tile_key"],
                    "crc32": [zlib.crc32(d) & 0xFFFFFFFF for d in pdf["data"]],
                    "n_bytes": [len(d) for d in pdf["data"]],
                }
            )

    return tiles.select("tile_key", "data").mapInPandas(crc, schema="tile_key string, crc32 long, n_bytes long")


def tiles_to_pixels(tiles: DataFrame, tile_w: int, tile_h: int) -> DataFrame:
    """Raster -> relational pixel table (band, row, col, value:double).

    The engine's raster-as-rows escape hatch: feeds histograms, oracle
    comparisons, and zonal joins.  Global row/col from the tile grid
    position; one vectorized meshgrid per blob.
    """

    def explode_px(batches):
        import pandas as pd

        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.data, dtype=np.dtype(r.dtype)).reshape(r.height, r.width)
                jj, ii = np.meshgrid(np.arange(r.width), np.arange(r.height))
                outs.append(
                    pd.DataFrame(
                        {
                            "band": np.full(arr.size, r.band, dtype=np.int32),
                            "row": (ii + r.tile_y * tile_h).ravel().astype(np.int64),
                            "col": (jj + r.tile_x * tile_w).ravel().astype(np.int64),
                            "value": arr.ravel().astype(np.float64),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return tiles.select("band", "tile_x", "tile_y", "width", "height", "dtype", "data").mapInPandas(
        explode_px, schema="band int, row long, col long, value double"
    )
