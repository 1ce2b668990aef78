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
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"]))
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
