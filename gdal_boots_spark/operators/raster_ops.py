"""Small raster parity operators: dtype cast, band ops, window write,
validity, metadata codec.

Reference mapping (SURVEY §2.2):
  as_type        <- RasterDataset.as_type (gdal.py:285-292)
  select_band    <- band axis select (gdal.py:241-251 squeeze rule)
  add_band       <- RasterDataset.add_band (gdal.py:474-479)
  write_window   <- __setitem__ (gdal.py:392-472) — Spark DataFrames are
                    immutable, so a window write is copy-on-write: the
                    affected tile rows are replaced, everything else
                    passes through untouched
  is_valid       <- gdal.py:537-544 (blob length + checksum probe)
  meta codec     <- gdal.py:230-239 ('json:' prefix round-trip)
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tiles import RasterGrid


def as_type(tiles: DataFrame, grid: RasterGrid, dtype: str) -> tuple[DataFrame, RasterGrid]:
    """Cast every tile blob to `dtype` (gdal.py:285-292: new raster,
    astype copy, georeferencing preserved)."""
    from dataclasses import replace

    def cast(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.data, dtype=np.dtype(r.dtype))
                out.append(arr.astype(np.dtype(dtype)).tobytes())
            pdf = pdf.copy()
            pdf["data"] = out
            pdf["dtype"] = dtype
            yield pdf

    return tiles.mapInPandas(cast, schema=tiles.schema), replace(grid, dtype=dtype)


def select_band(tiles: DataFrame, band: int) -> DataFrame:
    """Single-band view (reference 2-D squeeze, gdal.py:241-251)."""
    return tiles.where(F.col("band") == band)


def add_band(tiles: DataFrame, grid: RasterGrid, new_band_tiles: DataFrame) -> tuple[DataFrame, RasterGrid]:
    """Append a band (gdal.py:474-479): union of tile rows with the
    next band index."""
    from dataclasses import replace

    nb = new_band_tiles.withColumn("band", F.lit(grid.bands)).withColumn(
        "tile_key",
        F.format_string(f"{grid.raster_id}/%d/%d/%d", F.lit(grid.bands), F.col("tile_y"), F.col("tile_x")),
    )
    return tiles.unionByName(nb), replace(grid, bands=grid.bands + 1)


def write_window(
    tiles: DataFrame, grid: RasterGrid, window, value, band: int = 0
) -> DataFrame:
    """Copy-on-write window write: tiles overlapping the pixel window
    [col0,col1)x[row0,row1) get `value` (scalar broadcast, the common
    __setitem__ form gdal.py:459-460); other tiles pass through."""
    col0, row0, col1, row1 = (int(v) for v in window)
    tw, th = grid.tile_w, grid.tile_h

    def patch(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                x0 = r.tile_x * tw
                y0 = r.tile_y * th
                if r.band != band or x0 >= col1 or y0 >= row1 or x0 + r.width <= col0 or y0 + r.height <= row0:
                    out.append(r.data)
                    continue
                arr = np.frombuffer(r.data, dtype=np.dtype(r.dtype)).reshape(r.height, r.width).copy()
                xa, xb = max(col0 - x0, 0), min(col1 - x0, r.width)
                ya, yb = max(row0 - y0, 0), min(row1 - y0, r.height)
                arr[ya:yb, xa:xb] = value
                out.append(arr.tobytes())
            pdf = pdf.copy()
            pdf["data"] = out
            yield pdf

    return tiles.mapInPandas(patch, schema=tiles.schema)


def is_valid(tiles: DataFrame) -> DataFrame:
    """Per-tile validity probe (gdal.py:537-544): blob length must
    equal width*height*itemsize; checksum computed as crc32."""
    import zlib

    def probe(batches):
        import pandas as pd

        for pdf in batches:
            oks, crcs = [], []
            for r in pdf.itertuples(index=False):
                expect = r.width * r.height * np.dtype(r.dtype).itemsize
                oks.append(len(r.data) == expect)
                crcs.append(zlib.crc32(r.data) & 0xFFFFFFFF)
            yield pd.DataFrame({"tile_key": pdf["tile_key"], "ok": oks, "crc32": crcs})

    return tiles.select("tile_key", "width", "height", "dtype", "data").mapInPandas(
        probe, schema="tile_key string, ok boolean, crc32 long"
    )


# --- band descriptions (gdal.py:278-283) -----------------------------------

def set_band_description(grid: RasterGrid, idx: int, description: str) -> RasterGrid:
    """gdal.py:278-281 parity: store the description in the dataset
    metadata (a falsy description is a no-op, exactly the reference's
    guard).  Dataset-level state lives on the grid, not the tile rows —
    a 10^9-tile table must not be rewritten to label a band."""
    from dataclasses import replace

    if not description:
        return grid
    meta = dict(grid.meta or {})
    descs = list(meta.get("band_descriptions") or [])
    if len(descs) < grid.bands:
        descs += [""] * (grid.bands - len(descs))
    descs[idx] = description
    meta["band_descriptions"] = descs
    return replace(grid, meta=meta)


def get_band_description(grid: RasterGrid, idx: int) -> str:
    """gdal.py:282-283 parity (GDAL GetDescription returns '' when
    unset).  as_type/resample/warp copy descriptions for free: they
    `replace()` the grid, which preserves meta — the same guarantee
    the reference implements by hand in as_type (gdal.py:289-291)."""
    descs = (grid.meta or {}).get("band_descriptions") or []
    return descs[idx] if 0 <= idx < len(descs) else ""


# --- metadata codec (gdal.py:230-239) -------------------------------------

def meta_encode(meta: dict) -> dict[str, str]:
    """dict -> {str: str} with the reference 'json:' prefix for
    non-string values (gdal.py:233)."""
    out = {}
    for k, v in meta.items():
        out[str(k)] = v if isinstance(v, str) else "json:" + json.dumps(v)
    return out


def meta_decode(enc: dict[str, str]) -> dict:
    """Inverse (gdal.py:238): lazy 'json:'-prefixed values decode."""
    out = {}
    for k, v in enc.items():
        out[k] = json.loads(v[5:]) if isinstance(v, str) and v.startswith("json:") else v
    return out
