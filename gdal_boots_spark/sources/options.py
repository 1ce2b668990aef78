"""Writer option encoding — reference DriverOptions family
(gdal_boots/options.py:17-146).

The reference encodes per-driver dataclasses into GDAL KEY=VALUE
creation-option strings.  The engine's sinks are Parquet (tile/feature
tables), our pure-Python PNG codec, and GeoJSON/NDJSON; options map to
those writers.  The GTiff rule that ``zlevel`` only applies when
compression is deflate (options.py:88-92) carries over to the encode
analogue here.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class DriverOptions:
    def encode(self) -> dict[str, str]:
        out = {}
        for k, v in self.__dict__.items():
            if v is None:
                continue
            out[k.upper()] = str(v)
        return out


@dataclass
class PNG(DriverOptions):
    """zlevel -> zlib level of sources.png.encode_png (options.py:43-55)."""

    zlevel: int = 6


@dataclass
class GTiffLike(DriverOptions):
    """Tiled-raster creation options (options.py:58-92) mapped onto the
    tile-table Parquet sink: compress -> parquet codec; blocksize ->
    RasterGrid tile size."""

    compress: str = "deflate"  # deflate|zstd|snappy|none
    zlevel: int | None = 6
    blockxsize: int = 256
    blockysize: int = 256

    def encode(self) -> dict[str, str]:
        out = super().encode()
        if self.compress.lower() != "deflate":
            out.pop("ZLEVEL", None)  # reference drops zlevel unless deflate
        return out

    def parquet_options(self) -> dict[str, str]:
        codec = {"deflate": "gzip", "zstd": "zstd", "snappy": "snappy", "none": "uncompressed"}
        return {"compression": codec.get(self.compress.lower(), "snappy")}


@dataclass
class GeoJSONOptions(DriverOptions):
    """options.py:132-138."""

    coordinate_precision: int = 15
    write_bbox: bool = False


@dataclass
class GPKGOptions(DriverOptions):
    """GeoPackage driver marker (reference GPKG, options.py:141-146);
    dispatched by VectorDataset.to_file -> sources/gpkg.write_gpkg."""

    srs_id: int = 4326


@dataclass
class ESRIShapeOptions(DriverOptions):
    """ESRI Shapefile driver marker (reference ESRIShape,
    options.py:126-130); dispatched by VectorDataset.to_file ->
    sources/shp (one .shp/.shx/.dbf per layer)."""
