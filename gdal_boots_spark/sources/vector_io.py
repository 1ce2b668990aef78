"""Vector I/O: GeoJSON FeatureCollection <-> features DataFrame.

Reference: VectorDataset.open (gdal.py:1197-1205, file path or inline
GeoJSON string), to_file (gdal.py:1225-1263 — overwrite-by-delete, error
when the target exists and overwrite=False, test_raster.py:138-140),
from_bytes (gdal.py:1265-1274).

A whole-file GeoJSON FeatureCollection is not splittable, so `read_geojson`
parses on the driver (vector layers are dimension-sized); the scale path
is `read_ndjson`/`write_ndjson` — one feature per line via the native
JSON datasource.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = "fid long, gtype string, geojson string, props_json string"


def read_geojson(spark: SparkSession, src: str) -> DataFrame:
    """Path to a .geojson file OR an inline GeoJSON string (the
    reference accepts both, gdal.py:860,1197)."""
    if os.path.exists(src):
        with open(src) as f:
            obj = json.load(f)
    else:
        obj = json.loads(src)
    if obj.get("type") == "FeatureCollection":
        feats = obj.get("features", [])
    elif obj.get("type") == "Feature":
        feats = [obj]
    else:  # bare geometry
        feats = [{"type": "Feature", "geometry": obj, "properties": {}}]
    rows = []
    for i, ft in enumerate(feats):
        geom = ft.get("geometry") or {}
        rows.append(
            (
                int(ft.get("id", i)) if str(ft.get("id", i)).isdigit() else i,
                geom.get("type"),
                json.dumps(geom, separators=(",", ":")),
                json.dumps(ft.get("properties") or {}, separators=(",", ":")),
            )
        )
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


EXPORT_MAX_FEATURES = 1_000_000


def collect_for_export(df: DataFrame, max_features: int, what: str) -> list:
    """Bounded collect for single-file container exports.

    Single-file exports (GeoJSON FeatureCollection, GPKG, Shapefile)
    collect every feature to the driver — inherent to one-file
    container semantics and matching the reference to_file
    (gdal.py:1250-1256).  This guard mirrors the reader-side size
    guards (read_gpkg max_bytes): refuse planet-scale exports EARLY,
    with bounded driver memory even on the failure path (limit n+1,
    never an unbounded collect), pointing at the sharded scale path."""
    rows = df.limit(max_features + 1).collect()
    if len(rows) > max_features:
        raise ValueError(
            f"{what} export is a single-file, driver-side surface and the "
            f"layer exceeds max_features={max_features}. For planet-scale "
            "layers use the sharded scale path instead: write_ndjson(df, "
            "dir) (splittable NDJSON) or df.write.parquet(dir)."
        )
    return rows


def write_geojson(
    df: DataFrame, path: str, overwrite: bool = False,
    max_features: int = EXPORT_MAX_FEATURES,
) -> None:
    """features DataFrame -> one FeatureCollection file.

    Overwrite semantics of the reference to_file (gdal.py:1250-1256):
    raises when the file exists and overwrite=False.  Collects to the
    driver (single-file semantics) — guarded by ``max_features``; use
    write_ndjson/parquet for planet-scale layers."""
    if os.path.exists(path):
        if not overwrite:
            raise FileExistsError(path)
        os.remove(path)
    rows = collect_for_export(df.select("fid", "geojson", "props_json"), max_features, "GeoJSON")
    feats = [
        {
            "type": "Feature",
            "id": r["fid"],
            "geometry": json.loads(r["geojson"]),
            "properties": json.loads(r["props_json"] or "{}"),
        }
        for r in rows
    ]
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)


def read_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """Scale path: newline-delimited GeoJSON Feature objects, one per
    line.  Read as splittable text and field-extracted with native JSON
    path ops (NOT schema inference: ``coordinates`` nesting depth varies
    by geometry type, so inferring a unified schema across mixed layers
    mangles it; get_json_object returns each sub-object's raw JSON text,
    which is exactly the engine's geojson/props_json column format)."""
    raw = spark.read.text(path)
    # id-less (or non-numeric-id) features still need a usable key for
    # downstream joins/keys and write_ndjson: fall back to a synthetic
    # fid (unique, not stable across reads — same contract as OGR FIDs).
    # Synthetic fids live in the NEGATIVE range (-1 - miid) so they can
    # never collide with explicit non-negative ids in a mixed
    # id/id-less file (partition-0 miid values start at 0,1,2...).
    return raw.select(
        F.coalesce(
            F.get_json_object("value", "$.id").cast("long"),
            F.lit(-1) - F.monotonically_increasing_id(),
        ).alias("fid"),
        F.get_json_object("value", "$.geometry.type").alias("gtype"),
        F.get_json_object("value", "$.geometry").alias("geojson"),
        F.coalesce(F.get_json_object("value", "$.properties"), F.lit("{}")).alias("props_json"),
    )


def write_ndjson(df: DataFrame, path: str, mode: str = "error") -> None:
    """Inverse of read_ndjson: one GeoJSON Feature per line, built by
    string concatenation (geojson/props_json are already JSON text, so
    no parse/re-serialize round-trip and no from_json in the plan)."""
    lines = df.select(
        F.concat(
            F.lit('{"type":"Feature","id":'),
            F.coalesce(F.col("fid").cast("string"), F.lit("null")),
            F.lit(',"geometry":'),
            F.coalesce(F.col("geojson"), F.lit("null")),
            F.lit(',"properties":'),
            F.coalesce(F.col("props_json"), F.lit("{}")),
            F.lit("}"),
        ).alias("value")
    )
    lines.write.mode(mode).text(path)


class VectorDataset:
    """Multi-layer vector dataset: a catalog of NAMED layers, each a
    features DataFrame (reference ``VectorDataset`` is a container of
    named ``Layer`` objects — gdal.py:1174-1341, iterated/searched by
    name, written layer-by-layer in to_file gdal.py:1259; 5-layer GPKG
    fixture test_vector.py:35-60).

    Persistence: a directory with one NDJSON subdir per layer
    (layer name == subdir name) — the splittable scale format — or a
    GeoPackage file via to_gpkg/from_gpkg (sources/gpkg.py: stdlib
    sqlite3 container + from-scratch WKB codec, no GDAL) or OSM XML
    ingest via from_osm (sources/osm.py: the OGR 5-layer model,
    feature-parity-tested against the reference's own fixture pair).
    Both are dimension-scale, driver-side.
    """

    def __init__(self, layers: dict[str, DataFrame] | None = None):
        self._layers: dict[str, DataFrame] = dict(layers or {})

    def __repr__(self) -> str:  # reference __repr__ lists layer names
        return f"<VectorDataset {','.join(self._layers)}>"

    @property
    def layer_names(self) -> list[str]:
        return list(self._layers)

    def __len__(self) -> int:
        return len(self._layers)

    def __getitem__(self, name: str) -> DataFrame:
        return self._layers[name]

    def first(self) -> DataFrame:
        """reference ``layers.first()`` (gdal.py:621, 701)."""
        return next(iter(self._layers.values()))

    def release(self) -> None:
        """Unpersist any cached DataFrames a distributed reader attached
        (read_osm_distributed persists its relation-assembly branch point
        and the unioned feature set).  Mirrors pack_release (ADVICE r6:
        repeated invocations — bench reps, retries — otherwise leak
        cached copies).  Safe to call once after the layers have been
        consumed; re-reading a layer afterwards recomputes from source."""
        for df in getattr(self, "_cached", ()):
            df.unpersist()
        self._cached = ()

    def add_layer(self, name: str, df: DataFrame, overwrite: bool = False) -> None:
        """Duplicate layer names error unless overwrite (the reference
        add_layer creates-or-fails at the OGR level)."""
        if name in self._layers and not overwrite:
            raise ValueError(f"layer {name!r} exists")
        self._layers[name] = df

    def to_epsg(self, src_epsg: int, dst_epsg) -> "VectorDataset":
        """Transform EVERY layer (reference to_epsg loops layers,
        gdal.py:1302-1311) — vectorized per layer, no per-feature osr."""
        from ..functions.geometry_fns import geojson_decode_udf, geojson_encode_udf
        from ..operators.reproject import vector_to_epsg

        out = {}
        for name, df in self._layers.items():
            g = df.withColumn("_geom", geojson_decode_udf(F.col("geojson")))
            t = vector_to_epsg(g, src_epsg, dst_epsg, "_geom")
            out[name] = t.withColumn("geojson", geojson_encode_udf()(F.col("_geom"))).drop("_geom")
        return VectorDataset(out)

    def to_path(self, path: str, overwrite: bool = False) -> None:
        """Directory-of-layers write with the reference's to_file
        overwrite semantics (error when exists, gdal.py:1250-1256)."""
        if os.path.exists(path):
            if not overwrite:
                raise FileExistsError(path)
            import shutil

            shutil.rmtree(path)
        for name, df in self._layers.items():
            write_ndjson(df, os.path.join(path, name))

    def to_file(self, path: str, options=None, overwrite: bool = False) -> None:
        """Driver-option dispatch — the reference's
        ``to_file(filename, options, overwrite)`` (gdal.py:1225-1263):
        a GPKGOptions marker writes GeoPackage, ESRIShapeOptions a
        shapefile datasource directory, GeoJSONOptions (or None with a
        .geojson path) one FeatureCollection per layer; anything else
        falls back to the NDJSON layer directory."""
        from .options import ESRIShapeOptions, GeoJSONOptions, GPKGOptions

        if isinstance(options, GPKGOptions) or (options is None and path.endswith(".gpkg")):
            srs = options.srs_id if isinstance(options, GPKGOptions) else 4326
            self.to_gpkg(path, overwrite=overwrite, srs_id=srs)
        elif isinstance(options, ESRIShapeOptions) or (options is None and path.endswith(".shp")):
            self.to_shp(path[:-4] if path.endswith(".shp") else path, overwrite=overwrite)
        elif isinstance(options, GeoJSONOptions) or (options is None and path.endswith(".geojson")):
            if len(self._layers) == 1:
                write_geojson(self.first(), path, overwrite=overwrite)
            else:
                if os.path.exists(path) and not overwrite:
                    raise FileExistsError(path)
                os.makedirs(path, exist_ok=True)
                for name, df in self._layers.items():
                    write_geojson(df, os.path.join(path, f"{name}.geojson"), overwrite=overwrite)
        else:
            self.to_path(path, overwrite=overwrite)

    def to_gpkg(self, path: str, overwrite: bool = False, srs_id: int = 4326) -> None:
        """reference ``to_file(name, GPKG())`` (gdal.py:1225-1263)."""
        from .gpkg import write_gpkg

        write_gpkg(self, path, overwrite=overwrite, srs_id=srs_id)

    def to_shp(self, path: str, overwrite: bool = False) -> None:
        """Directory of one .shp/.shx/.dbf per layer — OGR's ESRI
        Shapefile datasource model (reference ESRIShape marker,
        options.py:126-130)."""
        from .shp import write_shp

        if os.path.exists(path) and not overwrite:
            raise FileExistsError(path)
        os.makedirs(path, exist_ok=True)
        for name, df in self._layers.items():
            write_shp(df, os.path.join(path, name), overwrite=overwrite)

    @classmethod
    def from_shp(cls, spark: SparkSession, path: str) -> "VectorDataset":
        from .shp import read_shp

        if os.path.isdir(path):
            names = sorted(f[:-4] for f in os.listdir(path) if f.endswith(".shp"))
            return cls({n: read_shp(spark, os.path.join(path, n)) for n in names})
        name = os.path.basename(path)[:-4] if path.endswith(".shp") else os.path.basename(path)
        return cls({name: read_shp(spark, path)})

    @classmethod
    def from_osm(cls, spark: SparkSession, path: str, distributed: bool = False, **kw) -> "VectorDataset":
        """OSM XML -> the 5-layer OGR-compatible model (sources/osm.py).

        ``distributed=True`` takes the planet-scale path: ONE
        bounded-memory streaming XML->NDJSON pass, then fully
        distributed node/way/relation resolution (read_osm_distributed;
        exact fixture parity with the driver parse)."""
        if distributed:
            from .osm import read_osm_distributed

            return read_osm_distributed(spark, path, **kw)
        from .osm import read_osm

        return read_osm(spark, path, **kw)

    @classmethod
    def from_gpkg(
        cls,
        spark: SparkSession,
        path: str,
        layers: list[str] | None = None,
        distributed: bool = False,
        **kw,
    ) -> "VectorDataset":
        """reference ``VectorDataset.open`` on .gpkg (gdal.py:1197-1205).

        ``distributed=True`` takes the planet-scale path: one
        bounded-memory driver stream of the SQLite rows to splittable
        NDJSON shards, then the per-vertex WKB -> GeoJSON decode runs
        distributed (read_gpkg_distributed; exact fixture parity with
        the driver parse)."""
        if distributed:
            from .gpkg import read_gpkg_distributed

            return read_gpkg_distributed(spark, path, layers=layers, **kw)
        from .gpkg import read_gpkg

        return read_gpkg(spark, path, layers=layers)

    @classmethod
    def from_path(cls, spark: SparkSession, path: str) -> "VectorDataset":
        names = sorted(
            d for d in os.listdir(path) if os.path.isdir(os.path.join(path, d)) and not d.startswith(("_", "."))
        )
        return cls({n: read_ndjson(spark, os.path.join(path, n)) for n in names})
