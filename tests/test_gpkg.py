"""GeoPackage driver (sources/gpkg.py) — closes the SURVEY §2.1 GPKG
scope exclusion without GDAL: stdlib sqlite3 container + from-scratch
WKB codec.

Reference contract: VectorDataset.open on .gpkg (gdal.py:1197-1205),
to_file(..., GPKG()) with overwrite semantics (gdal.py:1225-1263,
test_raster.py:138-140), the 5-layer fixture (test_vector.py:35-60)
and to_epsg over a gpkg dataset (test_vector.py:21-27).  The
minsk-boundary.gpkg fixture is cross-validated against its
minsk-boundary.geojson sibling: identical coordinate content.
"""

import json
import os

import numpy as np
import pytest

from gdal_boots_spark.sources.gpkg import (
    geojson_to_wkb,
    make_gpkg_blob,
    parse_gpkg_blob,
    read_gpkg,
    wkb_to_geojson,
    write_gpkg,
)
from gdal_boots_spark.sources.vector_io import VectorDataset

FIXTURE = "/root/reference/tests/fixtures/minsk-boundary.gpkg"
FIXTURE_GJ = "/root/reference/tests/fixtures/minsk-boundary.geojson"

GEOMS = [
    {"type": "Point", "coordinates": [1.5, 2.5]},
    {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]]},
    {
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [2.0, 1.0], [1.0, 2.0], [1.0, 1.0]],
        ],
    },
    {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
    {"type": "MultiLineString", "coordinates": [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]]},
    {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
            [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]],
        ],
    },
    {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [1.0, 2.0]},
            {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
        ],
    },
]


def test_wkb_roundtrip_all_types():
    for g in GEOMS:
        assert wkb_to_geojson(geojson_to_wkb(g)) == g
    # big-endian WKB parses too: flip a little-endian Point by hand
    import struct

    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.5, 2.5)
    assert wkb_to_geojson(be) == {"type": "Point", "coordinates": [1.5, 2.5]}
    # ISO Z offset (1001) and OGC Z flag both flatten to 2-D
    z_iso = b"\x01" + struct.pack("<I", 1001) + struct.pack("<ddd", 1.0, 2.0, 9.0)
    z_ogc = b"\x01" + struct.pack("<I", 0x80000001) + struct.pack("<ddd", 1.0, 2.0, 9.0)
    for buf in (z_iso, z_ogc):
        assert wkb_to_geojson(buf) == {"type": "Point", "coordinates": [1.0, 2.0]}


def test_gpkg_blob_roundtrip():
    for g in GEOMS:
        blob = make_gpkg_blob(g, srs_id=4326)
        assert blob[:2] == b"GP"
        assert parse_gpkg_blob(blob) == g
    assert parse_gpkg_blob(None) is None


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixtures not mounted")
def test_read_reference_fixture(spark):
    """The reference 5-layer OSM gpkg: layer catalog, feature counts,
    properties (incl. non-ASCII), and the Minsk boundary MultiPolygon's
    coordinate content EXACTLY matching the .geojson sibling."""
    vds = read_gpkg(spark, FIXTURE)
    assert sorted(vds.layer_names) == sorted(
        ["points", "lines", "multilinestrings", "multipolygons", "other_relations"]
    )
    assert vds["points"].count() == 7
    assert vds["lines"].count() == 25
    assert vds["multipolygons"].count() == 5
    assert vds["multilinestrings"].count() == 0
    rows = vds["multipolygons"].collect()
    minsk = next(r for r in rows if json.loads(r["props_json"]).get("name") == "Минск")
    g = json.loads(minsk["geojson"])
    assert minsk["gtype"] == "MultiPolygon" and len(g["coordinates"]) == 3
    ref = json.load(open(FIXTURE_GJ))
    mp = next(ft["geometry"] for ft in ref["features"] if ft["geometry"]["type"] == "MultiPolygon")
    a = np.array(sorted((p[0], p[1]) for part in g["coordinates"] for ring in part for p in ring))
    b = np.array(sorted((p[0], p[1]) for part in mp["coordinates"] for ring in part for p in ring))
    assert len(a) == len(b) == 1949
    # identical coordinate content (export part/ring ORDER differs):
    # every gpkg vertex appears exactly in the geojson and vice versa
    sa = {tuple(p) for p in a.tolist()}
    sb = {tuple(p) for p in b.tolist()}
    assert sa == sb
    assert np.allclose(a.min(0), b.min(0)) and np.allclose(a.max(0), b.max(0))


def test_write_read_roundtrip(spark, tmp_path):
    """Multi-layer write -> sqlite spec tables -> read back identical
    (fid, gtype, geojson, typed props incl. NULL geometry rows)."""
    rows_a = [
        (1, "Point", '{"type":"Point","coordinates":[27.5,53.9]}', '{"name":"a","pop":100,"w":1.5}'),
        (2, "Point", '{"type":"Point","coordinates":[27.6,53.8]}', '{"name":"б","pop":200,"w":2.5}'),
        (3, None, None, '{"name":"no-geom","pop":0,"w":0.0}'),
    ]
    rows_b = [
        (10, "Polygon", '{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]}', "{}"),
    ]
    schema = "fid long, gtype string, geojson string, props_json string"
    vds = VectorDataset(
        {"pts": spark.createDataFrame(rows_a, schema), "polys": spark.createDataFrame(rows_b, schema)}
    )
    path = str(tmp_path / "out.gpkg")
    write_gpkg(vds, path)
    # overwrite semantics (reference gdal.py:1250-1256)
    with pytest.raises(FileExistsError):
        write_gpkg(vds, path)
    write_gpkg(vds, path, overwrite=True)

    import sqlite3

    con = sqlite3.connect(path)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    reg = dict(con.execute("SELECT table_name, geometry_type_name FROM gpkg_geometry_columns"))
    assert reg == {"pts": "POINT", "polys": "POLYGON"}
    minx, miny, maxx, maxy = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents WHERE table_name='pts'"
    ).fetchone()
    assert (minx, miny, maxx, maxy) == (27.5, 53.8, 27.6, 53.9)
    con.close()

    back = read_gpkg(spark, path)
    got = sorted(tuple(r) for r in back["pts"].collect())
    want = sorted(rows_a)
    for g_, w in zip(got, want):
        assert g_[0] == w[0] and g_[1] == w[1]
        assert (g_[2] is None) == (w[2] is None)
        if g_[2]:
            assert json.loads(g_[2]) == json.loads(w[2])
        assert json.loads(g_[3]) == json.loads(w[3])
    assert back["polys"].count() == 1


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixtures not mounted")
def test_gpkg_to_epsg(spark):
    """Reference test_vector.py:21-27: open a gpkg, to_epsg(3857) —
    every layer's coordinates equal the direct batch transform."""
    from gdal_boots_spark.geom.crs import transform_coords

    vds = read_gpkg(spark, FIXTURE, layers=["points"])
    out = vds.to_epsg(4326, 3857)
    src = {r["fid"]: json.loads(r["geojson"]) for r in vds["points"].collect() if r["geojson"]}
    dst = {r["fid"]: json.loads(r["geojson"]) for r in out["points"].collect() if r["geojson"]}
    assert set(src) == set(dst) and len(src) == 7
    for fid, s in src.items():
        x, y = transform_coords(np.array([s["coordinates"][0]]), np.array([s["coordinates"][1]]), 4326, 3857)
        d = dst[fid]["coordinates"]
        assert abs(d[0] - float(x[0])) < 1e-6 and abs(d[1] - float(y[0])) < 1e-6


def test_to_file_driver_dispatch(spark, tmp_path):
    """Reference to_file(filename, options, overwrite) dispatch
    (gdal.py:1225-1263): GPKGOptions -> gpkg, ESRIShapeOptions -> shp
    datasource dir, GeoJSONOptions -> FeatureCollection; overwrite
    raises when the target exists (test_raster.py:138-140)."""
    from gdal_boots_spark.sources.options import ESRIShapeOptions, GeoJSONOptions, GPKGOptions
    from gdal_boots_spark.sources.shp import read_shp
    from gdal_boots_spark.sources.vector_io import read_geojson

    df = spark.createDataFrame(
        [(1, "Point", '{"type":"Point","coordinates":[1.5,2.5]}', '{"name":"a"}')],
        "fid long, gtype string, geojson string, props_json string",
    )
    vds = VectorDataset({"layer1": df})

    gpkg = str(tmp_path / "d.gpkg")
    vds.to_file(gpkg, GPKGOptions())
    assert read_gpkg(spark, gpkg)["layer1"].count() == 1
    with pytest.raises(FileExistsError):
        vds.to_file(gpkg, GPKGOptions())

    shp_dir = str(tmp_path / "d_shp")
    vds.to_file(shp_dir, ESRIShapeOptions())
    assert read_shp(spark, os.path.join(shp_dir, "layer1")).count() == 1

    gj = str(tmp_path / "d.geojson")
    vds.to_file(gj, GeoJSONOptions())
    assert read_geojson(spark, gj).count() == 1
    # extension-based dispatch with options=None
    gpkg2 = str(tmp_path / "e.gpkg")
    vds.to_file(gpkg2)
    assert read_gpkg(spark, gpkg2)["layer1"].count() == 1


def test_gpkg_size_guard(spark, tmp_path):
    """VERDICT r4 item 6: driver-side SQLite read refuses containers
    above the dimension-size threshold."""
    import pytest as _pytest

    from gdal_boots_spark.sources.gpkg import read_gpkg

    path = str(tmp_path / "tiny.gpkg")
    with open(path, "wb") as f:
        f.write(b"\x00" * 64)
    with _pytest.raises(ValueError, match="read_gpkg_distributed"):
        read_gpkg(spark, path, max_bytes=16)


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixtures not mounted")
def test_gpkg_distributed_parity_fixture(spark, tmp_path):
    """read_gpkg_distributed (one-call planet-scale path) must
    reproduce the driver-side read EXACTLY — every layer, every
    column byte-for-byte — on the reference 5-layer fixture."""
    from gdal_boots_spark.sources.gpkg import read_gpkg_distributed

    a = read_gpkg(spark, FIXTURE)
    b = read_gpkg_distributed(spark, FIXTURE, work_dir=str(tmp_path / "nd"))
    assert sorted(a.layer_names) == sorted(b.layer_names)
    for layer in a.layer_names:
        ra = sorted(tuple(r) for r in a[layer].collect())
        rb = sorted(tuple(r) for r in b[layer].collect())
        assert ra == rb, f"layer {layer}: {len(ra)} vs {len(rb)} rows"


def test_gpkg_distributed_shards_and_reuse(spark, tmp_path):
    """Synthetic multi-layer container through the distributed path:
    tiny shard_bytes rotates multiple splittable files, NULL-geometry
    and non-ASCII property rows survive byte-exactly, layers= filters,
    and a second read reuses the _SUCCESS work_dir (no re-stream)."""
    from gdal_boots_spark.sources.gpkg import gpkg_to_ndjson, read_gpkg_distributed

    rows_a = [
        (
            i,
            "Point",
            '{"type":"Point","coordinates":[%.1f,53.9]}' % (27.0 + i / 10.0),
            '{"name":"б%d","pop":%d,"w":%.1f}' % (i, i * 100, i + 0.5),
        )
        for i in range(1, 9)
    ] + [(9, None, None, '{"name":"no-geom","pop":0,"w":0.0}')]
    rows_b = [
        (10, "Polygon", '{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]}', "{}"),
    ]
    schema = "fid long, gtype string, geojson string, props_json string"
    vds = VectorDataset(
        {"pts": spark.createDataFrame(rows_a, schema), "polys": spark.createDataFrame(rows_b, schema)}
    )
    path = str(tmp_path / "c.gpkg")
    write_gpkg(vds, path)

    out = str(tmp_path / "nd")
    manifest = gpkg_to_ndjson(path, out, shard_bytes=64)
    pts_dir = os.path.join(out, manifest["layers"]["pts"])
    assert len(os.listdir(pts_dir)) > 1  # rotation produced several splits
    assert manifest["counts"] == {"pts": 9, "polys": 1}

    a = read_gpkg(spark, path)
    b = read_gpkg_distributed(spark, path, work_dir=out)  # reuses _SUCCESS
    for layer in ("pts", "polys"):
        ra = sorted(tuple(r) for r in a[layer].collect())
        rb = sorted(tuple(r) for r in b[layer].collect())
        assert ra == rb
    only = read_gpkg_distributed(spark, path, work_dir=out, layers=["polys"])
    assert only.layer_names == ["polys"]


def test_gpkg_to_ndjson_bounded_memory(spark, tmp_path):
    """The streaming converter must hold O(1) rows, not the table: the
    sqlite3 cursor streams and each row is written out immediately, so
    peak tracemalloc on a many-row container stays far below the
    whole-table footprint read_gpkg materializes (its rows list)."""
    import tracemalloc

    from gdal_boots_spark.sources.gpkg import gpkg_to_ndjson

    n = 30000
    rows = [
        (
            i,
            "Point",
            '{"type":"Point","coordinates":[%.2f,%.2f]}' % ((i % 300) / 10.0, (i % 150) / 10.0),
            '{"name":"feature-%d","val":%d}' % (i, i * 3),
        )
        for i in range(1, n + 1)
    ]
    vds = VectorDataset(
        {"many": spark.createDataFrame(rows, "fid long, gtype string, geojson string, props_json string")}
    )
    path = str(tmp_path / "many.gpkg")
    write_gpkg(vds, path)
    size = os.path.getsize(path)
    assert size > 2 << 20  # a genuinely multi-MB container

    out = str(tmp_path / "nd")
    tracemalloc.start()
    manifest = gpkg_to_ndjson(path, out)
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert manifest["counts"] == {"many": n}
    # O(1) rows: peak stays under 2 MB while the container is >2 MB
    # and the emitted NDJSON is larger still
    assert peak < 2 << 20, f"peak {peak / 2**20:.1f} MiB"


def test_from_gpkg_distributed_classmethod(spark, tmp_path):
    """The public VectorDataset.from_gpkg(distributed=True) entry point
    dispatches to the distributed reader with kwargs intact."""
    rows = [(1, "Point", '{"type":"Point","coordinates":[1.0,2.0]}', '{"a":1}')]
    vds = VectorDataset(
        {"l1": spark.createDataFrame(rows, "fid long, gtype string, geojson string, props_json string")}
    )
    path = str(tmp_path / "d.gpkg")
    write_gpkg(vds, path)
    out = VectorDataset.from_gpkg(spark, path, distributed=True, work_dir=str(tmp_path / "nd"))
    got = out["l1"].collect()
    assert len(got) == 1 and got[0]["gtype"] == "Point" and got[0]["fid"] == 1


def test_single_file_export_max_features_guard(spark, tmp_path):
    """VERDICT r6 item 7: single-file exports (GPKG/Shapefile/GeoJSON)
    collect to the driver; each must refuse planet-scale layers early
    (bounded limit-collect, never an unbounded collect), pointing at
    the sharded NDJSON/parquet scale path — mirroring the reader-side
    size guards."""
    from gdal_boots_spark.sources.shp import write_shp
    from gdal_boots_spark.sources.vector_io import FEATURE_SCHEMA, write_geojson

    rows = [
        (i, "Point", json.dumps({"type": "Point", "coordinates": [float(i), 0.5]}), "{}")
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, FEATURE_SCHEMA)
    with pytest.raises(ValueError, match="write_ndjson"):
        write_gpkg({"pts": df}, str(tmp_path / "a.gpkg"), max_features=3)
    with pytest.raises(ValueError, match="write_ndjson"):
        write_shp(df, str(tmp_path / "a.shp"), max_features=3)
    with pytest.raises(ValueError, match="write_ndjson"):
        write_geojson(df, str(tmp_path / "a.geojson"), max_features=3)
    # at/below the cap the exports still work end-to-end
    write_gpkg({"pts": df}, str(tmp_path / "b.gpkg"), max_features=5)
    assert read_gpkg(spark, str(tmp_path / "b.gpkg"))["pts"].count() == 5
