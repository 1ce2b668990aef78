"""ESRI Shapefile driver (sources/shp.py) — the reference exports an
ESRIShape driver marker (options.py:126-130); this closes the last
vector-driver scope exclusion without GDAL.

Checks: file-code/bbox header fixed points from the spec, ring-winding
normalization (outer clockwise / holes counter-clockwise), write->read
round-trips for every shape type, typed DBF attributes, and
cross-driver consistency (the same features through GPKG and SHP read
back with identical geometry and attribute content).
"""

import json
import struct

import numpy as np
import pytest

from gdal_boots_spark.sources.shp import _ring_area2, read_shp, write_shp

SCHEMA = "fid long, gtype string, geojson string, props_json string"


def test_shp_points_roundtrip(spark, tmp_path):
    rows = [
        (1, "Point", '{"type":"Point","coordinates":[27.5,53.9]}', '{"name":"a","pop":100,"w":1.5}'),
        (2, "Point", '{"type":"Point","coordinates":[27.6,53.8]}', '{"name":"б","pop":200,"w":2.5}'),
        (3, None, None, '{"name":"empty","pop":0,"w":0.0}'),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    base = str(tmp_path / "pts")
    write_shp(df, base)
    # header fixed points: file code 9994, shape type 1, bbox
    buf = open(base + ".shp", "rb").read()
    assert struct.unpack_from(">i", buf, 0)[0] == 9994
    assert struct.unpack_from("<i", buf, 28)[0] == 1000  # version
    assert struct.unpack_from("<i", buf, 32)[0] == 1  # point type
    assert struct.unpack_from("<dddd", buf, 36) == (27.5, 53.8, 27.6, 53.9)
    with pytest.raises(FileExistsError):
        write_shp(df, base)
    back = sorted(read_shp(spark, base + ".shp").collect(), key=lambda r: r["fid"])
    assert [r["gtype"] for r in back] == ["Point", "Point", None]
    for r, (fid, gt, gj, pj) in zip(back, rows):
        if gj:
            assert json.loads(r["geojson"]) == json.loads(gj)
        p, w = json.loads(r["props_json"]), json.loads(pj)
        assert p["name"] == w["name"] and p["pop"] == w["pop"] and abs(p["w"] - w["w"]) < 1e-12


def test_shp_polygon_winding_and_holes(spark, tmp_path):
    """Outer rings are written clockwise, holes counter-clockwise (the
    spec's winding rule), and holes re-attach to their outer on read."""
    geom = {
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],  # CCW outer (GeoJSON style)
            [[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]],  # CW hole
        ],
    }
    df = spark.createDataFrame([(0, "Polygon", json.dumps(geom), "{}")], SCHEMA)
    base = str(tmp_path / "poly")
    write_shp(df, base)
    buf = open(base + ".shp", "rb").read()
    nparts, npts = struct.unpack_from("<ii", buf, 100 + 12 + 32)
    assert nparts == 2 and npts == 10
    pts = np.frombuffer(buf, "<f8", count=2 * npts, offset=100 + 12 + 40 + 8).reshape(-1, 2)
    assert _ring_area2(pts[:5]) < 0  # outer clockwise on disk
    assert _ring_area2(pts[5:]) > 0  # hole counter-clockwise
    back = read_shp(spark, base).collect()[0]
    g = json.loads(back["geojson"])
    assert g["type"] == "Polygon" and len(g["coordinates"]) == 2
    # content identical up to direction/rotation
    want = {tuple(p) for ring in geom["coordinates"] for p in ring}
    got = {tuple(p) for ring in g["coordinates"] for p in ring}
    assert want == got
    # hole is the smaller ring
    assert len(g["coordinates"][1]) == 5 and abs(_ring_area2(np.asarray(g["coordinates"][1]))) == 2.0


def test_shp_multi_types_roundtrip(spark, tmp_path):
    cases = [
        ("mls", "MultiLineString", {"type": "MultiLineString", "coordinates": [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]]}),
        ("mpt", "MultiPoint", {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]}),
        (
            "mpoly",
            "MultiPolygon",
            {
                "type": "MultiPolygon",
                "coordinates": [
                    [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
                    [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]],
                ],
            },
        ),
    ]
    for name, gt, geom in cases:
        df = spark.createDataFrame([(0, gt, json.dumps(geom), "{}")], SCHEMA)
        base = str(tmp_path / name)
        write_shp(df, base)
        g = json.loads(read_shp(spark, base).collect()[0]["geojson"])
        assert g["type"] == gt, name
        def flat(gg):
            if gg["type"] == "MultiPoint":
                return {tuple(p) for p in gg["coordinates"]}
            if gg["type"] == "MultiPolygon":
                return {tuple(q) for part in gg["coordinates"] for ring in part for q in ring}
            return {tuple(q) for part in gg["coordinates"] for q in part}

        assert flat(geom) == flat(g), name
    # mixed types in one file error (spec: single-type container)
    df = spark.createDataFrame(
        [
            (0, "Point", '{"type":"Point","coordinates":[1.0,2.0]}', "{}"),
            (1, "LineString", '{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0]]}', "{}"),
        ],
        SCHEMA,
    )
    with pytest.raises(ValueError, match="single-type"):
        write_shp(df, str(tmp_path / "mixed"))


def test_shp_gpkg_cross_driver(spark, tmp_path):
    """The same features through the GPKG and SHP drivers read back
    with identical geometry and attribute content."""
    from gdal_boots_spark.sources.gpkg import read_gpkg, write_gpkg
    from gdal_boots_spark.sources.vector_io import VectorDataset

    rows = [
        (1, "Point", '{"type":"Point","coordinates":[10.25,20.5]}', '{"name":"x","n":7,"v":0.125}'),
        (2, "Point", '{"type":"Point","coordinates":[-3.5,45.0]}', '{"name":"y","n":-2,"v":100.0}'),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    write_shp(df, str(tmp_path / "cd"))
    write_gpkg(VectorDataset({"cd": df}), str(tmp_path / "cd.gpkg"))
    a = sorted(
        (r["geojson"], json.loads(r["props_json"])["name"], json.loads(r["props_json"])["n"], json.loads(r["props_json"])["v"])
        for r in read_shp(spark, str(tmp_path / "cd")).collect()
    )
    b = sorted(
        (r["geojson"], json.loads(r["props_json"])["name"], json.loads(r["props_json"])["n"], json.loads(r["props_json"])["v"])
        for r in read_gpkg(spark, str(tmp_path / "cd.gpkg"))["cd"].collect()
    )
    assert a == b


def test_shp_dbf_falsy_and_utf8_truncation(spark, tmp_path):
    """ADVICE r4: DBF C-field width must come from str(v) for non-NULL
    falsy values (False/0-as-text would get width 0 and truncate to
    'F'), and the 254-byte truncation must never split a multi-byte
    UTF-8 character."""
    long_cyr = "б" * 200  # 400 utf-8 bytes -> truncated at 254
    rows = [
        (1, "Point", '{"type":"Point","coordinates":[0.0,0.0]}',
         json.dumps({"flag": False, "note": long_cyr})),
        (2, "Point", '{"type":"Point","coordinates":[1.0,1.0]}',
         json.dumps({"flag": True, "note": "short"})),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    base = str(tmp_path / "falsy")
    write_shp(df, base)
    back = sorted(read_shp(spark, base + ".shp").collect(), key=lambda r: r["fid"])
    p1 = json.loads(back[0]["props_json"])
    p2 = json.loads(back[1]["props_json"])
    assert p1["flag"] == "False" and p2["flag"] == "True"
    # truncation lands on a character boundary: 254 // 2 = 127 chars
    assert p1["note"] == "б" * 127
    assert p2["note"] == "short"
