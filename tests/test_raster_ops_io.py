"""Parity small ops: as_type, band ops, window write, meta codec,
PNG codec round-trip, vector GeoJSON I/O, writer options."""

import json
import os

import numpy as np
import pytest

from gdal_boots_spark.operators.raster_ops import (
    add_band,
    as_type,
    is_valid,
    meta_decode,
    meta_encode,
    select_band,
    write_window,
)
from gdal_boots_spark.sources.options import PNG, GeoJSONOptions, GTiffLike
from gdal_boots_spark.sources.png import decode_png, encode_png
from gdal_boots_spark.sources.tiles import RasterGrid, array_to_tiles, generate_tiles, ramp_fill, tiles_to_array
from gdal_boots_spark.sources.vector_io import read_geojson, write_geojson


def _ramp(spark, bands=1):
    grid = RasterGrid("ro", 4326, (1.0, 0.0, 0.0, 0.0, -1.0, 6.0), 8, 6, 4, 4, bands, "int32")
    return generate_tiles(spark, grid, ramp_fill), grid


def test_as_type(spark):
    tiles, grid = _ramp(spark)
    out, og = as_type(tiles, grid, "float64")
    assert og.dtype == "float64"
    arr = tiles_to_array(out, og)
    assert arr.dtype == np.float64
    assert np.array_equal(arr, np.arange(1, 49).reshape(6, 8))


def test_band_select_and_add(spark):
    tiles, grid = _ramp(spark, bands=2)
    assert select_band(tiles, 1).count() == grid.n_tiles_x * grid.n_tiles_y
    extra, eg = _ramp(spark)
    out, og = add_band(tiles, grid, extra)
    assert og.bands == 3
    assert out.where("band = 2").count() == grid.n_tiles_x * grid.n_tiles_y


def test_write_window_scalar_broadcast(spark):
    # reference __setitem__ scalar broadcast (gdal.py:459-460)
    tiles, grid = _ramp(spark)
    out = write_window(tiles, grid, (2, 1, 6, 4), 99)
    arr = tiles_to_array(out, grid)
    exp = np.arange(1, 49).reshape(6, 8).copy()
    exp[1:4, 2:6] = 99
    assert np.array_equal(arr, exp)


def test_is_valid(spark):
    tiles, grid = _ramp(spark)
    rows = is_valid(tiles).collect()
    assert all(r["ok"] for r in rows) and len(rows) == 4


def test_meta_codec_roundtrip():
    # gdal.py:230-239 'json:' convention (golden style test_raster.py:563-625)
    meta = {"one": 1, "name": "s2", "nested": {"a": [1, 2]}, "f": 1.4}
    enc = meta_encode(meta)
    assert enc["name"] == "s2" and enc["one"] == "json:1"
    assert meta_decode(enc) == meta


def test_png_roundtrip_gray8():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_gray16_and_rgb():
    rng = np.random.default_rng(9)
    img16 = rng.integers(0, 65536, (21, 17), dtype=np.uint16)
    assert np.array_equal(decode_png(encode_png(img16)), img16)
    rgb = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)


def test_png_magic_and_zlevel():
    img = np.zeros((64, 64), np.uint8)
    data = encode_png(img, zlevel=9)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"  # magic golden (test_raster.py:90-113 style)
    assert len(encode_png(img, zlevel=0)) > len(data)


def test_vector_geojson_roundtrip(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "id": 1, "geometry": {"type": "Point", "coordinates": [27.5, 53.9]},
             "properties": {"name": "a", "rank": 3}},
            {"type": "Feature", "id": 2, "geometry": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]},
             "properties": {"name": "b"}},
        ],
    }
    p = str(tmp_path / "x.geojson")
    with open(p, "w") as f:
        json.dump(fc, f)
    df = read_geojson(spark, p)
    assert df.count() == 2
    assert {r["gtype"] for r in df.collect()} == {"Point", "Polygon"}

    out = str(tmp_path / "y.geojson")
    write_geojson(df, out)
    back = read_geojson(spark, out)
    assert sorted(r["geojson"] for r in back.collect()) == sorted(r["geojson"] for r in df.collect())
    # overwrite=False on existing -> error (test_raster.py:138-140 semantics)
    with pytest.raises(FileExistsError):
        write_geojson(df, out)
    write_geojson(df, out, overwrite=True)
    # inline GeoJSON string input (gdal.py:860)
    inline = read_geojson(spark, json.dumps({"type": "Point", "coordinates": [1.0, 2.0]}))
    assert inline.count() == 1


def test_driver_options_encoding():
    # reference GTiff drops zlevel unless deflate (options.py:88-92)
    assert "ZLEVEL" in GTiffLike(compress="deflate").encode()
    assert "ZLEVEL" not in GTiffLike(compress="zstd").encode()
    assert GTiffLike(compress="zstd").parquet_options() == {"compression": "zstd"}
    assert PNG(zlevel=9).encode() == {"ZLEVEL": "9"}
    assert GeoJSONOptions().encode()["COORDINATE_PRECISION"] == "15"


def test_meta_column_propagates_through_ops(spark):
    """Reference as_type/warp preserve metadata (gdal.py:285-292);
    engine: the 'json:'-encoded meta column rides every tile row."""
    from gdal_boots_spark.operators.warp import fast_warp
    from gdal_boots_spark.operators.raster_ops import meta_decode

    grid = RasterGrid("mm", 4326, (1.0, 0.0, 0.0, 0.0, -1.0, 8.0), 8, 8, 4, 4, 1, "int32",
                      meta={"sensor": "S2", "rev": 3, "cal": {"a": 1.5}})
    tiles = generate_tiles(spark, grid, ramp_fill)
    r = tiles.first()
    assert meta_decode(dict(r["meta"])) == {"sensor": "S2", "rev": 3, "cal": {"a": 1.5}}
    # through dtype cast (schema passthrough)
    out, og = as_type(tiles, grid, "float64")
    assert meta_decode(dict(out.first()["meta"])) == grid.meta
    # through a window slice (re-emitted rows carry the out grid's meta)
    from dataclasses import replace

    sl, sg = fast_warp(tiles, replace(grid, meta={"sensor": "S2"}), (1.0, 1.0, 7.0, 7.0))
    # the slice used the original `tiles` rows but emits out-grid meta
    assert sl.first()["meta"] is None or dict(sl.first()["meta"])


def test_png_ingestion_and_export_roundtrip(spark, tmp_path):
    """binaryFile PNG ingest -> tile table -> per-tile PNG export."""
    from gdal_boots_spark.sources.png import decode_png, encode_png
    from gdal_boots_spark.sources.tiles import png_to_tiles, tiles_to_png

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    p = tmp_path / "imgs"
    p.mkdir()
    (p / "a.png").write_bytes(encode_png(img))

    grid = RasterGrid("png1", 4326, (0.1, 0.0, 26.0, 0.0, -0.1, 55.0), 32, 24, 16, 16, 1, "uint8")
    tiles = png_to_tiles(spark, str(p), grid)
    assert tiles.count() == 4
    assert np.array_equal(tiles_to_array(tiles, grid), img)

    # per-tile export decodes back to the tile pixels
    out = {r["tile_key"]: bytes(r["png"]) for r in tiles_to_png(tiles).collect()}
    t00 = decode_png(out["png1/0/0/0"])
    assert np.array_equal(t00, img[:16, :16])


def test_ndjson_roundtrip(spark, tmp_path):
    """write_ndjson -> read_ndjson round-trips mixed geometry types
    (ADVICE r1: the flat writer was unreadable by the reader)."""
    from gdal_boots_spark.sources.vector_io import read_ndjson, write_ndjson

    rows = [
        (1, "Point", '{"type":"Point","coordinates":[27.5,53.9]}', '{"name":"a","rank":3}'),
        (2, "Polygon", '{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,0]]]}', "{}"),
        (3, "LineString", '{"type":"LineString","coordinates":[[0,0],[2,2]]}', '{"k":null}'),
    ]
    df = spark.createDataFrame(rows, "fid long, gtype string, geojson string, props_json string")
    p = str(tmp_path / "feats_ndjson")
    write_ndjson(df, p)
    back = read_ndjson(spark, p)
    got = {r["fid"]: (r["gtype"], json.loads(r["geojson"]), json.loads(r["props_json"])) for r in back.collect()}
    exp = {fid: (gt, json.loads(gj), json.loads(pj)) for fid, gt, gj, pj in rows}
    assert got == exp


def test_png_export_rejects_wide_dtypes(spark):
    """int32 tiles must error, not wrap (reference PNG driver refuses)."""
    from gdal_boots_spark.sources.tiles import generate_tiles, ramp_fill, tiles_to_png

    grid = RasterGrid("png_bad", 4326, (0.1, 0.0, 0.0, 0.0, -0.1, 5.0), 16, 16, 16, 16, 1, "int32")
    tiles = generate_tiles(spark, grid, ramp_fill)
    with pytest.raises(Exception, match="uint8/uint16"):
        tiles_to_png(tiles).collect()


def test_vector_dataset_multilayer_roundtrip(spark, tmp_path):
    """5-layer catalog round-trip (reference 5-layer GPKG fixture,
    test_vector.py:35-60): names, counts, features survive; duplicate
    add_layer and existing-path write error like the reference."""
    from gdal_boots_spark.sources.vector_io import VectorDataset

    def mk(i):
        rows = [
            (j, "Point", f'{{"type":"Point","coordinates":[{26 + i}.5,{53 + (j % 3)}.25]}}', f'{{"layer":{i}}}')
            for j in range(3 + i)
        ]
        return spark.createDataFrame(rows, "fid long, gtype string, geojson string, props_json string")

    vds = VectorDataset({f"layer_{i}": mk(i) for i in range(5)})
    assert len(vds) == 5 and vds.layer_names == [f"layer_{i}" for i in range(5)]
    with pytest.raises(ValueError):
        vds.add_layer("layer_0", mk(0))
    p = str(tmp_path / "vds")
    vds.to_path(p)
    with pytest.raises(FileExistsError):
        vds.to_path(p)
    back = VectorDataset.from_path(spark, p)
    assert back.layer_names == vds.layer_names
    for n in vds.layer_names:
        a = {(r["fid"], r["gtype"], r["geojson"]) for r in vds[n].collect()}
        b = {(r["fid"], r["gtype"], r["geojson"]) for r in back[n].collect()}
        assert a == b and len(a) > 0
    # whole-catalog CRS transform keeps layer structure
    t = vds.to_epsg(4326, 3857)
    assert t.layer_names == vds.layer_names
    assert '"type":"Point"' in t.first().first()["geojson"]


def test_band_descriptions_parity():
    """gdal.py:278-283: set/get band descriptions; falsy set is a no-op;
    unset bands read '' (GDAL GetDescription default); grid-replace ops
    (as_type, resample) carry descriptions for free."""
    from dataclasses import replace

    from gdal_boots_spark.operators.raster_ops import get_band_description, set_band_description

    grid = RasterGrid("bd", 4326, (1.0, 0.0, 0.0, 0.0, -1.0, 8.0), 8, 8, 8, 8, 3, "int32")
    grid = set_band_description(grid, 0, "red")
    grid = set_band_description(grid, 2, "nir")
    grid = set_band_description(grid, 1, "")  # falsy -> no-op (gdal.py:279)
    assert get_band_description(grid, 0) == "red"
    assert get_band_description(grid, 1) == ""
    assert get_band_description(grid, 2) == "nir"
    # as_type semantics: replace(grid, dtype=...) preserves meta — the
    # reference copies descriptions by hand (gdal.py:289-291)
    cast = replace(grid, dtype="float64")
    assert get_band_description(cast, 0) == "red" and get_band_description(cast, 2) == "nir"
    # the 'json:' codec round-trips the list through the meta column
    from gdal_boots_spark.operators.raster_ops import meta_decode, meta_encode

    assert meta_decode(meta_encode(grid.meta))["band_descriptions"] == ["red", "", "nir"]


def test_int8_dtype_supported(spark):
    """DTYPE_TO_GDAL gains int8 on GDAL>=3.7 (gdal.py:58-71) — the
    engine supports it unconditionally: generate -> cast -> checksum
    round-trips, negative values preserved."""
    from gdal_boots_spark.operators.raster_ops import as_type, is_valid

    grid = RasterGrid("i8", 4326, (1.0, 0.0, 0.0, 0.0, -1.0, 16.0), 16, 16, 8, 8, 1, "int8")

    def fill(b, ty, tx, h, w, g):
        return (np.arange(h * w, dtype=np.int64).reshape(h, w) % 256 - 128).astype(np.int8)

    tiles = generate_tiles(spark, grid, fill)
    arr = tiles_to_array(tiles, grid)
    assert arr.dtype == np.int8 and arr.min() < 0
    ok = {r["tile_key"]: r["ok"] for r in is_valid(tiles).collect()}
    assert all(ok.values()) and len(ok) == 4
    up, ug = as_type(tiles, grid, "int16")
    assert tiles_to_array(up, ug).dtype == np.int16
    np.testing.assert_array_equal(tiles_to_array(up, ug), arr.astype(np.int16))
    # full reference dtype matrix (incl. the GDAL>=3.7 int8 row)
    for dt in ("uint8", "uint16", "uint32", "int8", "int16", "int32", "float32", "float64"):
        c, cg = as_type(tiles, grid, dt)
        assert tiles_to_array(c, cg).dtype == np.dtype(dt)


def test_warp_resolution_ratio_golden(spark):
    """Reference golden test_raster.py:299-302: warp(resolution=(100,100))
    on a 10m raster -> transform (a, -e) == (100, 100) and shape ==
    round(shape / 10) — here through the engine's warp facade."""
    from gdal_boots_spark.operators.warp_facade import warp

    grid = RasterGrid("wr", 32636, (10.0, 0.0, 500000.0, 0.0, -10.0, 6000000.0), 64, 48, 16, 16, 1, "int32")
    tiles = generate_tiles(spark, grid, ramp_fill)
    out_tiles, og = warp(spark, tiles, grid, resolution=(100, 100), resampling="average")
    assert (og.transform[0], -og.transform[4]) == (100.0, 100.0)
    assert (og.height, og.width) == (round(48 / 10), round(64 / 10))
    # pixel values follow the documented footprint rule (window_agg:
    # source CENTERS in [j*scale, (j+1)*scale) -> index range
    # [ceil(j*s - 0.5), ceil((j+1)*s - 0.5))) at the extent-preserving
    # scales 64/6 x 48/5 — computed here independently from the ramp
    arr = tiles_to_array(out_tiles, og)
    W = 64
    src = np.add.outer(np.arange(48) * W, np.arange(64)).astype(np.float64) + 1
    sx, sy = 64 / 6, 48 / 5
    bx = np.clip(np.ceil(np.arange(7) * sx - 0.5).astype(int), 0, 64)
    by = np.clip(np.ceil(np.arange(6) * sy - 0.5).astype(int), 0, 48)
    exp = np.empty((5, 6), np.float64)
    for i in range(5):
        for j in range(6):
            exp[i, j] = src[by[i] : by[i + 1], bx[j] : bx[j + 1]].mean()
    np.testing.assert_allclose(arr.astype(np.float64), exp, rtol=1e-12)


def test_gtiff_roundtrip_all_dtypes():
    """REAL GeoTIFF container (gdal.py:526-535 to_file analogue): every
    reference dtype x tiled/stripped x none/deflate round-trips
    bit-exactly with georeferencing, EPSG and nodata preserved."""
    from gdal_boots_spark.sources.gtiff import decode_gtiff, encode_gtiff

    tr = (10.0, 0.0, 500000.0, 0.0, -10.0, 6000000.0)
    for dt in ("uint8", "uint16", "uint32", "int8", "int16", "int32", "float32", "float64"):
        arr = (np.arange(2 * 70 * 90).reshape(2, 70, 90) % 200 - 50).astype(dt)
        for layout in (dict(blockxsize=64, blockysize=48), dict(blockxsize=None, blockysize=None)):
            for comp in ("deflate", "none"):
                blob = encode_gtiff(arr, tr, epsg=32636, nodata=-50.0, compress=comp, **layout)
                back, tr2, epsg2, nd2 = decode_gtiff(blob)
                np.testing.assert_array_equal(back, arr)
                assert tr2 == tr and epsg2 == 32636 and nd2 == -50.0
    # geographic CRS lands in GeographicTypeGeoKey
    blob = encode_gtiff(np.zeros((1, 16, 16), np.uint8), (0.1, 0, 26.0, 0, -0.1, 55.0), epsg=4326)
    assert decode_gtiff(blob)[2] == 4326


def test_gtiff_zlevel_byte_size_golden():
    """Reference byte-size golden (test_raster.py:90-113): higher zlevel
    -> smaller file; zlevel only applies to deflate (options.py:88-92,
    mirrored by GTiffLike.encode)."""
    from gdal_boots_spark.sources.gtiff import encode_gtiff
    from gdal_boots_spark.sources.options import GTiffLike

    ramp = (np.arange(512 * 512) % 251).astype(np.uint8).reshape(1, 512, 512)
    tr = (1.0, 0.0, 0.0, 0.0, -1.0, 512.0)
    s1 = len(encode_gtiff(ramp, tr, zlevel=1))
    s9 = len(encode_gtiff(ramp, tr, zlevel=9))
    sn = len(encode_gtiff(ramp, tr, compress="none"))
    assert s9 <= s1 < sn
    # none-compress ignores zlevel entirely (same bytes either way)
    a = encode_gtiff(ramp, tr, compress="none", zlevel=1)
    b = encode_gtiff(ramp, tr, compress="none", zlevel=9)
    assert a == b
    assert "ZLEVEL" not in GTiffLike(compress="none").encode()


def test_gtiff_spark_export_ingest_roundtrip(spark, tmp_path):
    """write_gtiff (single-file to_file semantics) -> read_gtiff_tiles
    (distributed binaryFile ingest) reproduces the original tile table's
    pixels, grid and georeferencing."""
    from gdal_boots_spark.sources.gtiff import read_gtiff_tiles, write_gtiff

    grid = RasterGrid("gt", 32636, (10.0, 0.0, 500000.0, 0.0, -10.0, 6000000.0), 48, 32, 16, 16, 1, "int32")
    tiles = generate_tiles(spark, grid, ramp_fill)
    path = str(tmp_path / "gt.tif")
    write_gtiff(tiles, grid, path)
    back = read_gtiff_tiles(spark, path, tile_w=16, tile_h=16)
    rows = {r["tile_key"]: r for r in back.collect()}
    orig = {r["tile_key"]: r for r in tiles.collect()}
    assert set(rows) == set(orig)
    for k in orig:
        assert rows[k]["data"] == orig[k]["data"], k
        assert rows[k]["epsg"] == 32636
        assert list(rows[k]["transform"]) == list(orig[k]["transform"])
    arr = tiles_to_array(back, grid)
    np.testing.assert_array_equal(arr, tiles_to_array(tiles, grid))


def test_ndjson_synthetic_fid_never_collides_with_explicit(spark, tmp_path):
    """ADVICE r3: id-less rows get NEGATIVE synthetic fids so a mixed
    id/id-less NDJSON can't produce duplicate fid keys (partition-0
    monotonically_increasing_id starts at 0,1,2...)."""
    from gdal_boots_spark.sources.vector_io import read_ndjson

    p = str(tmp_path / "mixed.ndjson")
    pt = '{"type":"Point","coordinates":[1.0,2.0]}'
    with open(p, "w") as f:
        for i in range(5):  # explicit ids 0..4 — the old collision range
            f.write('{"type":"Feature","id":%d,"geometry":%s,"properties":{}}\n' % (i, pt))
        for _ in range(5):  # id-less
            f.write('{"type":"Feature","geometry":%s,"properties":{}}\n' % pt)
    back = read_ndjson(spark, p)
    fids = [r["fid"] for r in back.collect()]
    assert len(fids) == 10 and len(set(fids)) == 10
    assert sorted(f for f in fids if f >= 0) == [0, 1, 2, 3, 4]
    assert sum(1 for f in fids if f < 0) == 5


def test_reference_binary_fixtures_decode(spark):
    """The reference's own GDAL-produced binary fixtures decode with
    the from-scratch codecs (test_raster.py:24-49 goldens): the
    big-endian lena512color.tiff and lena512color.png both yield
    (3, 512, 512) uint8 with IDENTICAL pixels (cross-codec bit-exact),
    window slices match the reference shape rule, and a zlevel=9
    re-encode round-trips bit-exact."""
    import os

    import numpy as np
    import pytest

    from gdal_boots_spark.sources.gtiff import decode_gtiff
    from gdal_boots_spark.sources.png import decode_png, encode_png

    png_path = "/root/reference/tests/fixtures/lena512color.png"
    tif_path = "/root/reference/tests/fixtures/lena512color.tiff"
    if not (os.path.exists(png_path) and os.path.exists(tif_path)):
        pytest.skip("reference fixtures not mounted")
    png = decode_png(open(png_path, "rb").read())
    assert png.shape == (512, 512, 3) and png.dtype == np.uint8
    tif, transform, epsg, nodata = decode_gtiff(open(tif_path, "rb").read())
    assert tif.shape == (3, 512, 512) and tif.dtype == np.uint8  # golden test_raster.py:27
    assert np.array_equal(np.moveaxis(tif, 0, -1), png)
    # ds[:, :100, :100].shape == (3, 100, 100) (golden test_raster.py:28)
    assert tif[:, :100, :100].shape == (3, 100, 100)
    # to_bytes(PNG(zlevel=9)) path: re-encode decodes bit-exact and
    # beats the raw pixel volume (on photographic data zlib level 9
    # can exceed level 1 by a hair, so no cross-level ordering here)
    z9 = encode_png(png, zlevel=9)
    assert np.array_equal(decode_png(z9), png)
    assert len(z9) < png.nbytes
