"""Polygonize: pixel-exact raster->vector with cross-tile stitching.

Reference contract: to_vector (gdal.py:609-623) — 4-connected equal
value regions become polygons (shape-level assertions,
test_raster.py:116-140).  Strong oracle here: PIP round-trip — every
pixel center must be inside exactly the polygon of its own component.
"""

import json

import numpy as np

from gdal_boots_spark.geom.packed import from_geojson
from gdal_boots_spark.geom.pip import points_in_packed
from gdal_boots_spark.operators.polygonize import polygonize
from gdal_boots_spark.sources.tiles import RasterGrid, array_to_tiles


def _grid_for(arr, tile=4, rid="pz"):
    return RasterGrid(rid, 4326, (1.0, 0.0, 0.0, 0.0, 1.0, 0.0), arr.shape[1], arr.shape[0], tile, tile, 1, str(arr.dtype))


def _pip_roundtrip(spark, arr, exclude=None, tile=4):
    grid = _grid_for(arr, tile=tile)
    tiles = array_to_tiles(spark, arr, grid)
    rows = polygonize(spark, tiles, grid, exclude=exclude).collect()
    # identity transform (a=1, e=+1): world == pixel-corner coords
    from gdal_boots_spark.geom.polygonize_kernel import label_components

    labels, n = label_components(arr, exclude=exclude)
    assert len(rows) == n, (len(rows), n)
    total_px = sum(r["n_pixels"] for r in rows)
    assert total_px == int((labels > 0).sum())
    jj, ii = np.meshgrid(np.arange(arr.shape[1]) + 0.5, np.arange(arr.shape[0]) + 0.5)
    for r in rows:
        pg = from_geojson(r["geojson"])
        inside = points_in_packed(jj.ravel(), ii.ravel(), pg).reshape(arr.shape)
        # the polygon contains exactly the pixels of ONE component with
        # this value and the right pixel count
        assert inside.sum() == r["n_pixels"], r
        vals = arr[inside]
        assert (vals == r["value"]).all(), r
        lab_inside = labels[inside]
        assert len(set(lab_inside.tolist())) == 1
    return rows


def test_polygonize_basic_regions(spark):
    arr = np.zeros((8, 12), np.int32)
    arr[1:4, 1:5] = 7
    arr[5:7, 2:11] = 9  # spans multiple 4px tiles
    arr[0:8, 11:12] = 7  # separate component, same value
    _pip_roundtrip(spark, arr, exclude=0)


def test_polygonize_hole_across_tiles(spark):
    arr = np.zeros((10, 10), np.int32)
    arr[1:9, 1:9] = 5
    arr[3:6, 3:7] = 0  # hole crossing the tile boundary at col 4
    rows = _pip_roundtrip(spark, arr, exclude=0)
    big = max(rows, key=lambda r: r["n_pixels"])
    gj = json.loads(big["geojson"])
    assert gj["type"] == "Polygon" and len(gj["coordinates"]) == 2  # shell + hole


def test_polygonize_diagonal_not_connected(spark):
    arr = np.zeros((6, 6), np.int32)
    arr[0:3, 0:3] = 2
    arr[3:6, 3:6] = 2  # touches only at a corner -> 2 components
    rows = _pip_roundtrip(spark, arr, exclude=0)
    assert len(rows) == 2


def test_polygonize_all_values_no_exclude(spark):
    arr = np.array([[1, 1, 2], [1, 2, 2], [3, 3, 3]], np.int32)
    rows = _pip_roundtrip(spark, arr, exclude=None, tile=2)
    assert {r["value"] for r in rows} == {1.0, 2.0, 3.0}


def test_polygonize_world_transform(spark):
    arr = np.zeros((4, 4), np.int32)
    arr[1:3, 1:3] = 8
    grid = RasterGrid("wt", 4326, (0.5, 0.0, 10.0, 0.0, -0.5, 20.0), 4, 4, 2, 2, 1, "int32")
    tiles = array_to_tiles(spark, arr, grid)
    rows = polygonize(spark, tiles, grid, exclude=0).collect()
    assert len(rows) == 1
    ring = json.loads(rows[0]["geojson"])["coordinates"][0]
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    assert (min(xs), max(xs)) == (10.5, 11.5)  # cols 1..3 at res 0.5
    assert (min(ys), max(ys)) == (18.5, 19.5)  # rows 1..3, y-flip


def test_polygonize_distributed_cc_matches_driver(spark):
    """A merge graph spanning >= 100 border components (16 stripe rows
    x 16 tile columns -> 256 border comps in 16 chains): the Spark CC
    path (min-label propagation + pointer jumping) must produce exactly
    the driver union-find's components (VERDICT r1 item 5)."""
    import numpy as np

    from gdal_boots_spark.operators.polygonize import polygonize
    from gdal_boots_spark.sources.tiles import RasterGrid, array_to_tiles

    h, w = 16, 256
    arr = np.repeat(np.arange(1, h + 1, dtype=np.int32)[:, None], w, axis=1)
    grid = RasterGrid("cc", 4326, (0.01, 0.0, 0.0, 0.0, -0.01, 10.0), w, h, 16, 16, 1, "int32")
    tiles = array_to_tiles(spark, arr, grid)

    def snap(df):
        return sorted(
            (r["comp_id"], r["value"], r["n_pixels"], r["geojson"]) for r in df.collect()
        )

    got_driver = snap(polygonize(spark, tiles, grid, exclude=0, distributed_cc=False))
    got_dist = snap(polygonize(spark, tiles, grid, exclude=0, distributed_cc=True))
    assert got_driver == got_dist
    assert len(got_dist) == h
    assert all(n == w for _, _, n, _ in got_dist)


def test_polygonize_progress_callback(spark):
    """Reference parity: to_vector(callback=...) (gdal.py:609-623,
    driven with tqdm in test_raster.py:120-134).  GDAL-style
    (fraction, msg, user_data) callback: monotone non-decreasing,
    starts at 0.0, ends exactly at 1.0, and the result is already
    materialized (and identical to the callback-less run) when 1.0
    fires."""
    arr = np.zeros((8, 12), np.int32)
    arr[1:4, 1:5] = 7
    arr[5:8, 6:12] = 9
    grid = _grid_for(arr)
    tiles = array_to_tiles(spark, arr, grid)

    seen = []
    out = polygonize(
        spark, tiles, grid, exclude=0,
        progress=lambda frac, msg, _user: seen.append((frac, msg)),
    )
    fracs = [f for f, _ in seen]
    assert fracs[0] == 0.0 and fracs[-1] == 1.0
    assert all(b >= a for a, b in zip(fracs, fracs[1:]))
    assert all(isinstance(m, str) and m for _, m in seen)
    # reference usage drives a progress bar to 100 (test_raster.py:127)
    pbar = 0
    for f, _ in seen:
        pbar += int(round(f * 100 - pbar))
    assert pbar == 100
    got = {(r["comp_id"], r["value"], r["n_pixels"]) for r in out.collect()}
    want = {
        (r["comp_id"], r["value"], r["n_pixels"])
        for r in polygonize(spark, tiles, grid, exclude=0).collect()
    }
    assert got == want
    out.unpersist()
