"""Geometry-repair goldens (reference tests/test_geometry.py:184-247).

Comparison is order-insensitive: rings are normalized (rotation +
orientation) before comparing, since valid polygon representations are
equivalence classes.
"""

import numpy as np
import pytest

from gdal_boots_spark.geom.validity import make_valid_geojson


def _norm_ring(ring, nd=6):
    pts = [tuple(round(c, nd) for c in p) for p in ring[:-1]]
    # canonical orientation: compare both directions, pick lexicographically
    def rot(seq):
        i = min(range(len(seq)), key=lambda k: seq[k])
        return seq[i:] + seq[:i]

    fwd = rot(pts)
    rev = rot(list(reversed(pts)))
    best = min(fwd, rev)
    return tuple(best)


def _norm_poly(poly, nd=6):
    return tuple(sorted(_norm_ring(r, nd) for r in poly))


def _norm(gj, nd=6):
    if gj["type"] == "Polygon":
        return {"Polygon": frozenset([_norm_poly(gj["coordinates"], nd)])}
    if gj["type"] == "MultiPolygon":
        return {"MultiPolygon": frozenset(_norm_poly(p, nd) for p in gj["coordinates"])}
    return gj


def geo_eq(a, b, nd=6):
    ta = "MultiPolygon" if a["type"] == "MultiPolygon" else "Polygon"
    tb = "MultiPolygon" if b["type"] == "MultiPolygon" else "Polygon"
    na = _norm(a, nd)[ta] if ta in _norm(a, nd) else None
    nb = _norm(b, nd)[tb] if tb in _norm(b, nd) else None
    # allow Polygon vs MultiPolygon-of-one equivalence
    if a["type"] != b["type"]:
        return False
    return na == nb


def test_make_valid_bowtie():
    # golden: test_geometry.py:184-210
    self_intersection = {
        "type": "Polygon",
        "coordinates": [
            [
                [28.377685, 53.533778],
                [28.388671, 54.278054],
                [26.768188, 53.504384],
                [26.845092, 54.226707],
                [28.377685, 53.533778],
            ]
        ],
    }
    got = make_valid_geojson(self_intersection, precision=6)
    exp = {
        "type": "MultiPolygon",
        "coordinates": [
            [[[27.582652, 53.893235], [26.768188, 53.504384], [26.845092, 54.226707], [27.582652, 53.893235]]],
            [[[27.582652, 53.893235], [28.388671, 54.278054], [28.377685, 53.533778], [27.582652, 53.893235]]],
        ],
    }
    assert got["type"] == "MultiPolygon"
    assert geo_eq(got, exp), got


def test_make_valid_self_touching_hole():
    # golden: test_geometry.py:211-247
    src = {
        "type": "Polygon",
        "coordinates": [
            [
                [26.531982, 54.204223],
                [26.740722, 53.855766],
                [28.168945, 53.448806],
                [28.372192, 54.007768],
                [26.779174, 53.402982],
                [28.883056, 53.176411],
                [28.943481, 54.188155],
                [26.531982, 54.204223],
            ]
        ],
    }
    got = make_valid_geojson(src, precision=6)
    exp = {
        "type": "Polygon",
        "coordinates": [
            [
                [27.443987, 53.655377],
                [26.740722, 53.855766],
                [26.531982, 54.204223],
                [28.943481, 54.188155],
                [28.883056, 53.176411],
                [26.779174, 53.402982],
                [27.443987, 53.655377],
            ],
            [[27.443987, 53.655377], [28.168945, 53.448806], [28.372192, 54.007768], [27.443987, 53.655377]],
        ],
    }
    assert got["type"] == "Polygon", got
    assert len(got["coordinates"]) == 2, got  # shell + hole
    assert geo_eq(got, exp), got


def test_make_valid_already_valid_passthrough():
    ok = {
        "type": "Polygon",
        "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]],
    }
    got = make_valid_geojson(ok, precision=6)
    assert geo_eq(got, ok), got


def test_make_valid_preserves_area_invariant():
    """Property: repaired area == even-odd covered area of the input
    (Monte-Carlo estimate against the raw even-odd rule)."""
    from gdal_boots_spark.geom.packed import from_geojson
    from gdal_boots_spark.geom.pip import points_in_packed

    src = {
        "type": "Polygon",
        "coordinates": [
            [
                [28.377685, 53.533778],
                [28.388671, 54.278054],
                [26.768188, 53.504384],
                [26.845092, 54.226707],
                [28.377685, 53.533778],
            ]
        ],
    }
    got = make_valid_geojson(src)
    rng = np.random.default_rng(5)
    xs = rng.uniform(26.7, 28.5, 4000)
    ys = rng.uniform(53.4, 54.3, 4000)
    before = points_in_packed(xs, ys, from_geojson(src))
    after = points_in_packed(xs, ys, from_geojson(got))
    assert np.array_equal(before, after)


def test_make_valid_pinched_ring_to_hole():
    # golden: test_geometry.py:249-312 (hole ring begins at a computed
    # self-intersection point, 124.107187,-10.547924)
    invalid = {
        "type": "Polygon",
        "coordinates": [[
            [123.912279, -9.94963], [124.808856, -9.945983], [124.658416, -10.631109],
            [124.419945, -10.627865], [124.417387, -10.633294], [124.384578, -10.780016],
            [124.378588, -10.807525], [124.380593, -10.810794], [124.598579, -10.901209],
            [124.590119, -10.939784], [123.915179, -10.942552], [123.912279, -9.94963],
            [124.16208, -10.716425], [124.195546, -10.570105], [123.983748, -10.516936],
            [123.94459, -10.689683], [123.959686, -10.6948], [124.149828, -10.743025],
            [124.155046, -10.743006], [124.16208, -10.716425], [123.912279, -9.94963],
        ]],
    }
    got = make_valid_geojson(invalid, precision=6)
    assert got["type"] == "Polygon" and len(got["coordinates"]) == 2
    hole = got["coordinates"][1]
    pts = {tuple(p) for p in hole}
    assert (124.107187, -10.547924) in pts  # the noded intersection vertex


def test_make_valid_simple_grid_bowtie():
    # golden: test_geometry.py:612-635 (exact coordinates)
    simple = {"type": "Polygon", "coordinates": [[[28, 53], [28, 55], [26, 53], [26, 55], [28, 53]]]}
    got = make_valid_geojson(simple, precision=6)
    exp = {
        "type": "MultiPolygon",
        "coordinates": [
            [[[26.0, 55.0], [27.0, 54.0], [26.0, 53.0], [26.0, 55.0]]],
            [[[28.0, 53.0], [27.0, 54.0], [28.0, 55.0], [28.0, 53.0]]],
        ],
    }
    assert geo_eq(got, exp), got


def test_make_valid_splits_to_six():
    # golden: test_geometry.py:540-608 — nested invalid multipolygon
    # splits into 6 polygons.  Input read from the reference test file
    # (data fixture, not code).
    import ast
    import os

    ref = "/root/reference/tests/test_geometry.py"
    if not os.path.exists(ref):
        pytest.skip("reference fixtures not mounted")
    src = open(ref).read()
    mark = src.find("# splitted to polygons")
    s = src.rfind("invalid = {", 0, mark)
    e = src.find("result = make_valid_geojson", s)
    invalid = ast.literal_eval(src[s:e].split("=", 1)[1].strip())
    got = make_valid_geojson(invalid, precision=6)
    assert got["type"] == "MultiPolygon"
    assert len(got["coordinates"]) == 6
