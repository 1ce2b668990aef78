"""Cell-bucketed point-in-polygon spatial join — the engine flagship.

This re-expresses, as one distributed plan, what the reference does
in-process in ``crop_by_geometry``/``values_by_points`` (gdal.py:819-931):
geometry -> covering cells -> candidate pairs -> exact refinement.

Physical shape (small/medium polygon side — the common case):

    points ──(native cell_id math, codegen)──┐
                                             ├─ BROADCAST hash join on cell_id
    polys ──(driver: bbox cover explode)─────┘
                      │
                      └─ mapInPandas ray-cast refinement (Arrow batches,
                         polygon coords via a Spark broadcast variable —
                         candidate rows never carry coordinate payloads)

Zero shuffles end-to-end: the fact (document/point) side flows
filter -> project -> broadcast-join -> mapInPandas entirely within one
stage, so the plan scales linearly with executors at 100 TB (the
two-parallelism scaling evidence in BENCH runs this operator).

For point-vs-polygon the (point, poly) pair appears at most once —
a point maps to exactly one cell and a polygon's cover lists each cell
once — so no dedup shuffle is needed (SURVEY §4.3 applies only to
geometry x geometry joins).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geometry_fns import cell_id_col
from ..geom.cells import MAX_RES, cover_bbox, pick_res
from ..geom.packed import from_geojson
from ..geom.pip import points_in_polygon
from .spans import extract_geo_spans


def _collect_polys(polys: DataFrame):
    """Driver-side: polygon table -> {poly_id: (coords, ring_offsets)} +
    per-poly bbox list.  The polygon side is the *dimension*; the point
    side is the 10^12-row fact and never leaves the executors."""
    rows = polys.select("poly_id", "geojson").collect()
    packed, bboxes = {}, {}
    for r in rows:
        pg = from_geojson(r["geojson"])
        packed[int(r["poly_id"])] = (pg.coords, pg.ring_offsets)
        c = pg.coords.reshape(-1, 2)
        bboxes[int(r["poly_id"])] = (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())
    return packed, bboxes


def _auto_res(bboxes: dict) -> int:
    """Pick one global resolution: cell size ~ median polygon extent,
    capped so no polygon covers more than ~64 cells (SURVEY §4.1)."""
    if not bboxes:
        return 8
    spans = sorted(max(b[2] - b[0], b[3] - b[1]) for b in bboxes.values())
    med = spans[len(spans) // 2] or 1e-9
    res = int(np.clip(np.floor(np.log2(360.0 / med)), 0, MAX_RES))
    worst = max(bboxes.values(), key=lambda b: (b[2] - b[0]) * (b[3] - b[1]))
    res = min(res, pick_res(*worst, max_cells=64))
    return res


def pip_join_points(
    points: DataFrame,
    polys: DataFrame,
    res: int | None = None,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """points(<ids..>, x, y) x polys(poly_id, geojson) -> points cols + poly_id.

    Exact even-odd ray-cast semantics; the cell join is only a
    no-false-negative pre-filter.
    """
    spark: SparkSession = points.sparkSession
    packed, bboxes = _collect_polys(polys)
    if res is None:
        res = _auto_res(bboxes)

    cover_rows = []
    for pid, (minx, miny, maxx, maxy) in bboxes.items():
        for cid in cover_bbox(minx, miny, maxx, maxy, res).tolist():
            cover_rows.append((cid, pid))
    cover_df = spark.createDataFrame(cover_rows, "cell_id long, poly_id long")

    pts = points.withColumn("cell_id", cell_id_col(F.col(x_col), F.col(y_col), res))
    cand = pts.join(F.broadcast(cover_df), "cell_id").drop("cell_id")

    bpolys = spark.sparkContext.broadcast(packed)

    # Refinement as a BOOLEAN pandas UDF inside a WHERE, not a
    # mapInArrow over whole rows: Spark's ArrowEvalPython projects ONLY
    # (x, y, poly_id) into Python and gets one byte back per row, so
    # id/string payload columns never cross the Arrow boundary in
    # either direction and the JVM applies the filter in codegen.
    # Measured on the 20M-doc flagship: ~2x faster end-to-end than the
    # round-trip refine and the refine increment scales with cores like
    # the pure-JVM stages (BENCH/BASELINE.md).
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def pip_ok(px, py, pid):
        import pandas as pd

        polys_local = bpolys.value
        pxv = px.to_numpy(np.float64)
        pyv = py.to_numpy(np.float64)
        pidv = pid.to_numpy(np.int64)
        keep = np.zeros(len(pxv), dtype=bool)
        order = np.argsort(pidv, kind="stable")
        uniq = np.unique(pidv)
        bounds = np.searchsorted(pidv[order], uniq)
        for s, p in zip(np.split(order, bounds[1:]), uniq):
            if len(s) == 0:
                continue
            coords, ro = polys_local[int(p)]
            keep[s] = points_in_polygon(pxv[s], pyv[s], coords, ro)
        return pd.Series(keep)

    return cand.where(pip_ok(F.col(x_col), F.col(y_col), F.col("poly_id")))


def pip_join_docs(docs: DataFrame, polys: DataFrame, res: int | None = None) -> DataFrame:
    """Interleaved documents x polygons -> (doc_id, span_pos, poly_id).

    Geometry extraction is all codegen: posexplode + filter (spans.py),
    then Point coordinates via native string ops (point_xy_native — NOT
    from_json, which does not scale with cores; see its docstring) —
    the engine keeps the 10^12-doc hot path JVM-side and enters Python
    only inside the Arrow-batched ray-cast refinement (pandas UDF
    surface, SURVEY §2.8).  Point spans only (the flagship hot path);
    use pip_join_docs_any when documents also carry Polygon/LineString
    geo spans.
    """
    from ..functions.geometry_fns import point_xy_native

    geo = extract_geo_spans(docs)
    x, y, is_point = point_xy_native(F.col("text"))
    pts = geo.where(is_point).select("doc_id", "span_pos", x.alias("x"), y.alias("y")).where(
        F.col("x").isNotNull() & F.col("y").isNotNull()
    )
    return pip_join_points(pts, polys, res=res).select("doc_id", "span_pos", "poly_id", "x", "y")


def pip_join_docs_any(docs: DataFrame, polys: DataFrame, res: int | None = None) -> DataFrame:
    """Interleaved documents x polygons -> (doc_id, span_pos, poly_id)
    for geo spans of ANY geometry type (crop/rasterize in the reference
    accept any geometry, gdal.py:836-846).

    Point spans take the codegen fast path (== pip_join_docs);
    Polygon/LineString/Multi* spans go through geojson_decode_udf ->
    native bbox cover explode -> broadcast cell join, deduped WITHOUT a
    shuffle via the reporting-cell trick (a candidate survives only in
    the cell containing the bbox-intersection lower-left corner), then
    exact GEOS-Intersects refinement against the broadcast packed dims.
    """
    from ..functions.geometry_fns import cell_id_col, geojson_decode_udf, geom_bounds_udf, point_xy_native
    from ..geom.pip import geometry_intersects_polygon

    spark = docs.sparkSession
    packed, bboxes = _collect_polys(polys)
    if res is None:
        res = _auto_res(bboxes)

    geo = extract_geo_spans(docs)
    x, y, is_point = point_xy_native(F.col("text"))

    # --- Point spans: identical plan to pip_join_docs ---------------
    pts = geo.where(is_point).select("doc_id", "span_pos", x.alias("x"), y.alias("y")).where(
        F.col("x").isNotNull() & F.col("y").isNotNull()
    )
    pt_pairs = pip_join_points(pts, polys, res=res).select("doc_id", "span_pos", "poly_id")

    # --- non-Point spans: decode -> cover -> intersects --------------
    cover_rows = []
    for pid, (minx, miny, maxx, maxy) in bboxes.items():
        for cid in cover_bbox(minx, miny, maxx, maxy, res).tolist():
            cover_rows.append((cid, pid, float(minx), float(miny), float(maxx), float(maxy)))
    cover_df = spark.createDataFrame(
        cover_rows, "cell_id long, poly_id long, pminx double, pminy double, pmaxx double, pmaxy double"
    )

    g = geo.where(~is_point).select(
        "doc_id", "span_pos", geojson_decode_udf(F.col("text")).alias("geom")
    ).where(F.col("geom").isNotNull() & (F.size("geom.coords") > 0))
    b = geom_bounds_udf(F.col("geom"))
    g = g.select("doc_id", "span_pos", "geom", b.alias("b"))

    n = 1 << res
    def cpart(lon, lat):
        ix = F.least(F.greatest(F.floor((lon + 180.0) / 360.0 * n), F.lit(0)), F.lit(n - 1)).cast("long")
        iy = F.least(F.greatest(F.floor((lat + 90.0) / 180.0 * n), F.lit(0)), F.lit(n - 1)).cast("long")
        return ix, iy

    ix0, iy0 = cpart(F.col("b.minx"), F.col("b.miny"))
    ix1, iy1 = cpart(F.col("b.maxx"), F.col("b.maxy"))
    base = F.lit(res).cast("long") * F.lit(2**58)
    covered = g.select(
        "doc_id", "span_pos", "geom", "b",
        F.explode(F.sequence(ix0, ix1)).alias("_ix"), iy0.alias("_iy0"), iy1.alias("_iy1"),
    ).select(
        "doc_id", "span_pos", "geom", "b", "_ix",
        F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))).alias("_iy"),
    ).select(
        "doc_id", "span_pos", "geom", "b",
        (base + F.col("_ix") * F.lit(2**29) + F.col("_iy")).alias("cell_id"),
    )
    cand = covered.join(F.broadcast(cover_df), "cell_id").where(
        (F.col("b.minx") <= F.col("pmaxx")) & (F.col("pminx") <= F.col("b.maxx"))
        & (F.col("b.miny") <= F.col("pmaxy")) & (F.col("pminy") <= F.col("b.maxy"))
    )
    # reporting cell: keep the pair only in the cell holding the
    # bbox-intersection lower-left corner (dedup without a shuffle)
    rix, riy = cpart(F.greatest(F.col("b.minx"), F.col("pminx")), F.greatest(F.col("b.miny"), F.col("pminy")))
    cand = cand.where(F.col("cell_id") == base + rix * F.lit(2**29) + riy).select(
        "doc_id", "span_pos", "poly_id", "geom"
    )

    bpolys = spark.sparkContext.broadcast(packed)

    def refine(batches):
        from ..geom.packed import PackedGeometry

        polys_local = bpolys.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            for i, (_, row) in enumerate(pdf.iterrows()):
                gg = row["geom"]
                pg = PackedGeometry(
                    gtype=int(gg["gtype"]),
                    coords=np.asarray(gg["coords"], dtype=np.float64),
                    ring_offsets=np.asarray(gg["ring_offsets"], dtype=np.int32),
                    part_offsets=np.asarray(gg["part_offsets"], dtype=np.int32),
                )
                coords, ro = polys_local[int(row["poly_id"])]
                poly = PackedGeometry(gtype=3, coords=coords, ring_offsets=ro, part_offsets=np.asarray([0], np.int32))
                keep[i] = geometry_intersects_polygon(pg, poly)
            out = pdf.loc[keep, ["doc_id", "span_pos", "poly_id"]]
            if len(out):
                yield out

    poly_pairs = cand.mapInPandas(refine, schema="doc_id string, span_pos int, poly_id long")
    return pt_pairs.unionByName(poly_pairs)


def pip_join_points_shuffle(
    points: DataFrame,
    polys: DataFrame,
    res: int | None = None,
    x_col: str = "x",
    y_col: str = "y",
    salt: int = 8,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """Big-polygon-side variant: no driver collect, no broadcast dict.

    The polygon table is decoded and cover-exploded DISTRIBUTED
    (pandas UDFs), candidates come from a shuffle hash join on cell_id
    with **salted repartitioning on hot cells** (north_star: points
    side counts pick hot cell ids; their rows split across `salt`
    reducers, the polygon side's hot rows are exploded x salt), and the
    ray-cast refinement runs per candidate batch with each polygon's
    packed coords decoded once per (batch, poly) group.

    Semantics identical to pip_join_points (tested); use when the
    polygon side is too large to broadcast.
    """
    from ..functions.geometry_fns import cells_cover_udf, geojson_decode_udf
    from .skew import salted_join

    gp = polys.select("poly_id", geojson_decode_udf(F.col("geojson")).alias("geom"))
    if res is None:
        # distributed resolution heuristic: median bbox span via approx
        b = gp.select(
            F.col("poly_id"),
            (F.array_max("geom.coords") - F.array_min("geom.coords")).alias("rough_span"),
        ).agg(F.expr("percentile_approx(rough_span, 0.5)").alias("med")).collect()[0]
        med = float(b["med"] or 1.0)
        res = int(np.clip(np.floor(np.log2(360.0 / max(med, 1e-9))), 0, 24))
    cells = gp.select("poly_id", "geom", F.explode(cells_cover_udf(res)(F.col("geom"))).alias("cell_id"))

    pts = points.withColumn("cell_id", cell_id_col(F.col(x_col), F.col(y_col), res))
    cand = salted_join(pts, cells, "cell_id", salt=salt, hot_threshold=hot_threshold).drop("cell_id")

    out_cols = [c for c in cand.columns if c not in ("geom",)]
    out_schema = cand.select(*out_cols).schema

    def refine(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            px = batch.column(x_col).to_numpy(zero_copy_only=False)
            py = batch.column(y_col).to_numpy(zero_copy_only=False)
            pids = batch.column("poly_id").to_numpy(zero_copy_only=False)
            geom = batch.column("geom")
            keep = np.zeros(n, dtype=bool)
            order = np.argsort(pids, kind="stable")
            uniq = np.unique(pids)
            bounds = np.searchsorted(pids[order], uniq)
            for s, pid in zip(np.split(order, bounds[1:]), uniq):
                if len(s) == 0:
                    continue
                g0 = geom[int(s[0])]  # decode this polygon's arrays once
                coords = np.asarray(g0["coords"].as_py(), dtype=np.float64)
                ro = np.asarray(g0["ring_offsets"].as_py(), dtype=np.int32)
                keep[s] = points_in_polygon(px[s], py[s], coords, ro)
            out = pa.Table.from_batches([batch]).filter(pa.array(keep)).drop_columns(["geom"])
            if out.num_rows:
                yield from out.combine_chunks().to_batches()

    return cand.mapInArrow(refine, schema=out_schema)
