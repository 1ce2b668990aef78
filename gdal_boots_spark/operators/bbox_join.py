"""BBox-overlap (range/interval) join — SURVEY §2.3: "bbox-overlap is a
range/interval join realized as cell-bucket equi-join + exact
refinement predicate" (the standard OSS-Spark pattern, cf. PAPERS.md
"Raster Intervals").

Both sides explode to covering cells at one resolution — **entirely in
native Column math** (sequence/transform over the ix/iy ranges; no
UDF) — then hash-join on cell_id, refine with the exact interval
predicate, and de-duplicate WITHOUT a distinct shuffle via the
reporting-cell trick: a pair is emitted only in the unique cell that
contains the intersection's (max(minx), max(miny)) corner, so each
overlapping pair appears exactly once.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell_parts(lon, lat, res: int):
    n = 1 << res
    ix = F.least(F.greatest(F.floor((lon + F.lit(180.0)) / 360.0 * n), F.lit(0)), F.lit(n - 1)).cast("long")
    iy = F.least(F.greatest(F.floor((lat + F.lit(90.0)) / 180.0 * n), F.lit(0)), F.lit(n - 1)).cast("long")
    return ix, iy


def _explode_cover(df: DataFrame, res: int, prefix: str) -> DataFrame:
    """bbox columns -> one row per covering cell (native sequence math)."""
    ix0, iy0 = _cell_parts(F.col(f"{prefix}minx"), F.col(f"{prefix}miny"), res)
    ix1, iy1 = _cell_parts(F.col(f"{prefix}maxx"), F.col(f"{prefix}maxy"), res)
    base = F.lit(res).cast("long") * F.lit(2**58)
    out = df.select(
        "*",
        F.explode(F.sequence(ix0, ix1)).alias("_ix"),
        iy0.alias("_iy0"),
        iy1.alias("_iy1"),
    ).select("*", F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))).alias("_iy"))
    return out.withColumn("cell_id", base + F.col("_ix") * F.lit(2**29) + F.col("_iy")).drop(
        "_ix", "_iy", "_iy0", "_iy1"
    )


def auto_res(left: DataFrame, right: DataFrame, sample: int = 1024) -> int:
    """Pick the bucketing resolution from the DATA: x-cell edge closest
    (in log2) to the median rect edge max(w, 2h) — i.e. cell ~ rect.
    The join result is res-INDEPENDENT (exact refinement +
    reporting-cell dedup), but the candidate volume is not: cells much
    larger than the rects dilate every rect by a cell (at bench
    density, res=10 = 62.4M join rows over 120 cells — a skewed
    per-cell cross join — for 4.38M true pairs), while cells much
    smaller multiply the cover explode (res=14: 2.3M cover rows, 30.7M
    join rows).  cell ~ rect bottoms the trade: res=12 = 19.0M join
    rows / 1575 cells, measured -40% wall vs res=10 (clean-window
    interleaved probe, scripts/bbox_res_probe.py, BENCH/BASELINE.md).
    Two bounded `limit(sample)` scans; their cost (~2 tiny jobs) is
    paid once per join against the candidate-volume cliff."""
    import statistics

    med = []
    for df, p in ((left, "l"), (right, "r")):
        rows = df.select(
            (F.col(f"{p}maxx") - F.col(f"{p}minx")).alias("w"),
            (F.col(f"{p}maxy") - F.col(f"{p}miny")).alias("h"),
        ).limit(sample).collect()
        for r in rows:
            med.append(max(r["w"], r["h"] * 2.0))  # y cells are 180/n vs x 360/n
    if not med:
        return 10
    target = max(statistics.median(med), 1e-9)
    res = int(round(math.log2(360.0 / target)))
    return max(4, min(res, 18))


def bbox_overlap_join(left: DataFrame, right: DataFrame, res: int | None = 10) -> DataFrame:
    """left(lid, lminx..lmaxy) x right(rid, rminx..rmaxy) ->
    one row per overlapping pair (closed-interval overlap), all left +
    right columns, exactly once per pair (no distinct needed).
    ``res=None`` auto-picks the resolution from sampled rect sizes
    (auto_res); any res yields the identical result set."""
    if res is None:
        res = auto_res(left, right)
    lc = _explode_cover(left, res, "l")
    rc = _explode_cover(right, res, "r")
    j = lc.join(rc, "cell_id")
    overlap = (
        (F.col("lminx") <= F.col("rmaxx"))
        & (F.col("rminx") <= F.col("lmaxx"))
        & (F.col("lminy") <= F.col("rmaxy"))
        & (F.col("rminy") <= F.col("lmaxy"))
    )
    # reporting cell: the one containing the intersection's lower-left
    rep_x, rep_y = _cell_parts(
        F.greatest(F.col("lminx"), F.col("rminx")), F.greatest(F.col("lminy"), F.col("rminy")), res
    )
    rep = F.lit(res).cast("long") * F.lit(2**58) + rep_x * F.lit(2**29) + rep_y
    return j.where(overlap & (F.col("cell_id") == rep)).drop("cell_id")


def intersects_join(left: DataFrame, right: DataFrame, res: int | None = None) -> DataFrame:
    """Exact polygon-intersects join: left(lid, geojson) x
    right(rid, geojson) -> (lid, rid) for every intersecting pair.

    bbox-overlap candidates (cell-bucketed, dedup-free; res=None picks
    the resolution from sampled bbox sizes — the candidate volume
    matters MORE here than in bbox_overlap_join because every
    candidate row crosses into the Python refine) refined by the
    exact GEOS-Intersects predicate (geom.pip.polygons_intersect —
    boundary crossing, containment, AND degenerate touching).
    Geometries ride the candidate rows as GeoJSON strings; within each
    Arrow batch every distinct lid/rid geometry is decoded ONCE (a
    geometry touching 1000 candidates parses once, not 1000x) and
    pairs are processed grouped by lid.  For dimension x dimension
    workloads; point x polygon goes through pip_join_*, bbox-only
    through bbox_overlap_join.
    """
    from ..functions.geometry_fns import geojson_decode_udf, geom_bounds_udf
    import numpy as np

    def side(df, ident, prefix):
        g = df.select(F.col(ident), F.col("geojson").alias(f"{prefix}gj"))
        g = g.withColumn("_geom", geojson_decode_udf(F.col(f"{prefix}gj")))
        b = geom_bounds_udf(F.col("_geom"))
        return g.select(
            ident, f"{prefix}gj",
            b["minx"].alias(f"{prefix}minx"), b["miny"].alias(f"{prefix}miny"),
            b["maxx"].alias(f"{prefix}maxx"), b["maxy"].alias(f"{prefix}maxy"),
        )

    l = side(left.select(F.col("poly_id").alias("lid"), "geojson"), "lid", "l")
    r = side(right.select(F.col("poly_id").alias("rid"), "geojson"), "rid", "r")
    cand = bbox_overlap_join(l, r, res=res)

    def refine(batches):
        from ..geom.packed import from_geojson
        from ..geom.pip import polygons_intersect

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            lids = pdf["lid"].to_numpy()
            rids = pdf["rid"].to_numpy()
            lgj = pdf["lgj"].to_numpy()
            rgj = pdf["rgj"].to_numpy()
            lcache: dict = {}
            rcache: dict = {}
            keep = np.zeros(n, dtype=bool)
            order = np.argsort(lids, kind="stable")
            uniq_l = np.unique(lids)
            bounds = np.searchsorted(lids[order], uniq_l)
            for grp, lid in zip(np.split(order, bounds[1:]), uniq_l):
                if len(grp) == 0:
                    continue
                lpg = lcache.get(lid)
                if lpg is None:
                    try:
                        lpg = from_geojson(lgj[grp[0]])
                    except (ValueError, KeyError):
                        lpg = False
                    lcache[lid] = lpg
                if lpg is False:
                    continue
                for i in grp:
                    rid = rids[i]
                    rpg = rcache.get(rid)
                    if rpg is None:
                        try:
                            rpg = from_geojson(rgj[i])
                        except (ValueError, KeyError):
                            rpg = False
                        rcache[rid] = rpg
                    if rpg is not False:
                        keep[i] = polygons_intersect(lpg, rpg)
            out = pdf.loc[keep, ["lid", "rid"]]
            if len(out):
                yield out

    return cand.mapInPandas(refine, schema="lid long, rid long")
