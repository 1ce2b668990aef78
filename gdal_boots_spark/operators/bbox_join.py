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


def _cell_x_sql(v: str, res: int) -> str:
    n = 1 << res
    return f"CAST(LEAST(GREATEST(FLOOR(({v} + 180.0D) / 360.0D * {n}), 0), {n - 1}) AS BIGINT)"


def _cell_y_sql(v: str, res: int) -> str:
    n = 1 << res
    return f"CAST(LEAST(GREATEST(FLOOR(({v} + 90.0D) / 180.0D * {n}), 0), {n - 1}) AS BIGINT)"


def _explode_cover(df: DataFrame, res: int, prefix: str) -> DataFrame:
    """bbox columns -> one row per covering cell (native sequence math).

    Server-side-parsed SQL strings (r8): the Column-tree form of the
    same expressions cost ~400 py4j round trips per join build on the
    cold-plan profile; the emitted plan is identical."""
    out = df.selectExpr(
        "*",
        f"explode(sequence({_cell_x_sql(prefix + 'minx', res)}, {_cell_x_sql(prefix + 'maxx', res)})) AS _ix",
        f"{_cell_y_sql(prefix + 'miny', res)} AS _iy0",
        f"{_cell_y_sql(prefix + 'maxy', res)} AS _iy1",
    ).selectExpr("*", "explode(sequence(_iy0, _iy1)) AS _iy")
    return out.selectExpr(
        "*", f"{res}L * {2**58}L + _ix * {2**29}L + _iy AS cell_id"
    ).drop("_ix", "_iy", "_iy0", "_iy1")


# per-session memo of the auto_res/auto_levels sampling probes, keyed
# by the SEMANTIC hash of both input plans (the knn _STATS_CACHE /
# spatial_join _POLY_DIM_CACHE pattern): each probe is 2 bounded
# limit(sample) jobs whose ~0.3-0.6s of scheduling latency re-ran on
# EVERY join build (bench best-of-N reps rebuild the plan per rep).
# Standard table-statistics caching assumption: inputs are immutable
# within a session; clear with _RES_CACHE.clear() after rewriting an
# input path in-session.
_RES_CACHE: dict = {}


def _res_memo_key(left: DataFrame, right: DataFrame, tag: str, sample: int):
    try:
        return (
            left.sparkSession.sparkContext.applicationId,
            left._jdf.queryExecution().analyzed().semanticHash(),
            right._jdf.queryExecution().analyzed().semanticHash(),
            tag, sample,
        )
    except Exception:  # internal API moved: fall back to no memo
        return None


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
    paid once per (session, input pair) — memoized in _RES_CACHE."""
    import statistics

    key = _res_memo_key(left, right, "res", sample)
    if key is not None and key in _RES_CACHE:
        return _RES_CACHE[key]

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
    res = max(4, min(res, 18))
    if key is not None:
        if len(_RES_CACHE) > 64:
            _RES_CACHE.pop(next(iter(_RES_CACHE)))
        _RES_CACHE[key] = res
    return res


def bbox_overlap_join(left: DataFrame, right: DataFrame, res: int | None = 10) -> DataFrame:
    """left(lid, lminx..lmaxy) x right(rid, rminx..rmaxy) ->
    one row per overlapping pair (closed-interval overlap), all left +
    right columns, exactly once per pair (no distinct needed).
    ``res=None`` auto-picks the resolution from sampled rect sizes
    (auto_res); any res yields the identical result set."""
    if res is None:
        res = auto_res(left, right)
    # single-file seeds plan as ONE task and the cover join amplifies
    # them 100x+ — spread BEFORE the explode (zero-job gated; no-op for
    # well-partitioned inputs and for tiny correctness-SF seeds)
    from ..partitioning import spread_small_scan

    lc = _explode_cover(spread_small_scan(left), res, "l")
    rc = _explode_cover(spread_small_scan(right), res, "r")
    j = lc.join(rc, "cell_id")
    # exact overlap + reporting cell (the one containing the
    # intersection's lower-left) in ONE server-parsed filter string
    keep = (
        "lminx <= rmaxx AND rminx <= lmaxx AND lminy <= rmaxy AND rminy <= lmaxy "
        f"AND cell_id = {res}L * {2**58}L "
        f"+ {_cell_x_sql('GREATEST(lminx, rminx)', res)} * {2**29}L "
        f"+ {_cell_y_sql('GREATEST(lminy, rminy)', res)}"
    )
    return j.where(keep).drop("cell_id")


def _rect_level(prefix: str, lo: int, hi: int):
    """Per-row finest level in [lo, hi] whose cell covers the rect in
    <= 2 cells per axis (cell edge >= rect edge; y cells are half the
    x edge, hence the 180/h term) — the bbox twin of the poly path's
    adaptive span level (spatial_join.py)."""
    w = F.greatest(F.col(f"{prefix}maxx") - F.col(f"{prefix}minx"), F.lit(1e-12))
    h = F.greatest(F.col(f"{prefix}maxy") - F.col(f"{prefix}miny"), F.lit(1e-12))
    lx = F.floor(F.log2(F.lit(360.0) / w))
    ly = F.floor(F.log2(F.lit(180.0) / h))
    return F.least(F.greatest(F.least(lx, ly), F.lit(lo)), F.lit(hi)).cast("int")


def _explode_cover_multi(df: DataFrame, lo: int, hi: int, prefix: str) -> DataFrame:
    """bbox columns -> covering cells at EVERY level in [lo, own_level]
    (level embedded in cell_id; `{prefix}lvl` carries the rect's own
    level).  For any rect whose edge fits a cell at some level >= lo
    (auto_levels sizes lo from the sampled max edge) the cover is
    <= 2x2 cells at its own level and every coarser one, i.e.
    <= 4*(hi-lo+1) rows; rects LARGER than every sampled edge can still
    exceed that bound (they explode as (size/cell)^2 at lo)."""
    own = _rect_level(prefix, lo, hi).alias(f"{prefix}lvl")
    out = df.select("*", own).select(
        "*", F.explode(F.sequence(F.lit(lo), F.col(f"{prefix}lvl"))).alias("_lvl")
    )
    n = F.pow(F.lit(2.0), F.col("_lvl")).cast("long")

    def part(v, offs, span):
        return F.least(
            F.greatest(F.floor((v + F.lit(offs)) / span * n), F.lit(0)), n - F.lit(1)
        ).cast("long")

    out = out.select(
        "*",
        F.explode(
            F.sequence(
                part(F.col(f"{prefix}minx"), 180.0, 360.0),
                part(F.col(f"{prefix}maxx"), 180.0, 360.0),
            )
        ).alias("_ix"),
        part(F.col(f"{prefix}miny"), 90.0, 180.0).alias("_iy0"),
        part(F.col(f"{prefix}maxy"), 90.0, 180.0).alias("_iy1"),
    ).select("*", F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))).alias("_iy"))
    cell = (
        F.col("_lvl").cast("long") * F.lit(2**58)
        + F.col("_ix") * F.lit(2**29)
        + F.col("_iy")
    )
    return out.withColumn("cell_id", cell).drop("_ix", "_iy", "_iy0", "_iy1", "_lvl")


def auto_levels(left: DataFrame, right: DataFrame, sample: int = 1024) -> tuple[int, int]:
    """(lo, hi) level window from the DATA: hi sized for the small
    rects (10th-percentile edge), lo for the large ones (the sampled
    MAX edge — r8, ADVICE r7: a p90-derived lo left up to ~10% of the
    corpus exploding as (size/cell)^2 cover rows at every level), capped
    at 8 apart.  Mixed-magnitude corpora get per-rect levels inside
    this window instead of one global compromise resolution.  Every
    SAMPLED rect covers <= 2x2 cells at its own level; outliers the
    non-uniform limit(sample) scan missed (or rects beyond the hi-8
    cap) can still exceed that bound.  Memoized per (session, input
    pair) like auto_res."""
    key = _res_memo_key(left, right, "levels", sample)
    if key is not None and key in _RES_CACHE:
        return _RES_CACHE[key]
    edges = []
    for df, p in ((left, "l"), (right, "r")):
        rows = df.select(
            (F.col(f"{p}maxx") - F.col(f"{p}minx")).alias("w"),
            (F.col(f"{p}maxy") - F.col(f"{p}miny")).alias("h"),
        ).limit(sample).collect()
        edges.extend(max(r["w"], r["h"] * 2.0) for r in rows)
    if not edges:
        return 10, 10
    edges.sort()
    p10 = max(edges[int(len(edges) * 0.1)], 1e-9)
    emax = max(edges[-1], 1e-9)
    hi = max(4, min(int(round(math.log2(360.0 / p10))), 18))
    # floor, not round: guarantees cell edge >= the sampled max edge
    lo = max(4, min(int(math.floor(math.log2(360.0 / emax))), hi))
    out = (max(lo, hi - 8), hi)
    if key is not None:
        if len(_RES_CACHE) > 64:
            _RES_CACHE.pop(next(iter(_RES_CACHE)))
        _RES_CACHE[key] = out
    return out


def bbox_overlap_join_adaptive(
    left: DataFrame, right: DataFrame, levels: tuple[int, int] | None = None
) -> DataFrame:
    """bbox_overlap_join for HETEROGENEOUS rect sizes: each rect covers
    at its own level (<= 2x2 cells) plus every coarser level in a
    bounded window, both sides symmetric.  A pair (A, B) meets at every
    common level; it is COUNTED exactly once — at min(lvl_A, lvl_B)
    (the coarser rect's level, where the finer rect is a <= 2x2 cover)
    in the reporting cell holding the intersection's lower-left corner.

    Same exact semantics as bbox_overlap_join (closed-interval overlap,
    each pair exactly once, no distinct shuffle); use it when rect
    sizes span magnitudes — a single global resolution either explodes
    the big rects or dilates the small ones by giant cells.  Cost per
    rect is <= 4*(hi-lo+1) cover rows REGARDLESS of its size (the
    poly-span adaptive-cover argument, spatial_join.py, applied to both
    join sides)."""
    if levels is None:
        levels = auto_levels(left, right)
    lo, hi = levels
    from ..partitioning import spread_small_scan

    lc = _explode_cover_multi(spread_small_scan(left), lo, hi, "l")
    rc = _explode_cover_multi(spread_small_scan(right), lo, hi, "r")
    j = lc.join(rc, "cell_id")
    overlap = (
        (F.col("lminx") <= F.col("rmaxx"))
        & (F.col("rminx") <= F.col("lmaxx"))
        & (F.col("lminy") <= F.col("rmaxy"))
        & (F.col("rminy") <= F.col("lmaxy"))
    )
    m = F.least(F.col("llvl"), F.col("rlvl")).cast("long")
    cell_lvl = F.floor(F.col("cell_id") / F.lit(2**58)).cast("long")
    n = F.pow(F.lit(2.0), m).cast("long")
    cx = F.greatest(F.col("lminx"), F.col("rminx"))
    cy = F.greatest(F.col("lminy"), F.col("rminy"))
    rep_x = F.least(
        F.greatest(F.floor((cx + F.lit(180.0)) / 360.0 * n), F.lit(0)), n - F.lit(1)
    ).cast("long")
    rep_y = F.least(
        F.greatest(F.floor((cy + F.lit(90.0)) / 180.0 * n), F.lit(0)), n - F.lit(1)
    ).cast("long")
    rep = m * F.lit(2**58) + rep_x * F.lit(2**29) + rep_y
    return (
        j.where(overlap & (cell_lvl == m) & (F.col("cell_id") == rep))
        .drop("cell_id", "llvl", "rlvl")
    )


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
