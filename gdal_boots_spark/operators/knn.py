"""Grid-pruned k-nearest-neighbours join — engine-only operator
(north_rule; no reference counterpart, SURVEY §2.3 "kNN").

Algorithm (ring expansion over the cell index, SURVEY §2.9):

    r = 0, remaining = all queries
    repeat with r growing GEOMETRICALLY (r <- max(2r, r+1)):
        annulus(r_prev, r] cells of each remaining query (exact
            Chebyshev annulus — inner cells were joined in earlier
            rounds, so no candidate is ever produced twice; geometric
            growth makes the driver-synchronous round count
            O(log domain) instead of O(domain))
        ⋈ base points on cell_id        (hash join; broadcast shells)
        accumulate candidates
        a query FINISHES when it holds >= k candidates whose k-th
        smallest distance < r * min(cell_w, cell_h) — nothing outside
        the explored (2r+1)x(2r+1) block can be closer or tie-win
    top-k per query: row_number over (dist, base_id)  — deterministic
        tie-break, reproducible under any parallelism

Distance is planar Euclidean in coordinate units (degree space for
EPSG:4326 inputs — documented engine semantics).

Scale shape: each round is one equi-join keyed by cell id + one
partial agg; only *unfinished* queries re-enter, so round volume decays
geometrically.  The candidate accumulator is persisted per round
(checkpointable by the resumable runner).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry_fns import cell_id_col
from ..geom.cells import MAX_RES


def _auto_res(n_base: int, bbox, k: int) -> int:
    """Cell size so an average cell holds ~max(k, 8) base points, but
    never so fine that the data bbox spans more than ~32 cells per axis
    (bounds the ring-expansion round count for sparse/degenerate data)."""
    minx, miny, maxx, maxy = bbox
    w, h = maxx - minx, maxy - miny
    area = max(w * h, 1e-12)
    target_cell_area = area * max(k, 8) / max(n_base, 1)
    cell_deg = max(float(np.sqrt(target_cell_area)), w / 32.0, h / 32.0, 1e-9)
    res = int(np.clip(np.floor(np.log2(360.0 / cell_deg)), 0, MAX_RES))
    return res


def _annulus_cells_expr(res: int, r_in: int, r_out: int):
    """Array of cell ids with Chebyshev distance in (r_in, r_out] from
    the point's cell — built natively (nested sequence/transform +
    null-filter, no UDF).  r_in = -1 gives the full (2*r_out+1)^2
    block; geometric ring growth explores annuli so each cell is
    produced exactly once across rounds."""
    n = 1 << res
    ix = F.least(F.greatest(F.floor((F.col("x") + 180.0) / 360.0 * n), F.lit(0)), F.lit(n - 1)).cast("long")
    iy = F.least(F.greatest(F.floor((F.col("y") + 90.0) / 180.0 * n), F.lit(0)), F.lit(n - 1)).cast("long")
    base = F.lit(res).cast("long") * F.lit(2**58)

    def cid(jx, jy):
        return base + ((jx % n + n) % n) * F.lit(2**29) + jy

    ds = F.sequence(F.lit(-r_out), F.lit(r_out))
    # x wraps modulo n: when the block width 2*r_out+1 exceeds n, the
    # same wrapped cell would appear at several dx (duplicating pairs
    # within a block and re-emitting cells across rings).  Restrict dx
    # to one n-wide window [-n//2, (n-1)//2] — each wrapped x-cell then
    # maps to exactly one dx, so every cell id is produced at most once
    # across all rounds.  Completeness holds: the window spans all n
    # x-cells once r_out >= n//2, and y is clamped (not wrapped).
    wide = 2 * r_out + 1 > n

    def row_of(dx):
        def one(dy):
            cheb = F.greatest(F.abs(dx), F.abs(dy))
            ok = (cheb > r_in) & (iy + dy >= 0) & (iy + dy < n)
            if wide:
                ok = ok & (dx >= -(n // 2)) & (dx <= (n - 1) // 2)
            return F.when(ok, cid(ix + dx, iy + dy))

        return F.transform(ds, one)

    cells = F.flatten(F.transform(ds, row_of))
    return F.filter(cells, lambda c: c.isNotNull())


def knn_join(
    query: DataFrame,
    base: DataFrame,
    k: int,
    res: int | None = None,
    max_rounds: int = 0,
    q_id: str = "qid",
    b_id: str = "bid",
) -> DataFrame:
    """query(qid,x,y) x base(bid,x,y) -> (qid, bid, dist, rank<=k).

    Exact planar kNN (matches a full cross-join + window oracle).
    """
    # ONE aggregate job over the union of both sides (was two collects;
    # every driver-synchronous job is ~0.2s of scheduling latency and
    # knn's wall time is mostly job count — BENCH/BASELINE.md r4)
    both = base.select("x", "y", F.lit(1).alias("_b")).unionByName(
        query.select("x", "y", F.lit(0).alias("_b"))
    )
    srow = both.agg(
        F.sum("_b").alias("n"),
        F.min("x").alias("uminx"), F.max("x").alias("umaxx"),
        F.min("y").alias("uminy"), F.max("y").alias("umaxy"),
        F.min(F.when(F.col("_b") == 1, F.col("x"))).alias("minx"),
        F.max(F.when(F.col("_b") == 1, F.col("x"))).alias("maxx"),
        F.min(F.when(F.col("_b") == 1, F.col("y"))).alias("miny"),
        F.max(F.when(F.col("_b") == 1, F.col("y"))).alias("maxy"),
    ).collect()[0]
    stats = srow
    uminx, umaxx = srow["uminx"], srow["umaxx"]
    uminy, umaxy = srow["uminy"], srow["umaxy"]
    if res is None:
        res = _auto_res(stats["n"], (uminx, uminy, umaxx, umaxy), k)
    n = 1 << res
    cell_w, cell_h = 360.0 / n, 180.0 / n
    guarantee = min(cell_w, cell_h)

    # lazy persist: round 1's join materializes the cache in-stage; an
    # eager count() here was one full extra pass over the base
    basec = base.select(
        F.col(b_id).alias("bid"), F.col("x").alias("bx"), F.col("y").alias("by"),
        cell_id_col(F.col("x"), F.col("y"), res).alias("cell_id"),
    ).persist()

    # a query can never hold more than |base| neighbours; and once the
    # ring covers the whole base bbox there is nothing left to explore
    k_eff = min(k, int(stats["n"]))
    r_domain = int(np.ceil(max((umaxx - uminx) / cell_w, (umaxy - uminy) / cell_h))) + 2
    # max_rounds<=0 (default) = run until coverage guarantees exactness
    hard_stop = min(max(r_domain, 1), 1 << res)
    if max_rounds > 0:
        hard_stop = min(hard_stop, max_rounds)

    remaining = query.select(F.col(q_id).alias("qid"), "x", "y")
    acc: DataFrame | None = None  # candidates of still-UNFINISHED queries only
    finished: list[DataFrame] = []  # frozen top-k of finished queries
    w = Window.partitionBy("qid").orderBy("dist", "bid")
    # geometric radius growth (r <- max(2r, r+1)): round count is
    # O(log(domain)) instead of O(domain) — each round is a driver
    # barrier, so sparse data no longer pays 50 synchronous rounds.
    # Start with the full radius-1 block (9 cells): cells hold ~max(k,8)
    # points on average, so radius 0 almost never finishes a query and
    # its round is a wasted barrier.
    r_prev, r = -1, min(1, hard_stop)
    while r_prev < hard_stop:
        shells = remaining.select(
            "qid", "x", "y", F.explode(_annulus_cells_expr(res, r_prev, r)).alias("cell_id")
        )
        cand = shells.join(basec, "cell_id").select(
            "qid",
            "bid",
            F.sqrt((F.col("x") - F.col("bx")) ** 2 + (F.col("y") - F.col("by")) ** 2).alias("dist"),
        )
        acc = cand if acc is None else acc.unionByName(cand)
        # rank ONLY unfinished queries' candidates; finished queries'
        # results are frozen, so per-round work decays with the frontier
        # instead of re-ranking the whole accumulator every round.
        # eager localCheckpoint keeps the iterative plan shallow.
        ranked = (
            acc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k_eff)
            .localCheckpoint(eager=True)
        )
        kth = ranked.groupBy("qid").agg(F.max("dist").alias("kth"), F.count("*").alias("cnt"))
        # STRICT kth < r*guarantee: an unexplored point can sit at exactly
        # r*cell from the query, tie the frozen k-th candidate, and win
        # the (dist, bid) tie-break — non-strict would freeze too early.
        done_ids = kth.where((F.col("cnt") >= k_eff) & (F.col("kth") < r * guarantee)).select("qid")
        finished.append(ranked.join(done_ids, "qid", "left_semi"))
        # count first, checkpoint only if the loop continues: in the
        # common everyone-finished-in-round-1 case the eager checkpoint
        # was a wasted materialization job
        remaining = remaining.join(done_ids, "qid", "left_anti")
        if remaining.count() == 0:
            acc = None
            break
        remaining = remaining.localCheckpoint(eager=True)
        # keep only unfinished queries' top-k candidates (dominated
        # candidates can never re-enter the top-k, so dropping them is
        # safe and bounds the accumulator at k_eff rows per open query)
        acc = ranked.join(done_ids, "qid", "left_anti").select("qid", "bid", "dist")
        r_prev, r = r, min(max(2 * r, r + 1), hard_stop)

    out = finished[0]
    for f in finished[1:]:
        out = out.unionByName(f)
    if acc is not None:  # hard_stop reached with open queries: emit best-so-far
        out = out.unionByName(
            acc.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
        )
    basec.unpersist()
    return out.select("qid", "bid", "dist", "rank")


def radius_join(
    query: DataFrame,
    base: DataFrame,
    radius: float,
    res: int | None = None,
    q_id: str = "qid",
    b_id: str = "bid",
) -> DataFrame:
    """Distance-within join: query(qid,x,y) x base(bid,x,y) ->
    (qid, bid, dist) for every pair with planar dist <= radius.

    One-shot companion to knn_join (fixed radius instead of fixed k):
    each query explodes to the cell block covering its radius disk
    (native annulus expr with r_in=-1), ONE equi-join on cell_id, exact
    distance refinement — no dedup shuffle (a base point lives in one
    cell and the block lists distinct cells, so a pair appears at most
    once).  Fully SQL-expressible, so the driver oracle is exact.
    """
    if res is None:
        # cell edge ~ radius: the block is 3x3-ish; finer cells blow up
        # the explode, coarser ones the candidate count
        res = int(np.clip(np.floor(np.log2(360.0 / max(radius, 1e-9))), 0, MAX_RES))
    n = 1 << res
    cell_w, cell_h = 360.0 / n, 180.0 / n
    r_cells = int(np.ceil(radius / min(cell_w, cell_h)))

    basec = base.select(
        F.col(b_id).alias("bid"), F.col("x").alias("bx"), F.col("y").alias("by"),
        cell_id_col(F.col("x"), F.col("y"), res).alias("cell_id"),
    )
    blocks = query.select(
        F.col(q_id).alias("qid"), "x", "y",
        F.explode(_annulus_cells_expr(res, -1, r_cells)).alias("cell_id"),
    )
    # dist spelled as dx*dx + dy*dy (not **2 -> POWER): bit-identical to
    # the oracle's SQL expression, so the <= radius boundary can never
    # disagree by a ULP
    dx = F.col("x") - F.col("bx")
    dy = F.col("y") - F.col("by")
    dist = F.sqrt(dx * dx + dy * dy)
    return (
        blocks.join(basec, "cell_id")
        .select("qid", "bid", dist.alias("dist"))
        .where(F.col("dist") <= radius)
    )


EARTH_MEAN_RADIUS_M = 6371008.8  # IUGG mean radius (PROJ's default sphere)


def radius_join_meters(
    query: DataFrame,
    base: DataFrame,
    radius_m: float,
    res: int | None = None,
    q_id: str = "qid",
    b_id: str = "bid",
    sphere_r: float = EARTH_MEAN_RADIUS_M,
) -> DataFrame:
    """Great-circle distance-within join: query(qid,x,y) x
    base(bid,x,y degrees) -> (qid, bid) for every pair within
    ``radius_m`` METERS on the sphere (haversine).

    Same scalable shape as radius_join — per-query cell-block explode,
    ONE equi-join on cell_id, exact refinement, no dedup shuffle — but
    metric: the candidate block is latitude-aware (the longitude
    extent of a meter grows by 1/cos(lat)), sized per point with
    native exprs, so high-latitude queries cover more cells instead of
    silently missing neighbors.  The refinement predicate is the
    haversine inequality; output is the PAIR SET (no dist column —
    sin/cos are not required to be bit-identical across engines, and
    fixtures must keep every pair clear of the radius boundary, the
    repo's geometry-fixture rule).
    """
    # Δφ max of a radius-r cap is exactly r/R; tiny inflation guards
    # the float floor()-index boundary (over-cover is free — the
    # haversine refinement is the truth)
    dlat_deg = radius_m / (sphere_r * math.pi / 180.0) * (1.0 + 1e-9)
    if res is None:
        res = int(np.clip(np.floor(np.log2(180.0 / max(dlat_deg, 1e-12))), 0, MAX_RES))
    n = 1 << res

    basec = base.select(
        F.col(b_id).alias("bid"), F.col("x").alias("bx"), F.col("y").alias("by"),
        cell_id_col(F.col("x"), F.col("y"), res).alias("cell_id"),
    )
    # latitude-aware per-point degree bbox.  The EXACT max longitude
    # extent of the cap is asin(sin(r/R)/cos(lat)) — the linearized
    # dlat/cos(lat) bound is ~z^2/6 SMALLER and could drop a boundary
    # pair (ADVICE r5); ALL longitudes when the cap reaches past a pole
    # (cos(lat) <= sin(r/R)) or when r >= (pi/2)R.
    z = radius_m / sphere_r
    sin_z = 1.0 if z >= math.pi / 2 else math.sin(z)
    coslat = F.cos(F.radians(F.col("y")))
    dlon_deg = F.when(coslat <= F.lit(sin_z), F.lit(180.0)).otherwise(
        F.least(F.lit(180.0), F.degrees(F.asin(F.lit(sin_z) / coslat)) * F.lit(1.0 + 1e-9))
    )

    def clampi(v, hi):
        return F.least(F.greatest(v, F.lit(0)), F.lit(hi)).cast("long")

    # x indices are NOT clamped: the sequence runs over the raw index
    # range and each exploded index wraps modulo n when composing the
    # cell id, so a disk straddling the antimeridian finds base points
    # on both sides of +-180 (ADVICE r5).  The width cap at n keeps a
    # full-circle block from listing any wrapped cell twice (the
    # no-dedup-shuffle guarantee relies on distinct cells per query).
    ix0 = F.floor((F.col("x") - dlon_deg + 180.0) / 360.0 * n).cast("long")
    ix1 = F.least(
        F.floor((F.col("x") + dlon_deg + 180.0) / 360.0 * n).cast("long"),
        ix0 + F.lit(n - 1),
    )
    iy0 = clampi(F.floor((F.col("y") - F.lit(dlat_deg) + 90.0) / 180.0 * n), n - 1)
    iy1 = clampi(F.floor((F.col("y") + F.lit(dlat_deg) + 90.0) / 180.0 * n), n - 1)
    base_id = F.lit(res).cast("long") * F.lit(2**58)
    wx = (F.col("_ix") % n + n) % n
    blocks = (
        query.select(F.col(q_id).alias("qid"), "x", "y", ix0.alias("_ix0"), ix1.alias("_ix1"),
                     iy0.alias("_iy0"), iy1.alias("_iy1"))
        .select("qid", "x", "y", F.explode(F.sequence(F.col("_ix0"), F.col("_ix1"))).alias("_ix"),
                "_iy0", "_iy1")
        .select("qid", "x", "y", "_ix",
                F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))).alias("_iy"))
        .select("qid", "x", "y", (base_id + wx * F.lit(2**29) + F.col("_iy")).alias("cell_id"))
    )
    # haversine refinement, spelled identically to the oracle SQL
    sdphi = F.sin(F.radians(F.col("by") - F.col("y")) / 2)
    sdlmb = F.sin(F.radians(F.col("bx") - F.col("x")) / 2)
    h = sdphi * sdphi + F.cos(F.radians(F.col("y"))) * F.cos(F.radians(F.col("by"))) * sdlmb * sdlmb
    dist = F.lit(2.0 * sphere_r) * F.asin(F.sqrt(h))
    return (
        blocks.join(basec, "cell_id")
        .where(dist <= F.lit(float(radius_m)))
        .select("qid", "bid")
    )
