"""Vector -> raster burn as a distributed tile render.

Reference: ``Layer.rasterize`` (gdal.py:1092-1107) burns features into
an existing raster via gdal.RasterizeLayer (default burn value 1,
ALL_TOUCHED toggle).  Engine shape (SURVEY §2.7):

    polys (dimension) ── (tile, poly) contribution rows ──┐
       broadcast path: driver bbox loop + broadcast dict  │
       distributed path: operators.cover (no collect)     │
                                                          │
    repartition(tile) ── mapInPandas ─────────────────────┘
         scanline fill of every contributing polygon on the tile's
         pixel-center lattice (geom.raster_kernels)

Only tiles with at least one burned pixel are emitted in sparse mode
(at 100 TB most of the world is empty); ``dense=True`` additionally
emits zero tiles so the result is a complete mask raster.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.raster_kernels import rasterize_mask
from ..sources.tiles import TILE_SCHEMA, RasterGrid
from .cover import contribs_broadcast, contribs_distributed, geom_arrays, polys_fit_broadcast


def rasterize(
    spark: SparkSession,
    polys: DataFrame,
    grid: RasterGrid,
    all_touched: bool = False,
    burn: int = 1,
    dense: bool = False,
    distributed: bool | None = None,
) -> DataFrame:
    """polys(poly_id, geojson) -> uint8 mask tile table on `grid`.

    Deterministic under parallelism: within a tile, polygons burn in
    poly_id order (they all burn the same value by default, but custom
    per-poly burn values stay reproducible).

    ``distributed=True`` switches the polygon side to the no-collect
    cover explode (operators.cover) — required when the polygon table
    is too large to broadcast; output is identical (pytest-asserted).
    Default ``None`` auto-picks from a cheap dimension-size probe
    (cover.polys_fit_broadcast); pass an explicit bool to override.
    """
    from dataclasses import replace

    if distributed is None:
        distributed = not polys_fit_broadcast(polys)

    mask_grid = replace(
        grid, raster_id=grid.raster_id + "_mask", bands=1, dtype="uint8", nodata=None
    )
    g = mask_grid
    at, bv = all_touched, burn
    ntx = g.n_tiles_x

    # NOT groupBy().applyInPandas(): contribution rows are a few bytes
    # but each group is heavy CPU (a full scanline render), so AQE's
    # byte-based partition coalescing would collapse the render stage
    # onto one task.  An explicit repartition-by-number is exempt from
    # AQE coalescing and spreads the tiles across all cores.
    def tile_row(ti: int, out: np.ndarray):
        ty, tx = ti // ntx, ti % ntx
        return {
            "tile_key": g.tile_key(0, ty, tx),
            "raster_id": g.raster_id,
            "band": 0,
            "tile_x": tx,
            "tile_y": ty,
            "epsg": g.epsg,
            "transform": list(g.tile_transform(tx, ty)),
            "width": out.shape[1],
            "height": out.shape[0],
            "dtype": "uint8",
            "nodata": None,
            "data": out.tobytes(),
            "meta": g.meta_encoded,
        }

    # dense mode is ONE render pass: a zero-contribution sentinel row
    # per tile rides the (tiny) contribution shuffle and the render
    # emits every group.  The old shape (burn touched tiles, then
    # zeros.join(broadcast(burned.select(tile_key)), "left_anti") +
    # union) consumed `burned` TWICE — Spark does not reuse an
    # uncached subtree across consumers, so the whole render ran twice
    # plus a zeros generate stage and an anti-join (measured ~2x the
    # single-pass execution on the board burn).
    n_tiles_total = g.n_tiles_x * g.n_tiles_y
    dn = dense

    if distributed:
        contribs = contribs_distributed(polys, grid).select(
            (F.col("tile_y").cast("long") * ntx + F.col("tile_x")).alias("tile_index"),
            "poly_id",
            "geom",
        )
        if dense:
            # r8 (ADVICE): the sentinel geom is a NON-NULL empty struct
            # — Spark's Arrow writer serializes NULL struct rows
            # pathologically slowly (~14us/row, the CLAUDE.md gotcha);
            # the render keeps keying the skip on poly_id IS NULL.
            empty_geom = F.struct(
                F.lit(0).cast("tinyint").alias("gtype"),
                F.array().cast("array<double>").alias("coords"),
                F.array().cast("array<int>").alias("ring_offsets"),
                F.array().cast("array<int>").alias("part_offsets"),
                F.array().cast("array<tinyint>").alias("part_types"),
                F.array().cast("array<int>").alias("child_offsets"),
            )
            contribs = contribs.unionByName(
                # 2 input tasks, not defaultParallelism: these are a few
                # bytes per tile and only feed the tile_index exchange
                spark.range(0, n_tiles_total, 1, 2).select(
                    F.col("id").alias("tile_index"),
                    F.lit(None).cast("long").alias("poly_id"),
                    empty_geom.alias("geom"),
                )
            )
        n_parts = max(spark.sparkContext.defaultParallelism * 2, 2)

        def render_partition(batches):
            import pandas as pd

            pdfs = list(batches)
            if not pdfs:
                return
            allc = pd.concat(pdfs, ignore_index=True)
            cache: dict = {}  # decode each polygon once per partition (zonal's pattern, commit 3874102)
            rows = []
            for ti, grp in allc.groupby("tile_index"):
                ti = int(ti)
                ty, tx = ti // ntx, ti % ntx
                h, w = g.tile_shape(tx, ty)
                t = g.tile_transform(tx, ty)
                out = np.zeros((h, w), dtype=np.uint8)
                grp = grp.sort_values("poly_id")
                for pid, gg in zip(grp["poly_id"].to_numpy(), grp["geom"]):
                    if pd.isna(pid):
                        continue  # dense sentinel row
                    arrays = cache.get(int(pid))
                    if arrays is None:
                        arrays = cache[int(pid)] = geom_arrays(gg)
                    coords, ro = arrays
                    rasterize_mask(coords, ro, t, h, w, all_touched=at, out=out, burn=bv)
                if dn or out.any():
                    rows.append(tile_row(ti, out))
            if rows:
                yield pd.DataFrame(rows)

        burned = contribs.repartition(n_parts, "tile_index").mapInPandas(
            render_partition, schema=TILE_SCHEMA
        )
    else:
        # r8 (guide §2.4): the contribution rows are DRIVER-resident
        # (contribs_broadcast already collected them), so they ride the
        # polygon broadcast as a {tile_index: [poly_id]} dict instead of
        # a createDataFrame -> union(zeros) -> repartition chain.  The
        # render source collapses to ONE Range with explicit partitions:
        # zero exchanges, no ExistingRDD parallelize, two fewer stage
        # boundaries per build (plan: Range -> MapInPandas; before:
        # Scan ExistingRDD + Range -> Union -> Exchange -> MapInPandas).
        packed, pairs = contribs_broadcast(spark, polys, grid)
        contribs_by_tile: dict[int, list[int]] = {}
        for tx, ty, pid in pairs:
            contribs_by_tile.setdefault(ty * ntx + tx, []).append(pid)
        # dense: render every tile (ids ARE tile indices); sparse: only
        # touched tiles, via a broadcast id -> tile_index table
        units = None if dense else sorted(contribs_by_tile)
        n_units = n_tiles_total if dense else len(units)
        n_parts = max(min(spark.sparkContext.defaultParallelism * 2, n_units), 2)
        bstate = spark.sparkContext.broadcast((packed, contribs_by_tile, units))

        def render_partition(batches):
            import pandas as pd

            packed_l, by_tile, units_l = bstate.value
            rows = []
            for pdf in batches:
                for u in pdf["id"]:
                    ti = int(u) if units_l is None else units_l[int(u)]
                    ty, tx = ti // ntx, ti % ntx
                    h, w = g.tile_shape(tx, ty)
                    t = g.tile_transform(tx, ty)
                    out = np.zeros((h, w), dtype=np.uint8)
                    # deterministic within-tile burn order (poly_id asc)
                    for pid in sorted(by_tile.get(ti, ())):
                        coords, ro = packed_l[int(pid)]
                        rasterize_mask(coords, ro, t, h, w, all_touched=at, out=out, burn=bv)
                    if dn or out.any():
                        rows.append(tile_row(ti, out))
            if rows:
                yield pd.DataFrame(rows)

        burned = spark.range(0, n_units, 1, n_parts).mapInPandas(
            render_partition, schema=TILE_SCHEMA
        )

    return burned
