"""Distributed polygonize (raster -> vector) with cross-tile stitching.

Reference: ``RasterDataset.to_vector`` (gdal.py:609-623) —
gdal.Polygonize: 4-connected regions of equal pixel value -> polygons.

Engine shape (the two-stage plan of SURVEY §2.7):

  1. per-tile mapInPandas: label components, emit per-component
     (value, pixel count, directed boundary edges as an int64 blob,
     border runs on each tile side);
  2. adjacency join: border runs meet across a shared tile line when
     value matches and row/col intervals overlap -> merge pairs;
  3. connected components over merge pairs — driver union-find for
     small merge graphs (one node per *border-touching component*, not
     per pixel), or an iterative min-label-propagation +
     pointer-jumping Spark pass (O(log diameter) rounds) when the
     merge graph exceeds ``cc_threshold`` (planet-scale rasters);
  4. groupBy(global component): concat edges, cancel seam pairs, trace
     rings, emit Polygon (shell + holes) in world coordinates.

Exactness: boundary edges are directed interior-left, so seam edges
cancel in pairs and the stitched polygon is pixel-exact (validated by
the PIP round-trip property test).
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.polygonize_kernel import (
    boundary_edges,
    cancel_paired_edges,
    label_components,
    ring_signed_area,
    trace_rings,
)
from ..geom.validity import _interior_point
from ..sources.tiles import RasterGrid


def _per_tile(grid: RasterGrid, exclude):
    tw, th = grid.tile_w, grid.tile_h

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            comp_rows, border_rows = [], []
            for t in pdf.itertuples(index=False):
                arr = np.frombuffer(t.data, dtype=np.dtype(t.dtype)).reshape(t.height, t.width)
                labels, n = label_components(arr, exclude=exclude)
                if n == 0:
                    continue
                tx, ty = int(t.tile_x), int(t.tile_y)
                r0, c0 = ty * th, tx * tw
                h, w = arr.shape
                for lab in range(1, n + 1):
                    m = labels == lab
                    val = float(arr[m][0])
                    edges = boundary_edges(labels, lab, r0=r0, c0=c0)
                    ckey = f"{tx}_{ty}_{lab}"
                    comp_rows.append(
                        {"comp": ckey, "value": val, "npix": int(m.sum()), "edges": edges.tobytes()}
                    )
                    # border runs (global pixel indices along each side)
                    sides = [
                        ("v", c0, m[:, 0], r0),        # left side at line x=c0
                        ("v", c0 + w, m[:, -1], r0),   # right side at line x=c0+w
                        ("h", r0, m[0, :], c0),        # top side at line y=r0
                        ("h", r0 + h, m[-1, :], c0),   # bottom at line y=r0+h
                    ]
                    for axis, line, strip, off in sides:
                        idx = np.nonzero(strip)[0]
                        if len(idx) == 0:
                            continue
                        # contiguous runs
                        breaks = np.nonzero(np.diff(idx) > 1)[0]
                        starts = np.concatenate([[0], breaks + 1])
                        ends = np.concatenate([breaks, [len(idx) - 1]])
                        for s, e in zip(starts, ends):
                            border_rows.append(
                                {
                                    "comp": ckey,
                                    "value": val,
                                    "axis": axis,
                                    "line": int(line),
                                    "lo": int(idx[s] + off),
                                    "hi": int(idx[e] + off + 1),
                                }
                            )
            if comp_rows:
                yield pd.DataFrame(
                    {
                        "kind": ["c"] * len(comp_rows) + ["b"] * len(border_rows),
                        "payload": [json.dumps({k: v for k, v in r.items() if k != "edges"}) for r in comp_rows]
                        + [json.dumps(r) for r in border_rows],
                        "edges": [r["edges"] for r in comp_rows] + [None] * len(border_rows),
                    }
                )

    return fn


def _cc_distributed(pairs: DataFrame) -> DataFrame:
    """Connected components over (x, y) merge pairs -> (comp, gid) with
    gid = lexicographic-min member of each component (the same root the
    driver union-find picks, so outputs are path-identical).

    Min-label propagation with pointer jumping: each round does one
    1-hop min over the edge set and one label-of-label shortcut, which
    converges in O(log diameter) rounds — a planet-scale seam graph
    (10^8 border components, long tile-chain diameters) stays tractable
    where single-step propagation would need O(diameter) rounds.
    """
    edges = pairs.select(F.col("x").alias("u"), F.col("y").alias("v")).unionByName(
        pairs.select(F.col("y").alias("u"), F.col("x").alias("v"))
    ).persist()
    labels = edges.select(F.col("u").alias("comp")).distinct().select(
        "comp", F.col("comp").alias("gid")
    ).localCheckpoint(eager=True)
    while True:
        # 1-hop: candidate label for v = label of each neighbor u
        hop = edges.join(labels.withColumnRenamed("comp", "u"), "u").select(
            F.col("v").alias("comp"), "gid"
        )
        l2 = labels.unionByName(hop).groupBy("comp").agg(F.min("gid").alias("gid"))
        # pointer jump: gid <- gid(gid)
        l3 = l2.alias("a").join(
            l2.select(F.col("comp").alias("gid"), F.col("gid").alias("gid2")).alias("b"), "gid", "left"
        ).select("comp", F.coalesce("gid2", "gid").alias("gid")).localCheckpoint(eager=True)
        n_changed = (
            l3.alias("n").join(labels.alias("o"), "comp").where(F.col("n.gid") != F.col("o.gid")).count()
        )
        labels = l3
        if n_changed == 0:
            break
    edges.unpersist()
    return labels


def polygonize(
    spark: SparkSession, tiles: DataFrame, grid: RasterGrid, exclude=None, band: int = 0,
    cc_threshold: int = 200_000, distributed_cc: bool | None = None,
    progress=None,
) -> DataFrame:
    """-> (comp_id string, value double, n_pixels long, geojson string).

    ``distributed_cc``: None = auto (driver union-find while the merge
    graph has <= cc_threshold pairs, Spark CC beyond), True/False to
    force a path.  Outputs are identical either way (tested).

    ``progress``: optional GDAL-style callback ``(fraction, msg,
    user_data)`` mirroring the reference's ``to_vector(callback=...)``
    (gdal.py:609-623, exercised with tqdm in test_raster.py:120-134).
    gdal.Polygonize is synchronous, so when a callback is given the
    stages run eagerly (tile sweep -> merge graph -> connected
    components -> ring assembly) and the returned DataFrame is fully
    materialized (persisted) by the time 1.0 is reported; without one,
    the plan stays lazy as before."""
    def _report(frac, msg):
        if progress is not None:
            progress(frac, msg, None)

    _report(0.0, "polygonize: tile sweep")
    src = tiles.where(F.col("band") == band).select("tile_x", "tile_y", "width", "height", "dtype", "data")
    raw = src.mapInPandas(_per_tile(grid, exclude), schema="kind string, payload string, edges binary").persist()
    if progress is not None:
        raw.count()  # materialize the per-tile pass into the persisted cache
        _report(0.4, "polygonize: merge graph")

    comps = raw.where(F.col("kind") == "c").select(
        F.get_json_object("payload", "$.comp").alias("comp"),
        F.get_json_object("payload", "$.value").cast("double").alias("value"),
        F.get_json_object("payload", "$.npix").cast("long").alias("npix"),
        "edges",
    )
    borders = raw.where(F.col("kind") == "b").select(
        F.get_json_object("payload", "$.comp").alias("comp"),
        F.get_json_object("payload", "$.value").cast("double").alias("value"),
        F.get_json_object("payload", "$.axis").alias("axis"),
        F.get_json_object("payload", "$.line").cast("long").alias("line"),
        F.get_json_object("payload", "$.lo").cast("long").alias("lo"),
        F.get_json_object("payload", "$.hi").cast("long").alias("hi"),
    )

    a = borders.alias("a")
    b = borders.alias("b")
    pairs_df = (
        a.join(
            b,
            (F.col("a.axis") == F.col("b.axis"))
            & (F.col("a.line") == F.col("b.line"))
            & (F.col("a.value") == F.col("b.value"))
            & (F.col("a.comp") < F.col("b.comp"))
            & (F.col("a.lo") < F.col("b.hi"))
            & (F.col("b.lo") < F.col("a.hi")),
        )
        .select(F.col("a.comp").alias("x"), F.col("b.comp").alias("y"))
        .distinct()
        .persist()
    )
    if distributed_cc is None:
        use_dist = pairs_df.count() > cc_threshold
    else:
        use_dist = distributed_cc
    _report(0.6, "polygonize: connected components")

    if use_dist:
        labels = _cc_distributed(pairs_df)
        merged = comps.join(labels.withColumnRenamed("gid", "_gid"), "comp", "left").withColumn(
            "gid", F.coalesce("_gid", "comp")
        ).drop("_gid")
    else:
        # driver union-find over border-touching components
        pairs = pairs_df.collect()
        parent: dict[str, str] = {}

        def find(u):
            parent.setdefault(u, u)
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u

        for r in pairs:
            ru, rv = find(r["x"]), find(r["y"])
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        mapping = {u: find(u) for u in list(parent)}
        bmap = spark.sparkContext.broadcast(mapping)

        @F.pandas_udf("string")
        def gid_of(comp):
            import pandas as pd

            m = bmap.value
            return pd.Series([m.get(c, c) for c in comp])

        merged = comps.withColumn("gid", gid_of(F.col("comp")))
    pairs_df.unpersist()

    g = grid
    a_, b_, c_, d_, e_, f_ = g.transform

    def assemble(key, pdf):
        import pandas as pd

        # concat in comp-key order: edge order feeds ring tracing, so a
        # deterministic order makes the emitted GeoJSON reproducible
        # under any parallelism / CC path
        pdf = pdf.sort_values("comp")
        edges = np.concatenate(
            [np.frombuffer(x, dtype=np.int64).reshape(-1, 4) for x in pdf["edges"]]
        )
        edges = cancel_paired_edges(edges)
        rings = trace_rings(edges)
        shells, holes = [], []
        for r in rings:
            (shells if ring_signed_area(r) > 0 else holes).append(r)
        # world transform: corner (x=col, y=row) -> world
        def world(r):
            xs = a_ * r[:, 0] + b_ * r[:, 1] + c_
            ys = d_ * r[:, 0] + e_ * r[:, 1] + f_
            return np.column_stack([xs, ys]).tolist()

        polys = []
        for s in shells:
            rs = [world(s)]
            for h in holes:
                ip = _interior_point([tuple(p) for p in h.tolist()])
                if ip is not None:
                    # hole belongs to the shell containing it (pixel frame)
                    from ..geom.pip import points_in_polygon

                    inside = points_in_polygon(
                        np.array([ip[0]]), np.array([ip[1]]),
                        s.astype(np.float64).ravel(), np.asarray([0, len(s)], np.int32),
                    )[0]
                    if inside:
                        rs.append(world(h))
            polys.append(rs)
        if len(polys) == 1:
            gj = {"type": "Polygon", "coordinates": polys[0]}
        else:
            gj = {"type": "MultiPolygon", "coordinates": polys}
        return pd.DataFrame(
            [
                {
                    "comp_id": str(key[0]),
                    "value": float(pdf["value"].iloc[0]),
                    "n_pixels": int(pdf["npix"].sum()),
                    "geojson": json.dumps(gj, separators=(",", ":")),
                }
            ]
        )

    out = merged.groupBy("gid").applyInPandas(
        assemble, schema="comp_id string, value double, n_pixels long, geojson string"
    )
    if progress is not None:
        _report(0.8, "polygonize: ring assembly")
        out = out.persist()
        out.count()
        _report(1.0, "polygonize: done")
    return out
