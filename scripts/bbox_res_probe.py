#!/usr/bin/env python
"""Decompose bbox_join (VERDICT r6 item 6): candidate volume + wall
time per bucketing resolution, interleaved rep-by-rep (the repo's A/B
protocol), cold plan per rep (fresh DataFrame — matches how the
per-round bench measures it).

At res=10 the domain (2.9 x 1.9 deg at bench density) holds only ~88
distinct cell_ids -> the hash join has 88 keys for 32+ cores (skew by
construction) and every rect is dilated by a 0.35 x 0.18 deg cell
(~65M candidates for ~4.4M true pairs).  Finer cells shrink dilation
but multiply the cover explode; this probe measures where the trade
bottoms out.

Usage: python scripts/bbox_res_probe.py [reps] [res,res,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res_list = [int(r) for r in (sys.argv[2] if len(sys.argv) > 2 else "10,12,13,14").split(",")]
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from gdal_boots_spark.operators.bbox_join import bbox_overlap_join
    from gdal_boots_spark.session import get_spark

    spark = get_spark("bbox-res-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def build(res):
        # same rects as the board query, parameterized res
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        part = spark.read.parquet(f"{sf}/part.parquet")
        ok, pk = F.col("o_orderkey"), F.col("p_partkey")
        left = orders.select(
            ok.alias("lid"),
            (F.lit(26.0) + ((ok * 271) % 2900).cast("double") / 1000.0).alias("lminx"),
            (F.lit(53.0) + ((ok * 577) % 1900).cast("double") / 1000.0).alias("lminy"),
        ).select(
            "lid", "lminx", "lminy",
            (F.col("lminx") + 0.04).alias("lmaxx"), (F.col("lminy") + 0.04).alias("lmaxy"),
        )
        right = part.select(
            pk.alias("rid"),
            (F.lit(26.0) + ((pk * 383) % 2900).cast("double") / 1000.0).alias("rminx"),
            (F.lit(53.0) + ((pk * 769) % 1900).cast("double") / 1000.0).alias("rminy"),
        ).select(
            "rid", "rminx", "rminy",
            (F.col("rminx") + 0.05).alias("rmaxx"), (F.col("rminy") + 0.05).alias("rmaxy"),
        )
        return bbox_overlap_join(left, right, res=res).select("lid", "rid")

    # one-time: candidate volume + true pairs per res (not timed)
    from gdal_boots_spark.operators.bbox_join import _explode_cover

    stats = {}
    for res in res_list:
        orders = spark.read.parquet(f"{sf}/orders.parquet").selectExpr(
            "o_orderkey lid",
            "26.0 + (o_orderkey * 271 % 2900) / 1000.0 lminx",
            "53.0 + (o_orderkey * 577 % 1900) / 1000.0 lminy",
        ).selectExpr("lid", "lminx", "lminy", "lminx + 0.04 lmaxx", "lminy + 0.04 lmaxy")
        part = spark.read.parquet(f"{sf}/part.parquet").selectExpr(
            "p_partkey rid",
            "26.0 + (p_partkey * 383 % 2900) / 1000.0 rminx",
            "53.0 + (p_partkey * 769 % 1900) / 1000.0 rminy",
        ).selectExpr("rid", "rminx", "rminy", "rminx + 0.05 rmaxx", "rminy + 0.05 rmaxy")
        lc = _explode_cover(orders, res, "l")
        rc = _explode_cover(part, res, "r")
        row = lc.join(rc, "cell_id").groupBy().count().collect()[0][0]
        stats[res] = {
            "l_cover": lc.count(), "r_cover": rc.count(),
            "cells": lc.select("cell_id").distinct().count(),
            "join_rows": row,
        }
        print(json.dumps({"res": res, **stats[res]}), flush=True)

    results: dict[int, list[float]] = {r: [] for r in res_list}
    true_rows = None
    for rep in range(reps):
        order = res_list if rep % 2 == 0 else list(reversed(res_list))
        for res in order:
            df = build(res)  # fresh DataFrame: cold plan, like the bench
            t0 = time.perf_counter()
            n = df.count()
            dt = time.perf_counter() - t0
            results[res].append(round(dt, 4))
            if true_rows is None:
                true_rows = n
            assert n == true_rows, f"res={res} changed the result: {n} != {true_rows}"
            load1 = float(open("/proc/loadavg").read().split()[0])
            print(json.dumps({"rep": rep, "res": res, "sec": round(dt, 4), "rows": n,
                              "load1": load1}), flush=True)
    print(json.dumps({
        "true_rows": true_rows,
        "best": {r: min(v) for r, v in results.items()},
        "all": results,
        "stats": stats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
