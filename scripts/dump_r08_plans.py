#!/usr/bin/env python
"""Dump .explain('formatted') for every bench-timed query into
plans/r08/<query>_<tag>.txt (tag = before/after).  Build-only: no query
is executed (operators may run their small build-time probe jobs)."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")


def cap(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    import __spark_entry__ as e
    from gdal_boots_spark.operators.spatial_join import pip_join_docs, pip_join_docs_any
    from gdal_boots_spark.session import get_spark
    from gdal_boots_spark.sources.synth import rect_polygons_df

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plans-r08", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = [
        "pip_join", "cell_assign", "geo_extract", "span_counts",
        "rasterize_hist", "point_sampling", "knn", "bbox_join",
    ]
    for name in names:
        df = qs[name](spark, SF_DIR)
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(cap(df))
        print("wrote", name)

    # xl flagships exactly as bench.py builds them (cached parquet input)
    repl = int(os.environ.get("SPARK_GRAFT_REPLICATE", "4000"))
    base = os.path.join(os.path.dirname(OUT.rstrip("/")), "..", ".bench_cache")
    cache = os.path.abspath(os.path.join(base, f"docs_{os.path.basename(SF_DIR.rstrip('/'))}_x{repl}.parquet"))
    pcache = cache.replace(".parquet", "_poly.parquet")
    polys = rect_polygons_df(spark)
    if os.path.exists(cache):
        docs = spark.read.parquet(cache)
        with open(os.path.join(OUT, f"pip_join_xl_{TAG}.txt"), "w") as f:
            f.write(cap(pip_join_docs(docs, polys)))
        print("wrote pip_join_xl")
    if os.path.exists(pcache):
        pdocs = spark.read.parquet(pcache)
        with open(os.path.join(OUT, f"pip_join_poly_xl_{TAG}.txt"), "w") as f:
            f.write(cap(pip_join_docs_any(pdocs, polys)))
        print("wrote pip_join_poly_xl")
    spark.stop()


if __name__ == "__main__":
    main()
