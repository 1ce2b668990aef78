#!/usr/bin/env python
"""Executor-process scale-out evidence (BASELINE.md north rule).

local[N] threads share one JVM heap, memory system and GC; real
clusters add executors (separate processes).  Spark's local-cluster
master spawns REAL executor JVMs on this box, so

    spark-submit --master 'local-cluster[2,4,4096]' \
        --py-files dist/gdal_boots_spark.zip scripts/scaling_multiproc.py

vs ``local-cluster[8,4,4096]`` measures a genuine 2-executor -> 8-
executor scale-out (4 cores each) of the SAME flagship job on the SAME
materialized input — process isolation stands in for node isolation
(the co-tenant memory-bandwidth ceiling still applies; the same-run
JVM control calibrates it).

Prints one JSON line: {"master": ..., "flagship": best sec,
"cpu_control": best sec, "docs": N}.
"""

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    docs_path = os.environ.get(
        "SPARK_GRAFT_DOCS", "/root/repo/.bench_cache/docs_sf0.1_x4000.parquet"
    )
    spark = SparkSession.builder.appName("gbs-scaling-mp").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from gdal_boots_spark.operators.spatial_join import pip_join_docs
    from gdal_boots_spark.sources.synth import rect_polygons_df

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    polys = rect_polygons_df(spark)
    pip_join_docs(docs, polys).count()  # warm executors + plan
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        pip_join_docs(docs, polys).count()
        best = min(best or 1e9, time.perf_counter() - t0)

    ctl = spark.range(40_000_000).select(F.md5(F.col("id").cast("string")).alias("h"))
    ctl.where(F.col("h") > "f").count()
    cbest = None
    for _ in range(3):
        t0 = time.perf_counter()
        ctl.where(F.col("h") > "f").count()
        cbest = min(cbest or 1e9, time.perf_counter() - t0)

    print(json.dumps({
        "master": spark.sparkContext.master,
        "flagship": round(best, 3),
        "cpu_control": round(cbest, 3),
        "docs": n_docs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
