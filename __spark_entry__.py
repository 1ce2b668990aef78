"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Every spatial query here runs through the real engine machinery
(gdal_boots_spark): interleaved-span extraction, packed-geometry
decode, native cell-id math, cell-bucketed broadcast join, Arrow-batched
ray-cast refinement.  The oracle SQL reproduces the same semantics
analytically (the doc_id -> lon/lat derivation is pure integer
arithmetic shared via gdal_boots_spark.sources.synth).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_boots_spark.operators.spans import explode_spans
from gdal_boots_spark.operators.spatial_join import pip_join_docs
from gdal_boots_spark.sources.synth import (
    SQL_HAS_GEO,
    SQL_LAT,
    SQL_LON,
    interleaved_docs,
    rect_polygons_df,
    rects_sql_values,
)

SF0001 = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: interleaved docs x polygon dim, cell-bucketed PIP join."""
    docs = interleaved_docs(spark, sf_dir)
    polys = rect_polygons_df(spark)
    out = pip_join_docs(docs, polys)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), F.col("poly_id").alias("poly_id"))


def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile/cell assignment of every geo span at resolution 8."""
    from gdal_boots_spark.functions.geometry_fns import cell_id_col
    from gdal_boots_spark.operators.spatial_join import extract_geo_spans

    docs = interleaved_docs(spark, sf_dir)
    geo = extract_geo_spans(docs)
    pt = F.from_json(F.col("text"), "type string, coordinates array<double>")
    pts = geo.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
    ).withColumn("g", pt)
    return pts.select(
        "doc_id",
        cell_id_col(F.col("g.coordinates")[0], F.col("g.coordinates")[1], 8).alias("cell_id"),
    )


def q_geo_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-span extraction: doc_id + decoded lon/lat (rounded to 6)."""
    from gdal_boots_spark.operators.spatial_join import extract_geo_spans

    docs = interleaved_docs(spark, sf_dir)
    geo = extract_geo_spans(docs)
    pt = F.from_json(F.col("text"), "type string, coordinates array<double>")
    return geo.withColumn("g", pt).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round(F.col("g.coordinates")[0], 6).alias("x"),
        F.round(F.col("g.coordinates")[1], 6).alias("y"),
    )


def q_span_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-structure audit of the interleaved table: per-doc span count
    and kind histogram fields (exercises posexplode + groupBy)."""
    docs = interleaved_docs(spark, sf_dir)
    ex = explode_spans(docs)
    return ex.groupBy(F.col("doc_id").cast("long").alias("doc_id")).agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("kind") == "geo", 1).otherwise(0)).alias("n_geo"),
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias("n_media"),
    )


def q_point_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """values_by_points (gdal.py:897-931) through the real tile-table
    machinery: a 2-band 50x30 ramp raster (res 0.25, binary tile blobs,
    16px tiles) sampled at points derived from customer keys; NULL for
    out-of-bounds (left-outer semantics, golden test_raster.py:648-668).

    The 0.25 resolution and quarter-valued coordinates are exact in
    binary floating point, so the oracle's analytic pixel math agrees
    with the engine's inverse-affine to the last bit.
    """
    from gdal_boots_spark.operators.sampling import values_by_points
    from gdal_boots_spark.sources.tiles import RasterGrid, generate_tiles, ramp_fill

    grid = RasterGrid(
        raster_id="rq", epsg=4326, transform=(0.25, 0.0, 0.0, 0.0, -0.25, 7.5),
        width=50, height=30, tile_w=16, tile_h=16, bands=2, dtype="int32",
    )
    tiles = generate_tiles(spark, grid, ramp_fill)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    pts = cust.select(
        k.alias("point_id"),
        (F.lit(-2.0) + ((k * 13) % 70).cast("double") / 4.0).alias("x"),
        (F.lit(-2.0) + ((k * 29) % 60).cast("double") / 4.0).alias("y"),
    )
    return values_by_points(pts, tiles, grid)


def q_rasterize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector->raster burn (Layer.rasterize, gdal.py:1092-1107): the
    polygon dim burned onto a 300x200 grid (res 0.01 over the Minsk
    region), verified by exact value histogram — the reference's own
    oracle style (test_vector.py:76-78).  The DuckDB oracle evaluates
    center coverage for all 60k pixel centers analytically."""
    from gdal_boots_spark.operators.rasterize import rasterize
    from gdal_boots_spark.operators.stats import tile_histogram
    from gdal_boots_spark.sources.tiles import RasterGrid

    grid = RasterGrid(
        raster_id="burn", epsg=4326, transform=(0.01, 0.0, 26.0, 0.0, -0.01, 55.0),
        width=300, height=200, tile_w=64, tile_h=64, bands=1, dtype="uint8",
    )
    tiles = rasterize(spark, rect_polygons_df(spark), grid, all_touched=False, dense=True)
    return tile_histogram(tiles).select("value", "cnt")


def q_resample_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-downsample (Resampling.average, gdal.py:196) of an
    analytic ramp raster, emitted as a pixel table.  Block means of the
    ramp value row*W+col+1 are closed-form, so the oracle reproduces
    every output pixel exactly."""
    from gdal_boots_spark.operators.stats import tiles_to_pixels
    from gdal_boots_spark.operators.warp import resample
    from gdal_boots_spark.sources.tiles import RasterGrid, generate_tiles, ramp_fill

    grid = RasterGrid(
        raster_id="rs", epsg=4326, transform=(0.25, 0.0, 0.0, 0.0, -0.25, 12.0),
        width=64, height=48, tile_w=16, tile_h=16, bands=1, dtype="int32",
    )
    tiles = generate_tiles(spark, grid, ramp_fill)
    out_tiles, og = resample(tiles, grid, "average", resolution=(1.0, 1.0))
    return tiles_to_pixels(out_tiles, og.tile_w, og.tile_h).select("row", "col", "value")


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-pruned exact kNN (ring expansion over the cell index):
    supplier-derived query points x customer-derived base points, k=3.
    The oracle is the definitional cross-join + window top-k."""
    from gdal_boots_spark.operators.knn import knn_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    ck, sk = F.col("c_custkey"), F.col("s_suppkey")
    base = cust.select(
        ck.alias("bid"),
        (F.lit(26.0) + ((ck * 7919) % 3000).cast("double") / 1000.0).alias("x"),
        (F.lit(53.0) + ((ck * 104729) % 2000).cast("double") / 1000.0).alias("y"),
    )
    query = supp.select(
        sk.alias("qid"),
        (F.lit(26.0) + ((sk * 4409) % 3000).cast("double") / 1000.0).alias("x"),
        (F.lit(53.0) + ((sk * 9973) % 2000).cast("double") / 1000.0).alias("y"),
    )
    out = knn_join(query, base, k=3)
    return out.select("qid", "bid", F.col("rank").alias("rnk"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pip_join": q_pip_join,
        "cell_assign": q_cell_assign,
        "geo_extract": q_geo_extract,
        "span_counts": q_span_counts,
        "point_sampling": q_point_sampling,
        "rasterize_hist": q_rasterize,
        "resample_avg": q_resample_avg,
        "knn": q_knn,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB, over pre-registered testdata views)
# --------------------------------------------------------------------------

_GEO_CTE = f"""
geo AS (
  SELECT doc_id,
         {SQL_LON} AS x,
         {SQL_LAT} AS y
  FROM documents
  WHERE {SQL_HAS_GEO}
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "pip_join": f"""
            WITH {_GEO_CTE}
            SELECT g.doc_id AS doc_id, p.poly_id AS poly_id
            FROM geo g
            JOIN {rects_sql_values('p')}
              ON g.x >= p.minx AND g.x < p.maxx
             AND g.y >= p.miny AND g.y < p.maxy
        """,
        "cell_assign": f"""
            WITH {_GEO_CTE}
            SELECT doc_id,
                   CAST(8 AS BIGINT) * 288230376151711744
                 + CAST(LEAST(GREATEST(FLOOR((x + 180.0) / 360.0 * 256), 0), 255) AS BIGINT) * 536870912
                 + CAST(LEAST(GREATEST(FLOOR((y + 90.0) / 180.0 * 256), 0), 255) AS BIGINT) AS cell_id
            FROM geo
        """,
        "geo_extract": f"""
            WITH {_GEO_CTE}
            SELECT doc_id, ROUND(x, 6) AS x, ROUND(y, 6) AS y FROM geo
        """,
        "point_sampling": """
            WITH pts AS (
              SELECT c_custkey AS point_id,
                     -2.0 + CAST((c_custkey * 13) % 70 AS DOUBLE) / 4.0 AS x,
                     -2.0 + CAST((c_custkey * 29) % 60 AS DOUBLE) / 4.0 AS y
              FROM customer
            ), px AS (
              SELECT point_id,
                     CAST(FLOOR(4.0 * x) AS BIGINT) AS col,
                     CAST(FLOOR(30.0 - 4.0 * y) AS BIGINT) AS row
              FROM pts
            )
            SELECT p.point_id AS point_id, b.band AS band,
                   CASE WHEN p.col >= 0 AND p.col < 50 AND p.row >= 0 AND p.row < 30
                        THEN CAST(p.row * 50 + p.col + 1 + b.band * 1500 AS DOUBLE)
                        ELSE NULL END AS value
            FROM px p CROSS JOIN (VALUES (0), (1)) AS b(band)
        """,
        "knn": """
            WITH q AS (
              SELECT s_suppkey AS qid,
                     26.0 + CAST((s_suppkey * 4409) % 3000 AS DOUBLE) / 1000.0 AS x,
                     53.0 + CAST((s_suppkey * 9973) % 2000 AS DOUBLE) / 1000.0 AS y
              FROM supplier
            ), b AS (
              SELECT c_custkey AS bid,
                     26.0 + CAST((c_custkey * 7919) % 3000 AS DOUBLE) / 1000.0 AS x,
                     53.0 + CAST((c_custkey * 104729) % 2000 AS DOUBLE) / 1000.0 AS y
              FROM customer
            ), d AS (
              SELECT q.qid, b.bid,
                     SQRT((q.x - b.x) * (q.x - b.x) + (q.y - b.y) * (q.y - b.y)) AS dist
              FROM q CROSS JOIN b
            ), r AS (
              SELECT qid, bid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, bid) AS rnk
              FROM d
            )
            SELECT qid, bid, rnk FROM r WHERE rnk <= 3
        """,
        "resample_avg": """
            SELECT i.range AS row, j.range AS col,
                   CAST((i.range * 4 + 1.5) * 64.0 + (j.range * 4 + 1.5) + 1.0 AS DOUBLE) AS value
            FROM range(12) i, range(16) j
        """,
        "rasterize_hist": f"""
            WITH px AS (
              SELECT 26.005 + cx.range * 0.01 AS x,
                     54.995 - cy.range * 0.01 AS y
              FROM range(300) cx, range(200) cy
            ), cov AS (
              SELECT CASE WHEN EXISTS (
                       SELECT 1 FROM {rects_sql_values('p')}
                       WHERE px.x > p.minx AND px.x < p.maxx
                         AND px.y > p.miny AND px.y < p.maxy
                     ) THEN 1.0 ELSE 0.0 END AS value
              FROM px
            )
            SELECT value, COUNT(*) AS cnt FROM cov GROUP BY value
        """,
        "span_counts": f"""
            SELECT doc_id,
                   2 + CASE WHEN doc_id % 10 IN (0,1,2) THEN 1 ELSE 0 END
                     + CASE WHEN doc_id % 10 IN (8,9) THEN 1 ELSE 0 END AS n_spans,
                   CAST(CASE WHEN doc_id % 10 IN (0,1,2) THEN 1 ELSE 0 END AS BIGINT) AS n_geo,
                   CAST(CASE WHEN doc_id % 10 IN (8,9) THEN 1 ELSE 0 END AS BIGINT) AS n_media
            FROM documents
        """,
    }


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pip_join(spark, SF0001)
