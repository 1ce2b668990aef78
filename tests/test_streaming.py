"""Streaming surface: availableNow drain equals the batch result."""

from pyspark.sql import functions as F

from gdal_boots_spark.sources.synth import interleaved_docs
from gdal_boots_spark.streaming.doc_stream import stream_cell_assign
from tests.conftest import SF_SMOKE


def test_stream_cell_assign_matches_batch(spark, tmp_path):
    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = interleaved_docs(spark, SF_SMOKE)
    docs.write.parquet(indir)

    q = stream_cell_assign(spark, indir, ckpt, outdir, res=8)
    q.awaitTermination(120)

    got = spark.read.parquet(outdir)
    from gdal_boots_spark.functions.geometry_fns import cell_id_col, point_xy_native
    from gdal_boots_spark.operators.spans import explode_spans

    geo = explode_spans(docs).where(F.col("kind") == "geo")
    x, y, is_point = point_xy_native(F.col("text"))
    exp = geo.where(is_point).select("doc_id", cell_id_col(x, y, 8).alias("cell_id"))
    assert sorted(map(tuple, got.select("doc_id", "cell_id").collect())) == sorted(
        map(tuple, exp.collect())
    )

    # resumability: re-running with the same checkpoint adds nothing
    q2 = stream_cell_assign(spark, indir, ckpt, outdir, res=8)
    q2.awaitTermination(120)
    assert spark.read.parquet(outdir).count() == exp.count()
