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


def test_stream_windowed_cell_counts_with_watermark(spark, tmp_path):
    """Watermarked windowed aggregation over event-time docs."""
    import datetime as dt

    from gdal_boots_spark.streaming.doc_stream import stream_cell_counts

    indir = str(tmp_path / "ev_in")
    docs = interleaved_docs(spark, SF_SMOKE)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    with_ts = docs.withColumn(
        "ts",
        F.to_timestamp(F.lit(t0.isoformat()))
        + F.make_interval(mins=(F.col("doc_id").cast("long") % 30)),
    )
    with_ts.write.parquet(indir)

    agg = stream_cell_counts(spark, indir, res=6, event_time_col="ts",
                             watermark="5 minutes", window="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("cellcounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cellcounts").collect()
    # append mode emits only windows closed by the watermark: with max
    # event time 00:29 and a 5-min watermark, the 00:00 and 00:10
    # windows are final
    assert len(got) > 0
    windows = {(r["window"]["start"].minute) for r in got}
    assert windows <= {0, 10}
    # counts match the batch computation for those closed windows
    from gdal_boots_spark.streaming.doc_stream import _geo_cells

    batch = _geo_cells(with_ts, 6, ("ts",)).groupBy(
        F.window("ts", "10 minutes"), "cell_id"
    ).agg(F.count("*").alias("n_docs"))
    exp = {
        (r["window"]["start"], r["cell_id"]): r["n_docs"]
        for r in batch.collect()
        if r["window"]["start"].minute in windows
    }
    gotmap = {(r["window"]["start"], r["cell_id"]): r["n_docs"] for r in got}
    assert gotmap == exp


def test_stream_exact_dedup_within_watermark(spark, tmp_path):
    """First occurrence of each normalized text survives; duplicates
    within the watermark horizon drop; state is hash-keyed + expiring."""
    import datetime as dt

    from gdal_boots_spark.streaming.doc_stream import stream_exact_dedup

    indir = str(tmp_path / "in")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("a", "Hello  World", t0),
        ("b", "hello world", t0 + dt.timedelta(minutes=1)),   # dup after normalize
        ("c", "another doc", t0 + dt.timedelta(minutes=2)),
        ("d", "ANOTHER   doc", t0 + dt.timedelta(minutes=3)),  # dup
        ("e", "unique text", t0 + dt.timedelta(minutes=4)),
    ]
    spark.createDataFrame(rows, "doc_id string, text string, ts timestamp").write.parquet(indir)
    out = stream_exact_dedup(spark, indir, "ts", "1 hour")
    q = (
        out.writeStream.format("memory").queryName("dedup_sink")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_sink").collect()}
    # one survivor per hash group; within one micro-batch the kept row
    # is one of the group (engine picks first encountered)
    assert len(got) == 3
    assert "c" in got or "d" in got
    assert "e" in got


def test_stream_cell_running_stats_stateful_resume(spark, tmp_path):
    """applyInPandasWithState totals accumulate ACROSS restarts via the
    checkpointed state store (custom stateful operator)."""
    from gdal_boots_spark.sources.synth import interleaved_docs
    from gdal_boots_spark.streaming.doc_stream import stream_cell_running_stats

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    docs = interleaved_docs(spark, SF_SMOKE)
    docs.write.parquet(indir)

    outdir = str(tmp_path / "updates")

    def drain():
        # foreachBatch parquet sink: memory sink cannot recover from a
        # checkpoint, file sinks cannot take update mode — foreachBatch
        # supports both (the production shape for stateful updates)
        out = stream_cell_running_stats(spark, indir, res=6)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(outdir)

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(outdir).groupBy("cell_id").agg(
            F.max("n_docs_total").alias("n")
        ).collect()
        return {r["cell_id"]: r["n"] for r in rows}

    first = drain()
    assert sum(first.values()) > 0

    # append the SAME docs again: totals must double (state persisted
    # across a query restart through the checkpointed state store)
    docs.write.mode("append").parquet(indir)
    second = drain()
    for cid, n in second.items():
        assert n == 2 * first[cid], (cid, n, first.get(cid))
    assert set(second) == set(first)


def test_stream_pip_join_matches_batch(spark, tmp_path):
    """The flagship join drained as a stream == the batch flagship
    (same operator code, stream-static broadcast join, map-only)."""
    from gdal_boots_spark.operators.spatial_join import pip_join_docs
    from gdal_boots_spark.sources.synth import interleaved_docs, rect_polygons_df
    from gdal_boots_spark.streaming.doc_stream import stream_pip_join

    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    docs = interleaved_docs(spark, SF_SMOKE)
    docs.write.parquet(indir)
    polys = rect_polygons_df(spark)

    q = stream_pip_join(spark, indir, polys, ckpt, outdir)
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(outdir).collect()))
    exp = sorted(
        map(tuple, pip_join_docs(docs, polys).select("doc_id", "span_pos", "poly_id").collect())
    )
    assert got == exp and len(exp) > 0


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    """Streaming decontamination drained == the batch operator on the
    same docs (foreachBatch reuses the batch code path; static
    benchmark dimension), and a checkpointed re-run adds nothing.

    VERDICT r6 item 8: the drained SINK additionally flows through the
    board's DuckDB oracle SQL (the stream inputs are exactly the board
    query's: sf0.001 documents, bench = doc_id % 37) — the streaming
    path inherits the same exactness bar as batch, not just
    batch-vs-stream parity."""
    import __spark_entry__ as entrymod
    from conftest import SF_SMOKE, compare_to_oracle
    from gdal_boots_spark.operators.decontam import decontaminate
    from gdal_boots_spark.streaming.doc_stream import stream_decontaminate

    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    docs.write.parquet(indir)
    bench = docs.where(F.col("doc_id") % 37 == 0)

    q = stream_decontaminate(spark, indir, bench, ckpt, outdir, n=3)
    q.awaitTermination(120)

    drained = spark.read.parquet(outdir)
    got = sorted(map(tuple, drained.collect()))
    exp = sorted(map(tuple, decontaminate(docs, bench, n=3).collect()))
    assert got == exp and len(exp) > 0

    # oracle-equality of the drained sink itself
    compare_to_oracle(drained, entrymod.all_oracle_sql()["decontaminate"], SF_SMOKE)

    # restart with the same checkpoint: no new batches, no duplicates
    q2 = stream_decontaminate(spark, indir, bench, ckpt, outdir, n=3)
    q2.awaitTermination(120)
    assert spark.read.parquet(outdir).count() == len(exp)


def test_stream_session_stats_matches_batch(spark, tmp_path):
    """Native session-window streaming aggregation drained == the same
    session_window aggregation in batch; session count also agrees
    with the batch sessionize counter on real (no exact-gap) data."""
    from gdal_boots_spark.operators.sessionize import session_stats
    from gdal_boots_spark.streaming.doc_stream import stream_session_stats

    indir = str(tmp_path / "ev")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.parquet(indir)

    agg = stream_session_stats(spark, indir, gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("sess").collect()))

    exp = sorted(
        map(
            tuple,
            ev.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start"), F.col("w.end"), "n_events")
            .collect(),
        )
    )
    assert got == exp and len(exp) > 0
    # no exact-gap events in the synthetic data: window count equals
    # the strict-gap batch counter's session count
    n_batch = session_stats(ev, "30 minutes").count()
    assert len(exp) == n_batch

    # oracle-equality of the DRAINED SINK itself (VERDICT r6 item 8,
    # second streaming surface): the streamed session windows equal the
    # DuckDB strict-gap oracle in session-window form (end = last
    # event + gap), compared in microseconds so NTZ/zone casts cannot
    # hide an off-by-offset
    from conftest import SF_SMOKE, compare_to_oracle
    from gdal_boots_spark.operators.sessionize import session_stats_oracle_sql

    drained = spark.table("sess").select(
        "user_id",
        F.unix_micros("w_start").alias("start_us"),
        F.unix_micros("w_end").alias("end_us"),
        F.col("n_events").cast("long").alias("n_events"),
    )
    compare_to_oracle(drained, session_stats_oracle_sql(gap_us=1_800_000_000), SF_SMOKE)

    # boundary agreement: an event at EXACTLY the gap merges into the
    # native session window AND stays in-session for the strict-gap
    # sessionize counter — identical session sets, boundary included
    two = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00"), (2, 10, "2024-01-01 00:30:00")],
        "event_id long, user_id long, s string",
    ).select("event_id", "user_id", F.col("s").cast("timestamp").alias("ts"))
    n_windows = (
        two.groupBy(F.session_window("ts", "30 minutes"), "user_id").count().count()
    )
    assert n_windows == 1
    assert session_stats(two, "30 minutes").count() == 1


def test_stream_chunk_documents_matches_batch(spark, tmp_path):
    """Streaming chunking drained == the batch operator (same
    zero-shuffle code path under readStream)."""
    from gdal_boots_spark.operators.chunking import chunk_documents
    from gdal_boots_spark.streaming.doc_stream import stream_chunk_documents

    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    docs.write.parquet(indir)

    q = stream_chunk_documents(spark, indir, ckpt, outdir, chunk_tokens=64, stride=48)
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(outdir).collect()))
    exp = sorted(map(tuple, chunk_documents(docs, 64, 48).collect()))
    assert got == exp and len(exp) > 0
