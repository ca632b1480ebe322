"""Tests: per-partition metrics, checkpoint/resume, streaming ingest."""

import os

from pyspark.sql import functions as F

from pure_python_geospatial_export_spark.functions.geom_udfs import (
    cell_id_col,
)
from pure_python_geospatial_export_spark.functions.points import with_point
from pure_python_geospatial_export_spark.plans.lineage import (
    ResumableRun,
    partition_metrics,
)
from pure_python_geospatial_export_spark.sources.pages import synth_pages
from pure_python_geospatial_export_spark.streaming.ingest import (
    run_available_now,
    stream_pages,
    windowed_cell_counts,
)


def test_partition_metrics(spark):
    df = spark.range(0, 1000, 1, 8)
    m = partition_metrics(df).collect()
    assert len(m) == 8
    assert sum(r["n_rows"] for r in m) == 1000
    assert all(r["n_bytes"] > 0 for r in m)
    assert sorted(r["partition_id"] for r in m) == list(range(8))


def _units_df(spark, n=500):
    pages = with_point(synth_pages(spark, n))
    return pages.withColumn(
        "unit", cell_id_col(F.col("lon"), F.col("lat"), 2)
    )


def test_resumable_run_resumes(spark, tmp_path):
    df = _units_df(spark)
    units = [int(r["unit"]) for r in df.select("unit").distinct().collect()]
    assert len(units) > 4
    half = set(units[: len(units) // 2])

    out = str(tmp_path / "run")
    rr = ResumableRun(spark, out, unit_col="unit")

    # first (partial) run: only half the units available
    s1 = rr.run(df.where(F.col("unit").isin(list(half))))
    assert s1["processed_units"] == len(half)
    assert not s1["resumed"]

    # second run with the full input resumes: only the remainder processed
    s2 = rr.run(df)
    assert s2["resumed"]
    assert s2["processed_units"] == len(units) - len(half)

    # third run: nothing left to do
    s3 = rr.run(df)
    assert s3["processed_units"] == 0

    # final output equals one-shot processing
    got = rr.output().count()
    assert got == df.count()
    manifest = spark.read.parquet(os.path.join(out, "manifest"))
    assert manifest.select("unit").distinct().count() == len(units)


def test_resumable_run_retry_is_idempotent(spark, tmp_path):
    """Crash between the data write and the manifest write: the unit is
    re-done on resume, and the dynamic-partition-overwrite data write
    must REPLACE its partition, not append a second copy."""
    import shutil

    df = _units_df(spark)
    out = str(tmp_path / "run_crash")
    rr = ResumableRun(spark, out, unit_col="unit")

    rr.run(df)
    # simulate the crash: data landed, manifest did not
    shutil.rmtree(os.path.join(out, "manifest"))

    s2 = rr.run(df)  # resume re-does every unit
    assert s2["processed_units"] > 0
    assert rr.output().count() == df.count()  # no duplicated rows


def test_resumable_run_marks_empty_units_done(spark, tmp_path):
    """Units whose process() output is empty are still manifested as
    done, so they don't recompute on every resume."""
    df = _units_df(spark)
    rr = ResumableRun(spark, str(tmp_path / "run_empty"), unit_col="unit")

    def drop_everything(d):
        return d.where(F.lit(False))

    s1 = rr.run(df, process=drop_everything)
    assert s1["processed_units"] > 0
    assert s1["rows"] == 0

    s2 = rr.run(df, process=drop_everything)
    assert s2["processed_units"] == 0  # nothing recomputed


def test_resumable_run_with_process_fn(spark, tmp_path):
    df = _units_df(spark, 300)
    rr = ResumableRun(spark, str(tmp_path / "run2"), unit_col="unit")

    def proc(d):
        return d.groupBy("unit", "lang").agg(
            F.count(F.lit(1)).alias("n")
        )

    rr.run(df, process=proc, collect_metrics=True)
    out = rr.output()
    assert out.agg(F.sum("n")).first()[0] == 300
    metrics = spark.read.parquet(str(tmp_path / "run2" / "metrics"))
    assert metrics.count() > 0


def test_streaming_windowed_cell_counts(spark, tmp_path):
    src = str(tmp_path / "pages_parquet")
    ckpt = str(tmp_path / "ckpt")
    pages = synth_pages(spark, 400)
    pages.write.parquet(src)

    stream = stream_pages(spark, src)
    assert stream.isStreaming
    agg = windowed_cell_counts(stream, res=3, window="30 minutes")
    run_available_now(agg, "cell_counts", ckpt)
    got = spark.sql(
        "select sum(n_pages) as total, count(*) as groups from cell_counts"
    ).first()
    assert got["total"] == 400

    # batch equivalent must agree group-for-group
    batch = (
        windowed_cell_counts.__wrapped__(pages, 3, "30 minutes")
        if hasattr(windowed_cell_counts, "__wrapped__")
        else None
    )
    from pure_python_geospatial_export_spark.functions.points import (
        lat_col,
        lon_col,
    )

    batch = (
        pages.withColumn("lon", lon_col(F.col("url")))
        .withColumn("lat", lat_col(F.col("url")))
        .withColumn("cell_id", cell_id_col(F.col("lon"), F.col("lat"), 3))
        .groupBy(F.window("warc_ts", "30 minutes").alias("win"), "cell_id")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            "cell_id",
            F.col("n_pages"),
        )
    )
    expected = {
        (r["window_start"], int(r["cell_id"])): int(r["n_pages"])
        for r in batch.collect()
    }
    streamed = {
        (r["window_start"], int(r["cell_id"])): int(r["n_pages"])
        for r in spark.table("cell_counts").collect()
    }
    assert streamed == expected


def test_streaming_windowed_cell_distinct(spark, tmp_path):
    """HLL++ distinct-URL estimates per (window, cell): all urls are
    unique in the fixture, so estimates must sit within the configured
    rsd of the true per-group counts."""
    from pure_python_geospatial_export_spark.functions.points import (
        lat_col,
        lon_col,
    )
    from pure_python_geospatial_export_spark.streaming.ingest import (
        windowed_cell_distinct,
    )

    src = str(tmp_path / "pages_d")
    ckpt = str(tmp_path / "ckpt_d")
    pages = synth_pages(spark, 400)
    pages.write.parquet(src)

    agg = windowed_cell_distinct(stream_pages(spark, src), res=2,
                                 window="30 minutes", rsd=0.02)
    run_available_now(agg, "cell_distinct", ckpt)

    exact = (
        pages.withColumn("lon", lon_col(F.col("url")))
        .withColumn("lat", lat_col(F.col("url")))
        .withColumn("cell_id", cell_id_col(F.col("lon"), F.col("lat"), 2))
        .groupBy(F.window("warc_ts", "30 minutes").alias("win"), "cell_id")
        .agg(F.countDistinct("url").alias("n"))
        .select(F.col("win.start").alias("ws"), "cell_id", "n")
    )
    truth = {(r["ws"], int(r["cell_id"])): int(r["n"])
             for r in exact.collect()}
    got = {
        (r["window_start"], int(r["cell_id"])): int(r["n_distinct_urls"])
        for r in spark.table("cell_distinct").collect()
    }
    assert set(got) == set(truth)
    for key, est in got.items():
        assert abs(est - truth[key]) <= max(2, 0.1 * truth[key]), (
            key, est, truth[key])


def test_streaming_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one page per content hash
    within the watermark horizon; distinct texts all survive."""
    import datetime

    from pure_python_geospatial_export_spark.streaming.ingest import (
        deduplicated_stream,
    )

    src = str(tmp_path / "dup_pages")
    ckpt = str(tmp_path / "dup_ckpt")
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(60):
        text = "unique text %d" % (i % 20)  # 20 distinct texts, 3 copies
        rows.append((i, "doc://%d" % i,
                     t0 + datetime.timedelta(minutes=i), None, text, "en"))
    spark.createDataFrame(
        rows,
        "page_id long, url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    ).write.parquet(src)

    from pure_python_geospatial_export_spark.streaming.ingest import (
        stream_pages,
    )

    deduped = deduplicated_stream(stream_pages(spark, src),
                                  watermark="6 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("deduped_pages")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM deduped_pages").collect()
    texts = [r["text"] for r in out]
    assert len(texts) == 20  # one survivor per distinct text
    assert len(set(texts)) == 20
    assert "text_hash" not in spark.sql(
        "SELECT * FROM deduped_pages").columns


def test_stream_to_spatial_table_prunes(spark, tmp_path):
    from pure_python_geospatial_export_spark.geo import cells as cellmod
    from pure_python_geospatial_export_spark.sources.layout import (
        read_cells,
    )
    from pure_python_geospatial_export_spark.streaming.ingest import (
        stream_to_spatial_table,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "spatial")
    ckpt = str(tmp_path / "ck")
    synth_pages(spark, 1500).write.parquet(src)

    stream = stream_pages(spark, src)
    q = stream_to_spatial_table(stream, out, ckpt, part_res=3)
    q.awaitTermination()

    table = spark.read.parquet(out)
    assert table.count() == 1500
    qcell = int(cellmod.cell_id_scalar(-104.786, 41.14, 8))
    pruned = read_cells(spark, out, [qcell], part_res=3)
    touched = {
        r["f"] for r in pruned.select(
            F.input_file_name().alias("f")).distinct().collect()
    }
    assert 0 < len(touched) < len(set(table.inputFiles()))


def test_curated_stream_end_to_end(spark, tmp_path):
    """Streaming curation preset: quality floor drops junk, PII is
    redacted in place, exact dup within the watermark horizon is
    dropped — one pass, one stateful stage."""
    import datetime
    import os

    from pure_python_geospatial_export_spark.streaming.curate import (
        curated_stream,
    )

    base = datetime.datetime(2024, 6, 1)
    good = ("the quick brown fox jumps over the lazy dog and then "
            "it runs far away to the hills and sleeps")
    pii = good + " contact agent007@example.org now"
    rows = [
        (1, base, good),
        (2, base + datetime.timedelta(minutes=1), "too short"),
        (3, base + datetime.timedelta(minutes=2), pii),
        (4, base + datetime.timedelta(minutes=3), good),  # dup of 1
    ]
    src_df = spark.createDataFrame(rows, ["page_id", "warc_ts", "text"])
    src = os.path.join(tmp_path, "pages")
    ckpt = os.path.join(tmp_path, "ckpt")
    src_df.write.parquet(src)
    stream = spark.readStream.schema(src_df.schema).parquet(src)
    out = curated_stream(stream, dedup_watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("curated")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["page_id"]: r["text"]
           for r in spark.table("curated").collect()}
    # 2 fails the quality floor; 1 and 4 are exact twins, so exactly
    # ONE survives (which one is batch-internal arrival order — the
    # operator guarantees dedup, not a representative)
    assert 3 in got and len(got) == 2
    (dup_kept,) = set(got) - {3}
    assert dup_kept in (1, 4)
    assert got[dup_kept] == good
    assert got[3] == good + " contact <EMAIL> now"


def test_curated_stream_stateless_matches_batch_preset(spark):
    """With the stateful stage off, the streaming preset's filters must
    keep exactly the rows the batch preset's filter stages keep."""
    import datetime

    from pure_python_geospatial_export_spark.functions import text as T
    from pure_python_geospatial_export_spark.session import local_df
    from pure_python_geospatial_export_spark.streaming.curate import (
        curated_stream,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog near the river "
        "bank and the other animals watch it in the morning light",
        "x",
        "!!! ??? ,,, ;;; ::: !!!",
        "der hund und die katze ist das haus und der baum ist gross "
        "und die sonne ist hell und das wasser ist kalt heute",
    ]
    rows = [
        (i, datetime.datetime(2024, 6, 1), t)
        for i, t in enumerate(texts)
    ]
    df = local_df(spark, rows, ["page_id", "warc_ts", "text"])
    got = {
        r["page_id"]
        for r in curated_stream(
            df, min_tokens=5, min_quality=0.3, keep_langs=["en"],
            redact=False, dedup_watermark=None,
        ).collect()
    }
    want = {
        r["page_id"]
        for r in df.where(
            (T.token_count(F.col("text")) >= 5)
            & (T.quality_score(F.col("text")) >= 0.3)
            & T.lang_id(F.col("text")).isin(["en"])
        ).collect()
    }
    assert got == want
    assert got == {0}  # 1 too short, 2 pure punctuation, 3 German
