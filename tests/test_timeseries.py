"""Hypertable time-chunked layout (sources/timeseries.py): pruned range
reads, and the continuous aggregate's chunk/tail seam."""

import datetime
import os

from pyspark.sql import functions as F

from pure_python_geospatial_export_spark.session import local_df
from pure_python_geospatial_export_spark.sources.timeseries import (
    read_time_range,
    serve_rollup,
    write_events_table,
    write_rollup,
)

BASE = datetime.datetime(2024, 5, 1)


def _events_df(spark, n=400, days=10):
    rows = [
        (
            i,
            BASE + datetime.timedelta(
                days=i % days, minutes=(i * 37) % 1440
            ),
            "t%d" % (i % 3),
            float(i % 7) * 0.5,
        )
        for i in range(n)
    ]
    return local_df(spark, rows, ["event_id", "ts", "event_type",
                                  "value"])


def test_range_read_prunes_partitions_and_filters_exactly(
        spark, tmp_path):
    path = os.path.join(tmp_path, "events")
    df = _events_df(spark)
    write_events_table(df, path)
    got = read_time_range(
        spark, path, "2024-05-03 12:00:00", "2024-05-06 00:00:00"
    )
    rows = got.collect()
    lo = datetime.datetime(2024, 5, 3, 12)
    hi = datetime.datetime(2024, 5, 6)
    want = {r["event_id"] for r in df.collect() if lo <= r["ts"] < hi}
    assert {r["event_id"] for r in rows} == want and want
    # pruning: the EXECUTED scan touches only the 3 candidate day dirs
    # (inputFiles() reports the unpruned relation — use input_file_name)
    touched = {
        r["f"].split("part_day=")[1].split("/")[0]
        for r in got.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert touched == {"2024-05-03", "2024-05-04", "2024-05-05"}


def test_serve_rollup_equals_flat_recompute(spark, tmp_path):
    ev_path = os.path.join(tmp_path, "events")
    roll_path = os.path.join(tmp_path, "rollup")
    df = _events_df(spark)
    write_events_table(df, ev_path)
    write_rollup(spark, ev_path, roll_path)
    for cutoff in ("2024-05-01", "2024-05-04", "2024-05-11"):
        served = {
            (r["day"], r["event_type"]): (r["n_events"], r["sum_cents"])
            for r in serve_rollup(
                spark, ev_path, roll_path, cutoff
            ).collect()
        }
        flat = {
            (r["day"], r["event_type"]): (r["n_events"], r["sum_cents"])
            for r in df.withColumn(
                "day", F.date_trunc("day", "ts").cast("date")
            ).groupBy("day", "event_type").agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(
                    F.floor(F.col("value") * 100.0 + 0.5).cast("long")
                ).alias("sum_cents"),
            ).collect()
        }
        assert served == flat, cutoff
    # all-precomputed cutoff: every executed row comes from rollup
    # files, none from the raw events table
    served_df = serve_rollup(spark, ev_path, roll_path, "2024-05-11")
    srcs = {
        r["f"]
        for r in served_df.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert srcs and all("/rollup/" in f for f in srcs), srcs


def test_rollup_incremental_day_append(spark, tmp_path):
    """Appending a new day chunk + its rollup keeps the seam exact."""
    ev_path = os.path.join(tmp_path, "events")
    roll_path = os.path.join(tmp_path, "rollup")
    df = _events_df(spark, n=300, days=5)
    write_events_table(df, ev_path)
    write_rollup(spark, ev_path, roll_path)
    extra = local_df(
        spark,
        [(10_000 + i,
          BASE + datetime.timedelta(days=7, minutes=i),
          "t0", 1.25) for i in range(20)],
        ["event_id", "ts", "event_type", "value"],
    )
    write_events_table(extra, ev_path, mode="append")
    served = serve_rollup(
        spark, ev_path, roll_path, "2024-05-06"
    ).where(F.col("day") == datetime.date(2024, 5, 8)).collect()
    assert len(served) == 1
    assert served[0]["n_events"] == 20
    assert served[0]["sum_cents"] == 20 * 125


def test_stream_ingest_into_time_layout(spark, tmp_path):
    """Streamed micro-batches land in part_day dirs; pruned range reads
    and the continuous aggregate work on live-ingested data."""
    from pure_python_geospatial_export_spark.streaming.ingest import (
        stream_to_events_table,
    )

    src = os.path.join(tmp_path, "src")
    table = os.path.join(tmp_path, "events")
    ckpt = os.path.join(tmp_path, "ckpt")
    roll = os.path.join(tmp_path, "rollup")
    df = _events_df(spark, n=200, days=4)
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = stream_to_events_table(stream, table, ckpt)
    q.awaitTermination()

    got = read_time_range(
        spark, table, "2024-05-02 00:00:00", "2024-05-04 00:00:00"
    )
    lo, hi = datetime.datetime(2024, 5, 2), datetime.datetime(2024, 5, 4)
    want = {r["event_id"] for r in df.collect() if lo <= r["ts"] < hi}
    assert {r["event_id"] for r in got.collect()} == want and want

    write_rollup(spark, table, roll)
    served = {
        (r["day"], r["event_type"]): r["n_events"]
        for r in serve_rollup(spark, table, roll, "2024-05-03").collect()
    }
    flat = {
        (r["day"], r["event_type"]): r["n_events"]
        for r in df.withColumn(
            "day", F.date_trunc("day", "ts").cast("date")
        ).groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n_events")
        ).collect()
    }
    assert served == flat


def test_serve_distinct_rollup_equals_flat_sketch(spark, tmp_path):
    """The distinct-count seam: precomputed per-day registers UNION
    tail registers, merged by max, must equal the flat sketch of ALL
    raw events bit for bit — at every cutoff position (all-precomputed,
    mid, all-tail)."""
    from pure_python_geospatial_export_spark.operators.sketch import (
        hll_estimate,
        hll_sketch,
    )
    from pure_python_geospatial_export_spark.sources.timeseries import (
        serve_distinct_rollup,
        write_distinct_rollup,
    )

    path = os.path.join(tmp_path, "events")
    droll = os.path.join(tmp_path, "droll")
    df = _events_df(spark, n=600, days=10).withColumn(
        "user_id", (F.col("event_id") % 37).cast("long")
    )
    write_events_table(df, path)
    write_distinct_rollup(spark, path, droll, p=8,
                          distinct_col="user_id")
    flat = hll_estimate(
        hll_sketch(
            df.withColumn("_dv", F.col("user_id").cast("string")),
            ["event_type"], "_dv", p=8,
        ),
        ["event_type"], p=8,
    )
    want = {tuple(r) for r in flat.collect()}
    for cutoff in ("2024-05-11", "2024-05-05", "2024-05-01"):
        got = serve_distinct_rollup(
            spark, path, droll, cutoff, p=8, distinct_col="user_id"
        )
        assert {tuple(r) for r in got.collect()} == want, cutoff
    # sanity: the estimate tracks the true distinct count (37 users)
    ests = {r["event_type"]: r["est"] for r in flat.collect()}
    for v in ests.values():
        assert abs(v - 37) / 37 < 0.25
