"""Tests for shx index, zip source/sink, writer balance, and the stateful
sessionization operator."""

import io
import os
import zipfile

from pure_python_geospatial_export_spark.sources import shapefile as shp

SHPDIR = "/root/reference/ppge-tests/shapefiles"


def test_shx_offsets_match_shp():
    with open(os.path.join(SHPDIR, "test/polygon.shx"), "rb") as f:
        idx = shp.decode_shx_bytes(f.read())
    with open(os.path.join(SHPDIR, "test/polygon.shp"), "rb") as f:
        buf = f.read()
    _hdr, shapes = shp.decode_shp_bytes(buf)
    assert len(idx) == len(shapes)
    # each offset points at a record header whose record number is i+1
    import struct

    for i, (off, _length) in enumerate(idx):
        recnum = struct.unpack(">i", buf[off:off + 4])[0]
        assert recnum == i + 1


def test_read_shapefile_zip(spark, tmp_path):
    zpath = str(tmp_path / "bundle.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for ext in (".shp", ".shx", ".dbf"):
            z.write(os.path.join(SHPDIR, "test/point" + ext),
                    "point" + ext)
    df = shp.read_shapefile_zip(spark, zpath)
    direct = shp.read_shapefile(spark,
                                os.path.join(SHPDIR, "test/point.shp"))
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, direct.collect()))


def test_bundle_shapefile_zip():
    parts = {}
    for ext in ("shp", "shx", "dbf"):
        with open(os.path.join(SHPDIR, "test/point.%s" % ext), "rb") as f:
            parts[ext] = f.read()
    parts["prj"] = shp.PRJ_WGS84
    bufs = {k: io.BytesIO(v) for k, v in parts.items()}
    out = io.BytesIO()
    shp.bundle_shapefile_zip("point", out, bufs["shp"], bufs["shx"],
                             bufs["dbf"], io.BytesIO(parts["prj"]))
    out.seek(0)
    with zipfile.ZipFile(out) as z:
        assert sorted(z.namelist()) == [
            "point.dbf", "point.prj", "point.shp", "point.shx"
        ]
        assert z.read("point.shp") == parts["shp"]
        assert z.read("point.prj") == shp.PRJ_WGS84


def test_writer_balance():
    shp_b, shx_b, dbf_b = io.BytesIO(), io.BytesIO(), io.BytesIO()
    w = shp.ShapefileWriter(shp_b, shx_b, dbf_b, shape_type=shp.MULTIPOINT)
    w.field("name", "C")
    # two shapes, one record -> balance pads one empty record
    w.shape({"shape_type": shp.MULTIPOINT,
             "points": [[1.0, 2.0]], "parts": [0]})
    w.shape({"shape_type": shp.MULTIPOINT,
             "points": [[3.0, 4.0]], "parts": [0]})
    w.record(name="only")
    w.balance()
    w.close()
    fields, records = shp.decode_dbf_bytes(dbf_b.getvalue())
    assert len(records) == 2
    assert records[0][0] == "only" and records[1][0] == ""
    _h, shapes = shp.decode_shp_bytes(shp_b.getvalue())
    assert len(shapes) == 2


def test_sessionization_batch_oracle(spark):
    import datetime

    from pure_python_geospatial_export_spark.streaming.sessions import (
        sessionized_stream,
    )

    base = datetime.datetime(2024, 1, 1)

    def ts(minutes):
        return base + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: two sessions separated by a 90-minute silence
        (1, ts(0), 1.0), (1, ts(10), 2.0), (1, ts(20), 3.0),
        (1, ts(110), 4.0), (1, ts(115), 5.0),
        # user 2: one long session, never closed within the data
        (2, ts(0), 1.0), (2, ts(20), 1.0), (2, ts(40), 1.0),
    ]
    src_dir_rows = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        ckpt = os.path.join(d, "ckpt")
        src_dir_rows.write.parquet(src)
        stream = (
            spark.readStream.schema(src_dir_rows.schema).parquet(src)
        )
        out = sessionized_stream(stream, gap_seconds=1800)
        q = (
            out.writeStream.format("memory").queryName("sessions")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (int(r["user_id"]), r["session_start"], r["session_end"],
             int(r["n_events"]), r["sum_value"])
            for r in spark.table("sessions").collect()
        }
    # only user 1's first session closes (gap 90min > 30min)
    assert got == {(1, ts(0), ts(20), 3, 6.0)}
