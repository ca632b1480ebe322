"""Incremental MVT tile maintenance (streaming/tiles.py): as point
micro-batches arrive, only touched tiles re-encode, the directory is
always complete, and at-least-once redelivery changes nothing."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pure_python_geospatial_export_spark.geo import mvt
from pure_python_geospatial_export_spark.session import local_df
from pure_python_geospatial_export_spark.streaming.tiles import (
    MvtTileMaintainer,
    points_to_mvt_sink,
)

Z = 3


def _write_point_files(tmp_path, batches):
    src = tmp_path / "pts_src"
    src.mkdir()
    schema = pa.schema([
        ("doc_id", pa.int64()), ("lon", pa.float64()),
        ("lat", pa.float64()),
    ])
    for i, pts in enumerate(batches):
        t = pa.table(
            {"doc_id": [p[0] for p in pts],
             "lon": [p[1] for p in pts],
             "lat": [p[2] for p in pts]},
            schema=schema,
        )
        path = src / ("b%03d.parquet" % i)
        pq.write_table(t, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src)


def _stream(spark, src):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )
    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
    ])
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _tile_ids(tiles_dir):
    out = {}
    zdir = os.path.join(tiles_dir, str(Z))
    for tx in os.listdir(zdir):
        for f in os.listdir(os.path.join(zdir, tx)):
            if not f.endswith(".mvt"):
                continue
            with open(os.path.join(zdir, tx, f), "rb") as fh:
                t = mvt.decode_tile(fh.read())
            ids = sorted(
                ft["id"] for ft in t["layers"][0]["features"]
            )
            out[(int(tx), int(f[:-4]))] = ids
    return out


def test_incremental_tiles_accumulate(spark, tmp_path):
    # two tile neighborhoods: west cluster and east cluster
    batches = [
        [(1, -100.0, 40.0), (2, -100.2, 40.1)],
        [(3, 100.0, -20.0)],
        [(4, -100.1, 40.2), (5, 100.1, -20.1)],
    ]
    src = _write_point_files(tmp_path, batches)
    m, q = points_to_mvt_sink(
        _stream(spark, src), Z,
        str(tmp_path / "store"), str(tmp_path / "tiles"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = _tile_ids(str(tmp_path / "tiles"))
    # the west tile accumulated ids across batches 0 and 2
    west = [ids for ids in got.values() if 1 in ids]
    assert west == [[1, 2, 4]]
    east = [ids for ids in got.values() if 3 in ids]
    assert east == [[3, 5]]


def test_redelivery_is_idempotent(spark, tmp_path):
    m = MvtTileMaintainer(
        spark, Z, str(tmp_path / "store"), str(tmp_path / "tiles")
    )
    b1 = local_df(spark, [(1, -100.0, 40.0), (2, -100.2, 40.1)],
                  ["doc_id", "lon", "lat"])
    b2 = local_df(spark, [(3, -100.1, 40.3)],
                  ["doc_id", "lon", "lat"])
    m.foreach_batch(b1, 0)
    m.foreach_batch(b2, 1)
    want = _tile_ids(str(tmp_path / "tiles"))
    m.foreach_batch(b2, 2)  # replay: duplicate rows in the store
    assert _tile_ids(str(tmp_path / "tiles")) == want
    m.foreach_batch(b1, 3)
    assert _tile_ids(str(tmp_path / "tiles")) == want
    assert list(want.values()) == [[1, 2, 3]]
