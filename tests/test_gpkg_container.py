"""GeoPackage CONTAINER source/sink (sources/gpkg.py): real SQLite
.gpkg files written and read with the stdlib, geometry through the
byte-exact GP-blob codec. Round-trips must be bit-stable; metadata
must satisfy the spec's core requirements (application_id, mandatory
gpkg_spatial_ref_sys rows, contents/geometry_columns registration)."""

import sqlite3

import pytest

from pure_python_geospatial_export_spark.geo import geopackage as gpkgeo
from pure_python_geospatial_export_spark.geo import wkb as wkbmod
from pure_python_geospatial_export_spark.geo import wkt as wktmod
from pure_python_geospatial_export_spark.session import local_df
from pure_python_geospatial_export_spark.sources.gpkg import (
    GPKG_APPLICATION_ID,
    GPKG_USER_VERSION,
    gpkg_blob_to_wkb,
    gpkg_header_bytes,
    list_gpkg_layers,
    read_gpkg,
    write_gpkg,
)

WKTS = [
    "POINT (30.5 -12.25)",
    "LINESTRING (0 0, 1.5 2.5, -3 4)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 2))",
    "MULTIPOINT ((1 1), (2 2))",
]


def _wkb(wkt: str) -> bytes:
    return wkbmod.dumps(wktmod.loads(wkt), big_endian=False)


def _sample_df(spark, with_null_geom=False):
    rows = [
        (i, "name-%d" % i, float(i) * 1.5, i % 2 == 0, b"\x00\xffP%d"
         % i, _wkb(w))
        for i, w in enumerate(WKTS)
    ]
    if with_null_geom:
        rows.append((99, "no-geom", -1.0, False, b"", None))
    return local_df(
        spark, rows, ["oid", "name", "score", "flag", "payload", "geom"]
    )


def _collect_sorted(df):
    rows = df.collect()
    return sorted(
        (
            r["oid"], r["name"], r["score"], r["flag"],
            bytes(r["payload"]),
            None if r["geom"] is None else bytes(r["geom"]),
        )
        for r in rows
    )


def test_roundtrip_bit_stable(spark, tmp_path):
    path = str(tmp_path / "layer.gpkg")
    n = write_gpkg(_sample_df(spark), path, "cities", geom_col="geom",
                   geometry_type="GEOMETRY")
    assert n == len(WKTS)
    back = read_gpkg(spark, path)
    assert _collect_sorted(back) == sorted(
        (i, "name-%d" % i, float(i) * 1.5, i % 2 == 0,
         b"\x00\xffP%d" % i, _wkb(w))
        for i, w in enumerate(WKTS)
    )
    # fid is assigned 1..n in insert order
    assert sorted(r["fid"] for r in back.collect()) == [1, 2, 3, 4]


def test_gpkg_blob_mode_and_codec_decode(spark, tmp_path):
    path = str(tmp_path / "blob.gpkg")
    write_gpkg(_sample_df(spark), path, "layer1")
    raw = read_gpkg(spark, path, geom_as="gpkg").collect()
    for r in sorted(raw, key=lambda r: r["oid"]):
        geom = gpkgeo.loads(bytes(r["geom"]))
        assert geom["meta"]["srid"] == 4326
        # stripping the header recovers the exact WKB we wrote
        assert gpkg_blob_to_wkb(bytes(r["geom"])) == _wkb(
            WKTS[r["oid"]]
        )


def test_metadata_conformance(spark, tmp_path):
    path = str(tmp_path / "meta.gpkg")
    write_gpkg(
        _sample_df(spark), path, "roads",
        geometry_type="MULTIPOINT",
        bbox=(-3.0, -12.25, 30.5, 10.0),
    )
    conn = sqlite3.connect(path)
    try:
        assert conn.execute("PRAGMA application_id").fetchone()[0] \
            == GPKG_APPLICATION_ID
        assert conn.execute("PRAGMA user_version").fetchone()[0] \
            == GPKG_USER_VERSION
        srs = conn.execute(
            "SELECT srs_id FROM gpkg_spatial_ref_sys ORDER BY srs_id"
        ).fetchall()
        assert [s[0] for s in srs] == [-1, 0, 4326]
        c = conn.execute(
            "SELECT table_name, data_type, min_x, min_y, max_x, "
            "max_y, srs_id FROM gpkg_contents"
        ).fetchall()
        assert c == [("roads", "features", -3.0, -12.25, 30.5, 10.0,
                      4326)]
        g = conn.execute(
            "SELECT table_name, column_name, geometry_type_name, "
            "srs_id, z, m FROM gpkg_geometry_columns"
        ).fetchall()
        assert g == [("roads", "geom", "MULTIPOINT", 4326, 0, 0)]
    finally:
        conn.close()
    assert list_gpkg_layers(path) == [
        {"table": "roads", "geom_col": "geom",
         "geometry_type": "MULTIPOINT", "srs_id": 4326}
    ]


def test_distributed_read_matches_single_partition(spark, tmp_path):
    path = str(tmp_path / "big.gpkg")
    rows = [(i, "r%d" % i, _wkb("POINT (%d %d)" % (i % 360 - 180,
                                                   i % 170 - 85)))
            for i in range(500)]
    df = local_df(spark, rows, ["oid", "name", "geom"])
    assert write_gpkg(df, path, "pts") == 500
    one = read_gpkg(spark, path, num_partitions=1)
    four = read_gpkg(spark, path, num_partitions=4)
    assert four.rdd.getNumPartitions() == 4
    key = lambda r: r["fid"]
    a = [(r["fid"], r["oid"], r["name"], bytes(r["geom"]))
         for r in sorted(one.collect(), key=key)]
    b = [(r["fid"], r["oid"], r["name"], bytes(r["geom"]))
         for r in sorted(four.collect(), key=key)]
    assert a == b and len(a) == 500


def test_null_geometry_roundtrip(spark, tmp_path):
    path = str(tmp_path / "nulls.gpkg")
    write_gpkg(_sample_df(spark, with_null_geom=True), path, "layer1")
    back = {r["oid"]: r["geom"] for r in
            read_gpkg(spark, path).collect()}
    assert back[99] is None
    assert bytes(back[0]) == _wkb(WKTS[0])


def test_layer_selection_and_errors(spark, tmp_path):
    path = str(tmp_path / "sel.gpkg")
    write_gpkg(_sample_df(spark), path, "only")
    assert read_gpkg(spark, path, table="only").count() == len(WKTS)
    with pytest.raises(ValueError, match="no feature layer"):
        read_gpkg(spark, path, table="nope")
    with pytest.raises(ValueError, match="geom_as"):
        read_gpkg(spark, path, geom_as="wkt")
    df = _sample_df(spark)
    with pytest.raises(ValueError, match="missing geometry column"):
        write_gpkg(df, path, "x", geom_col="nope")
    with pytest.raises(ValueError, match="invalid layer name"):
        write_gpkg(df, path, "gpkg_contents")
    from pyspark.sql import functions as F

    arr = df.withColumn("bad", F.array(F.lit(1)))
    with pytest.raises(ValueError, match="no GeoPackage attribute"):
        write_gpkg(arr, str(tmp_path / "arr.gpkg"), "layer1")
    nonbin = df.withColumn("geom", F.lit("POINT (0 0)"))
    with pytest.raises(ValueError, match="must be binary"):
        write_gpkg(nonbin, str(tmp_path / "nb.gpkg"), "layer1")


def test_blob_strip_handles_envelopes():
    geom = wktmod.loads(WKTS[2])
    geom["bbox"] = [0.0, 0.0, 10.0, 10.0]
    geom["meta"] = {"srid": 4326}
    blob = gpkgeo.dumps(geom, big_endian=False)
    body = {k: v for k, v in geom.items()
            if k not in ("bbox", "meta", "crs")}
    assert gpkg_blob_to_wkb(blob) == wkbmod.dumps(
        body, big_endian=False
    )
    assert gpkg_blob_to_wkb(
        gpkg_header_bytes(0) + b"WKB"
    ) == b"WKB"
    with pytest.raises(ValueError, match="not a GeoPackage"):
        gpkg_blob_to_wkb(b"XX\x00\x00\x00\x00\x00\x00")


def test_empty_table_read(spark, tmp_path):
    path = str(tmp_path / "empty.gpkg")
    write_gpkg(_sample_df(spark).limit(0), path, "layer1")
    out = read_gpkg(spark, path)
    assert out.count() == 0
    assert out.columns == ["fid", "oid", "name", "score", "flag",
                           "payload", "geom"]
