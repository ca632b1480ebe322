"""GeoJSON read direction (sources/geojson_source.py): FeatureCollection
documents, NDJSON features at scale, malformed-line guard, and a
write->read round trip through the byte-parity sink."""

import json
import os

import pytest

from pure_python_geospatial_export_spark.geo import wkt as wkt_mod
from pure_python_geospatial_export_spark.sources.geojson_source import (
    read_geojson,
    read_geojson_lines,
)

FEATS = [
    {
        "type": "Feature",
        "id": 7,
        "geometry": {"type": "Point", "coordinates": [1.5, -2.25]},
        "properties": {"name": "a", "n": 1},
    },
    {
        "type": "Feature",
        "geometry": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]],
        },
        "properties": {"name": "b"},
    },
    {
        "type": "Feature",
        "geometry": None,
        "properties": {"name": "null-geom"},
    },
]


def test_read_geojson_feature_collection(spark, tmp_path):
    path = os.path.join(tmp_path, "fc.geojson")
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": FEATS}, f)
    rows = sorted(
        read_geojson(spark, path).collect(),
        key=lambda r: r["properties"],
    )
    byname = {json.loads(r["properties"])["name"]: r for r in rows}
    assert byname["a"]["fid"] == "7"
    assert wkt_mod.loads(byname["a"]["wkt"]) == FEATS[0]["geometry"]
    assert byname["b"]["fid"] is None
    got_poly = wkt_mod.loads(byname["b"]["wkt"])
    assert got_poly["type"] == "Polygon"
    assert byname["null-geom"]["wkt"] is None


def test_read_geojson_rejects_non_feature(spark, tmp_path):
    path = os.path.join(tmp_path, "bad.geojson")
    with open(path, "w") as f:
        json.dump({"type": "GeometryCollection"}, f)
    with pytest.raises(ValueError):
        read_geojson(spark, path)


def test_read_geojson_lines_permissive_and_failfast(spark, tmp_path):
    path = os.path.join(tmp_path, "feats.ndjson")
    with open(path, "w") as f:
        for ft in FEATS:
            f.write(json.dumps(ft) + "\n")
        f.write("{this is not json\n")
        f.write("\n")  # blank lines are skipped, not malformed
    df = read_geojson_lines(spark, path)
    rows = df.collect()
    assert len(rows) == 4  # 3 features + 1 malformed
    bad = [r for r in rows
           if r["wkt"] is None and r["properties"] is None]
    assert len(bad) == 1 and bad[0]["fid"] is None
    names = {
        json.loads(r["properties"])["name"]
        for r in rows if r["properties"] is not None
    }
    assert names == {"a", "b", "null-geom"}

    with pytest.raises(Exception):
        read_geojson_lines(spark, path, mode="failfast").collect()


def test_geojson_sink_source_round_trip(spark, tmp_path):
    """export_to_geojson output must read back with identical WKT and
    properties."""
    import io

    from pure_python_geospatial_export_spark.session import local_df
    from pure_python_geospatial_export_spark.sources.export import (
        Field,
        FieldType,
        GeometryFormat,
        export_to_geojson,
    )

    wkts = [
        "POINT (10 20)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))",
    ]
    df = local_df(
        spark,
        [(i, "row%d" % i, w) for i, w in enumerate(wkts)],
        ["oid", "label", "geom"],
    )
    buf = io.BytesIO()
    export_to_geojson(
        df,
        [
            Field("geom", FieldType.GEOM),
            Field("oid", FieldType.INT),
            Field("label", FieldType.STR),
        ],
        buf,
        "geom",
        GeometryFormat.WKT,
    )
    path = os.path.join(tmp_path, "rt.geojson")
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    back = read_geojson(spark, path).collect()
    assert len(back) == 3
    got = {
        json.loads(r["properties"])["label"]:
            wkt_mod.loads(r["wkt"])
        for r in back
    }
    for i, w in enumerate(wkts):
        assert got["row%d" % i] == wkt_mod.loads(w)
