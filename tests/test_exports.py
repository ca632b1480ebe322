"""Export-sink golden tests: the Spark exporters must reproduce the
reference's GeoJSON/CSV output bytes exactly (fixtures recorded from the
reference, see generate_golden_exports.py). Covers null + malformed
geometry (P8), both WKT/GeoJSON input modes, geometry-column name
conflicts (ref ppge/__init__.py:45-64), and cast-error contracts.
"""

import io
import json
import os

import pytest

from pure_python_geospatial_export_spark.sources.export import (
    Field,
    FieldType,
    GeometryFormat,
    export_sharded,
    export_to_csv,
    export_to_geojson,
    geometry_column_name,
)

HERE = os.path.dirname(__file__)
with open(os.path.join(HERE, "fixtures", "golden_exports.json")) as f:
    GOLDEN = json.load(f)

WYOMING = (
    "POLYGON ((-111.020843268199 44.9981946924588,-111.020843268199 "
    "41.0013336343981,-104.052453769699 41.0013336343981,-104.052453769699 "
    "44.9981946924588,-111.020843268199 44.9981946924588))"
)
MALFORMED = "POLYGON ((-100 40, -100 41, -101 41, INVALID_COORDINATE))"

ROWS_WKT = [
    ("POINT (-104.8 41.1)", "Cheyenne", 65132, 32.9, True),
    (WYOMING, "Wyoming", 576851, 97914.0, False),
    (None, "NoGeom", 0, 0.0, True),
    (MALFORMED, "BadGeom", 1, 1.5, False),
    ("POINT (-105.0 39.7)", "Denver", 715522, 153.3, True),
]
SCHEMA_WKT = [
    Field("geom", FieldType.GEOM),
    Field("name", FieldType.STR),
    Field("pop", FieldType.INT),
    Field("area", FieldType.FLOAT),
    Field("active", FieldType.BOOL),
]

ROWS_GJ = [
    (json.dumps({"coordinates": [-104.8, 41.1], "type": "Point"}),
     "Cheyenne"),
    (None, "NoGeom"),
    (None, None),
    ("{not valid json", "BadGeom"),
    (json.dumps({"coordinates": [-105.0, 39.7], "type": "Point"}),
     "Denver"),
]
SCHEMA_GJ = [Field("GEOM", FieldType.GEOG), Field("name", FieldType.STR)]


def _df(spark, rows, names, order=True):
    df = spark.createDataFrame(
        [r + (i,) for i, r in enumerate(rows)], names + ["_ord"]
    )
    return df


def test_geojson_wkt_mode(spark):
    df = _df(spark, ROWS_WKT, ["geom", "name", "pop", "area", "active"])
    buf = io.BytesIO()
    export_to_geojson(df, SCHEMA_WKT, buf, "geom", GeometryFormat.WKT,
                      order_col="_ord")
    assert buf.getvalue().decode("utf-8") == GOLDEN["wkt_mode"]["geojson"]


def test_csv_wkt_mode(spark):
    df = _df(spark, ROWS_WKT, ["geom", "name", "pop", "area", "active"])
    buf = io.BytesIO()
    export_to_csv(df, SCHEMA_WKT, buf, "geom", GeometryFormat.WKT,
                  order_col="_ord")
    assert buf.getvalue().decode("utf-8") == GOLDEN["wkt_mode"]["csv"]


def test_geojson_geojson_mode(spark):
    df = _df(spark, ROWS_GJ, ["GEOM", "name"])
    buf = io.BytesIO()
    export_to_geojson(df, SCHEMA_GJ, buf, "GEOM", GeometryFormat.GEOJSON,
                      order_col="_ord")
    assert buf.getvalue().decode("utf-8") == GOLDEN["geojson_mode"]["geojson"]


def test_csv_geojson_mode(spark):
    df = _df(spark, ROWS_GJ, ["GEOM", "name"])
    buf = io.BytesIO()
    export_to_csv(df, SCHEMA_GJ, buf, "GEOM", GeometryFormat.GEOJSON,
                  order_col="_ord")
    assert buf.getvalue().decode("utf-8") == GOLDEN["geojson_mode"]["csv"]


def test_geometry_column_conflict(spark):
    rows = [("POINT (1 2)", "decoy", "decoy2", "X")]
    schema = [
        Field("geom", FieldType.GEOM),
        Field("geometry", FieldType.STR),
        Field("WKT", FieldType.STR),
        Field("name", FieldType.STR),
    ]
    df = _df(spark, rows, ["geom", "geometry", "WKT", "name"])
    buf = io.BytesIO()
    export_to_csv(df, schema, buf, "geom", GeometryFormat.WKT,
                  order_col="_ord")
    assert buf.getvalue().decode("utf-8") == GOLDEN["conflict_mode"]["csv"]
    gj = io.BytesIO()
    export_to_geojson(df, schema, gj, "geom", GeometryFormat.WKT,
                      order_col="_ord")
    assert gj.getvalue().decode("utf-8") == GOLDEN["conflict_mode"]["geojson"]


def test_geometry_column_name_resolution():
    assert geometry_column_name(set()) == "geometry"
    assert geometry_column_name({"geometry"}) == "WKT"
    assert geometry_column_name({"geometry", "WKT"}) == "geometry_1"
    assert geometry_column_name(
        {"geometry", "WKT", "geometry_1"}) == "geometry_2"


def test_cast_error_contract(spark):
    rows = [("POINT (1 2)", "abc")]
    schema = [Field("geom", FieldType.GEOM), Field("n", FieldType.INT)]
    df = spark.createDataFrame(rows, ["geom", "n"])
    buf = io.BytesIO()
    with pytest.raises(Exception) as e:
        export_to_geojson(df, schema, buf, "geom", GeometryFormat.WKT)
    assert "Field 'n' conversion error" in str(e.value)


def test_sharded_export(spark, tmp_path):
    df = _df(spark, ROWS_WKT, ["geom", "name", "pop", "area", "active"])
    out = str(tmp_path / "shards")
    export_sharded(df, SCHEMA_WKT, out, "geom", GeometryFormat.WKT,
                   kind="geojson")
    files = [p for p in os.listdir(out) if p.startswith("part-")]
    assert files
    lines = []
    for p in files:
        with open(os.path.join(out, p)) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == len(ROWS_WKT)
    names = {json.loads(ln)["properties"]["name"] for ln in lines}
    assert names == {"Cheyenne", "Wyoming", "NoGeom", "BadGeom", "Denver"}
