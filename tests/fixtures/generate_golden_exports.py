"""One-off differential-fixture generator for export sinks.

Runs the REFERENCE exporters over deterministic rows (incl. null and
malformed geometries, both WKT and GeoJSON input modes, geometry-column
name conflicts) and records the exact output bytes.

    python tests/fixtures/generate_golden_exports.py
"""

import io
import json
import sys

sys.path.insert(0, "/root/reference")

import ppge  # noqa: E402

WYOMING = (
    "POLYGON ((-111.020843268199 44.9981946924588,-111.020843268199 "
    "41.0013336343981,-104.052453769699 41.0013336343981,-104.052453769699 "
    "44.9981946924588,-111.020843268199 44.9981946924588))"
)
MALFORMED = "POLYGON ((-100 40, -100 41, -101 41, INVALID_COORDINATE))"

ROWS_WKT = [
    {"geom": "POINT (-104.8 41.1)", "name": "Cheyenne", "pop": 65132,
     "area": 32.9, "active": True},
    {"geom": WYOMING, "name": "Wyoming", "pop": 576851, "area": 97914.0,
     "active": False},
    {"geom": None, "name": "NoGeom", "pop": 0, "area": 0.0, "active": True},
    {"geom": MALFORMED, "name": "BadGeom", "pop": 1, "area": 1.5,
     "active": False},
    {"geom": "POINT (-105.0 39.7)", "name": "Denver", "pop": 715522,
     "area": 153.3, "active": True},
]

ROWS_GJ = [
    {"GEOM": json.dumps({"coordinates": [-104.8, 41.1], "type": "Point"}),
     "name": "Cheyenne"},
    {"GEOM": None, "name": "NoGeom"},
    {"GEOM": None, "name": None},
    {"GEOM": "{not valid json", "name": "BadGeom"},
    {"GEOM": json.dumps({"coordinates": [-105.0, 39.7], "type": "Point"}),
     "name": "Denver"},
]

# name-conflict rows: a column already called "geometry"
ROWS_CONFLICT = [
    {"geom": "POINT (1 2)", "geometry": "decoy", "WKT": "decoy2",
     "name": "X"},
]

F = ppge.Field
FT = ppge.FieldType

SCHEMA_WKT = [
    F("geom", FT.GEOM, True),
    F("name", FT.STR, True),
    F("pop", FT.INT, True),
    F("area", FT.FLOAT, True),
    F("active", FT.BOOL, True),
]
SCHEMA_GJ = [F("GEOM", FT.GEOG, True), F("name", FT.STR, True)]
SCHEMA_CONFLICT = [
    F("geom", FT.GEOM, True),
    F("geometry", FT.STR, True),
    F("WKT", FT.STR, True),
    F("name", FT.STR, True),
]

out = {}


def run(rows, schema, geom_key, geom_format):
    gj = io.BytesIO()
    ppge.export_to_geojson_from_rows(schema, iter(rows), gj, geom_key,
                                     geom_format)
    cs = io.BytesIO()
    ppge.export_to_csv_from_rows(schema, iter(rows), cs, geom_key,
                                 geom_format)
    return {"geojson": gj.getvalue().decode("utf-8"),
            "csv": cs.getvalue().decode("utf-8")}


out["wkt_mode"] = run(ROWS_WKT, SCHEMA_WKT, "geom",
                      ppge.GeometryFormat.WKT)
out["geojson_mode"] = run(ROWS_GJ, SCHEMA_GJ, "GEOM",
                          ppge.GeometryFormat.GEOJSON)
out["conflict_mode"] = run(ROWS_CONFLICT, SCHEMA_CONFLICT, "geom",
                           ppge.GeometryFormat.WKT)

with open("/root/repo/tests/fixtures/golden_exports.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print({k: {kk: len(vv) for kk, vv in v.items()} for k, v in out.items()})
