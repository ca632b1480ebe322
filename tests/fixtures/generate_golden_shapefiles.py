"""One-off differential-fixture generator for the shapefile codec.

(a) Reads the REFERENCE's own fixture shapefiles with the reference
    reader and records shapes (__geo_interface__), records, and header
    info — my reader must reproduce these semantics exactly.
(b) Runs the REFERENCE shapefile export on deterministic rows and records
    the output .shp/.shx/.dbf bytes — my writer must match byte-for-byte
    (dbf date header bytes 1..3 masked to 0).

    python tests/fixtures/generate_golden_shapefiles.py
"""

import io
import json
import os
import sys

sys.path.insert(0, "/root/reference")

import ppge  # noqa: E402
from ppge import pyshp  # noqa: E402

SHPDIR = "/root/reference/ppge-tests/shapefiles"

READ_CASES = [
    "test/point", "test/multipoint", "test/line", "test/polygon",
    "test/linem", "test/linez", "blockgroups",
]

out = {"read": {}, "write": {}}

for case in READ_CASES:
    path = os.path.join(SHPDIR, case)
    r = pyshp.Reader(path)
    shapes = []
    for sr in r.iterShapeRecords():
        shapes.append({
            "shape_type": sr.shape.shapeType,
            "geojson": (sr.shape.__geo_interface__
                        if sr.shape.shapeType != 0 else None),
            "record": [
                v.isoformat() if hasattr(v, "isoformat") else v
                for v in list(sr.record)
            ],
        })
    out["read"][case] = {
        "shape_type": r.shapeType,
        "bbox": list(r.bbox),
        "n": len(r),
        "fields": [list(f) for f in r.fields if f[0] != "DeletionFlag"],
        # cap big files to first 30 shapes for fixture size
        "shapes": shapes[:30],
    }
    r.close()

# --- writer golden -----------------------------------------------------
WYOMING = (
    "POLYGON ((-111.020843268199 44.9981946924588,-111.020843268199 "
    "41.0013336343981,-104.052453769699 41.0013336343981,-104.052453769699 "
    "44.9981946924588,-111.020843268199 44.9981946924588))"
)
MALFORMED = "POLYGON ((-100 40, -100 41, -101 41, INVALID_COORDINATE))"

F = ppge.Field
FT = ppge.FieldType


def run_export(rows, schema, geom_key, geom_format):
    shp, shx, dbf, prj = (io.BytesIO() for _ in range(4))
    ppge.export_to_shapefile_from_rows(
        schema, iter(rows), shp, shx, dbf, prj, geom_key, geom_format
    )
    db = bytearray(dbf.getvalue())
    db[1:4] = b"\0\0\0"  # mask dbf header date
    return {
        "shp": shp.getvalue().hex(),
        "shx": shx.getvalue().hex(),
        "dbf": bytes(db).hex(),
        "prj": prj.getvalue().decode("ascii"),
    }


out["write"]["polygons_wkt"] = run_export(
    [
        {"geom": WYOMING, "name": "Wyoming", "pop": 576851,
         "area": 97914.0, "active": False},
        {"geom": None, "name": "NoGeom", "pop": 0, "area": 0.0,
         "active": True},
        {"geom": MALFORMED, "name": "BadGeom", "pop": 1, "area": 1.5,
         "active": None},
        {"geom": "POINT (-104.8 41.1)", "name": "MismatchSkipped",
         "pop": 2, "area": 2.0, "active": True},
        {"geom": (
            "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), "
            "(2 2, 4 2, 4 4, 2 4, 2 2))"
        ), "name": "Holed", "pop": 3, "area": 3.0, "active": False},
    ],
    [F("geom", FT.GEOM, True), F("name", FT.STR, True),
     F("pop", FT.INT, True), F("area", FT.FLOAT, True),
     F("active", FT.BOOL, True)],
    "geom", ppge.GeometryFormat.WKT,
)

out["write"]["points_wkt"] = run_export(
    [
        {"geom": "POINT (-104.8 41.1)", "name": "Cheyenne"},
        {"geom": "POINT (-105.0 39.7)", "name": "Denver"},
        {"geom": None, "name": "Nowhere"},
        {"geom": "MULTIPOINT ((1 2), (3 4))", "name": "Pair"},
    ],
    [F("geom", FT.GEOM, True), F("name", FT.STR, True)],
    "geom", ppge.GeometryFormat.WKT,
)

out["write"]["lines_geojson"] = run_export(
    [
        {"GEOM": json.dumps({
            "type": "LineString",
            "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]],
        }), "name": "L1"},
        {"GEOM": json.dumps({
            "type": "MultiLineString",
            "coordinates": [[[0.0, 0.0], [1.0, 1.0]],
                            [[5.0, 5.0], [6.0, 7.0]]],
        }), "name": "L2"},
    ],
    [F("GEOM", FT.GEOG, True), F("name", FT.STR, True)],
    "GEOM", ppge.GeometryFormat.GEOJSON,
)

with open("/root/repo/tests/fixtures/golden_shapefiles.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("read cases:", list(out["read"]),
      "write cases:", list(out["write"]))
