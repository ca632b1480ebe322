"""One-off golden fixtures for the end-to-end reference-CSV pipeline:
runs the REFERENCE process_* entry points over the reference repo's own
CSV fixtures and records the exact output bytes.

    python tests/fixtures/generate_golden_e2e.py
"""

import csv
import io
import json
import sys

sys.path.insert(0, "/root/reference")

import ppge  # noqa: E402

F = ppge.Field
FT = ppge.FieldType

out = {}


def rows_of(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


CASES = {
    "wy_co_wkt": ("/root/reference/wy-co-wkt-bigquery.csv", "bigquery",
                  [F("geom", FT.GEOM, True), F("name", FT.STR, True)]),
    "denver_cheyenne_wkt": (
        "/root/reference/denver-cheyenne-wkt-bigquery.csv", "bigquery",
        [F("geom", FT.GEOM, True), F("name", FT.STR, True)]),
    "wy_co_geojson": ("/root/reference/wy-co-geojson-snowflake.csv",
                      "snowflake",
                      [F("GEOM", FT.GEOG, True), F("name", FT.STR, True)]),
    "denver_cheyenne_geojson": (
        "/root/reference/denver-cheyenne-geojson-snowflake.csv",
        "snowflake",
        [F("GEOM", FT.GEOG, True), F("name", FT.STR, True)]),
    "wy_co_malformed": ("/root/reference/wy-co-wkt-malformed.csv",
                        "bigquery",
                        [F("geom", FT.GEOM, True), F("name", FT.STR, True)]),
}

for name, (path, mode, schema) in CASES.items():
    rows = rows_of(path)
    gj = io.BytesIO()
    cs = io.BytesIO()
    shp, shx, dbf, prj = (io.BytesIO() for _ in range(4))
    if mode == "bigquery":
        ppge.process_bigquery_rows_to_geojson(schema, iter(rows), gj)
        ppge.process_bigquery_rows_to_csv(schema, iter(rows), cs)
        ppge.process_bigquery_rows_to_shapefile(
            schema, iter(rows), shp, shx, dbf, prj)
    else:
        ppge.process_snowflake_rows_to_geojson(schema, iter(rows), gj)
        ppge.process_snowflake_rows_to_csv(schema, iter(rows), cs)
        ppge.process_snowflake_rows_to_shapefile(
            schema, iter(rows), shp, shx, dbf, prj)
    db = bytearray(dbf.getvalue())
    db[1:4] = b"\0\0\0"
    out[name] = {
        "csv_path": path,
        "mode": mode,
        "geojson": gj.getvalue().decode("utf-8"),
        "csv": cs.getvalue().decode("utf-8"),
        "shp": shp.getvalue().hex(),
        "shx": shx.getvalue().hex(),
        "dbf": bytes(db).hex(),
    }

with open("/root/repo/tests/fixtures/golden_e2e.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print({k: len(v["geojson"]) for k, v in out.items()})
