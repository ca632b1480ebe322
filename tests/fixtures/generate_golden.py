"""One-off differential-fixture generator.

Runs the REFERENCE codecs (read-only, /root/reference) over a case matrix
and records their exact outputs as JSON. The engine's tests then assert
byte-for-byte equality against these recorded outputs WITHOUT importing the
reference at test time. Regenerate with:

    PYTHONPATH=/root/reference python tests/fixtures/generate_golden.py

The case matrix mirrors the coverage of the reference's own test suites
(ppge-tests/test-geomet/wkt_test.py, wkb_test.py): every geometry type x
{2D, Z, ZM} x {big, little endian} x {no SRID, SRID} plus EMPTY, custom
decimals, and negative/scientific-notation ordinates.
"""

import json
import sys

sys.path.insert(0, "/root/reference")

from ppge.geomet import wkt as ref_wkt  # noqa: E402
from ppge.geomet import wkb as ref_wkb  # noqa: E402

CASES = {}


def add(name, geom):
    CASES[name] = geom


add("point_2d", dict(type="Point", coordinates=[0.0, 1.0]))
add("point_2d_neg", dict(type="Point", coordinates=[-0.0, -1.0]))
add("point_3d", dict(type="Point", coordinates=[0.0, -1.0, 2.0]))
add("point_4d", dict(type="Point", coordinates=[-0.0, -1.0, -2.0, -4.0]))
add("point_int", dict(type="Point", coordinates=[-10, -77]))
add("point_precise", dict(type="Point", coordinates=[
    -104.7638739135329, 41.140946303408]))
add("point_sci", dict(type="Point", coordinates=[1e-9, 1.234567890123456e7]))
add("linestring_2d", dict(type="LineString",
                          coordinates=[[-100.0, 0.0], [-101.0, -1.0]]))
add("linestring_3d", dict(type="LineString",
                          coordinates=[[100.0, 0.0, -60.0],
                                       [101.0, 1.0, -65.25]]))
add("linestring_4d", dict(type="LineString",
                          coordinates=[[100.0, 0.0, -60.0, 0.1],
                                       [101.0, 1.0, -65.25, 0.2]]))
add("polygon_2d", dict(type="Polygon", coordinates=[
    [[100.001, 0.001], [101.1235, 0.001], [101.001, 1.001], [100.001, 0.001]],
    [[100.201, 0.201], [100.801, 0.201], [100.801, 0.801], [100.201, 0.201]],
]))
add("polygon_3d", dict(type="Polygon", coordinates=[
    [[100.0, 0.0, 3.1], [101.0, 0.0, 2.1], [101.0, 1.0, 1.1],
     [100.0, 0.0, 3.1]],
    [[100.2, 0.2, 3.1], [100.8, 0.2, 2.1], [100.8, 0.8, 1.1],
     [100.2, 0.2, 3.1]],
]))
add("polygon_4d_int", dict(type="Polygon", coordinates=[
    [[1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12], [1, 2, 3, 4]],
]))
add("multipoint_2d", dict(type="MultiPoint",
                          coordinates=[[100.0, 3.101], [101.0, 2.1],
                                       [3.14, 2.18]]))
add("multipoint_3d", dict(type="MultiPoint",
                          coordinates=[[100.0, 3.1, 1.0], [101.0, 2.1, 2.0],
                                       [3.14, 2.18, 3.0]]))
add("multilinestring_2d", dict(type="MultiLineString", coordinates=[
    [[0.0, -1.0], [-2.0, -3.0], [-4.0, -5.0]],
    [[1.66, -31023.5], [10000.9999, 3.0], [100.9, 1.1], [0.0, 0.0]],
]))
add("multilinestring_3d", dict(type="MultiLineString", coordinates=[
    [[0.0, -1.0, 1.0], [-2.0, -3.0, 1.0], [-4.0, -5.0, 1.0]],
    [[1.66, -31023.5, 1.1], [10000.9999, 3.0, 2.2], [100.9, 1.1, 3.3],
     [0.0, 0.0, 4.4]],
]))
add("multipolygon_2d", dict(type="MultiPolygon", coordinates=[
    [[[102.0, 2.0], [103.0, 2.0], [103.0, 3.0], [102.0, 3.0], [102.0, 2.0]]],
    [[[100.0, 0.0], [101.0, 0.0], [101.0, 1.0], [100.0, 1.0], [100.0, 0.0]],
     [[100.2, 0.2], [100.8, 0.2], [100.8, 0.8], [100.2, 0.8],
      [100.2, 0.2]]],
]))
add("geometrycollection_2d", dict(type="GeometryCollection", geometries=[
    dict(type="Point", coordinates=[0.0, 1.0]),
    dict(type="LineString", coordinates=[[-100.0, 0.0], [-101.0, -1.0]]),
]))
add("geometrycollection_3d", dict(type="GeometryCollection", geometries=[
    dict(type="Point", coordinates=[0.0, 1.0, 2.0]),
    dict(type="LineString", coordinates=[[-100.0, 0.0, 1.0],
                                         [-101.0, -1.0, 2.0]]),
]))
# reference fixture polygons (Wyoming / Colorado, verbatim from
# /root/reference/wy-co-wkt-bigquery.csv)
WYOMING = (
    "POLYGON ((-111.020843268199 44.9981946924588,-111.020843268199 "
    "41.0013336343981,-104.052453769699 41.0013336343981,-104.052453769699 "
    "44.9981946924588,-111.020843268199 44.9981946924588))"
)
COLORADO = (
    "POLYGON ((-109.042545474199 41.0034439410838,-109.042545474199 "
    "36.9963964708165,-102.041551293899 36.9963964708165,-102.041551293899 "
    "41.0034439410838,-109.042545474199 41.0034439410838))"
)
add("wyoming", ref_wkt.loads(WYOMING))
add("colorado", ref_wkt.loads(COLORADO))

out = {"dumps": {}, "loads": {}, "wkb": {}, "wkt_variants": {}}

for name, geom in CASES.items():
    entry = {}
    entry["geojson"] = geom
    entry["wkt_16"] = ref_wkt.dumps(geom)
    entry["wkt_3"] = ref_wkt.dumps(geom, decimals=3)
    entry["wkt_0"] = ref_wkt.dumps(geom, decimals=0)
    entry["wkt_roundtrip"] = ref_wkt.loads(entry["wkt_16"])
    try:
        entry["wkb_be_hex"] = ref_wkb.dumps(geom, big_endian=True).hex()
        entry["wkb_le_hex"] = ref_wkb.dumps(geom, big_endian=False).hex()
        entry["wkb_roundtrip"] = ref_wkb.loads(
            ref_wkb.dumps(geom, big_endian=True))
    except ValueError as e:
        entry["wkb_error"] = str(e)
    # SRID variants
    g_srid = dict(geom, meta=dict(srid=4326))
    entry["ewkt"] = ref_wkt.dumps(g_srid)
    entry["ewkb_be_hex"] = ref_wkb.dumps(g_srid, big_endian=True).hex()
    entry["ewkb_le_hex"] = ref_wkb.dumps(g_srid, big_endian=False).hex()
    entry["ewkb_roundtrip"] = ref_wkb.loads(
        ref_wkb.dumps(g_srid, big_endian=True))
    out["dumps"][name] = entry

# EMPTY cases (WKT only; WKB raises)
for t in ["Point", "LineString", "Polygon", "MultiPoint", "MultiLineString",
          "MultiPolygon"]:
    g = dict(type=t, coordinates=[])
    out["wkt_variants"]["empty_%s" % t.lower()] = {
        "wkt": ref_wkt.dumps(g),
        "loads_back": ref_wkt.loads(ref_wkt.dumps(g)),
    }
out["wkt_variants"]["empty_gc"] = {
    "wkt": ref_wkt.dumps(dict(type="GeometryCollection", geometries=[])),
    "loads_back": ref_wkt.loads("GEOMETRYCOLLECTION EMPTY"),
}

# MULTIPOINT dual grammar forms
out["wkt_variants"]["multipoint_bare"] = {
    "input": "MULTIPOINT (100.000 3.101, 101.000 2.100, 3.140 2.180)",
    "loads": ref_wkt.loads(
        "MULTIPOINT (100.000 3.101, 101.000 2.100, 3.140 2.180)"),
}
out["wkt_variants"]["multipoint_paren"] = {
    "input": "MULTIPOINT ((100.000 3.101), (101.000 2.100), (3.140 2.180))",
    "loads": ref_wkt.loads(
        "MULTIPOINT ((100.000 3.101), (101.000 2.100), (3.140 2.180))"),
}
# EWKT load
out["wkt_variants"]["ewkt_load"] = {
    "input": "SRID=664;POINT (-0.0000000000000000 1.0000000000000000)",
    "loads": ref_wkt.loads(
        "SRID=664;POINT (-0.0000000000000000 1.0000000000000000)"),
}

# M-geometry load-only cases (XYM promoted to XYZM with Z=0.0):
# build M-typed WKB by hand: M Point code = 0x7D1
m_point = bytes([0]) + (0x7D1).to_bytes(4, "big") + \
    __import__("struct").pack(">ddd", 1.0, 2.0, 3.0)
out["wkb"]["m_point_load"] = {
    "hex": m_point.hex(),
    "loads": ref_wkb.loads(m_point),
}
m_ls = bytes([0]) + (0x7D2).to_bytes(4, "big") + \
    (2).to_bytes(4, "big") + \
    __import__("struct").pack(">dddddd", 1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
out["wkb"]["m_linestring_load"] = {
    "hex": m_ls.hex(),
    "loads": ref_wkb.loads(m_ls),
}

with open("/root/repo/tests/fixtures/golden_geometry.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("cases:", len(out["dumps"]), "variants:", len(out["wkt_variants"]))
