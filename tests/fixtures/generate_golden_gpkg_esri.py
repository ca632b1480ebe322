"""One-off differential fixtures for GeoPackage and EsriJSON codecs.

    python tests/fixtures/generate_golden_gpkg_esri.py
"""

import json
import sys

sys.path.insert(0, "/root/reference")

from ppge.geomet import esri as ref_esri  # noqa: E402
from ppge.geomet import geopackage as ref_gpkg  # noqa: E402

CASES = {
    "point_2d": dict(type="Point", coordinates=[1.0, 2.0]),
    "point_3d": dict(type="Point", coordinates=[1.0, 2.0, 3.0]),
    "linestring": dict(type="LineString",
                       coordinates=[[0.0, 0.0], [1.5, 2.5], [3.0, 1.0]]),
    "polygon_hole": dict(type="Polygon", coordinates=[
        [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]],
        [[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0], [2.0, 2.0]],
    ]),
    "multipolygon": dict(type="MultiPolygon", coordinates=[
        [[[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.0, 0.0]]],
        [[[5.0, 5.0], [5.0, 7.0], [7.0, 7.0], [5.0, 5.0]],
         [[5.5, 5.5], [5.7, 5.7], [5.5, 5.9], [5.5, 5.5]]],
    ]),
    "multipoint": dict(type="MultiPoint",
                       coordinates=[[1.0, 2.0], [3.0, 4.0]]),
    "multilinestring": dict(type="MultiLineString", coordinates=[
        [[0.0, 0.0], [1.0, 1.0]], [[5.0, 5.0], [6.0, 7.0]],
    ]),
}

out = {"gpkg": {}, "esri": {}}

for name, geom in CASES.items():
    e = {}
    e["be"] = ref_gpkg.dumps(geom, big_endian=True).hex()
    e["le"] = ref_gpkg.dumps(geom, big_endian=False).hex()
    e["roundtrip"] = ref_gpkg.loads(ref_gpkg.dumps(geom))
    g_srid = dict(geom, meta=dict(srid=4326))
    e["srid"] = ref_gpkg.dumps(g_srid, big_endian=True).hex()
    e["srid_roundtrip"] = ref_gpkg.loads(ref_gpkg.dumps(g_srid))
    if geom["type"] == "Point":
        g_env = dict(geom, bbox=[1.0, 1.0, 2.0, 2.0])
        e["envelope"] = ref_gpkg.dumps(g_env, big_endian=False).hex()
        e["envelope_roundtrip"] = ref_gpkg.loads(
            ref_gpkg.dumps(g_env, big_endian=False))
    out["gpkg"][name] = e

    es = {}
    es["esri"] = ref_esri.dumps(geom)
    es["esri_srid"] = ref_esri.dumps(dict(geom, meta=dict(srid=3857)))
    es["roundtrip"] = ref_esri.loads(json.dumps(ref_esri.dumps(geom)))
    out["esri"][name] = es

# esri point-with-null load
out["esri"]["null_point_load"] = {
    "input": {"x": None, "spatialReference": {"wkid": 4326}},
    "loads": ref_esri.loads(json.dumps(
        {"x": None, "spatialReference": {"wkid": 4326}})),
}

with open("/root/repo/tests/fixtures/golden_gpkg_esri.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True, default=list)
print("gpkg:", len(out["gpkg"]), "esri:", len(out["esri"]))
