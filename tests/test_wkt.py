"""WKT codec golden tests — byte-for-byte vs reference-recorded fixtures.

Fixture provenance: tests/fixtures/golden_geometry.json was produced by
running the reference codecs (see generate_golden.py); the engine must match
every recorded byte. Case matrix mirrors
/root/reference/ppge-tests/test-geomet/wkt_test.py.
"""

import json
import os

import pytest

from pure_python_geospatial_export_spark.geo import wkt
from pure_python_geospatial_export_spark.geo.wkt import (
    InvalidGeoJSONException,
)

HERE = os.path.dirname(__file__)
with open(os.path.join(HERE, "fixtures", "golden_geometry.json")) as f:
    GOLDEN = json.load(f)

DUMPS = sorted(GOLDEN["dumps"])
VARIANTS = GOLDEN["wkt_variants"]


@pytest.mark.parametrize("name", DUMPS)
def test_dumps_16_decimals(name):
    e = GOLDEN["dumps"][name]
    assert wkt.dumps(e["geojson"]) == e["wkt_16"]


@pytest.mark.parametrize("name", DUMPS)
def test_dumps_3_decimals(name):
    e = GOLDEN["dumps"][name]
    assert wkt.dumps(e["geojson"], decimals=3) == e["wkt_3"]


@pytest.mark.parametrize("name", DUMPS)
def test_dumps_0_decimals(name):
    e = GOLDEN["dumps"][name]
    assert wkt.dumps(e["geojson"], decimals=0) == e["wkt_0"]


@pytest.mark.parametrize("name", DUMPS)
def test_loads_roundtrip(name):
    e = GOLDEN["dumps"][name]
    assert wkt.loads(e["wkt_16"]) == e["wkt_roundtrip"]


@pytest.mark.parametrize("name", DUMPS)
def test_ewkt_dumps(name):
    e = GOLDEN["dumps"][name]
    g = dict(e["geojson"], meta=dict(srid=4326))
    assert wkt.dumps(g) == e["ewkt"]


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variants(name):
    v = VARIANTS[name]
    if "wkt" in v:
        # EMPTY dump + load-back
        t = name.replace("empty_", "")
        if t == "gc":
            assert wkt.dumps(
                dict(type="GeometryCollection", geometries=[])) == v["wkt"]
        assert wkt.loads(v["wkt"]) == v["loads_back"]
    else:
        assert wkt.loads(v["input"]) == v["loads"]


def test_srid_from_crs_only():
    g = dict(type="Point", coordinates=[0.0, 1.0],
             crs={"type": "name", "properties": {"name": "EPSG4326"}})
    assert wkt.dumps(g).startswith("SRID=4326;POINT (0.0000000000000000")


def test_srid_conflict_raises():
    g = dict(type="Point", coordinates=[0.0, 1.0], meta=dict(srid=4326),
             crs={"type": "name", "properties": {"name": "EPSG4327"}})
    with pytest.raises(ValueError) as e:
        wkt.dumps(g)
    assert str(e.value) == "Ambiguous CRS/SRID values: 4326 and 4327"


def test_unsupported_type_dumps():
    with pytest.raises(ValueError) as e:
        wkt.dumps(dict(type="Tetrahedron", coordinates=[]))
    assert str(e.value) == "Unsupported geometry type 'Tetrahedron'"


def test_unsupported_type_loads():
    with pytest.raises(ValueError) as e:
        wkt.loads("TETRAHEDRON (0 0)")
    assert str(e.value) == "Unsupported geometry type 'TETRAHEDRON'"


def test_malformed_geojson_raises():
    for bad in [
        dict(type="GeometryCollection", coordinates=[]),
        dict(type="Point"),
        dict(coordinates=[]),
    ]:
        with pytest.raises(InvalidGeoJSONException):
            wkt.dumps(bad)


def test_unmatched_paren():
    with pytest.raises(ValueError) as e:
        wkt.loads("POINT (0.0 1.0")
    assert str(e.value) == "Invalid WKT: `POINT (0.0 1.0`"


def test_missing_paren():
    with pytest.raises(ValueError) as e:
        wkt.loads("POINT 0.0 1.0")
    assert str(e.value) == "Invalid WKT: `POINT 0.0 1.0`"


def test_batch_null_guard():
    out = wkt.loads_batch(["POINT (0 1)", None, "POLYGON ((bogus))",
                           "POINT (2 3)"])
    assert out[0] == dict(type="Point", coordinates=[0.0, 1.0])
    assert out[1] is None
    assert out[2] is None
    assert out[3] == dict(type="Point", coordinates=[2.0, 3.0])

    dumped = wkt.dumps_batch([dict(type="Point", coordinates=[0.0, 1.0]),
                              None, dict(type="Bogus", coordinates=[])])
    assert dumped[0] == "POINT (0.0000000000000000 1.0000000000000000)"
    assert dumped[1] is None and dumped[2] is None
