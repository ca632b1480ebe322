"""GeoPackage (C5) and EsriJSON (C6) golden tests vs reference-recorded
fixtures (see generate_golden_gpkg_esri.py)."""

import json
import os

import pytest

from pure_python_geospatial_export_spark.geo import esri, geopackage

HERE = os.path.dirname(__file__)
with open(os.path.join(HERE, "fixtures", "golden_gpkg_esri.json")) as f:
    GOLDEN = json.load(f)

GP = GOLDEN["gpkg"]
ES = GOLDEN["esri"]


def _norm(o):
    """JSON-normalize tuples/lists for comparison with stored fixtures."""
    return json.loads(json.dumps(o, default=list))


@pytest.mark.parametrize("name", sorted(GP))
def test_gpkg_dumps(name):
    e = GP[name]
    geom = _geom(name)
    assert geopackage.dumps(geom, big_endian=True).hex() == e["be"]
    assert geopackage.dumps(geom, big_endian=False).hex() == e["le"]
    assert geopackage.dumps(
        dict(geom, meta=dict(srid=4326)), big_endian=True
    ).hex() == e["srid"]


@pytest.mark.parametrize("name", sorted(GP))
def test_gpkg_loads(name):
    e = GP[name]
    assert _norm(geopackage.loads(bytes.fromhex(e["be"]))) == _norm(
        e["roundtrip"])
    got = geopackage.loads(bytes.fromhex(e["srid"]))
    assert _norm(got) == _norm(e["srid_roundtrip"])
    assert got["meta"] == {"srid": 4326}
    if "envelope" in e:
        env = geopackage.loads(bytes.fromhex(e["envelope"]))
        assert _norm(env) == _norm(e["envelope_roundtrip"])
        assert env["bbox"] == [1.0, 1.0, 2.0, 2.0]


def _geom(name):
    # reconstruct input geometry from the roundtrip fixture (wkb loads
    # output equals input for these 2D/Z cases)
    rt = GP[name]["roundtrip"]
    return {"type": rt["type"], "coordinates": rt["coordinates"]}


@pytest.mark.parametrize("name", [n for n in sorted(ES)
                                  if n != "null_point_load"])
def test_esri_dumps(name):
    geom = _geom(name)
    assert _norm(esri.dumps(geom)) == _norm(ES[name]["esri"])
    assert _norm(esri.dumps(dict(geom, meta=dict(srid=3857)))) == _norm(
        ES[name]["esri_srid"])


@pytest.mark.parametrize("name", [n for n in sorted(ES)
                                  if n != "null_point_load"])
def test_esri_roundtrip(name):
    geom = _geom(name)
    got = esri.loads(json.dumps(esri.dumps(geom)))
    assert _norm(got) == _norm(ES[name]["roundtrip"])


def test_esri_null_point():
    e = ES["null_point_load"]
    assert _norm(esri.loads(json.dumps(e["input"]))) == _norm(e["loads"])


def test_gpkg_bad_magic():
    with pytest.raises(ValueError):
        geopackage.loads(b"XX\x00\x00\x00\x00\x00\x00" + b"\x00" * 21)
