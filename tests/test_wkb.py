"""WKB codec golden tests — byte-for-byte vs reference-recorded fixtures.

Case matrix mirrors /root/reference/ppge-tests/test-geomet/wkb_test.py and
the byte-layout walkthroughs in /root/reference/docs/wkb_detail.md.
"""

import json
import os

import pytest

from pure_python_geospatial_export_spark.geo import wkb

HERE = os.path.dirname(__file__)
with open(os.path.join(HERE, "fixtures", "golden_geometry.json")) as f:
    GOLDEN = json.load(f)

DUMPS = sorted(GOLDEN["dumps"])


@pytest.mark.parametrize("name", DUMPS)
@pytest.mark.parametrize("endian", ["be", "le"])
def test_dumps(name, endian):
    e = GOLDEN["dumps"][name]
    if "wkb_error" in e:
        with pytest.raises(ValueError):
            wkb.dumps(e["geojson"], big_endian=(endian == "be"))
        return
    got = wkb.dumps(e["geojson"], big_endian=(endian == "be"))
    assert got.hex() == e["wkb_%s_hex" % endian]


@pytest.mark.parametrize("name", DUMPS)
@pytest.mark.parametrize("endian", ["be", "le"])
def test_ewkb_dumps(name, endian):
    e = GOLDEN["dumps"][name]
    g = dict(e["geojson"], meta=dict(srid=4326))
    got = wkb.dumps(g, big_endian=(endian == "be"))
    assert got.hex() == e["ewkb_%s_hex" % endian]


@pytest.mark.parametrize("name", DUMPS)
def test_loads_roundtrip(name):
    e = GOLDEN["dumps"][name]
    if "wkb_error" in e:
        return
    assert wkb.loads(bytes.fromhex(e["wkb_be_hex"])) == e["wkb_roundtrip"]
    # little-endian bytes load to the same dict
    assert wkb.loads(bytes.fromhex(e["wkb_le_hex"])) == e["wkb_roundtrip"]


@pytest.mark.parametrize("name", DUMPS)
def test_ewkb_loads_dual_srid_keys(name):
    e = GOLDEN["dumps"][name]
    got = wkb.loads(bytes.fromhex(e["ewkb_be_hex"]))
    assert got == e["ewkb_roundtrip"]
    assert got["meta"] == {"srid": 4326}
    assert got["crs"] == {"type": "name",
                          "properties": {"name": "EPSG4326"}}


@pytest.mark.parametrize("name", ["m_point_load", "m_linestring_load"])
def test_m_promotion(name):
    """XYM loads as XYZM with Z=0.0 inserted (ref geomet/wkb.py:626-633)."""
    e = GOLDEN["wkb"][name]
    assert wkb.loads(bytes.fromhex(e["hex"])) == e["loads"]


def test_empty_dump_raises():
    with pytest.raises(ValueError) as e:
        wkb.dumps(dict(type="Point", coordinates=[]))
    assert "Empty geometries cannot be represented in WKB" in str(e.value)


def test_bad_endian_byte():
    with pytest.raises(ValueError) as e:
        wkb.loads(b"\x02\x00\x00\x00\x01" + b"\x00" * 16)
    assert "Invalid endian byte" in str(e.value)


def test_mixed_dim_collection_rejected():
    g2 = dict(type="Point", coordinates=[0.0, 1.0])
    g3 = dict(type="Point", coordinates=[0.0, 1.0, 2.0])
    buf = (b"\x00" + (7).to_bytes(4, "big") + (2).to_bytes(4, "big")
           + wkb.dumps(g2) + wkb.dumps(g3))
    with pytest.raises(ValueError) as e:
        wkb.loads(buf)
    assert "Cannot mix dimensionality" in str(e.value)


def test_truncated_input():
    full = wkb.dumps(dict(type="Point", coordinates=[1.0, 2.0]))
    with pytest.raises(ValueError):
        wkb.loads(full[:-3])


def test_batch_null_guard():
    good = wkb.dumps(dict(type="Point", coordinates=[1.0, 2.0]))
    out = wkb.loads_batch([good, None, b"\x09garbage"])
    assert out[0] == dict(type="Point", coordinates=[1.0, 2.0])
    assert out[1] is None and out[2] is None

    dumped = wkb.dumps_batch(
        [dict(type="Point", coordinates=[1.0, 2.0]), None,
         dict(type="Point", coordinates=[])])
    assert dumped[0] == good
    assert dumped[1] is None and dumped[2] is None
