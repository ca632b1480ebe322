"""CLI translate tests (S11) — golden outputs mirror the reference CLI's
behavior (ref geomet/tool.py:46-64 format sniffing + translation)."""

import json
import subprocess
import sys

from pure_python_geospatial_export_spark.tool import translate


def test_wkt_to_json():
    out = translate("POINT (1 2)")
    assert json.loads(out) == {"type": "Point", "coordinates": [1.0, 2.0]}


def test_wkt_to_wkb_hex():
    out = translate("POINT (1 2)", output_format="wkb")
    assert out == (
        "00000000013ff00000000000004000000000000000"
    )


def test_wkb_hex_to_wkt():
    out = translate("00000000013ff00000000000004000000000000000",
                    output_format="wkt", precision=1)
    assert out == "POINT (1.0 2.0)"


def test_geojson_passthrough_rounding():
    out = translate(
        json.dumps({"type": "Point",
                    "coordinates": [1.123456, 2.987654]}),
        precision=2,
    )
    assert json.loads(out) == {"type": "Point",
                               "coordinates": [1.12, 2.99]}


def test_cli_subprocess():
    p = subprocess.run(
        [sys.executable, "-m",
         "pure_python_geospatial_export_spark.tool",
         "POINT (1 2)", "--wkb"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode == 0
    assert p.stdout.strip() == (
        "00000000013ff00000000000004000000000000000"
    )


def test_cli_stdin_multiline():
    p = subprocess.run(
        [sys.executable, "-m",
         "pure_python_geospatial_export_spark.tool", "--wkt",
         "--precision", "1"],
        input='{"type": "Point", "coordinates": [1.0, 2.0]}\n'
              "LINESTRING (0 0, 1 1)\n",
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode == 0
    assert p.stdout.splitlines() == [
        "POINT (1.0 2.0)",
        "LINESTRING (0.0 0.0, 1.0 1.0)",
    ]


def test_ewkt_flag_roundtrip(capsys):
    from pure_python_geospatial_export_spark import tool

    rc = tool.main(["SRID=4326;POINT (1 2)", "--ewkt", "--wkb"])
    assert rc == 0
    hexout = capsys.readouterr().out.strip()
    from pure_python_geospatial_export_spark.geo import wkb as wkbmod

    geom = wkbmod.loads(bytes.fromhex(hexout))
    assert geom["type"] == "Point"
    assert geom["meta"]["srid"] == 4326
    assert geom["coordinates"] == [1.0, 2.0]


def test_ewkt_default_still_missniffs(capsys):
    """Reference-identical default: without --ewkt the 'S' prefix falls
    through to the hex-WKB parse and errors (geomet/tool.py:47-52)."""
    from pure_python_geospatial_export_spark import tool

    rc = tool.main(["SRID=4326;POINT (1 2)"])
    assert rc == 1
