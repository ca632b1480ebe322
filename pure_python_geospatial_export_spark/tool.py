"""Format-translate CLI (SURVEY S11 — parity with the reference's geomet
CLI, ref geomet/tool.py:46-116): reads lines from a file, a positional
string, or stdin, sniffs the format ('{' -> GeoJSON, G/L/M/P prefix ->
WKT, else hex WKB), and writes the requested output format to stdout.

  python -m pure_python_geospatial_export_spark.tool 'POINT (1 2)' --wkb
  echo '{"type": "Point", "coordinates": [1, 2]}' | \
      python -m pure_python_geospatial_export_spark.tool --wkt
"""

from __future__ import annotations

import argparse
import json
import sys

from .geo import wkb as wkbmod
from .geo import wkt as wktmod
from .geo.geojson import round_geom


def translate(text: str, output_format: str = "json",
              indent=None, precision: int = -1,
              ewkt: bool = False) -> str:
    if text.startswith("{"):
        geom = json.loads(text)
    elif ewkt and text.startswith("SRID="):
        # opt-in extension: 'SRID=4326;POINT (1 2)'. The DEFAULT sniff
        # below is deliberately reference-identical (geomet/tool.py:47-52
        # has no EWKT branch, so 'S...' falls through to the hex-WKB
        # parse and errors) — the flag adds the capability without
        # changing golden CLI behavior.
        from .geo.geojson import srid_keys

        head, _, rest = text.partition(";")
        geom = wktmod.loads(rest)
        geom.update(srid_keys(int(head[5:])))
    elif text.startswith(("G", "L", "M", "P")):
        geom = wktmod.loads(text)
    else:
        geom = wkbmod.loads(bytes.fromhex(text))
    if output_format == "wkb":
        return wkbmod.dumps(geom).hex()
    if output_format == "wkt":
        kwds = {}
        if precision >= 0:
            kwds["decimals"] = precision
        return wktmod.dumps(geom, **kwds)
    if precision >= 0:
        geom = round_geom(geom, precision)
    return json.dumps(geom, indent=indent, sort_keys=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Convert between WKT or hex-encoded WKB and GeoJSON."
    )
    ap.add_argument("input", nargs="?", default="-")
    group = ap.add_mutually_exclusive_group()
    group.add_argument("--json", dest="fmt", action="store_const",
                       const="json")
    group.add_argument("--wkb", dest="fmt", action="store_const",
                       const="wkb")
    group.add_argument("--wkt", dest="fmt", action="store_const",
                       const="wkt")
    ap.add_argument("--precision", type=int, default=-1)
    ap.add_argument("--indent", type=int, default=None)
    ap.add_argument(
        "--ewkt", action="store_true",
        help="accept EWKT input lines ('SRID=n;WKT'); off by default "
             "to keep the reference CLI's exact sniffing behavior",
    )
    ap.set_defaults(fmt="json")
    args = ap.parse_args(argv)

    if args.input == "-":
        lines = sys.stdin.readlines()
    else:
        try:
            with open(args.input) as f:
                lines = f.readlines()
        except OSError:
            lines = [args.input]

    try:
        for line in lines:
            text = line.strip()
            if not text:
                continue
            sys.stdout.write(
                translate(text, output_format=args.fmt,
                          indent=args.indent, precision=args.precision,
                          ewkt=args.ewkt)
            )
            sys.stdout.write("\n")
        return 0
    except Exception:
        import traceback

        traceback.print_exc()
        return 1


if __name__ == "__main__":
    sys.exit(main())
