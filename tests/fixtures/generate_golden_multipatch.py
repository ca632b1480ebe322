"""One-off differential-fixture generator for MULTIPATCH and Z/M writes.

(a) Reads the reference's multipatch fixture with the reference reader
    and records the full shape structure (parts, partTypes, z, m) — my
    reader must reproduce it exactly.
(b) Runs the REFERENCE writer on deterministic multipatch / pointz /
    linez inputs and records the output .shp/.shx/.dbf bytes — my writer
    must match byte-for-byte (dbf date header bytes 1..3 masked to 0).

    python tests/fixtures/generate_golden_multipatch.py
"""

import io
import json
import os
import sys

sys.path.insert(0, "/root/reference")

from ppge import pyshp  # noqa: E402

SHPDIR = "/root/reference/ppge-tests/shapefiles"
HERE = os.path.dirname(os.path.abspath(__file__))

out = {"read": [], "write": {}}

r = pyshp.Reader(os.path.join(SHPDIR, "test/multipatch"))
for sr in r.iterShapeRecords():
    s = sr.shape
    out["read"].append({
        "shape_type": s.shapeType,
        "parts": [int(p) for p in s.parts],
        "part_types": [int(p) for p in s.partTypes],
        "points": [[float(c) for c in p] for p in s.points],
        "z": [float(z) for z in s.z] if hasattr(s, "z") else None,
        "m": ([None if m is None else float(m) for m in s.m]
              if hasattr(s, "m") else None),
        "record": list(sr.record),
    })
r.close()


def run_write(fn):
    shp, shx, dbf = io.BytesIO(), io.BytesIO(), io.BytesIO()
    w = pyshp.Writer(shp=shp, shx=shx, dbf=dbf)
    w.field("name", "C", 20)
    fn(w)
    w.close()
    db = bytearray(dbf.getvalue())
    db[1:4] = b"\0\0\0"
    return {
        "shp": shp.getvalue().hex(),
        "shx": shx.getvalue().hex(),
        "dbf": bytes(db).hex(),
    }


MP_PARTS = [
    [[0.0, 0.0, 0.0], [0.0, 0.0, 3.0], [5.0, 0.0, 0.0], [5.0, 0.0, 3.0],
     [5.0, 5.0, 0.0], [5.0, 5.0, 3.0], [0.0, 5.0, 0.0], [0.0, 5.0, 3.0],
     [0.0, 0.0, 0.0], [0.0, 0.0, 3.0]],
    [[2.5, 2.5, 10.0], [0.0, 0.0, 3.0], [5.0, 0.0, 3.0], [5.0, 5.0, 3.0],
     [0.0, 5.0, 3.0], [0.0, 0.0, 3.0]],
]
MP_PARTS_M = [
    [[0.0, 0.0, 1.0, 7.5], [1.0, 0.0, 1.0, None], [1.0, 1.0, 2.0, 9.25]],
    [[3.0, 3.0, 0.0, 4.0], [4.0, 3.0, 0.5, 5.0], [4.0, 4.0, 1.5, 6.0],
     [3.0, 4.0, 2.5, None]],
]


def w_multipatch(w):
    w.multipatch(MP_PARTS, partTypes=[pyshp.TRIANGLE_STRIP,
                                      pyshp.TRIANGLE_FAN])
    w.record(name="house")


def w_multipatch_m(w):
    w.multipatch(MP_PARTS_M, partTypes=[pyshp.RING, pyshp.OUTER_RING])
    w.record(name="measured")
    w.multipatch(MP_PARTS, partTypes=[0, 1])
    w.record(name="second")


def w_pointz(w):
    w.pointz(-104.8, 41.1, 1876.0)
    w.record(name="cheyenne")
    w.pointz(1.0, 2.0, 3.0, 4.5)
    w.record(name="withm")


def w_linez(w):
    w.linez([
        [[0.0, 0.0, 0.0], [1.0, 1.0, 2.0], [2.0, 0.5, 1.0]],
        [[5.0, 5.0, 0.0], [6.0, 7.0, 3.0]],
    ])
    w.record(name="ridge")


out["write"]["multipatch"] = run_write(w_multipatch)
out["write"]["multipatch_m"] = run_write(w_multipatch_m)
out["write"]["pointz"] = run_write(w_pointz)
out["write"]["linez"] = run_write(w_linez)

with open(os.path.join(HERE, "golden_multipatch.json"), "w") as f:
    json.dump(out, f, indent=1)
print("wrote", os.path.join(HERE, "golden_multipatch.json"))
