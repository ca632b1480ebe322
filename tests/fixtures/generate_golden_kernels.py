"""One-off differential-fixture generator for geometry-math kernels.

Records the REFERENCE's point-in-ring / ring-assembly behavior over
deterministic inputs (including boundary/vertex edge cases) so engine tests
can assert bit-identical semantics without importing the reference.

    python tests/fixtures/generate_golden_kernels.py
"""

import json
import sys

sys.path.insert(0, "/root/reference")

from ppge.pyshp import (  # noqa: E402
    is_cw,
    organize_polygon_rings,
    ring_contains_point,
    ring_sample,
    signed_area,
)

# --- rings -----------------------------------------------------------------
WYOMING = [
    [-111.020843268199, 44.9981946924588],
    [-111.020843268199, 41.0013336343981],
    [-104.052453769699, 41.0013336343981],
    [-104.052453769699, 44.9981946924588],
    [-111.020843268199, 44.9981946924588],
]
CONCAVE = [  # CW arrow-like concave ring
    [0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [5.0, 5.0], [10.0, 0.0],
    [0.0, 0.0],
]
PENTAGON = [
    [2.0, 0.0], [0.0, 2.0], [1.0, 4.0], [3.0, 4.0], [4.0, 2.0], [2.0, 0.0],
]
HOLE = [  # CCW square hole inside CONCAVE's left part
    [1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0],
]

RINGS = {
    "wyoming": WYOMING,
    "concave": CONCAVE,
    "pentagon": PENTAGON,
    "hole": HOLE,
}

# deterministic probe points: grid + boundary + vertex cases
POINTS = []
for ix in range(-2, 13):
    for iy in range(-2, 13):
        POINTS.append([ix * 1.0, iy * 1.0])
        POINTS.append([ix + 0.5, iy + 0.25])
# exact vertices and edge midpoints of each ring
for ring in RINGS.values():
    for i in range(len(ring) - 1):
        POINTS.append(list(ring[i]))
        POINTS.append([(ring[i][0] + ring[i + 1][0]) / 2.0,
                       (ring[i][1] + ring[i + 1][1]) / 2.0])
# Wyoming-ish coordinates
POINTS += [[-104.7863, 41.13998], [-104.9903, 39.7392],
           [-111.020843268199, 42.0], [-104.052453769699, 43.0]]

out = {"rings": RINGS, "points": POINTS, "pip": {}, "area": {},
       "is_cw": {}, "sample": {}, "organize": {}}

for name, ring in RINGS.items():
    out["pip"][name] = [bool(ring_contains_point(ring, (p[0], p[1])))
                        for p in POINTS]
    out["area"][name] = signed_area(ring)
    out["is_cw"][name] = bool(is_cw(ring))
    out["sample"][name] = list(
        ring_sample(ring, ccw=not is_cw(ring)))

# ring assembly cases: (name, rings)
CW_OUTER = [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]]
CW_OUTER2 = [[20.0, 0.0], [20.0, 8.0], [28.0, 8.0], [28.0, 0.0], [20.0, 0.0]]
CCW_HOLE_A = [[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0], [2.0, 2.0]]
CCW_HOLE_B = [[22.0, 2.0], [24.0, 2.0], [24.0, 4.0], [22.0, 4.0],
              [22.0, 2.0]]
CCW_ORPHAN = [[50.0, 50.0], [52.0, 50.0], [52.0, 52.0], [50.0, 52.0],
              [50.0, 50.0]]
CW_NESTED = [[1.0, 1.0], [1.0, 9.0], [9.0, 9.0], [9.0, 1.0], [1.0, 1.0]]

ORG_CASES = {
    "single_ext_with_holes": [CW_OUTER, CCW_HOLE_A],
    "two_ext_two_holes": [CW_OUTER, CW_OUTER2, CCW_HOLE_A, CCW_HOLE_B],
    "orphan_hole": [CW_OUTER, CW_OUTER2, CCW_HOLE_A, CCW_ORPHAN],
    "all_holes": [CCW_HOLE_A, CCW_HOLE_B],
    "nested_exteriors_tiebreak": [CW_OUTER, CW_NESTED, CCW_HOLE_A],
    "no_holes": [CW_OUTER, CW_OUTER2],
}
for name, rings in ORG_CASES.items():
    errors = {}
    polys = organize_polygon_rings(rings, errors)
    out["organize"][name] = {"input": rings, "polys": polys,
                             "errors": errors}

with open("/root/repo/tests/fixtures/golden_kernels.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("points:", len(POINTS), "org cases:", len(ORG_CASES))
