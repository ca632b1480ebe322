"""A/B: scalar vs array-API MVT geometry decode (VERDICT r5 #7).

The round-5 vectorization attempt was reverted because the decoder's
list-of-int-tuples API capped numpy gains; decode_geometry_arrays
changes the API to return int64 (n, 2) coordinate arrays. This script
times both paths on large rings (the regime that matters for tile QA
pipelines), asserts the decoded coordinate sums are identical, and
prints one JSON line.

Run: python scripts/mvt_decode_ab.py [n_vertices] [n_features] [reps]
"""

import json
import math
import sys
import time

sys.path.insert(0, ".")

from pure_python_geospatial_export_spark.geo import mvt  # noqa: E402


def build_tile(n_vertices: int, n_features: int) -> bytes:
    feats = []
    for f in range(n_features):
        cx, cy = 2048 + (f % 7) * 13, 2048 - (f % 5) * 11
        ring = []
        for i in range(n_vertices):
            a = 2.0 * math.pi * i / n_vertices
            r = 900 + 500 * math.cos(7 * a + f)
            ring.append((int(cx + r * math.cos(a)),
                         int(cy + r * math.sin(a))))
        feats.append({"id": f + 1, "type": mvt.GEOM_POLYGON,
                      "parts": [ring], "exterior": [True],
                      "properties": {"f": f}})
    return mvt.encode_tile([mvt.encode_layer("ab", feats)])


def decode_sum(buf: bytes, arrays: bool):
    sx = sy = nv = 0
    tile = mvt.decode_tile(buf, arrays=arrays)
    for feat in tile["layers"][0]["features"]:
        for part in feat["parts"]:
            if arrays:
                sx += int(part[:, 0].sum())
                sy += int(part[:, 1].sum())
                nv += len(part)
            else:
                for x, y in part:
                    sx += x
                    sy += y
                    nv += 1
    return sx, sy, nv


def bench(buf: bytes, arrays: bool, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        decode_sum(buf, arrays)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_features = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    buf = build_tile(n_vertices, n_features)
    a = decode_sum(buf, arrays=False)
    b = decode_sum(buf, arrays=True)
    assert a == b, (a, b)
    t_scalar = bench(buf, False, reps)
    t_array = bench(buf, True, reps)
    print(json.dumps({
        "n_vertices": n_vertices, "n_features": n_features,
        "tile_bytes": len(buf), "sums_equal": True,
        "scalar_sec": round(t_scalar, 5),
        "array_sec": round(t_array, 5),
        "speedup": round(t_scalar / t_array, 2),
    }))


if __name__ == "__main__":
    main()
