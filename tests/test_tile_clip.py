"""clip_layer_to_tiles: per-tile polygon pieces preserve even-odd
containment and total area; full cells ride the rectangle fast path."""

import numpy as np

from pure_python_geospatial_export_spark.geo import cells as cellmod
from pure_python_geospatial_export_spark.geo import kernels
from pure_python_geospatial_export_spark.geo import wkt as wktmod
from pure_python_geospatial_export_spark.operators.tiles import (
    clip_layer_to_tiles,
)
from pure_python_geospatial_export_spark.session import local_df

CONCAVE_WITH_HOLE = (
    "POLYGON ((0 0, 40 0, 40 12, 14 12, 14 22, 40 22, 40 34, 0 34, 0 0),"
    " (4 4, 10 4, 10 9, 4 9, 4 4))"
)


def _pieces(spark, wkt, res):
    layer = local_df(spark, [(1, "poly", wkt)],
                     ["polygon_id", "name", "wkt"])
    out = {}
    for r in clip_layer_to_tiles(layer, res).collect():
        out[r["tile_id"]] = (r["is_full"], wktmod.loads(r["wkt"]))
    return out


def test_clip_pip_parity_and_full_cells(spark):
    res = 5
    pieces = _pieces(spark, CONCAVE_WITH_HOLE, res)
    assert pieces
    assert any(full for full, _ in pieces.values())
    orig = wktmod.loads(CONCAVE_WITH_HOLE)["coordinates"]
    rng = np.random.default_rng(17)
    px = rng.uniform(-5.0, 45.0, 4000)
    py = rng.uniform(-5.0, 40.0, 4000)
    inside = kernels.points_in_polygon(px, py, orig)
    ids = cellmod.cell_id(px, py, res)
    for x, y, want, cell in zip(px, py, inside, ids):
        piece = pieces.get(int(cell))
        if piece is None:
            assert not want, (x, y)
            continue
        full, geom = piece
        got = bool(kernels.points_in_polygon(
            np.array([x]), np.array([y]), geom["coordinates"]
        )[0])
        assert got == want, (x, y, full)
    # full cells are exactly their cell rectangle
    for cell, (full, geom) in pieces.items():
        if full:
            x0, y0, x1, y1 = cellmod.cell_bounds(int(cell))
            (ring,) = geom["coordinates"]
            assert sorted(map(tuple, ring[:-1])) == sorted(
                [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
            )


def _even_odd_area(rings):
    # proper nesting: |exterior| minus |holes| == sum of |signed| with
    # the largest ring the exterior
    areas = sorted(
        (abs(kernels.signed_area(np.asarray(r))) for r in rings),
        reverse=True,
    )
    return areas[0] - sum(areas[1:])


def test_clip_area_conservation(spark):
    res = 5
    pieces = _pieces(spark, CONCAVE_WITH_HOLE, res)
    total = 0.0
    for cell, (full, geom) in pieces.items():
        if full:
            x0, y0, x1, y1 = cellmod.cell_bounds(int(cell))
            total += (x1 - x0) * (y1 - y0)
        else:
            total += _even_odd_area(geom["coordinates"])
    orig = wktmod.loads(CONCAVE_WITH_HOLE)["coordinates"]
    want = _even_odd_area(orig)
    assert abs(total - want) < 1e-6 * want, (total, want)


def test_clip_seam_polygon(spark):
    res = 5
    wkt = "POLYGON ((170 50, 170 60, -170 60, -170 50, 170 50))"
    pieces = _pieces(spark, wkt, res)
    assert pieces
    total = sum(
        (lambda b: (b[2] - b[0]) * (b[3] - b[1]))(
            cellmod.cell_bounds(int(c))
        ) if full else _even_odd_area(geom["coordinates"])
        for c, (full, geom) in pieces.items()
    )
    assert abs(total - 20.0 * 10.0) < 1e-6 * 200.0
    # pieces live on both sides of the seam
    xs = {cellmod.decode(np.array([c]))[0][0] for c in pieces}
    n = 1 << res
    assert any(x <= 1 for x in xs) and any(x >= n - 2 for x in xs)
