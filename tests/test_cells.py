"""Cell-index tests: encode/decode round-trips, hierarchy, neighbors,
Morton locality, polygon covering (incl. full-cell guarantee vs exact PIP).
"""

import numpy as np
import pytest

from pure_python_geospatial_export_spark.geo import cells, kernels


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (0, 1, 5, 12, 28):
        ids = cells.cell_id(lon, lat, res)
        x, y, r = cells.decode(ids)
        assert (r == res).all()
        assert (cells.encode(x, y, res) == ids).all()
        n = 1 << res
        assert (x >= 0).all() and (x < n).all()
        assert (y >= 0).all() and (y < n).all()


def test_world_edges_clamp():
    ids = cells.cell_id(
        np.array([-180.0, 180.0, 0.0]), np.array([-90.0, 90.0, 0.0]), 4
    )
    x, y, _ = cells.decode(ids)
    assert x.tolist() == [0, 15, 8]
    assert y.tolist() == [0, 15, 8]


def test_sql_equivalence_formula():
    """The canonical id must equal the plain-arithmetic SQL formula — this
    is what lets DuckDB oracles recompute engine cell ids exactly."""
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    res = 7
    n = 1 << res
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    manual = res * (2**58) + x * (2**29) + y
    assert (cells.cell_id(lon, lat, res) == manual).all()


def test_parent_children():
    c = cells.cell_id_scalar(-104.786, 41.14, 10)
    p = int(cells.parent(np.array([c]))[0])
    assert p in [int(v) for v in
                 [cells.parent(np.array([k]))[0] for k in cells.children(p)]]
    kids = cells.children(p)
    assert c in kids.tolist()
    x, y, r = cells.decode(kids)
    assert (r == 10).all()


def test_neighbors_ring():
    c = cells.cell_id_scalar(0.0, 0.0, 8)
    nb = cells.neighbors(c, ring=1)
    assert len(nb) == 9
    assert c in nb.tolist()
    # pole clamp: a cell at max y has only 6 neighbors
    top = cells.cell_id_scalar(0.0, 89.99, 8)
    assert len(cells.neighbors(top, ring=1)) == 6
    # lon wrap: a cell at x=0 still has 9 (wraps to x=n-1)
    west = cells.cell_id_scalar(-179.99, 0.0, 8)
    assert len(cells.neighbors(west, ring=1)) == 9


def test_cell_bounds_contains_point():
    lon, lat = -104.786, 41.14
    c = cells.cell_id_scalar(lon, lat, 12)
    b = cells.cell_bounds(c)
    assert b[0] <= lon < b[2]
    assert b[1] <= lat < b[3]


def test_morton_locality():
    """Morton codes of the 4 children of a cell are contiguous."""
    x = np.array([10, 11, 10, 11])
    y = np.array([4, 4, 5, 5])
    m = np.sort(cells.morton(x, y))
    assert (np.diff(m) == 1).all()


def test_morton_matches_xy():
    rng = np.random.default_rng(11)
    xs = rng.integers(0, 2**20, 100)
    ys = rng.integers(0, 2**20, 100)
    m = cells.morton(xs, ys)

    def scalar_morton(a, b):
        out = 0
        for i in range(29):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    expected = [scalar_morton(int(a), int(b)) for a, b in zip(xs, ys)]
    assert m.tolist() == expected


WYOMING_RING = [
    [-111.020843268199, 44.9981946924588],
    [-111.020843268199, 41.0013336343981],
    [-104.052453769699, 41.0013336343981],
    [-104.052453769699, 44.9981946924588],
    [-111.020843268199, 44.9981946924588],
]


def test_polygon_cover_correctness():
    """Every point inside the polygon must land in a covered cell, and
    every point in a 'full' cell must be inside the polygon."""
    res = 7
    cover = cells.polygon_cover([WYOMING_RING], res)
    assert cover, "cover must be non-empty"
    covered = {c for c, _ in cover}
    full = {c for c, f in cover if f}
    assert full, "a state-sized polygon at res 7 must have full cells"

    rng = np.random.default_rng(5)
    lon = rng.uniform(-112, -103, 5000)
    lat = rng.uniform(40, 46, 5000)
    inside = kernels.points_in_polygon(lon, lat, [WYOMING_RING])
    ids = cells.cell_id(lon, lat, res)

    # completeness: inside points are always in the cover
    assert all(int(c) in covered for c in ids[inside])
    # full-cell soundness: any point in a full cell is truly inside
    in_full = np.array([int(c) in full for c in ids])
    assert inside[in_full].all()


def test_polygon_cover_with_hole():
    outer = [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]]
    hole = [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]]
    res = 9
    cover = cells.polygon_cover([outer, hole], res)
    full = {c for c, f in cover if f}
    rng = np.random.default_rng(9)
    lon = rng.uniform(-1, 11, 4000)
    lat = rng.uniform(-1, 11, 4000)
    inside = kernels.points_in_polygon(lon, lat, [outer, hole])
    ids = cells.cell_id(lon, lat, res)
    covered = {c for c, _ in cover}
    assert all(int(c) in covered for c in ids[inside])
    in_full = np.array([int(c) in full for c in ids])
    assert inside[in_full].all()


def test_polygon_cover_multipolygon_parts():
    """MultiPolygons are flattened to one ring list upstream; parts whose
    exterior is outside the FIRST ring's bbox must still get cover cells
    (regression: cover used to seed candidates from rings[0] only, so
    points inside later parts were silently dropped by spatial_join)."""
    part_a = [[0.0, 0.0], [0.0, 5.0], [5.0, 5.0], [5.0, 0.0], [0.0, 0.0]]
    # far away from part_a — entirely outside its bbox
    part_b = [[40.0, 40.0], [40.0, 45.0], [45.0, 45.0], [45.0, 40.0],
              [40.0, 40.0]]
    res = 8
    cover = cells.polygon_cover([part_a, part_b], res)
    covered = {c for c, _ in cover}
    full = {c for c, f in cover if f}

    # a point deep inside part_b must land in a covered (indeed full) cell
    probe = cells.cell_id_scalar(42.5, 42.5, res)
    assert probe in covered
    assert probe in full

    # property check over both parts plus the gap between them
    rng = np.random.default_rng(11)
    lon = rng.uniform(-2, 47, 6000)
    lat = rng.uniform(-2, 47, 6000)
    inside = kernels.points_in_polygon(lon, lat, [part_a, part_b])
    ids = cells.cell_id(lon, lat, res)
    assert all(int(c) in covered for c in ids[inside])
    in_full = np.array([int(c) in full for c in ids])
    assert inside[in_full].all()
    # the gap between the parts must NOT be covered as full
    gap = cells.cell_id_scalar(20.0, 20.0, res)
    assert gap not in full


def test_bad_resolution():
    with pytest.raises(ValueError):
        cells.cell_id(np.array([0.0]), np.array([0.0]), 29)
    with pytest.raises(ValueError):
        cells.cell_id(np.array([0.0]), np.array([0.0]), -1)
