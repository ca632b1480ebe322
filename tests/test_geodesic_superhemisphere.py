"""Geodesic polygons spanning more than a hemisphere (round-3 verdict
item 4): the gnomonic kernel no longer raises — rings are clipped on the
sphere into quarter-sphere wedge lobes, each evaluated in its own chart.

Oracle: densify every great-circle edge to a tiny sagitta and run the
PLANAR kernel on the densified ring — as sagitta -> 0 this converges to
the true geodesic containment, and at 1e-6 rad the disagreement band is
~6 mm wide (zero expected hits from random test points)."""

import numpy as np
import pytest

from pure_python_geospatial_export_spark.geo import geodesic as geod
from pure_python_geospatial_export_spark.geo import kernels


def _barrel(lons, lat_top=30.0, lat_bot=-30.0):
    """A 'barrel' ring: vertex chain along lat_top west->east, down the
    east side, back along lat_bot, closed up the west side. Every hop is
    well under 180 deg, so edges take the intended short way."""
    top = [[float(x), lat_top] for x in lons]
    bot = [[float(x), lat_bot] for x in reversed(lons)]
    ring = top + bot + [top[0]]
    return ring


SYM_LONS = [-150.0, -90.0, -30.0, 30.0, 90.0, 150.0]  # 300 deg span
ASYM_LONS = [-150.0, -90.0, -30.0, 30.0, 90.0]  # 240 deg span


def _densified_planar_oracle(rings, lons, lats, sagitta=1e-6):
    dense = [geod.densify_ring_geodesic(r, sagitta) for r in rings]
    return kernels.points_in_polygon(lons, lats, dense)


def test_symmetric_barrel_uses_chart_ray_path():
    """The symmetric barrel violates the centroid hemisphere (far
    vertices beyond 90 deg), exercising the front-fail fallback."""
    ring = _barrel(SYM_LONS)
    c = geod.gnomonic_center([ring])
    vecs = geod.unit_vectors(
        np.asarray(ring)[:, 0], np.asarray(ring)[:, 1]
    )
    assert (vecs @ c).min() < 1e-12, "fixture must violate the hemisphere"
    rng = np.random.default_rng(2)
    lons = rng.uniform(-180.0, 180.0, 1000)
    lats = rng.uniform(-90.0, 90.0, 1000)
    got = geod.points_in_polygon_geodesic(lons, lats, [ring])
    want = _densified_planar_oracle([ring], lons, lats)
    assert (got == want).all()
    assert got.any() and not got.all()


def test_antipodal_rings_centroid_raise_branch():
    """Two antipodal triangles: the vertex sum is exactly zero, so
    gnomonic_center raises and the kernel takes the exception branch
    into the chart-ray fallback. One triangle straddles the
    antimeridian, exercising the seam handling of both the kernel and
    the densified-planar oracle."""
    tri = [[-10.0, -10.0], [10.0, -10.0], [0.0, 15.0], [-10.0, -10.0]]
    anti = [[170.0, 10.0], [-170.0, 10.0], [180.0, -15.0], [170.0, 10.0]]
    with pytest.raises(ValueError):
        geod.gnomonic_center([tri, anti])
    rng = np.random.default_rng(3)
    lons = rng.uniform(-180.0, 180.0, 2000)
    lats = rng.uniform(-30.0, 30.0, 2000)
    got = geod.points_in_polygon_geodesic(lons, lats, [tri, anti])
    want = _densified_planar_oracle([tri, anti], lons, lats)
    assert (got == want).all()
    # both disjoint regions are populated
    assert got[(np.abs(lons) < 5) & (np.abs(lats) < 5)].any()
    assert got[(np.abs(lons) > 175) & (np.abs(lats) < 5)].any()


def test_asymmetric_barrel_front_fail_branch():
    """Centroid exists but far vertices exceed 90 deg from it: the
    front-check branch falls back to wedges."""
    ring = _barrel(ASYM_LONS)
    c = geod.gnomonic_center([ring])
    vecs = geod.unit_vectors(
        np.asarray(ring)[:, 0], np.asarray(ring)[:, 1]
    )
    assert (vecs @ c).min() < 1e-12, "fixture must violate the hemisphere"
    rng = np.random.default_rng(4)
    lons = rng.uniform(-180.0, 180.0, 1000)
    lats = rng.uniform(-90.0, 90.0, 1000)
    got = geod.points_in_polygon_geodesic(lons, lats, [ring])
    want = _densified_planar_oracle([ring], lons, lats)
    assert (got == want).all()
    assert got.any()


def test_barrel_with_hole_parity():
    ring = _barrel(SYM_LONS)
    hole = [[-20.0, -10.0], [20.0, -10.0], [20.0, 10.0], [-20.0, 10.0],
            [-20.0, -10.0]]
    rng = np.random.default_rng(6)
    lons = rng.uniform(-180.0, 180.0, 1000)
    lats = rng.uniform(-60.0, 60.0, 1000)
    got = geod.points_in_polygon_geodesic(lons, lats, [ring, hole])
    want = _densified_planar_oracle([ring, hole], lons, lats)
    assert (got == want).all()
    # hole center excluded, ring interior outside hole included
    spot = geod.points_in_polygon_geodesic(
        np.array([0.0, 60.0, 180.0]), np.array([0.0, 0.0, 0.0]),
        [ring, hole],
    )
    assert spot.tolist() == [False, True, False]


def test_barrel_known_points():
    ring = _barrel(SYM_LONS)
    lons = np.array([0.0, 0.0, 180.0, 170.0, -170.0, 90.0, 0.0])
    lats = np.array([0.0, 31.0, 0.0, 0.0, 0.0, 50.0, -31.0])
    got = geod.points_in_polygon_geodesic(lons, lats, [ring])
    # lat +-31 at lon 0 is INSIDE: great-circle edges between lat-30
    # vertices bulge poleward (midpoint of the 60-deg hop sits at ~33.7)
    assert got.tolist() == [True, True, False, False, False, False, True]


def test_subhemisphere_fast_path_unchanged():
    """Round-2 behavior must be bit-identical for sub-hemisphere input
    (the pip_join_geodesic oracle embeds the single-chart constants)."""
    tri = [[-60.0, 45.0], [60.0, 45.0], [0.0, 80.0], [-60.0, 45.0]]
    rng = np.random.default_rng(8)
    lons = rng.uniform(-180.0, 180.0, 2000)
    lats = rng.uniform(0.0, 90.0, 2000)
    got = geod.points_in_polygon_geodesic(lons, lats, [tri])
    # replicate the single-chart computation inline
    c = geod.gnomonic_center([tri])
    arr = np.asarray(tri)
    rx, ry, _ = geod.gnomonic_project(
        geod.unit_vectors(arr[:, 0], arr[:, 1]), c
    )
    px, py, front = geod.gnomonic_project(
        geod.unit_vectors(lons, lats), c
    )
    want = np.zeros(len(lons), dtype=bool)
    want[front] = kernels.points_in_ring(
        px[front], py[front], np.stack([rx, ry], axis=1)
    )
    assert (got == want).all()


def test_random_wide_polygons_match_oracle():
    """Randomized wide rings (possibly self-intersecting — even-odd
    parity is still well defined and both engines implement it): chart
    parity must equal the densified-planar kernel everywhere."""
    rng = np.random.default_rng(13)
    for trial in range(8):
        n_v = int(rng.integers(5, 11))
        lons = np.sort(rng.uniform(-170.0, 170.0, n_v))
        if lons[-1] - lons[0] < 200.0:
            lons = lons * (260.0 / max(lons[-1] - lons[0], 1.0))
            lons = np.clip(lons, -175.0, 175.0)
        top = rng.uniform(10.0, 60.0, n_v)
        bot = rng.uniform(-60.0, -10.0, n_v)
        ring = (
            [[float(x), float(y)] for x, y in zip(lons, top)]
            + [[float(x), float(y)]
               for x, y in zip(lons[::-1], bot[::-1])]
        )
        ring.append(ring[0])
        plons = rng.uniform(-180.0, 180.0, 800)
        plats = rng.uniform(-80.0, 80.0, 800)
        got = geod._points_in_polygon_chart_ray(plons, plats, [ring])
        want = _densified_planar_oracle([ring], plons, plats)
        assert (got == want).all(), "trial %d mismatch" % trial


def test_wedge_cover_composes():
    """polygon_cover(edges='geodesic') inherits the wedge kernel via its
    corner tests: a >hemisphere barrel gets a complete, sound cover."""
    from pure_python_geospatial_export_spark.geo import cells as cellmod

    ring = _barrel(SYM_LONS)
    res = 5
    cover = cellmod.polygon_cover([ring], res, edges="geodesic")
    assert cover
    covered = {c for c, _ in cover}
    full = {c for c, f in cover if f}
    rng = np.random.default_rng(10)
    lons = rng.uniform(-180.0, 180.0, 4000)
    lats = rng.uniform(-60.0, 60.0, 4000)
    inside = geod.points_in_polygon_geodesic(lons, lats, [ring])
    ids = cellmod.cell_id(lons, lats, res)
    assert all(int(c) in covered for c in ids[inside])
    in_full = np.array([int(c) in full for c in ids])
    assert inside[in_full].all()
    assert full, "a 300-deg barrel at res 5 must have interior cells"
