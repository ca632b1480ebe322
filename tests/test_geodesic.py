"""Geodesic (great-circle-edge) containment, covers, and join wiring.

Ground truth for the kernel: a planar polygon whose edges are densified
along the great circles at a ~0.6 m sagitta bound — chords converge to
the arcs, so the planar ray cast on the densified ring equals geodesic
containment except within ~1e-7 rad of the boundary (random test points
never land there).
"""

import numpy as np
import pytest

from pure_python_geospatial_export_spark.geo import cells, geodesic, kernels

# great circle between (-60,45) and (60,45) culminates at lat
# atan(tan(45)/cos(60)) = 63.43 at lon 0 — a strongly bulging edge
BULGE_TRIANGLE = [
    [-60.0, 45.0], [60.0, 45.0], [0.0, 80.0], [-60.0, 45.0],
]


def test_geodesic_vs_planar_bulge():
    lon = np.array([0.0, 0.0, 0.0, 0.0])
    lat = np.array([55.0, 70.0, 44.0, 81.0])
    geo = geodesic.points_in_polygon_geodesic(lon, lat, [BULGE_TRIANGLE])
    planar = kernels.points_in_polygon(lon, lat, [BULGE_TRIANGLE])
    # (0,55): above the planar chord (lat 45) but BELOW the geodesic
    # edge (lat 63.4) -> the two interpretations must disagree
    assert planar[0] and not geo[0]
    # (0,70): inside under both; (0,44)/(0,81): outside under both
    assert geo[1] and planar[1]
    assert not geo[2] and not planar[2]
    assert not geo[3] and not planar[3]


def test_geodesic_kernel_matches_densified_planar_oracle():
    rng = np.random.default_rng(21)
    lon = rng.uniform(-70, 70, 3000)
    lat = rng.uniform(35, 85, 3000)
    geo = geodesic.points_in_polygon_geodesic(lon, lat, [BULGE_TRIANGLE])
    dense = geodesic.densify_ring_geodesic(BULGE_TRIANGLE,
                                           max_sagitta_rad=1e-7)
    planar_dense = kernels.points_in_polygon(lon, lat, [dense])
    assert (geo == planar_dense).all()


def test_geodesic_with_hole_and_multipart():
    outer = [[0.0, 0.0], [30.0, 0.0], [30.0, 30.0], [0.0, 30.0],
             [0.0, 0.0]]
    hole = [[10.0, 10.0], [20.0, 10.0], [20.0, 20.0], [10.0, 20.0],
            [10.0, 10.0]]
    part_b = [[50.0, 50.0], [60.0, 50.0], [60.0, 60.0], [50.0, 60.0],
              [50.0, 50.0]]
    rings = [outer, hole, part_b]
    lon = np.array([15.0, 5.0, 55.0, 40.0])
    lat = np.array([15.0, 5.0, 55.0, 40.0])
    got = geodesic.points_in_polygon_geodesic(lon, lat, rings)
    assert list(got) == [False, True, True, False]  # hole, in, part_b, gap


def test_geodesic_super_hemisphere_falls_back():
    # vertices spread over far more than a hemisphere: since round 3 this
    # no longer raises — the chart-ray fallback evaluates it (equatorial
    # triangle whose edges run along the equator: chart-bounded interior
    # is empty up to the arcs themselves, so parity is even everywhere
    # off the boundary)
    ring = [[0.0, 0.0], [120.0, 0.0], [-120.0, 0.0], [0.0, 0.0]]
    got = geodesic.points_in_polygon_geodesic(
        np.array([0.0, 100.0]), np.array([10.0, -10.0]), [ring]
    )
    assert got.tolist() == [False, False]


def test_densify_preserves_endpoints_and_bounds_sagitta():
    dense = geodesic.densify_ring_geodesic(BULGE_TRIANGLE,
                                           max_sagitta_rad=2e-5)
    assert np.allclose(dense[0], BULGE_TRIANGLE[0])
    assert np.allclose(dense[-1], BULGE_TRIANGLE[-1])
    assert len(dense) > len(BULGE_TRIANGLE)
    # every original vertex appears
    for v in BULGE_TRIANGLE:
        assert (np.isclose(dense[:, 0], v[0])
                & np.isclose(dense[:, 1], v[1])).any()
    # densified curve reaches the culmination latitude ~63.43
    assert dense[:, 1].max() > 63.0


def test_geodesic_cover_completeness_and_full_soundness():
    res = 6
    cover = cells.polygon_cover([BULGE_TRIANGLE], res, edges="geodesic")
    assert cover
    covered = {c for c, _ in cover}
    full = {c for c, f in cover if f}
    assert full, "a continental polygon at res 6 must have full cells"

    rng = np.random.default_rng(33)
    lon = rng.uniform(-70, 70, 4000)
    lat = rng.uniform(35, 85, 4000)
    inside = geodesic.points_in_polygon_geodesic(lon, lat,
                                                 [BULGE_TRIANGLE])
    ids = cells.cell_id(lon, lat, res)
    assert all(int(c) in covered for c in ids[inside])
    in_full = np.array([int(c) in full for c in ids])
    assert inside[in_full].all()
    # the planar cover would miss the bulge band around lat 60 at lon 0:
    # the geodesic cover must include the culmination cell
    assert cells.cell_id_scalar(0.0, 63.0, res) in covered


def test_geodesic_kernel_property_random_polygons():
    """Hypothesis-style sweep (deterministic seeds): random convex
    sub-hemisphere polygons anywhere on the globe — the geodesic kernel
    must agree with the densified-planar oracle everywhere."""
    rng = np.random.default_rng(99)
    for trial in range(12):
        clon = float(rng.uniform(-180, 180))
        clat = float(rng.uniform(-70, 70))
        radius = float(rng.uniform(5, 35))  # degrees of arc
        nv = int(rng.integers(3, 9))
        angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
        # vertices: offsets around (clon, clat) — convex-ish by angle sort
        vlat = clat + radius * np.sin(angles)
        vlon = clon + radius * np.cos(angles) / max(
            np.cos(np.radians(clat)), 0.3)
        vlon = (vlon + 180.0) % 360.0 - 180.0
        ring = [[float(lo), float(la)] for lo, la in zip(vlon, vlat)]
        ring.append(ring[0])

        lon = rng.uniform(clon - 50, clon + 50, 400)
        lon = (lon + 180.0) % 360.0 - 180.0
        lat = np.clip(rng.uniform(clat - 50, clat + 50, 400), -89.9, 89.9)
        geo = geodesic.points_in_polygon_geodesic(lon, lat, [ring])
        dense = geodesic.densify_ring_geodesic(ring, max_sagitta_rad=1e-7)
        planar = kernels.points_in_polygon(lon, lat, [dense])
        # densified chords cross the antimeridian as planar jumps when
        # the polygon straddles it — restrict the oracle comparison to
        # seam-free trials
        if np.abs(np.diff(dense[:, 0])).max() < 180.0:
            assert (geo == planar).all(), "trial %d" % trial


ANTIMERIDIAN_RING = [
    [170.0, -10.0], [-170.0, -10.0], [-170.0, 10.0], [170.0, 10.0],
    [170.0, -10.0],
]


def test_geodesic_kernel_crosses_antimeridian():
    lon = np.array([179.5, -179.5, 160.0, -160.0, 175.0])
    lat = np.array([0.0, 0.0, 0.0, 0.0, 30.0])
    got = geodesic.points_in_polygon_geodesic(lon, lat,
                                              [ANTIMERIDIAN_RING])
    assert list(got) == [True, True, False, False, False]


def test_geodesic_cover_crosses_antimeridian():
    res = 6
    cover = cells.polygon_cover([ANTIMERIDIAN_RING], res,
                                edges="geodesic")
    covered = {c for c, _ in cover}
    full = {c for c, f in cover if f}
    # cells on BOTH sides of the seam
    assert cells.cell_id_scalar(179.0, 0.0, res) in full
    assert cells.cell_id_scalar(-179.0, 0.0, res) in full
    # and nothing leaks to the opposite hemisphere
    assert cells.cell_id_scalar(0.0, 0.0, res) not in covered

    rng = np.random.default_rng(55)
    lon = np.concatenate([rng.uniform(150, 180, 2000),
                          rng.uniform(-180, -150, 2000)])
    lat = rng.uniform(-25, 25, 4000)
    inside = geodesic.points_in_polygon_geodesic(
        lon, lat, [ANTIMERIDIAN_RING])
    assert inside.any() and (~inside).any()
    ids = cells.cell_id(lon, lat, res)
    assert all(int(c) in covered for c in ids[inside])
    in_full = np.array([int(c) in full for c in ids])
    assert inside[in_full].all()


def test_geodesic_cover_polar_cap():
    """A ring encircling the north pole: the pole is interior under the
    geodesic interpretation, so interior cells ABOVE the ring's own
    latitude band must be covered (regression: candidates used to stop
    at the ring bbox)."""
    cap = [[lon, 80.0] for lon in range(-180, 181, 30)]
    res = 5
    # kernel: pole and high-lat points are inside; low-lat outside
    inside = geodesic.points_in_polygon_geodesic(
        np.array([0.0, 120.0, 0.0]), np.array([89.0, 85.0, 70.0]), [cap]
    )
    assert list(inside) == [True, True, False]

    cover = cells.polygon_cover([cap], res, edges="geodesic")
    covered = {c for c, _ in cover}
    full = {c for c, f in cover if f}
    assert cells.cell_id_scalar(0.0, 88.0, res) in covered
    assert cells.cell_id_scalar(120.0, 85.0, res) in full
    assert cells.cell_id_scalar(0.0, 70.0, res) not in covered

    rng = np.random.default_rng(77)
    lon = rng.uniform(-180, 180, 3000)
    lat = rng.uniform(60, 90, 3000)
    pin = geodesic.points_in_polygon_geodesic(lon, lat, [cap])
    ids = cells.cell_id(lon, lat, res)
    assert all(int(c) in covered for c in ids[pin])
    in_full = np.array([int(c) in full for c in ids])
    assert pin[in_full].all()


def test_spatial_join_geodesic_wiring(spark):
    from pure_python_geospatial_export_spark.operators.spatial_join import (
        spatial_join,
    )

    wkt = ("POLYGON ((-60 45, 60 45, 0 80, -60 45))")
    layer = spark.createDataFrame(
        [(1, "bulge", wkt)], ["polygon_id", "name", "wkt"]
    )
    rng = np.random.default_rng(44)
    pts = [(i, float(lo), float(la)) for i, (lo, la) in enumerate(
        zip(rng.uniform(-70, 70, 800), rng.uniform(35, 85, 800)))]
    pdf = spark.createDataFrame(pts, ["pid", "lon", "lat"])

    got = {
        int(r["pid"])
        for r in spatial_join(pdf, layer, res=5,
                              edges="geodesic").collect()
    }
    lon = np.array([p[1] for p in pts])
    lat = np.array([p[2] for p in pts])
    exact = set(np.flatnonzero(geodesic.points_in_polygon_geodesic(
        lon, lat, [BULGE_TRIANGLE])).tolist())
    assert got == exact

    planar = {
        int(r["pid"])
        for r in spatial_join(pdf, layer, res=5, edges="planar").collect()
    }
    assert planar != got  # the bulge band must actually differ

    # the fully-distributed big-layer variant must agree with broadcast
    from pure_python_geospatial_export_spark.operators.spatial_join import (
        spatial_join_big_layer,
    )

    big = {
        int(r["pid"])
        for r in spatial_join_big_layer(pdf, layer, res=5,
                                        edges="geodesic").collect()
    }
    assert big == got
