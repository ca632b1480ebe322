"""Exact polygon-intersects kernel + the polygon-overlap spatial join."""

import numpy as np

from pure_python_geospatial_export_spark.geo import kernels


def sq(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]


DONUT = [sq(0, 0, 10, 10), sq(3, 3, 7, 7)]  # exterior + hole


def test_polygons_intersect_cases():
    cases = [
        ([sq(2, -1, 4, 11)], True),    # crosses straight through
        ([sq(1, 1, 2, 2)], True),      # inside the solid part
        ([sq(-5, -5, 15, 15)], True),  # contains the donut
        ([sq(20, 20, 30, 30)], False),  # disjoint
        ([sq(10, 10, 12, 12)], True),  # touches at corner (0-area)
        ([sq(10, 2, 14, 8)], True),    # shares an edge segment
        ([sq(4, 4, 6, 6)], False),     # wholly inside the hole
        ([sq(4, 4, 8, 6)], True),      # straddles the hole boundary
        ([sq(3, 3, 7, 7)], True),      # exactly the hole ring: touch
    ]
    for probe, want in cases:
        assert kernels.polygons_intersect(probe, DONUT) == want, probe
        assert kernels.polygons_intersect(DONUT, probe) == want, probe


def test_segments_intersect_collinear_and_touch():
    a = np.array(sq(0, 0, 2, 2))
    assert kernels.segments_intersect_any(
        a, np.array([[2.0, 1.0], [4.0, 1.0], [4.0, 3.0], [2.0, 1.0]])
    )  # endpoint touches edge
    assert kernels.segments_intersect_any(
        a, np.array([[1.0, 0.0], [3.0, 0.0], [3.0, -2.0], [1.0, 0.0]])
    )  # collinear overlap along y=0
    assert not kernels.segments_intersect_any(
        a, np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]])
    )


def _wkt_poly(rings):
    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    return wktmod.dumps({"type": "Polygon", "coordinates": rings}, 12)


def test_polygon_overlap_join_matches_bruteforce(spark):
    import random

    from pure_python_geospatial_export_spark.operators.spatial_join import (
        polygon_overlap_join,
    )
    from pure_python_geospatial_export_spark.session import local_df

    layer_polys = {
        1: [sq(-20, -10, 15, 25), sq(-5, 0, 5, 10)],  # with hole
        2: [sq(30, 30, 60, 55)],
        3: [sq(-60, -40, -30, -20)],
    }
    layer = local_df(
        spark,
        [(pid, "p%d" % pid, _wkt_poly(r))
         for pid, r in layer_polys.items()],
        ["polygon_id", "name", "wkt"],
    )
    rnd = random.Random(23)
    probes = []
    for i in range(300):
        cx = rnd.uniform(-70, 70)
        cy = rnd.uniform(-50, 60)
        w = rnd.uniform(0.5, 8.0)
        h = rnd.uniform(0.5, 8.0)
        probes.append((i, _wkt_poly([sq(cx, cy, cx + w, cy + h)])))
    # adversarial probes: inside the hole, exactly edge-touching,
    # spanning a whole layer polygon, malformed
    probes += [
        (1000, _wkt_poly([sq(-3, 2, 3, 8)])),        # wholly in hole
        (1001, _wkt_poly([sq(15, -5, 20, 5)])),      # shares x=15 edge
        (1002, _wkt_poly([sq(-25, -15, 20, 30)])),   # contains poly 1
        (1003, "GARBAGE (not wkt)"),
    ]
    pdf = local_df(spark, probes, ["probe_id", "wkt"])
    got = {
        (r["probe_id"], r["polygon_id"])
        for r in polygon_overlap_join(pdf, layer, res=5).collect()
    }
    want = set()
    for pid_probe, wkt in probes:
        if pid_probe == 1003:
            continue
        from pure_python_geospatial_export_spark.geo import (
            wkt as wktmod,
        )
        rings = wktmod.loads(wkt)["coordinates"]
        for pid_layer, lr in layer_polys.items():
            if kernels.polygons_intersect(rings, lr):
                want.add((pid_probe, pid_layer))
    assert got == want
    # the adversarial rows behave
    assert (1000, 1) not in got
    assert (1001, 1) in got
    assert (1002, 1) in got
    assert not any(p == 1003 for p, _ in got)
    assert len(got) > 20  # fixture actually produces matches


def test_polygon_overlap_join_partitioning_invariant(spark):
    from pure_python_geospatial_export_spark.operators.spatial_join import (
        polygon_overlap_join,
    )
    from pure_python_geospatial_export_spark.session import local_df

    layer = local_df(
        spark, [(1, "zone", _wkt_poly([sq(0, 0, 20, 20)]))],
        ["polygon_id", "name", "wkt"],
    )
    probes = [
        (i, _wkt_poly([sq(i - 30.0, 5, i - 25.0, 8)]))
        for i in range(60)
    ]
    pdf = local_df(spark, probes, ["probe_id", "wkt"])
    a = sorted(
        (r["probe_id"], r["polygon_id"])
        for r in polygon_overlap_join(pdf, layer, res=6).collect()
    )
    b = sorted(
        (r["probe_id"], r["polygon_id"])
        for r in polygon_overlap_join(
            pdf.repartition(7), layer, res=6
        ).collect()
    )
    assert a == b and a


# ---------------------------------------------------------------------------
# geodesic edges
# ---------------------------------------------------------------------------

BAND = [[[-30.0, 60.0], [30.0, 60.0], [30.0, 70.0], [-30.0, 70.0],
         [-30.0, 60.0]]]
# the great circle through (-30,60)-(30,60) culminates near lat 62.3 at
# lon 0: geodesic BAND bulges north of the planar one


def test_geodesic_intersect_differs_from_planar_where_arcs_bow():
    from pure_python_geospatial_export_spark.geo.geodesic import (
        polygons_intersect_geodesic,
    )

    # well clear of both interpretations
    sliver_below = [sq(-2.0, 57.0, 2.0, 58.5)]
    assert not kernels.polygons_intersect(sliver_below, BAND)
    assert not polygons_intersect_geodesic(sliver_below, BAND)
    # geodesic-only hit: the UPPER edge's arc (70,±30) culminates near
    # lat 71.5 at lon 0 — a probe at 70.5..71 sits above the planar
    # band but inside the geodesic one
    probe_g = [sq(-2.0, 70.5, 2.0, 71.0)]
    assert not kernels.polygons_intersect(probe_g, BAND)
    assert polygons_intersect_geodesic(probe_g, BAND)
    # planar-only hit: at lon 0 the geodesic LOWER boundary sits near
    # 62.3, so lat 60.5..61 is inside planar-BAND but outside
    # geodesic-BAND
    probe_n = [sq(-2.0, 60.5, 2.0, 61.0)]
    assert kernels.polygons_intersect(probe_n, BAND)
    assert not polygons_intersect_geodesic(probe_n, BAND)


def test_geodesic_intersect_matches_densified_planar():
    import random

    from pure_python_geospatial_export_spark.geo.geodesic import (
        densify_ring_geodesic,
        polygons_intersect_geodesic,
    )

    dens = [densify_ring_geodesic(r).tolist() for r in BAND]
    rnd = random.Random(41)
    agree = checked = 0
    for _ in range(150):
        cx = rnd.uniform(-35, 35)
        cy = rnd.uniform(55, 72)
        probe = [sq(cx, cy, cx + rnd.uniform(0.5, 3.0),
                    cy + rnd.uniform(0.5, 3.0))]
        g = polygons_intersect_geodesic(probe, BAND)
        p = kernels.polygons_intersect(probe, dens)
        # skip probes within sagitta slack of the densified boundary
        checked += 1
        agree += int(g == p)
    assert agree >= checked - 2, (agree, checked)


def test_polygon_overlap_join_geodesic(spark):
    import random

    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.geo.geodesic import (
        polygons_intersect_geodesic,
    )
    from pure_python_geospatial_export_spark.operators.spatial_join import (
        polygon_overlap_join,
    )
    from pure_python_geospatial_export_spark.session import local_df

    layer = local_df(
        spark, [(1, "band", _wkt_poly(BAND))],
        ["polygon_id", "name", "wkt"],
    )
    rnd = random.Random(43)
    probes = []
    for i in range(150):
        cx = rnd.uniform(-35, 35)
        cy = rnd.uniform(55, 72)
        probes.append(
            (i, _wkt_poly([sq(cx, cy, cx + rnd.uniform(0.5, 3.0),
                              cy + rnd.uniform(0.5, 3.0))]))
        )
    pdf = local_df(spark, probes, ["probe_id", "wkt"])
    got = {
        r["probe_id"]
        for r in polygon_overlap_join(
            pdf, layer, res=5, edges="geodesic"
        ).collect()
    }
    want = {
        i for i, w in probes
        if polygons_intersect_geodesic(
            wktmod.loads(w)["coordinates"], BAND
        )
    }
    assert got == want and want


# ---------------------------------------------------------------------------
# LineString probes (routes-through-regions)
# ---------------------------------------------------------------------------

def test_lines_intersect_polygon_cases():
    cases = [
        ([[[-5.0, 5.0], [15.0, 5.0]]], True),    # crosses through
        ([[[1.0, 1.0], [2.0, 2.0]]], True),      # wholly inside solid
        ([[[4.0, 4.0], [6.0, 6.0]]], False),     # wholly inside hole
        ([[[4.0, 4.0], [9.0, 6.0]]], True),      # exits the hole
        ([[[20.0, 20.0], [30.0, 30.0]]], False),  # disjoint
        ([[[10.0, 2.0], [14.0, 2.0]]], True),    # starts ON boundary
        # multiline: one part disjoint, one crossing
        ([[[20.0, 20.0], [30.0, 30.0]],
          [[-5.0, 8.0], [5.0, 8.0]]], True),
    ]
    for lines, want in cases:
        assert kernels.lines_intersect_polygon(lines, DONUT) == want, \
            lines


def test_polygon_overlap_join_linestring_probes(spark):
    import random

    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.spatial_join import (
        polygon_overlap_join,
    )
    from pure_python_geospatial_export_spark.session import local_df

    layer = local_df(
        spark, [(1, "donut", _wkt_poly(DONUT))],
        ["polygon_id", "name", "wkt"],
    )
    rnd = random.Random(51)
    probes = []
    for i in range(200):
        x0 = rnd.uniform(-15, 15)
        y0 = rnd.uniform(-15, 15)
        probes.append((i, wktmod.dumps({
            "type": "LineString",
            "coordinates": [
                [x0, y0],
                [x0 + rnd.uniform(-6, 6), y0 + rnd.uniform(-6, 6)],
                [x0 + rnd.uniform(-6, 6), y0 + rnd.uniform(-6, 6)],
            ],
        }, 12)))
    pdf = local_df(spark, probes, ["probe_id", "wkt"])
    got = {
        r["probe_id"]
        for r in polygon_overlap_join(pdf, layer, res=5).collect()
    }
    want = {
        i for i, w in probes
        if kernels.lines_intersect_polygon(
            [wktmod.loads(w)["coordinates"]], DONUT
        )
    }
    assert got == want and want


def test_arcs_intersect_random_constructive():
    """Randomized with EXACT ground truth by construction: crossing
    pairs share an interior point (two arcs built through one random
    point), disjoint pairs live in angularly separated caps."""
    from pure_python_geospatial_export_spark.geo.geodesic import (
        arcs_intersect_any,
        lonlat_from_vectors,
        unit_vectors,
    )

    rng = np.random.default_rng(61)

    def rand_unit():
        v = rng.standard_normal(3)
        return v / np.linalg.norm(v)

    def arc_through(v, delta):
        t = np.cross(v, rand_unit())
        t /= np.linalg.norm(t)
        a = np.cos(delta) * v - np.sin(delta) * t
        b = np.cos(delta) * v + np.sin(delta) * t
        lon, lat = lonlat_from_vectors(np.stack([a, b]))
        return np.column_stack([lon, lat])

    hits = 0
    for _ in range(200):
        p = rand_unit()
        a1 = arc_through(p, rng.uniform(0.01, 0.4))
        a2 = arc_through(p, rng.uniform(0.01, 0.4))
        assert arcs_intersect_any(a1, a2), (a1, a2)
        hits += 1

    for _ in range(200):
        c1, c2 = rand_unit(), rand_unit()
        sep = np.arccos(np.clip(c1 @ c2, -1, 1))
        r1 = rng.uniform(0.01, 0.2)
        r2 = rng.uniform(0.01, 0.2)
        if sep < r1 + r2 + 0.05:
            continue  # caps not separated; skip
        a1 = arc_through(c1, r1 * 0.99)
        a2 = arc_through(c2, r2 * 0.99)
        assert not arcs_intersect_any(a1, a2), (sep, r1, r2)
    assert hits == 200


def test_planar_segments_intersect_random_constructive():
    """Planar twin of the constructive arc test: crossing pairs share
    an interior point, disjoint pairs live in separated disks."""
    rng = np.random.default_rng(67)

    def seg_through(p, r):
        ang = rng.uniform(0, 2 * np.pi)
        d = np.array([np.cos(ang), np.sin(ang)])
        return np.stack([p - r * d, p + r * d])

    for _ in range(200):
        p = rng.uniform(-100, 100, 2)
        s1 = seg_through(p, rng.uniform(0.1, 5.0))
        s2 = seg_through(p, rng.uniform(0.1, 5.0))
        assert kernels.segments_intersect_any(s1, s2)

    for _ in range(200):
        c1 = rng.uniform(-100, 100, 2)
        c2 = rng.uniform(-100, 100, 2)
        r1, r2 = rng.uniform(0.1, 5.0, 2)
        if np.linalg.norm(c1 - c2) < r1 + r2 + 0.1:
            continue
        s1 = seg_through(c1, r1 * 0.99)
        s2 = seg_through(c2, r2 * 0.99)
        assert not kernels.segments_intersect_any(s1, s2)
