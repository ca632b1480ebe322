"""Douglas-Peucker simplification (geo/kernels.simplify_line/_ring)."""

import numpy as np

from pure_python_geospatial_export_spark.geo import kernels


def _max_deviation(orig, simp):
    """Max distance from any original vertex to the simplified
    polyline's segments."""
    worst = 0.0
    for p in orig:
        best = float("inf")
        for i in range(len(simp) - 1):
            a, b = simp[i], simp[i + 1]
            seg = b - a
            L2 = float(seg @ seg)
            t = 0.0 if L2 == 0 else float(
                np.clip((p - a) @ seg / L2, 0.0, 1.0)
            )
            best = min(best, float(np.hypot(*(a + t * seg - p))))
        worst = max(worst, best)
    return worst


def test_simplify_line_known_case():
    line = np.array([
        [0.0, 0.0], [1.0, 0.05], [2.0, -0.04], [3.0, 0.02], [4.0, 0.0],
        [5.0, 3.0], [6.0, 0.0],
    ])
    out = kernels.simplify_line(line, 0.1)
    assert (out[0] == line[0]).all() and (out[-1] == line[-1]).all()
    # the spike at x=5 survives; the 0.05-noise collinear run collapses
    assert [5.0, 3.0] in out.tolist()
    assert len(out) <= 4
    # every kept vertex is an original vertex (subset property)
    orig = {tuple(p) for p in line.tolist()}
    assert all(tuple(p) in orig for p in out.tolist())


def test_simplify_line_error_bound_random():
    rng = np.random.default_rng(5)
    t = np.linspace(0, 4 * np.pi, 400)
    line = np.column_stack([
        t, np.sin(t) + rng.normal(0, 0.01, len(t)),
    ])
    for tol in (0.05, 0.2, 0.8):
        out = kernels.simplify_line(line, tol)
        assert len(out) < len(line)
        assert _max_deviation(line, out) <= tol + 1e-12
        # monotone: larger tolerance never keeps more vertices
    n = [len(kernels.simplify_line(line, tol))
         for tol in (0.05, 0.2, 0.8)]
    assert n[0] >= n[1] >= n[2] >= 2


def test_simplify_ring_closed_and_bounded():
    t = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    r = 10.0 + 0.05 * np.sin(17 * t)
    ring = np.column_stack([r * np.cos(t), r * np.sin(t)])
    ring = np.concatenate([ring, ring[:1]])
    out = kernels.simplify_ring(ring, 0.2)
    assert out is not None
    assert (out[0] == out[-1]).all()
    assert 3 <= len(out) - 1 < 200
    # kept vertices are original vertices
    orig = {tuple(p) for p in ring.tolist()}
    assert all(tuple(p) in orig for p in out.tolist())
    # area approximately preserved at small tolerance
    a0 = abs(kernels.signed_area(ring))
    a1 = abs(kernels.signed_area(out))
    assert abs(a1 - a0) / a0 < 0.05


def test_simplify_ring_collapses_subtolerance_feature():
    tiny = np.array([
        [0.0, 0.0], [0.01, 0.0], [0.01, 0.01], [0.0, 0.01], [0.0, 0.0],
    ])
    assert kernels.simplify_ring(tiny, 1.0) is None
    # degenerate inputs
    assert kernels.simplify_ring(tiny[:2], 0.1) is None
    line2 = np.array([[0.0, 0.0], [1.0, 1.0]])
    out = kernels.simplify_line(line2, 10.0)
    assert (out == line2).all()


def test_simplify_wkt_column(spark):
    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        simplify_wkt,
    )
    from pure_python_geospatial_export_spark.session import local_df

    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    ring = np.column_stack([
        10 * np.cos(t) + 0.02 * np.sin(31 * t), 10 * np.sin(t),
    ])
    ring = np.concatenate([ring, ring[:1]])
    poly = wktmod.dumps(
        {"type": "Polygon", "coordinates": [ring.tolist()]}, 12
    )
    rows = [
        (1, poly),
        (2, "LINESTRING (0 0, 1 0.001, 2 0, 3 5, 4 0)"),
        (3, "POINT (3 4)"),
        (4, "POLYGON ((0 0, 0.001 0, 0.001 0.001, 0 0))"),  # collapses
        (5, "not a geometry"),
    ]
    df = local_df(spark, rows, ["gid", "wkt"])
    got = {r["gid"]: r["wkt_simplified"]
           for r in simplify_wkt(df, 0.1).collect()}
    g1 = wktmod.loads(got[1])
    assert g1["type"] == "Polygon"
    assert 3 <= len(g1["coordinates"][0]) - 1 < 100
    g2 = wktmod.loads(got[2])
    assert g2["coordinates"] == [[0, 0], [2, 0], [3, 5], [4, 0]] or \
        len(g2["coordinates"]) <= 4
    assert got[3] == "POINT (3.000000000000 4.000000000000)"
    assert got[4] is None
    assert got[5] is None


def test_simplify_never_promotes_hole_to_exterior(spark):
    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        simplify_wkt,
    )
    from pure_python_geospatial_export_spark.session import local_df

    # flat-band exterior collapses at tol=1.0; the V-shaped hole spans
    # the band's full height and survives
    ext = [[0.0, 0.0], [20.0, 0.0], [20.0, 0.4], [0.0, 0.4], [0.0, 0.0]]
    hole = [[2.0, 0.1], [18.0, 0.1], [10.0, 0.35], [2.0, 0.1]]
    poly = wktmod.dumps(
        {"type": "Polygon", "coordinates": [ext, hole]}, 12
    )
    df = local_df(spark, [(1, poly)], ["gid", "wkt"])
    got = simplify_wkt(df, 1.0).collect()[0]["wkt_simplified"]
    assert got is None  # exterior collapsed -> polygon gone, no
    #                     hole-promoted inversion
