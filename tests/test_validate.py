"""Geometry validity checking (operators/validate.py)."""

import pytest

from pure_python_geospatial_export_spark.geo import wkt as wktmod
from pure_python_geospatial_export_spark.operators.validate import (
    validate_geometries,
    validate_geometry,
    validate_rings,
)


def _v(wkt):
    return validate_geometry(wktmod.loads(wkt))


def test_valid_shapes():
    assert _v("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))") == (True, None)
    assert _v(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(2 2, 8 2, 8 8, 2 8, 2 2))"
    ) == (True, None)
    # non-areal types have no ring structure to check
    assert _v("POINT (1 2)") == (True, None)
    assert _v("LINESTRING (0 0, 1 1, 0 1)") == (True, None)
    assert _v(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((5 5, 6 5, 6 6, 5 6, 5 5)))"
    ) == (True, None)


def test_bowtie_self_intersection():
    assert _v("POLYGON ((0 0, 4 0, 0 4, 4 4, 0 0))") == (
        False, "self_intersection",
    )


def test_open_ring():
    assert _v("POLYGON ((0 0, 4 0, 4 4, 0 4))") == (False, "open_ring")


def test_too_few_points():
    assert _v("POLYGON ((0 0, 4 4, 0 0))") == (False, "too_few_points")
    assert validate_rings([]) == (False, "too_few_points")


def test_repeated_point():
    assert _v("POLYGON ((0 0, 4 0, 4 0, 4 4, 0 4, 0 0))") == (
        False, "repeated_point",
    )


def test_spike():
    assert _v("POLYGON ((0 0, 4 0, 6 0, 4 0, 4 4, 0 4, 0 0))") == (
        False, "spike",
    )


def test_rings_cross_vs_touch():
    # hole properly crossing the shell wall
    assert _v(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(5 5, 15 5, 15 8, 5 8, 5 5))"
    ) == (False, "rings_cross")
    # hole touching the shell at one vertex: allowed (no proper cross)
    assert _v(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(0 0, 3 3, 1 4, 0 0))"
    ) == (True, None)


def test_multipolygon_reports_first_bad_member():
    assert _v(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((5 5, 9 5, 5 9, 9 9, 5 5)))"
    ) == (False, "self_intersection")


def test_dataframe_op(spark):
    rows = [
        (1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        (2, "POLYGON ((0 0, 4 0, 0 4, 4 4, 0 0))"),
        (3, "POLYGON ((oops"),
        (4, "POINT (1 2)"),
    ]
    df = spark.createDataFrame(rows, "id long, wkt string")
    got = {
        r["id"]: (r["is_valid"], r["reason"])
        for r in validate_geometries(df).collect()
    }
    assert got == {
        1: (True, None),
        2: (False, "self_intersection"),
        3: (False, "unparseable"),
        4: (True, None),
    }


def test_kernel_adjacent_edges_not_flagged():
    from pure_python_geospatial_export_spark.geo.kernels import (
        ring_self_intersects,
    )
    import numpy as np

    rect = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                     [0.0, 0.0]])
    assert not ring_self_intersects(rect)
    bow = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0], [4.0, 4.0],
                    [0.0, 0.0]])
    assert ring_self_intersects(bow)
    # concave but simple
    star = np.array([[0.0, 0.0], [4.0, 1.0], [8.0, 0.0], [4.0, 6.0],
                     [0.0, 0.0]])
    assert not ring_self_intersects(star)
