"""Geometry-kernel golden tests — vectorized numpy vs reference-recorded
behavior (tests/fixtures/golden_kernels.json, see generate_golden_kernels.py).

Covers the ray-cast PIP predicate (ref ppge/pyshp/__init__.py:253-295)
including boundary/vertex probes, signed area / orientation (:201-222),
ring_sample (:298-343) and organize_polygon_rings (:351-473).
"""

import json
import os

import numpy as np
import pytest

from pure_python_geospatial_export_spark.geo import kernels

HERE = os.path.dirname(__file__)
with open(os.path.join(HERE, "fixtures", "golden_kernels.json")) as f:
    GOLDEN = json.load(f)

POINTS = np.asarray(GOLDEN["points"], dtype=np.float64)
RING_NAMES = sorted(GOLDEN["rings"])


@pytest.mark.parametrize("name", RING_NAMES)
def test_points_in_ring_matches_reference(name):
    ring = np.asarray(GOLDEN["rings"][name], dtype=np.float64)
    got = kernels.points_in_ring(POINTS[:, 0], POINTS[:, 1], ring)
    expected = np.asarray(GOLDEN["pip"][name], dtype=bool)
    mismatches = np.flatnonzero(got != expected)
    assert mismatches.size == 0, (
        "PIP mismatch for %s at points %s"
        % (name, POINTS[mismatches[:5]].tolist())
    )


@pytest.mark.parametrize("name", RING_NAMES)
def test_signed_area_and_orientation(name):
    ring = GOLDEN["rings"][name]
    assert kernels.signed_area(ring) == pytest.approx(
        GOLDEN["area"][name], rel=1e-12)
    assert kernels.is_cw(ring) == GOLDEN["is_cw"][name]


@pytest.mark.parametrize("name", RING_NAMES)
def test_ring_sample(name):
    ring = GOLDEN["rings"][name]
    got = kernels.ring_sample(ring, ccw=not kernels.is_cw(ring))
    assert list(got) == GOLDEN["sample"][name]


@pytest.mark.parametrize("name", sorted(GOLDEN["organize"]))
def test_organize_polygon_rings(name):
    case = GOLDEN["organize"][name]
    errors = {}
    got = kernels.organize_polygon_rings(case["input"], errors)
    assert got == case["polys"]
    assert errors == case["errors"]


def test_points_in_polygon_hole_semantics():
    outer = GOLDEN["rings"]["concave"]
    hole = GOLDEN["rings"]["hole"]
    # (2,2) falls in the hole, (6,8) in the solid part, (9,5) in the notch
    px = np.array([2.0, 6.0, 9.0])
    py = np.array([2.0, 8.0, 5.0])
    got = kernels.points_in_polygon(px, py, [outer, hole])
    assert got.tolist() == [False, True, False]


def test_bbox_predicates():
    assert kernels.bbox_overlap((0, 0, 2, 2), (1, 1, 3, 3))
    assert not kernels.bbox_overlap((0, 0, 1, 1), (2, 2, 3, 3))
    # touching edges DO overlap (<=/>= semantics, ref :237-242)
    assert kernels.bbox_overlap((0, 0, 1, 1), (1, 1, 2, 2))
    assert kernels.bbox_contains((0, 0, 10, 10), (1, 1, 2, 2))
    # strict containment: equal edges do NOT contain (ref :245-250)
    assert not kernels.bbox_contains((0, 0, 10, 10), (0, 1, 2, 2))


def test_ring_contains_ring():
    outer = [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]]
    inner = [[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]]
    assert kernels.ring_contains_ring(outer, inner)
    assert not kernels.ring_contains_ring(inner, outer)


def test_rewind():
    ring = [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.0, 0.0]]
    assert kernels.rewind(ring) == list(reversed(ring))
    assert kernels.is_cw(ring) != kernels.is_cw(kernels.rewind(ring))


def test_pip_chunking_consistency():
    """Chunked evaluation must equal unchunked (exercise >1 chunk)."""
    rng = np.random.default_rng(42)
    px = rng.uniform(-2, 12, size=10000)
    py = rng.uniform(-2, 12, size=10000)
    ring = np.asarray(GOLDEN["rings"]["concave"])
    full = kernels.points_in_ring(px, py, ring)
    parts = np.concatenate(
        [kernels.points_in_ring(px[i:i + 100], py[i:i + 100], ring)
         for i in range(0, 10000, 100)]
    )
    assert (full == parts).all()
