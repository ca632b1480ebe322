"""Polygon dissolve: exact self-overlap pairs + connected groups."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pure_python_geospatial_export_spark.operators.dissolve import (
    dissolve,
    dissolve_groups,
    polygon_self_overlap_pairs,
)


def _rect_wkt(x0, y0, x1, y1):
    return (
        "POLYGON ((%g %g, %g %g, %g %g, %g %g, %g %g))"
        % (x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)
    )


def _rects_df(spark, rects):
    return spark.createDataFrame(
        [(int(i), _rect_wkt(*r)) for i, r in rects], "id long, wkt string"
    )


def test_chain_singleton_touch_and_malformed(spark):
    rows = [
        (1, (0.0, 0.0, 2.0, 2.0)),   # A overlaps B
        (2, (1.0, 1.0, 3.0, 3.0)),   # B overlaps C
        (3, (2.5, 2.5, 4.0, 4.0)),   # C
        (4, (10.0, 10.0, 11.0, 11.0)),  # isolated
        (5, (20.0, 20.0, 21.0, 21.0)),  # corner-touches 6
        (6, (21.0, 21.0, 22.0, 22.0)),
    ]
    df = _rects_df(spark, rows).unionByName(
        spark.createDataFrame([(7, "POLYGON ((oops")],
                              "id long, wkt string")
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in polygon_self_overlap_pairs(df, res=5).collect()
    }
    assert pairs == {(1, 2), (2, 3), (5, 6)}
    labels = {
        r["id"]: r["group_id"] for r in dissolve(df, res=5).collect()
    }
    # malformed row 7 drops entirely
    assert labels == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}
    groups = {
        r["group_id"]: r for r in dissolve_groups(df, res=5).collect()
    }
    assert groups[1]["n_members"] == 3
    assert groups[1]["xmin"] == 0.0 and groups[1]["xmax"] == 4.0
    assert groups[4]["n_members"] == 1
    assert groups[5]["n_members"] == 2


def test_hole_interior_does_not_merge(spark):
    donut = (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(2 2, 8 2, 8 8, 2 8, 2 2))"
    )
    inner = _rect_wkt(4.0, 4.0, 6.0, 6.0)      # wholly inside the hole
    crosser = _rect_wkt(7.0, 4.0, 9.0, 6.0)    # spans the hole wall
    df = spark.createDataFrame(
        [(1, donut), (2, inner), (3, crosser)], "id long, wkt string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in polygon_self_overlap_pairs(df, res=4).collect()
    }
    assert pairs == {(1, 3)}
    assert {
        (r["id_a"], r["id_b"])
        for r in polygon_self_overlap_pairs(
            df, res=4, strategy="grouped"
        ).collect()
    } == {(1, 3)}
    labels = {
        r["id"]: r["group_id"] for r in dissolve(df, res=4).collect()
    }
    assert labels == {1: 1, 2: 2, 3: 1}


def _brute_union_find(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


@pytest.mark.parametrize("res", [3, 6])
def test_random_rects_match_bruteforce(spark, res):
    rng = np.random.default_rng(42)
    rects = []
    for i in range(80):
        x0 = rng.uniform(-170, 160)
        y0 = rng.uniform(-80, 70)
        w, h = rng.uniform(0.5, 12, 2)
        rects.append((i, (x0, y0, x0 + w, y0 + h)))
    df = _rects_df(spark, rects)
    got = {
        (r["id_a"], r["id_b"])
        for r in polygon_self_overlap_pairs(df, res=res).collect()
    }
    grouped = {
        (r["id_a"], r["id_b"])
        for r in polygon_self_overlap_pairs(
            df, res=res, strategy="grouped"
        ).collect()
    }
    assert grouped == got
    want = set()
    for i, (ax0, ay0, ax1, ay1) in rects:
        for j, (bx0, by0, bx1, by1) in rects:
            if i < j and ax0 <= bx1 and bx0 <= ax1 \
                    and ay0 <= by1 and by0 <= ay1:
                want.add((i, j))
    assert got == want
    labels = {
        r["id"]: r["group_id"] for r in dissolve(df, res=res).collect()
    }
    assert labels == _brute_union_find(
        [i for i, _ in rects], sorted(want)
    )


def test_duplicate_ids_no_self_pairs_both_strategies(spark):
    # two rows share id 1 and overlap each other and row 2: neither
    # strategy may emit a (1, 1) self-pair
    df = spark.createDataFrame(
        [
            (1, _rect_wkt(0.0, 0.0, 2.0, 2.0)),
            (1, _rect_wkt(0.5, 0.5, 2.5, 2.5)),
            (2, _rect_wkt(1.0, 1.0, 3.0, 3.0)),
        ],
        "id long, wkt string",
    )
    for strategy in ("join", "grouped"):
        got = [
            (r["id_a"], r["id_b"])
            for r in polygon_self_overlap_pairs(
                df, res=5, strategy=strategy
            ).collect()
        ]
        assert all(a < b for a, b in got), (strategy, got)
        assert set(got) == {(1, 2)}, (strategy, got)


def test_max_bucket_above_family_size_identical(spark):
    rows = [(i, (float(i) * 0.5, 0.0, float(i) * 0.5 + 1.0, 1.0))
            for i in range(10)]
    df = _rects_df(spark, rows)
    base = {
        (r["id_a"], r["id_b"])
        for r in polygon_self_overlap_pairs(df, res=5).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in polygon_self_overlap_pairs(
            df, res=5, max_bucket=100
        ).collect()
    }
    assert base == capped and len(base) > 0


def test_geodesic_edges_merge_via_arc_bulge(spark):
    # planar-disjoint (a stays at lat<=40, b starts at 47), but a's
    # 80-degree top chord at lat 40 bows poleward to ~47.6 under
    # great-circle edges, sweeping across b's SW/SE corners
    a = "POLYGON ((-40 40, 40 40, 0 38, -40 40))"
    b = "POLYGON ((-10 47, 10 47, 10 49, -10 49, -10 47))"
    df = spark.createDataFrame(
        [(1, a), (2, b)], "id long, wkt string"
    )
    planar = polygon_self_overlap_pairs(df, res=4).collect()
    geo = polygon_self_overlap_pairs(df, res=4, edges="geodesic") \
        .collect()
    # planar: the triangles are disjoint (gap between 40 and 46);
    # geodesic: the 80-degree chord at lat 40/46 bows ~5-6 degrees
    # poleward, so polygon a's top edge crosses into polygon b
    assert planar == []
    assert {(r["id_a"], r["id_b"]) for r in geo} == {(1, 2)}


def test_non_areal_rows_stay_singletons(spark):
    df = spark.createDataFrame(
        [
            (1, _rect_wkt(0.0, 0.0, 2.0, 2.0)),
            (2, "LINESTRING (0 0, 2 2)"),
        ],
        "id long, wkt string",
    )
    assert polygon_self_overlap_pairs(df, res=5).collect() == []
    labels = {
        r["id"]: r["group_id"] for r in dissolve(df, res=5).collect()
    }
    assert labels == {1: 1, 2: 2}
