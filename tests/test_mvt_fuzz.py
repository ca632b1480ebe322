"""Property-based fuzz for the MVT codec: arbitrary geometry survives
encode -> independent-decode with the documented invariants (winding,
vertex preservation up to direction, value round-trips)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pure_python_geospatial_export_spark.geo import mvt

coord = st.integers(min_value=0, max_value=4096)
point = st.tuples(coord, coord)


@settings(max_examples=200, deadline=None)
@given(st.lists(point, min_size=1, max_size=12))
def test_point_runs_roundtrip(pts):
    cmds = mvt.encode_geometry(mvt.GEOM_POINT, [pts])
    parts = mvt.geometry_parts(mvt.decode_geometry(cmds))
    assert parts == [list(pts)]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(point, min_size=2, max_size=10),
                min_size=1, max_size=4))
def test_linestrings_roundtrip(lines):
    cmds = mvt.encode_geometry(mvt.GEOM_LINESTRING, lines)
    if cmds is None:
        # every line collapsed to < 2 distinct points
        assert all(
            len({tuple(p) for p in ln}) < 2 for ln in lines
        )
        return
    parts = mvt.geometry_parts(mvt.decode_geometry(cmds))
    expected = []
    for ln in lines:
        dedup = [ln[0]]
        for p in ln[1:]:
            if p != dedup[-1]:
                dedup.append(p)
        if len(dedup) >= 2:
            expected.append([tuple(p) for p in dedup])
    assert parts == expected


@settings(max_examples=300, deadline=None)
@given(st.lists(point, min_size=3, max_size=16))
def test_polygon_ring_invariants(ring):
    cmds = mvt.encode_geometry(mvt.GEOM_POLYGON, [ring])
    # degenerate (collinear / duplicate-collapsed) rings may drop
    if cmds is None:
        return
    parts = mvt.geometry_parts(mvt.decode_geometry(cmds))
    assert len(parts) == 1
    out = parts[0]
    # exterior winding enforced
    assert mvt._ring_area2(out) > 0
    # vertex multiset preserved up to direction/rotation of traversal
    def dedup_cycle(pts):
        d = [pts[0]]
        for p in pts[1:]:
            if tuple(p) != tuple(d[-1]):
                d.append(tuple(p))
        d = [tuple(x) for x in d]
        if len(d) > 1 and d[0] == d[-1]:
            d = d[:-1]
        return d
    src = dedup_cycle([tuple(p) for p in ring])
    assert set(out) == set(src)
    assert len(out) == len(src)


@settings(max_examples=150, deadline=None)
@given(st.dictionaries(
    st.text(min_size=1, max_size=8),
    st.one_of(
        st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=20),
    ),
    max_size=6,
))
def test_property_values_roundtrip(props):
    feats = [{"id": 1, "type": mvt.GEOM_POINT,
              "parts": [[(7, 9)]], "properties": props}]
    tile = mvt.decode_tile(
        mvt.encode_tile([mvt.encode_layer("l", feats)])
    )
    (f,) = tile["layers"][0]["features"]
    assert f["properties"] == props


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**62),
        coord, coord,
    ),
    min_size=1, max_size=60,
))
def test_fast_point_layer_always_matches_generic(rows):
    import numpy as np

    ids = np.array([r[0] for r in rows], dtype=np.int64)
    us = np.array([r[1] for r in rows], dtype=np.int64)
    vs = np.array([r[2] for r in rows], dtype=np.int64)
    feats = [
        {"id": int(i), "type": mvt.GEOM_POINT,
         "parts": [[(int(u), int(v))]], "properties": {}}
        for i, u, v in rows
    ]
    assert (mvt.encode_point_layer_fast(ids, us, vs, "p")
            == mvt.encode_layer("p", feats))
