"""Hypothesis fuzz for the geohash codec: encode == textbook
bisection for arbitrary doubles (including the generator's love of
boundary values), decode inverts encode, covers contain their
polygons' points."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pure_python_geospatial_export_spark.geo.geohash import (
    decode_geohash,
    encode_geohash,
    geohash_center,
)
from tests.test_geohash import _classic

lons = st.floats(min_value=-180.0, max_value=180.0,
                 allow_nan=False, allow_infinity=False)
lats = st.floats(min_value=-90.0, max_value=90.0,
                 allow_nan=False, allow_infinity=False)
precisions = st.integers(min_value=1, max_value=12)


@settings(max_examples=300, deadline=None)
@given(lon=lons, lat=lats, precision=precisions)
def test_encode_matches_bisection(lon, lat, precision):
    assert (
        str(encode_geohash([lon], [lat], precision)[0])
        == _classic(lon, lat, precision)
    )


@settings(max_examples=200, deadline=None)
@given(lon=lons, lat=lats, precision=precisions)
def test_roundtrip_invariants(lon, lat, precision):
    gh = encode_geohash([lon], [lat], precision)
    x0, y0, x1, y1 = decode_geohash(gh)
    # the cell contains the point (right-edge clamp means lon=180 /
    # lat=90 land in the last cell, whose open upper edge equals the
    # domain maximum)
    assert x0[0] <= lon and (lon < x1[0] or lon == 180.0)
    assert y0[0] <= lat and (lat < y1[0] or lat == 90.0)
    # re-encoding the center reproduces the geohash
    clon, clat = geohash_center(gh)
    assert (encode_geohash(clon, clat, precision) == gh).all()
    # prefix nesting: every coarser precision is a string prefix
    for p in range(1, precision):
        assert (
            str(encode_geohash([lon], [lat], p)[0])
            == str(gh[0])[:p]
        )


@settings(max_examples=60, deadline=None)
@given(
    data=st.lists(
        st.tuples(lons, lats), min_size=1, max_size=30
    ),
    precision=st.integers(min_value=1, max_value=4),
)
def test_cover_of_bbox_hull_contains_points(data, precision):
    from pure_python_geospatial_export_spark.geo.geohash import (
        geohash_cover,
    )

    pts = np.array(data, dtype=np.float64)
    x0, y0 = pts[:, 0].min(), pts[:, 1].min()
    x1, y1 = pts[:, 0].max() + 1e-6, pts[:, 1].max() + 1e-6
    x1 = min(x1, 180.0)
    y1 = min(y1, 90.0)
    if x0 >= x1 or y0 >= y1:
        return  # degenerate hull
    if x1 - x0 >= 180.0:
        # an edge spanning >= 180 degrees of longitude reads as
        # seam-crossing under the engine's (standard) convention —
        # the lobe split would cover the complement range
        return
    ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
    cover = {g for g, _f in geohash_cover([ring], precision)}
    inside = (
        (pts[:, 0] >= x0) & (pts[:, 0] <= x1)
        & (pts[:, 1] >= y0) & (pts[:, 1] <= y1)
    )
    ghs = encode_geohash(pts[inside, 0], pts[inside, 1], precision)
    assert all(str(g) in cover for g in ghs)
