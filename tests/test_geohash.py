"""Geohash codec: closed form vs classic bisection, Spark/SQL/numpy parity."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from pure_python_geospatial_export_spark.geo.geohash import (
    ALPHABET,
    decode_geohash,
    encode_geohash,
    geohash_center,
    geohash_col,
    geohash_neighbors,
    geohash_sql,
)


def _classic(lon: float, lat: float, precision: int) -> str:
    """Reference implementation: textbook bit-by-bit interval bisection."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2.0
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2.0
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for c in range(precision):
        v = 0
        for b in bits[5 * c:5 * c + 5]:
            v = v * 2 + b
        out.append(ALPHABET[v])
    return "".join(out)


def _rand_points(n=400, seed=7):
    rng = np.random.default_rng(seed)
    lons = rng.uniform(-180.0, 180.0, n)
    lats = rng.uniform(-90.0, 90.0, n)
    return lons, lats


def test_known_vectors():
    assert str(encode_geohash([-5.603], [42.605], 5)[0]) == "ezs42"
    assert (
        str(encode_geohash([10.40744], [57.64911], 11)[0])
        == "u4pruydqqvj"
    )
    assert str(encode_geohash([0.0], [0.0], 1)[0]) == "s"


@pytest.mark.parametrize("precision", [1, 2, 5, 8, 12])
def test_matches_classic_bisection(precision):
    lons, lats = _rand_points()
    got = encode_geohash(lons, lats, precision)
    for lon, lat, g in zip(lons, lats, got):
        assert str(g) == _classic(lon, lat, precision)


def _boundary_points(precision, n_cells=300, seed=13):
    """Doubles straddling cell edges: each edge's exact value plus its
    nextafter neighbors on both sides — where the naive fast-floor
    quantization diverged from bisection before the exactness fix."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits - lon_bits
    rng = np.random.default_rng(seed)
    lons, lats = [], []
    for _ in range(n_cells):
        qx = int(rng.integers(1, 1 << lon_bits))
        qy = int(rng.integers(1, 1 << lat_bits))
        ex = qx * (360.0 / (1 << lon_bits)) - 180.0
        ey = qy * (180.0 / (1 << lat_bits)) - 90.0
        for e, acc in ((ex, lons), (ey, lats)):
            acc.extend([
                e,
                np.nextafter(e, -np.inf),
                np.nextafter(e, np.inf),
            ])
    return np.array(lons), np.array(lats)


@pytest.mark.parametrize("precision", [5, 9, 12])
def test_boundary_adjacent_matches_bisection(precision):
    # the confirmed pre-fix counterexample first
    assert (
        str(encode_geohash([24.916992187499996], [0.0], 5)[0])
        == _classic(24.916992187499996, 0.0, 5)
        == "s818n"
    )
    lons, lats = _boundary_points(precision)
    got = encode_geohash(lons, lats, precision)
    for lon, lat, g in zip(lons, lats, got):
        assert str(g) == _classic(lon, lat, precision), (lon, lat)
    # the roundtrip invariant now holds strictly at boundaries too
    x0, y0, x1, y1 = decode_geohash(got)
    assert (x0 <= lons).all() and (lons < x1).all()
    assert (y0 <= lats).all() and (lats < y1).all()


def test_decode_accepts_noncontiguous_input():
    ghs = np.array(["ezs42", "u4pru", "s0000"])[::2]
    x0, y0, x1, y1 = decode_geohash(ghs)
    assert len(x0) == 2 and (x0 < x1).all()


def test_edge_clamps():
    # lon=180 / lat=90 clamp into the last cell (engine convention,
    # identical to the bisection's >= comparisons)
    for precision in (1, 5, 9):
        got = encode_geohash(
            [180.0, -180.0, 0.0], [90.0, -90.0, 0.0], precision
        )
        assert str(got[0]) == _classic(180.0, 90.0, precision)
        assert str(got[1]) == _classic(-180.0, -90.0, precision)


def test_decode_roundtrip():
    lons, lats = _rand_points(300, seed=11)
    for precision in (3, 7, 12):
        ghs = encode_geohash(lons, lats, precision)
        x0, y0, x1, y1 = decode_geohash(ghs)
        assert (x0 <= lons).all() and (lons < x1 + 1e-12).all()
        assert (y0 <= lats).all() and (lats < y1 + 1e-12).all()
        clon, clat = geohash_center(ghs)
        again = encode_geohash(clon, clat, precision)
        assert (again == ghs).all()


def test_decode_rejects():
    with pytest.raises(ValueError):
        decode_geohash(["ezs42", "u4pr"])  # mixed precision
    with pytest.raises(ValueError):
        decode_geohash(["ezsa2"])  # 'a' not in the alphabet
    with pytest.raises(ValueError):
        decode_geohash(["ez£42"])  # non-ascii


def test_neighbors_adjacency_and_wrap():
    nbrs = geohash_neighbors("ezs42")
    assert len(nbrs) == 8 and len(set(nbrs)) == 8
    x0, y0, x1, y1 = decode_geohash(["ezs42"])
    for nb in nbrs:
        a0, b0, a1, b1 = decode_geohash([nb])
        # shares an edge or corner with the center cell
        assert a1[0] >= x0[0] - 1e-9 and a0[0] <= x1[0] + 1e-9
        assert b1[0] >= y0[0] - 1e-9 and b0[0] <= y1[0] + 1e-9
    # antimeridian wrap: a cell on the west edge has east-hemisphere
    # neighbors
    west = str(encode_geohash([-179.99], [10.0], 4)[0])
    wn = geohash_neighbors(west)
    assert len(wn) == 8
    cl, _ = geohash_center(wn)
    assert (cl > 170.0).any()
    # pole: no rows beyond lat=90
    top = str(encode_geohash([10.0], [89.99], 4)[0])
    assert len(geohash_neighbors(top)) == 5


def test_spark_column_matches_numpy(spark):
    lons, lats = _rand_points(500, seed=3)
    import pandas as pd

    pdf = pd.DataFrame({"lon": lons, "lat": lats})
    df = spark.createDataFrame(pdf)
    for precision in (1, 4, 9, 12):
        rows = (
            df.select(
                "lon", "lat",
                geohash_col(F.col("lon"), F.col("lat"), precision)
                .alias("gh"),
            )
            .collect()
        )
        want = encode_geohash(
            [r["lon"] for r in rows], [r["lat"] for r in rows], precision
        )
        assert [r["gh"] for r in rows] == [str(w) for w in want]


def test_duckdb_sql_matches_numpy():
    lons, lats = _rand_points(500, seed=5)
    con = duckdb.connect()
    con.register(
        "pts",
        __import__("pandas").DataFrame({"lon": lons, "lat": lats}),
    )
    for precision in (1, 4, 9, 12):
        got = [
            r[0]
            for r in con.execute(
                "SELECT %s FROM pts" % geohash_sql("lon", "lat", precision)
            ).fetchall()
        ]
        want = encode_geohash(lons, lats, precision)
        assert got == [str(w) for w in want]


def _sample_inside(rings, n, seed):
    from pure_python_geospatial_export_spark.geo.kernels import (
        points_in_polygon, ring_bbox,
    )
    rng = np.random.default_rng(seed)
    bb = ring_bbox(np.asarray(rings[0], dtype=np.float64)[:, :2])
    xs = rng.uniform(bb[0], bb[2], n * 6)
    ys = rng.uniform(bb[1], bb[3], n * 6)
    inside = points_in_polygon(xs, ys, rings)
    return xs[inside][:n], ys[inside][:n]


@pytest.mark.parametrize("precision", [2, 3, 4])
def test_geohash_cover_contains_all_interior_points(precision):
    from pure_python_geospatial_export_spark.geo.geohash import (
        geohash_cover,
    )
    from pure_python_geospatial_export_spark.geo.kernels import (
        points_in_polygon,
    )

    # concave pentagon with a hole
    outer = [[-40.0, -20.0], [50.0, -25.0], [55.0, 30.0], [5.0, 12.0],
             [-45.0, 35.0], [-40.0, -20.0]]
    hole = [[-10.0, -10.0], [10.0, -10.0], [10.0, 2.0], [-10.0, 2.0],
            [-10.0, -10.0]]
    rings = [outer, hole]
    cover = geohash_cover(rings, precision)
    assert cover and any(f for _, f in cover)
    cover_set = {g for g, _ in cover}
    xs, ys = _sample_inside(rings, 400, seed=precision)
    ghs = encode_geohash(xs, ys, precision)
    missing = [g for g in ghs if str(g) not in cover_set]
    assert not missing
    # full cells really are full: their centers are inside
    full = [g for g, f in cover if f]
    clon, clat = geohash_center(np.array(full))
    assert points_in_polygon(clon, clat, rings).all()
    # and full cells never touch the hole's interior ring box
    # (conservative flag: corners in + no edge-bbox overlap)


def test_geohash_cover_antimeridian_and_errors():
    from pure_python_geospatial_export_spark.geo.geohash import (
        geohash_cover,
    )

    seam = [[170.0, 10.0], [-170.0, 10.0], [-170.0, 20.0],
            [170.0, 20.0], [170.0, 10.0]]
    cover = geohash_cover([seam], 3)
    cover_set = {g for g, _ in cover}
    # points on both sides of the seam are covered
    for lon in (175.0, -175.0):
        assert str(encode_geohash([lon], [15.0], 3)[0]) in cover_set
    # but the world's far side is not blanket-covered
    assert str(encode_geohash([0.0], [15.0], 3)[0]) not in cover_set
    with pytest.raises(ValueError, match="planar"):
        geohash_cover([seam], 3, edges="nope")


def test_geohash_cover_geodesic_reaches_arc_bulge():
    from pure_python_geospatial_export_spark.geo.geodesic import (
        densify_ring_geodesic,
    )
    from pure_python_geospatial_export_spark.geo.geohash import (
        geohash_cover,
    )
    from pure_python_geospatial_export_spark.geo.kernels import (
        points_in_polygon,
    )

    # the dissolve fixture: an 80-degree chord at lat 40 bows poleward
    # to ~47.6 under great-circle edges
    tri = [[-40.0, 40.0], [40.0, 40.0], [0.0, 38.0], [-40.0, 40.0]]
    p = 4
    planar = {g for g, _ in geohash_cover([tri], p)}
    geo = {g for g, _ in geohash_cover([tri], p, edges="geodesic")}
    bulge = str(encode_geohash([0.0], [46.5], p)[0])
    assert bulge in geo and bulge not in planar
    # cover property vs the densified geometry: sampled interior
    # points' geohashes are all covered
    dense = [densify_ring_geodesic(tri)]
    rng = np.random.default_rng(5)
    xs = rng.uniform(-40.0, 40.0, 3000)
    ys = rng.uniform(38.0, 48.0, 3000)
    inside = points_in_polygon(xs, ys, dense)
    ghs = encode_geohash(xs[inside], ys[inside], p)
    assert inside.sum() > 100
    assert all(str(g) in geo for g in ghs)


def test_sql_registry_geohash(spark):
    from pure_python_geospatial_export_spark.functions.sql_registry import (
        register_sql_functions,
    )

    names = register_sql_functions(spark)
    assert "ppge_geohash" in names and "ppge_geohash_center" in names
    lons, lats = _rand_points(200, seed=21)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lon": lons, "lat": lats}))
    df.createOrReplaceTempView("gh_pts")
    for precision in (1, 5, 12):
        got = [
            r["gh"]
            for r in spark.sql(
                "SELECT ppge_geohash(lon, lat, %d) AS gh FROM gh_pts"
                % precision
            ).collect()
        ]
        want = encode_geohash(lons, lats, precision)
        # also checks the nesting property the registration relies on:
        # precision p IS the first p chars of precision 12
        assert got == [str(w) for w in want]
    assert spark.sql(
        "SELECT ppge_geohash(1.0, 2.0, 0) AS gh"
    ).collect()[0]["gh"] is None
    # center decode: roundtrip, mixed precisions in one batch,
    # invalid -> NULL
    rows = spark.sql(
        "SELECT gh, ppge_geohash_center(gh) AS c FROM (VALUES"
        " ('ezs42'), ('u4pruydqqvj'), ('not valid!'), (''),"
        " (CAST(NULL AS STRING))) AS t(gh)"
    ).collect()
    by_gh = {r["gh"]: r["c"] for r in rows}
    for gh_str in ("ezs42", "u4pruydqqvj"):
        c = by_gh[gh_str]
        assert (
            str(encode_geohash([c["lon"]], [c["lat"]], len(gh_str))[0])
            == gh_str
        )
    assert by_gh["not valid!"]["lon"] is None
    assert by_gh[""]["lon"] is None
    assert by_gh[None]["lon"] is None


def test_precision_bounds():
    with pytest.raises(ValueError):
        encode_geohash([0.0], [0.0], 0)
    with pytest.raises(ValueError):
        encode_geohash([0.0], [0.0], 13)
    with pytest.raises(ValueError):
        geohash_sql("lon", "lat", 13)
