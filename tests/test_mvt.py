"""MVT 2.1 codec (geo/mvt.py) + the per-tile Spark encoders
(operators/tiles.encode_mvt_polygons / encode_mvt_points).

The decoder is an independent wire-format parser, so round-trip tests
pin the encoder against the public spec rather than against itself;
one golden test additionally checks the exact bytes of the spec's own
polygon example hand-assembled from the published field layout.
"""

import pytest

from pure_python_geospatial_export_spark.geo import mvt


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def test_varint_known_values():
    assert mvt._varint(0) == b"\x00"
    assert mvt._varint(1) == b"\x01"
    assert mvt._varint(127) == b"\x7f"
    assert mvt._varint(128) == b"\x80\x01"
    assert mvt._varint(300) == b"\xac\x02"
    # negative int64 -> 10-byte two's-complement, per protobuf
    assert len(mvt._varint(-1)) == 10


def test_zigzag_spec_values():
    # the published protobuf zigzag table
    for n, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4),
                 (2147483647, 4294967294), (-2147483648, 4294967295)]:
        assert mvt._zigzag(n) == z
        assert mvt._unzigzag(z) == n


def test_read_varint_roundtrip():
    for n in [0, 1, 127, 128, 300, 2 ** 31, 2 ** 63 - 1]:
        v, pos = mvt._read_varint(mvt._varint(n), 0)
        assert (v, pos) == (n, len(mvt._varint(n)))


# ---------------------------------------------------------------------------
# geometry encoding
# ---------------------------------------------------------------------------

def test_point_geometry_spec_example():
    # MVT spec example: POINT(25, 17) -> [9, 50, 34]
    assert mvt.encode_geometry(mvt.GEOM_POINT, [[(25, 17)]]) == [9, 50, 34]


def test_polygon_geometry_spec_example():
    # MVT spec example polygon (3, 6)-(8, 12)-(20, 34), already CW in
    # screen coords -> MoveTo(3,6), LineTo[(5,6),(12,22)], ClosePath
    cmds = mvt.encode_geometry(
        mvt.GEOM_POLYGON, [[(3, 6), (8, 12), (20, 34)]]
    )
    assert cmds == [9, 6, 12, 18, 10, 12, 24, 44, 15]


def test_multiline_cursor_persists():
    # spec example: two linestrings, cursor carries across parts
    cmds = mvt.encode_geometry(
        mvt.GEOM_LINESTRING,
        [[(2, 2), (2, 10), (10, 10)], [(1, 1), (3, 5)]],
    )
    assert cmds == [9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8]


def test_polygon_winding_enforced():
    # exterior given with negative screen area must be reversed to
    # positive; interior given positive must flip negative
    ext_ccw = [(0, 0), (0, 10), (10, 10), (10, 0)]   # area2 = -200
    hole_pos = [(2, 2), (8, 2), (8, 8), (2, 8)]      # area2 = +72
    assert mvt._ring_area2(ext_ccw) < 0
    assert mvt._ring_area2(hole_pos) > 0
    cmds = mvt.encode_geometry(mvt.GEOM_POLYGON, [ext_ccw, hole_pos])
    parts = mvt.geometry_parts(mvt.decode_geometry(cmds))
    assert mvt._ring_area2(parts[0]) > 0
    assert mvt._ring_area2(parts[1]) < 0
    # same vertex sets survive
    assert set(parts[0]) == set(ext_ccw)
    assert set(parts[1]) == set(hole_pos)


def test_degenerate_rings_dropped():
    # sub-3-point ring and zero-area sliver both vanish
    assert mvt.encode_geometry(mvt.GEOM_POLYGON, [[(1, 1), (2, 2)]]) is None
    assert mvt.encode_geometry(
        mvt.GEOM_POLYGON, [[(1, 1), (5, 1), (9, 1)]]
    ) is None
    # degenerate exterior kills the feature even with a valid hole
    assert mvt.encode_geometry(
        mvt.GEOM_POLYGON,
        [[(0, 0), (0, 0)], [(2, 2), (2, 8), (8, 8)]],
    ) is None
    # valid exterior + degenerate hole -> hole silently dropped
    cmds = mvt.encode_geometry(
        mvt.GEOM_POLYGON,
        [[(0, 0), (10, 0), (10, 10), (0, 10)], [(2, 2), (2, 2)]],
    )
    parts = mvt.geometry_parts(mvt.decode_geometry(cmds))
    assert len(parts) == 1


def test_closed_ring_input_accepted():
    open_r = [(0, 0), (0, 10), (10, 10), (10, 0)]
    closed_r = open_r + [open_r[0]]
    assert (mvt.encode_geometry(mvt.GEOM_POLYGON, [open_r])
            == mvt.encode_geometry(mvt.GEOM_POLYGON, [closed_r]))


# ---------------------------------------------------------------------------
# layer / tile round-trip
# ---------------------------------------------------------------------------

def _sample_features():
    return [
        {"id": 7, "type": mvt.GEOM_POLYGON,
         "parts": [[(0, 0), (4096, 0), (4096, 4096), (0, 4096)],
                   [(1000, 1000), (1000, 2000), (2000, 2000),
                    (2000, 1000)]],
         "properties": {"name": "Wyoming", "rank": 3,
                        "score": 0.25, "flag": True, "neg": -9}},
        {"id": 8, "type": mvt.GEOM_POINT,
         "parts": [[(123, 456)]],
         "properties": {"name": "Wyoming"}},  # dedups into value table
        {"id": 9, "type": mvt.GEOM_LINESTRING,
         "parts": [[(5, 5), (100, 5), (100, 100)]],
         "properties": {}},
    ]


def test_layer_roundtrip():
    buf = mvt.encode_tile(
        [mvt.encode_layer("zones", _sample_features(), extent=4096)]
    )
    tile = mvt.decode_tile(buf)
    assert len(tile["layers"]) == 1
    layer = tile["layers"][0]
    assert layer["version"] == 2
    assert layer["name"] == "zones"
    assert layer["extent"] == 4096
    feats = layer["features"]
    assert [f["id"] for f in feats] == [7, 8, 9]
    assert feats[0]["type"] == mvt.GEOM_POLYGON
    assert feats[0]["properties"] == {
        "name": "Wyoming", "rank": 3, "score": 0.25,
        "flag": True, "neg": -9,
    }
    # key/value tables deduplicated: 'Wyoming' stored once
    assert layer["values"].count("Wyoming") == 1
    assert feats[1]["properties"] == {"name": "Wyoming"}
    # geometry survives bit-exact (winding already conformant here)
    assert feats[0]["parts"][0] == [
        (0, 0), (4096, 0), (4096, 4096), (0, 4096)
    ]
    assert feats[1]["parts"] == [[(123, 456)]]
    assert feats[2]["parts"] == [[(5, 5), (100, 5), (100, 100)]]


def test_golden_tile_bytes():
    """Hand-assembled wire bytes for a one-feature point layer, built
    field by field from the published MVT/protobuf layout — pins the
    writer's byte layout, not just self-consistency."""
    feats = [{"id": 1, "type": mvt.GEOM_POINT,
              "parts": [[(25, 17)]], "properties": {"k": "v"}}]
    got = mvt.encode_tile([mvt.encode_layer("pts", feats, extent=4096)])

    feature = (
        b"\x08\x01"          # id=1
        b"\x12\x02\x00\x00"  # tags=[0,0] packed
        b"\x18\x01"          # type=POINT
        b"\x22\x03\x09\x32\x22"  # geometry=[9,50,34] packed
    )
    layer = (
        b"\x78\x02"              # version=2 (field 15)
        b"\x0a\x03pts"           # name
        + b"\x12" + bytes([len(feature)]) + feature
        + b"\x1a\x01k"           # keys[0]="k"
        + b"\x22\x03\x0a\x01v"   # values[0]=Value{string_value="v"}
        + b"\x28\x80\x20"        # extent=4096
    )
    want = b"\x1a" + bytes([len(layer)]) + layer
    assert got == want


def test_multiple_layers():
    l1 = mvt.encode_layer("a", [{"id": 1, "type": mvt.GEOM_POINT,
                                 "parts": [[(1, 2)]], "properties": {}}])
    l2 = mvt.encode_layer("b", [{"id": 2, "type": mvt.GEOM_POINT,
                                 "parts": [[(3, 4)]], "properties": {}}])
    tile = mvt.decode_tile(mvt.encode_tile([l1, l2]))
    assert [ly["name"] for ly in tile["layers"]] == ["a", "b"]


# ---------------------------------------------------------------------------
# Spark encoders
# ---------------------------------------------------------------------------

def test_encode_mvt_polygons_matches_clip(spark):
    """encode -> decode recovers exactly the clip pieces: same tiles,
    same feature ids, and each decoded exterior ring equals the
    quantized clip ring up to winding."""
    import math

    from pure_python_geospatial_export_spark.geo import cells as cellmod
    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        clip_layer_to_tiles,
        encode_mvt_polygons,
    )
    from pure_python_geospatial_export_spark.session import local_df

    def rect_ring(x0, y0, x1, y1):
        return [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]]

    layer = local_df(spark, [
        (1, "alpha", wktmod.dumps({
            "type": "Polygon",
            "coordinates": [rect_ring(-33.3, 11.1, 21.7, 44.9),
                            rect_ring(-10.1, 20.2, 5.5, 30.3)],
        })),
        (2, "beta", wktmod.dumps({
            "type": "Polygon",
            "coordinates": [rect_ring(100.7, -41.3, 151.9, -3.7)],
        })),
    ], ["polygon_id", "name", "wkt"])

    pieces = clip_layer_to_tiles(layer, res=4)
    piece_rows = pieces.collect()
    by_tile = {}
    for r in piece_rows:
        by_tile.setdefault(r["tile_id"], []).append(r)

    out = encode_mvt_polygons(pieces).collect()
    assert {r["tile_id"] for r in out} == set(by_tile)
    ext = 4096
    for r in out:
        tile = mvt.decode_tile(bytes(r["mvt"]))
        (ly,) = tile["layers"]
        assert ly["name"] == "zones"
        want = sorted(by_tile[r["tile_id"]],
                      key=lambda p: p["polygon_id"])
        assert r["n_features"] == len(ly["features"]) <= len(want)
        x0, y0, x1, y1 = cellmod.cell_bounds(int(r["tile_id"]))
        sx, sy = ext / (x1 - x0), ext / (y1 - y0)
        got_by_id = {f["id"]: f for f in ly["features"]}
        for p in want:
            f = got_by_id[p["polygon_id"]]
            assert f["properties"]["name"] == p["name"]
            ring0 = wktmod.loads(p["wkt"])["coordinates"][0]
            q = []
            for px, py in ring0[:-1]:
                u = min(max(int(math.floor((px - x0) * sx)), 0), ext)
                v = min(max(int(math.floor((y1 - py) * sy)), 0), ext)
                if not q or q[-1] != (u, v):
                    q.append((u, v))
            if len(q) > 1 and q[0] == q[-1]:
                q = q[:-1]
            got_ring = f["parts"][0]
            assert set(got_ring) == set(q), (r["tile_id"],
                                             p["polygon_id"])
            assert mvt._ring_area2(got_ring) > 0


def test_encode_mvt_points_roundtrip(spark):
    from pure_python_geospatial_export_spark.geo import cells as cellmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        encode_mvt_points,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rows = [
        (1, -100.3, 40.1, "en"),
        (2, -100.2, 40.2, "de"),
        (3, 10.0, -5.0, "en"),
        (4, 10.1, -5.1, "fr"),
    ]
    df = local_df(spark, rows, ["doc_id", "lon", "lat", "lang"])
    out = encode_mvt_points(
        df, res=3, prop_cols=("lang",)
    ).collect()
    assert sum(r["n_features"] for r in out) == 4
    seen = {}
    for r in out:
        tile = mvt.decode_tile(bytes(r["mvt"]))
        (ly,) = tile["layers"]
        assert ly["name"] == "points"
        x0, y0, x1, y1 = cellmod.cell_bounds(int(r["tile_id"]))
        for f in ly["features"]:
            (pt,) = f["parts"][0]
            # quantized point maps back inside the tile bbox
            assert 0 <= pt[0] <= 4096 and 0 <= pt[1] <= 4096
            seen[f["id"]] = (f["properties"]["lang"], r["tile_id"])
    assert {i: p[0] for i, p in seen.items()} == {
        1: "en", 2: "de", 3: "en", 4: "fr"
    }
    # near neighbors share a res-3 tile
    assert seen[1][1] == seen[2][1]
    assert seen[3][1] == seen[4][1]


def test_multipolygon_winding_per_member():
    """MultiPolygon features: EVERY member's outer ring winds positive
    (the spec encodes polygon boundaries as winding flips), holes bind
    to their own member, and an orphan hole (its exterior degenerate)
    drops without killing the other members."""
    sq1 = [(0, 0), (0, 10), (10, 10), (10, 0)]          # area2 < 0
    hole1 = [(2, 2), (8, 2), (8, 8), (2, 8)]            # area2 > 0
    sq2 = [(20, 20), (20, 30), (30, 30), (30, 20)]      # area2 < 0
    cmds = mvt.encode_geometry(
        mvt.GEOM_POLYGON, [sq1, hole1, sq2],
        exterior=[True, False, True],
    )
    parts = mvt.geometry_parts(mvt.decode_geometry(cmds))
    assert len(parts) == 3
    assert mvt._ring_area2(parts[0]) > 0   # member 1 exterior
    assert mvt._ring_area2(parts[1]) < 0   # its hole
    assert mvt._ring_area2(parts[2]) > 0   # member 2 exterior (NOT a hole)

    # orphan hole: member 1's exterior degenerate -> its hole drops,
    # member 2 survives
    cmds = mvt.encode_geometry(
        mvt.GEOM_POLYGON, [[(0, 0), (5, 0)], hole1, sq2],
        exterior=[True, False, True],
    )
    parts = mvt.geometry_parts(mvt.decode_geometry(cmds))
    assert len(parts) == 1
    assert set(parts[0]) == set(sq2)


def test_encode_mvt_points_xyz_mercator_quantization(spark):
    """XYZ tiles quantize in MERCATOR space: the decoded pixel of a
    known point equals the closed-form slippy-map math, and the tile
    ids match mercator_tile_cols."""
    import math

    from pure_python_geospatial_export_spark.operators.tiles import (
        MERCATOR_MAX_LAT,
        encode_mvt_points_xyz,
    )
    from pure_python_geospatial_export_spark.session import local_df

    z, ext = 4, 4096
    rows = [
        (1, -104.786, 41.14, "a"),
        (2, 12.5, -33.9, "b"),
        (3, 179.99, 84.9, "c"),   # near the mercator clamp
        (4, -104.5, 41.2, "d"),   # shares a tile with id 1
    ]
    df = local_df(spark, rows, ["doc_id", "lon", "lat", "tag"])
    out = encode_mvt_points_xyz(
        df, zoom=z, prop_cols=("tag",)
    ).collect()
    assert sum(r["n_features"] for r in out) == 4

    def expect(lon, lat):
        n = float(1 << z)
        lat = min(max(lat, -MERCATOR_MAX_LAT), MERCATOR_MAX_LAT)
        gx = (lon + 180.0) / 360.0 * n
        s = math.sin(math.radians(lat))
        gy = (0.5 - math.log((1.0 + s) / (1.0 - s))
              / (4.0 * math.pi)) * n
        tx, ty = min(int(gx), (1 << z) - 1), min(int(gy), (1 << z) - 1)
        u = min(max(int(math.floor((gx - tx) * ext)), 0), ext)
        v = min(max(int(math.floor((gy - ty) * ext)), 0), ext)
        return tx, ty, u, v

    got = {}
    for r in out:
        tile = mvt.decode_tile(bytes(r["mvt"]))
        (ly,) = tile["layers"]
        for f in ly["features"]:
            ((u, v),) = f["parts"][0]
            got[f["id"]] = (r["tx"], r["ty"], u, v,
                            f["properties"]["tag"])
    for pid, lon, lat, tag in rows:
        tx, ty, u, v = expect(lon, lat)
        assert got[pid] == (tx, ty, u, v, tag), (pid, got[pid])
    assert (got[1][0], got[1][1]) == (got[4][0], got[4][1])


def test_write_mvt_directory_layout(spark, tmp_path):
    from pure_python_geospatial_export_spark.operators.tiles import (
        encode_mvt_points_xyz,
        write_mvt_directory,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rows = [(1, -104.786, 41.14), (2, 12.5, -33.9), (3, 12.6, -33.8)]
    df = local_df(spark, rows, ["doc_id", "lon", "lat"])
    tiles = encode_mvt_points_xyz(df, zoom=3)
    meta = {(r["tx"], r["ty"]): r["n_features"]
            for r in tiles.collect()}

    out = str(tmp_path / "tiles")
    n = write_mvt_directory(tiles, out)
    assert n == len(meta)
    import os
    for (tx, ty), nf in meta.items():
        p = os.path.join(out, "3", str(tx), "%d.mvt" % ty)
        assert os.path.exists(p), p
        with open(p, "rb") as f:
            tile = mvt.decode_tile(f.read())
        assert len(tile["layers"][0]["features"]) == nf

    # tms scheme flips y
    out2 = str(tmp_path / "tiles_tms")
    write_mvt_directory(tiles, out2, scheme="tms")
    for (tx, ty) in meta:
        flipped = (1 << 3) - 1 - ty
        assert os.path.exists(
            os.path.join(out2, "3", str(tx), "%d.mvt" % flipped)
        )

    with pytest.raises(ValueError, match="scheme"):
        write_mvt_directory(tiles, out, scheme="wms")


def test_fast_point_layer_bytes_identical():
    """encode_point_layer_fast must produce the EXACT bytes of the
    generic writer for property-less point layers — including varint
    boundary ids/coords (0, 127, 128, multi-byte, max extent)."""
    import numpy as np

    rng = np.random.default_rng(11)
    ids = np.concatenate([
        np.array([0, 1, 127, 128, 300, 2**31, 2**40], dtype=np.int64),
        rng.integers(0, 2**62, 500).astype(np.int64),
    ])
    us = np.concatenate([
        np.array([0, 63, 64, 4095, 4096, 2048, 1], dtype=np.int64),
        rng.integers(0, 4097, 500).astype(np.int64),
    ])
    vs = np.concatenate([
        np.array([4096, 0, 127, 128, 1, 2, 3], dtype=np.int64),
        rng.integers(0, 4097, 500).astype(np.int64),
    ])
    feats = [
        {"id": int(i), "type": mvt.GEOM_POINT,
         "parts": [[(int(u), int(v))]], "properties": {}}
        for i, u, v in zip(ids, us, vs)
    ]
    want = mvt.encode_layer("pts", feats, extent=4096)
    got = mvt.encode_point_layer_fast(ids, us, vs, "pts", extent=4096)
    assert got == want


# ---------------------------------------------------------------------------
# mercator polygon tiles (encode_mvt_polygons_xyz)
# ---------------------------------------------------------------------------

def _merc_units(lon, lat, z):
    import math

    from pure_python_geospatial_export_spark.operators.tiles import (
        MERCATOR_MAX_LAT,
    )
    n = 1 << z
    lat = min(max(lat, -MERCATOR_MAX_LAT), MERCATOR_MAX_LAT)
    gx = (lon + 180.0) / 360.0 * n
    s = math.sin(math.radians(lat))
    gy = (0.5 - math.log((1.0 + s) / (1.0 - s)) / (4.0 * math.pi)) * n
    return gx, gy


def test_xyz_polygon_tiles_pip_parity(spark):
    """A probe point inside the polygon (even-odd in MERCATOR space —
    the clip geometry's own space) must land inside its tile's decoded
    piece, and vice versa, for probes at least one pixel from any
    boundary (quantization blurs exactly the sub-pixel band)."""
    import numpy as np

    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        _pip_planar,
        encode_mvt_polygons_xyz,
    )
    from pure_python_geospatial_export_spark.session import local_df

    z, ext = 5, 4096

    def rect_ring(x0, y0, x1, y1):
        return [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]]

    # concave-ish: big rect with a hole, spanning several z5 tiles
    outer = rect_ring(-40.0, -25.0, 31.0, 38.0)
    hole = rect_ring(-11.0, 2.0, 12.0, 21.0)
    layer = local_df(spark, [
        (1, "zone", wktmod.dumps(
            {"type": "Polygon", "coordinates": [outer, hole]}, 12)),
    ], ["polygon_id", "name", "wkt"])

    out = encode_mvt_polygons_xyz(layer, zoom=z).collect()
    assert out
    tiles = {}
    full_seen = False
    for r in out:
        tile = mvt.decode_tile(bytes(r["mvt"]))
        (ly,) = tile["layers"]
        assert ly["name"] == "zones"
        for f in ly["features"]:
            assert f["properties"]["name"] == "zone"
        tiles[(r["tx"], r["ty"])] = ly["features"]
        if any(len(f["parts"]) == 1
               and set(f["parts"][0]) == {(0, 0), (ext, 0),
                                          (ext, ext), (0, ext)}
               for f in ly["features"]):
            full_seen = True
    assert full_seen, "interior tiles should ride the full shortcut"

    proj_rings = [
        np.array([_merc_units(x, y, z) for x, y in outer]),
        np.array([_merc_units(x, y, z) for x, y in hole]),
    ]
    rng = np.random.default_rng(9)
    lons = rng.uniform(-50.0, 40.0, 1500)
    lats = rng.uniform(-35.0, 45.0, 1500)
    checked = 0
    for lon, lat in zip(lons, lats):
        gx, gy = _merc_units(float(lon), float(lat), z)
        want = bool(_pip_planar(
            np.array([gx]), np.array([gy]), proj_rings)[0])
        tx, ty = int(gx), int(gy)
        u = (gx - tx) * ext
        v = (gy - ty) * ext
        feats = tiles.get((tx, ty))
        got = False
        near_edge = False
        if feats:
            for f in feats:
                # decoded MVT rings are OPEN; the ray-cast kernel
                # needs the closing vertex back
                rings = [
                    np.vstack([np.array(p, dtype=float),
                               np.array(p[:1], dtype=float)])
                    for p in f["parts"]
                ]
                got |= bool(_pip_planar(
                    np.array([u]), np.array([v]), rings)[0])
                # skip probes within 1.5px of any piece ring bbox edge
                for p in rings:
                    d = np.concatenate([
                        np.abs(p[:, 0] - u), np.abs(p[:, 1] - v)])
                    if d.min() < 1.5:
                        near_edge = True
        if near_edge:
            continue
        checked += 1
        assert got == want, (lon, lat, tx, ty, got, want)
    assert checked > 1000


def test_xyz_polygon_tiles_to_directory(spark, tmp_path):
    import os

    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        encode_mvt_polygons_xyz,
        write_mvt_directory,
    )
    from pure_python_geospatial_export_spark.session import local_df

    layer = local_df(spark, [
        (1, "a", wktmod.dumps({"type": "Polygon", "coordinates": [
            [[-10.0, -10.0], [-10.0, 10.0], [10.0, 10.0],
             [10.0, -10.0], [-10.0, -10.0]]]}, 12)),
    ], ["polygon_id", "name", "wkt"])
    tiles = encode_mvt_polygons_xyz(layer, zoom=3)
    n = write_mvt_directory(tiles, str(tmp_path / "zt"))
    assert n == tiles.count() > 0
    found = 0
    for root, _d, files in os.walk(str(tmp_path / "zt")):
        for f in files:
            if f.endswith(".mvt"):
                with open(os.path.join(root, f), "rb") as fh:
                    t = mvt.decode_tile(fh.read())
                assert t["layers"][0]["features"]
                found += 1
    assert found == n


def test_xyz_polygon_tiles_antimeridian(spark):
    """A seam-crossing polygon produces pieces on BOTH sides, each
    wound as an exterior."""
    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        encode_mvt_polygons_xyz,
    )
    from pure_python_geospatial_export_spark.session import local_df

    z = 4
    n = 1 << z
    layer = local_df(spark, [
        (7, "fiji", wktmod.dumps({"type": "Polygon", "coordinates": [
            [[170.0, -25.0], [170.0, -8.0], [-170.0, -8.0],
             [-170.0, -25.0], [170.0, -25.0]]]}, 12)),
    ], ["polygon_id", "name", "wkt"])
    out = encode_mvt_polygons_xyz(layer, zoom=z).collect()
    txs = {r["tx"] for r in out}
    assert any(tx <= 1 for tx in txs) or any(tx >= n - 2 for tx in txs)
    assert any(tx >= n - 1 for tx in txs) and any(tx == 0 for tx in txs)
    for r in out:
        tile = mvt.decode_tile(bytes(r["mvt"]))
        for f in tile["layers"][0]["features"]:
            assert mvt._ring_area2(f["parts"][0]) > 0


def test_mvt_polygon_pyramid_xyz(spark, tmp_path):
    """Multi-zoom slippy build: every level present, finer levels cut
    more tiles, simplification keeps coarse levels lean, and the whole
    pyramid lands as a loadable {z}/{x}/{y}.mvt tree."""
    import os

    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        mvt_polygon_pyramid_xyz,
        write_mvt_directory,
    )
    from pure_python_geospatial_export_spark.session import local_df

    # jagged polygon so simplification has vertices to shed
    import math
    ring = []
    for k in range(72):
        a = 2 * math.pi * k / 72
        # 0.15-deg jags: ~7px at zoom 2 (shed by the 16px budget),
        # ~55px at zoom 5 (kept)
        r = 18.0 + (0.15 if k % 2 else 0.0)
        ring.append([r * math.cos(a), r * math.sin(a) * 0.7 + 10.0])
    ring.append(ring[0])
    layer = local_df(spark, [
        (1, "blob", wktmod.dumps(
            {"type": "Polygon", "coordinates": [ring]}, 12)),
    ], ["polygon_id", "name", "wkt"])

    pyr = mvt_polygon_pyramid_xyz(layer, 2, 5, simplify_px=16.0)
    rows = pyr.collect()
    by_zoom = {}
    for r in rows:
        by_zoom.setdefault(r["zoom"], []).append(r)
    assert set(by_zoom) == {2, 3, 4, 5}
    assert len(by_zoom[5]) > len(by_zoom[2])

    def total_ring_pts(rs):
        total = 0
        for r in rs:
            t = mvt.decode_tile(bytes(r["mvt"]))
            for f in t["layers"][0]["features"]:
                for p in f["parts"]:
                    total += len(p)
        return total
    # at the SAME zoom, the 1px simplification sheds vertices vs the
    # unsimplified encode (per-tile counts aren't comparable ACROSS
    # zooms — a coarse tile holds the whole ring, a fine tile a
    # fragment)
    from pure_python_geospatial_export_spark.operators.tiles import (
        encode_mvt_polygons_xyz,
    )
    unsimplified = encode_mvt_polygons_xyz(
        layer, 2, simplify_px=0.0
    ).collect()
    assert total_ring_pts(by_zoom[2]) < total_ring_pts(unsimplified)

    out = str(tmp_path / "pyr")
    n = write_mvt_directory(pyr, out)
    assert n == len(rows)
    for z in (2, 3, 4, 5):
        assert os.path.isdir(os.path.join(out, str(z)))


def test_xyz_multipolygon_members_keep_exterior_winding(spark):
    """Regression: load_rings flattens MultiPolygon members, and the
    old tiler flagged every ring after the first as a hole — second
    members rendered empty (orphan-hole drop) or inverted. Both
    members must now emit exterior-wound pieces; a hole must bind to
    ITS member."""
    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        encode_mvt_polygons_xyz,
    )
    from pure_python_geospatial_export_spark.session import local_df

    def rect(x0, y0, x1, y1):
        return [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]]

    layer = local_df(spark, [
        (1, "two", wktmod.dumps({"type": "MultiPolygon",
                                 "coordinates": [
            [rect(-60.0, 10.0, -40.0, 25.0),
             rect(-55.0, 14.0, -45.0, 21.0)],   # member A + its hole
            [rect(20.0, -30.0, 40.0, -15.0)],   # member B, disjoint
        ]}, 12)),
    ], ["polygon_id", "name", "wkt"])
    out = encode_mvt_polygons_xyz(layer, zoom=4).collect()
    assert out
    west_feats = east_feats = 0
    hole_seen = False
    for r in out:
        tile = mvt.decode_tile(bytes(r["mvt"]))
        for f in tile["layers"][0]["features"]:
            assert f["parts"], (r["tx"], r["ty"])
            assert mvt._ring_area2(f["parts"][0]) > 0, (
                "member exterior wound as hole", r["tx"], r["ty"])
            if r["tx"] < 8:
                west_feats += 1
                if len(f["parts"]) > 1:
                    hole_seen = True
                    assert mvt._ring_area2(f["parts"][1]) < 0
            else:
                east_feats += 1
    assert west_feats > 0 and east_feats > 0, (
        "a MultiPolygon member vanished")
    assert hole_seen


def test_xyz_empty_and_all_subpixel_layers(spark):
    """Regression: an empty layer or an all-sub-pixel zoom crashed
    local_df with CANNOT_INFER_EMPTY_SCHEMA; both must yield empty
    frames with the output schema."""
    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.operators.tiles import (
        encode_mvt_polygons_xyz,
        mvt_polygon_pyramid_xyz,
    )
    from pure_python_geospatial_export_spark.session import local_df

    tiny = local_df(spark, [
        (1, "speck", wktmod.dumps({"type": "Polygon", "coordinates": [
            [[10.0, 10.0], [10.0, 10.001], [10.001, 10.001],
             [10.001, 10.0], [10.0, 10.0]]]}, 12)),
    ], ["polygon_id", "name", "wkt"])
    pyr = mvt_polygon_pyramid_xyz(tiny, 0, 2, simplify_px=16.0)
    assert pyr.count() == 0
    assert pyr.columns == ["zoom", "tx", "ty", "n_features",
                           "n_bytes", "mvt"]

    empty = local_df(spark, [(1, "x", "POINT (0 0)")],
                     ["polygon_id", "name", "wkt"]).where("1 = 0")
    assert encode_mvt_polygons_xyz(empty, zoom=2).count() == 0
