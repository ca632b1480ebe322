"""Pure-stdlib GeoTIFF codec (sources/geotiff.py): round-trips across
dtype x compression x layout x byte order x predictor, geo-referencing
math, honest unsupported-variant errors, and the Spark binaryFile
pixel source."""

import numpy as np
import pytest

from pure_python_geospatial_export_spark.sources.geotiff import (
    GeoTiff,
    decode_geotiff,
    encode_geotiff,
    read_geotiff,
)

BBOX = (-180.0, -90.0, 180.0, 90.0)


def _rand(dt, shape=(37, 53), seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 200, shape)
    if np.dtype(dt).kind == "i":
        a -= 50
    return a.astype(dt)


@pytest.mark.parametrize("dt", ["u1", "u2", "i2", "i4", "u4", "i8",
                                "f4", "f8"])
@pytest.mark.parametrize("comp", ["none", "deflate"])
@pytest.mark.parametrize("tiled", [False, True])
def test_roundtrip_matrix(dt, comp, tiled):
    band = _rand(dt)
    for bo in ("<", ">"):
        for pred in (1, 2):
            if pred == 2 and band.dtype.kind == "f":
                continue
            buf = encode_geotiff(band, BBOX, compression=comp,
                                 tiled=tiled, tile_size=32,
                                 predictor=pred, byteorder=bo)
            g = decode_geotiff(buf)
            assert (g.read()[:, :, 0] == band).all()
            assert g.bbox == BBOX
            assert g.epsg == 4326
            assert g.compression == (1 if comp == "none" else 8)


def test_multiband_chunky_roundtrip():
    bands = [_rand("u2", seed=s) for s in range(3)]
    buf = encode_geotiff(bands, BBOX, tiled=True, tile_size=16,
                         predictor=2)
    g = decode_geotiff(buf)
    out = g.read()
    assert out.shape == (37, 53, 3)
    for i, b in enumerate(bands):
        assert (out[:, :, i] == b).all()


def test_blocks_stream_bounded_and_cover_image():
    band = _rand("i4", shape=(130, 97))
    buf = encode_geotiff(band, BBOX, tiled=True, tile_size=32)
    g = decode_geotiff(buf)
    seen = np.zeros_like(band, dtype=bool)
    for py0, px0, block in g.blocks():
        bh, bw, _ = block.shape
        assert bh <= 32 and bw <= 32  # one tile at a time
        assert (block[:, :, 0] == band[py0:py0 + bh,
                                       px0:px0 + bw]).all()
        seen[py0:py0 + bh, px0:px0 + bw] = True
    assert seen.all()


def test_geo_transform_pixel_centers():
    band = np.zeros((72, 144), dtype=np.uint8)
    g = decode_geotiff(encode_geotiff(band, BBOX))
    assert g.pixel_scale == (2.5, 2.5)
    assert (g.origin_x, g.origin_y) == (-180.0, 90.0)
    # regional (non-global) bbox
    g2 = decode_geotiff(encode_geotiff(
        np.zeros((10, 20), dtype=np.uint8),
        (-130.0, 20.0, -60.0, 55.0),
    ))
    assert g2.bbox == (-130.0, 20.0, -60.0, 55.0)
    assert g2.pixel_scale == (3.5, 3.5)


def test_unsupported_variants_raise_loudly():
    band = _rand("u1")
    buf = bytearray(encode_geotiff(band, BBOX))
    # patch Compression (tag 259) to LZW (5)
    g = GeoTiff(bytes(buf))
    import struct
    (n,) = struct.unpack_from("<H", buf, 8)
    for k in range(n):
        tag, = struct.unpack_from("<H", buf, 10 + k * 12)
        if tag == 259:
            struct.pack_into("<H", buf, 10 + k * 12 + 8, 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        GeoTiff(bytes(buf))
    with pytest.raises(ValueError, match="bad magic"):
        GeoTiff(b"nope" + bytes(buf))
    with pytest.raises(ValueError, match="predictor=2"):
        encode_geotiff(_rand("f8"), BBOX, predictor=2)
    with pytest.raises(ValueError, match="multiple of 16"):
        encode_geotiff(band, BBOX, tiled=True, tile_size=20)
    # non-georeferenced TIFF (drop the tiepoint) must refuse
    from pure_python_geospatial_export_spark.sources import geotiff as gt
    plain = encode_geotiff(band, BBOX)
    g3 = GeoTiff(plain)
    del g3  # decode fine with tags; now strip geo tags structurally:
    # simplest: a TIFF written by patching tag id to an unknown value
    buf2 = bytearray(plain)
    (n,) = struct.unpack_from("<H", buf2, 8)
    for k in range(n):
        tag, = struct.unpack_from("<H", buf2, 10 + k * 12)
        if tag in (gt._TAG_MODEL_TIEPOINT, gt._TAG_MODEL_PIXEL_SCALE):
            struct.pack_into("<H", buf2, 10 + k * 12, 60000 + k)
    with pytest.raises(ValueError, match="not geo-referenced"):
        GeoTiff(bytes(buf2))


def test_read_geotiff_spark_source(spark, tmp_path):
    """binaryFile -> block-streamed pixel rows with center coords and
    double values; multiple files in one directory scan."""
    w, h = 36, 18  # 10-degree pixels
    px = np.arange(w, dtype=np.int64)[None, :]
    py = np.arange(h, dtype=np.int64)[:, None]
    band = ((px * 3 + py * 5) % 97).astype(np.int32)
    for i, (comp, tiled) in enumerate(
        [("deflate", True), ("none", False)]
    ):
        buf = encode_geotiff(band, BBOX, compression=comp,
                             tiled=tiled, tile_size=16,
                             predictor=2 if comp == "deflate" else 1)
        (tmp_path / ("r%d.tif" % i)).write_bytes(buf)

    df = read_geotiff(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 2 * w * h
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file"], {})[(r["px"], r["py"])] = r
    assert set(by_file) == {"r0.tif", "r1.tif"}
    for pix in by_file.values():
        assert len(pix) == w * h
        r = pix[(3, 2)]
        assert r["lon"] == -180.0 + 3.5 * 10.0
        assert r["lat"] == 90.0 - 2.5 * 10.0
        assert r["value"] == float((3 * 3 + 2 * 5) % 97)
        assert r["band"] == 0


def test_read_geotiff_rejects_wrong_crs(spark, tmp_path):
    band = np.zeros((8, 8), dtype=np.uint8)
    buf = encode_geotiff(band, (0.0, 0.0, 8.0, 8.0), epsg=3857)
    (tmp_path / "m.tif").write_bytes(buf)
    import pyspark.errors
    with pytest.raises(Exception, match="EPSG:3857"):
        read_geotiff(spark, str(tmp_path)).collect()


def test_read_geotiff_rejects_bad_band(spark, tmp_path):
    """Review fix: an out-of-range band raises a clear ValueError, not
    a numpy IndexError from the executor."""
    band = np.zeros((8, 8), dtype=np.uint8)
    (tmp_path / "b.tif").write_bytes(encode_geotiff(band, BBOX))
    with pytest.raises(Exception, match="band 3 out of range"):
        read_geotiff(spark, str(tmp_path), band=3).collect()
    # in-range band on a multiband file still works
    bands = [np.full((4, 4), i, dtype=np.uint8) for i in range(2)]
    (tmp_path / "b.tif").write_bytes(encode_geotiff(bands, BBOX))
    vals = {r["value"] for r in
            read_geotiff(spark, str(tmp_path), band=1).collect()}
    assert vals == {1.0}


def test_write_geotiff_rasterizes_points(spark, tmp_path):
    """The raster SINK: points -> per-pixel mean -> GeoTIFF readable
    back through the engine's own decoder with exact georeference."""
    from pure_python_geospatial_export_spark.session import local_df
    from pure_python_geospatial_export_spark.sources.geotiff import (
        write_geotiff,
    )

    # 4 points per pixel on a 4x2 grid over (0,0)-(4,2)
    rows = []
    for px in range(4):
        for py in range(2):
            for k in range(4):
                rows.append((
                    px + 0.2 + 0.1 * k,       # lon inside pixel px
                    1.5 - py + 0.05 * k,      # lat inside row py (y down)
                    float(10 * px + py + k),
                ))
    df = local_df(spark, rows, ["lon", "lat", "value"])
    out = str(tmp_path / "mean.tif")
    stats = write_geotiff(df, out, (0.0, 0.0, 4.0, 2.0), 4, 2,
                          agg="mean", nodata=-1.0)
    assert stats["n_pixels"] == 8 and stats["n_rows"] == 32

    g = decode_geotiff(open(out, "rb").read())
    assert g.bbox == (0.0, 0.0, 4.0, 2.0)
    assert (g.width, g.height) == (4, 2)
    arr = g.read()[:, :, 0]
    for px in range(4):
        for py in range(2):
            want = sum(10 * px + py + k for k in range(4)) / 4.0
            assert arr[py, px] == want, (px, py)

    # count agg + nodata fill for missed pixels
    sparse = local_df(spark, [(0.5, 1.5, 7.0)], ["lon", "lat", "value"])
    out2 = str(tmp_path / "count.tif")
    write_geotiff(sparse, out2, (0.0, 0.0, 4.0, 2.0), 4, 2,
                  agg="count", nodata=-9.0)
    arr2 = decode_geotiff(open(out2, "rb").read()).read()[:, :, 0]
    assert arr2[0, 0] == 1.0
    assert (arr2 == -9.0).sum() == 7

    import pytest
    with pytest.raises(ValueError, match="64M-pixel"):
        write_geotiff(df, out, (0.0, 0.0, 4.0, 2.0), 10**5, 10**3,
                      engine="driver")
    with pytest.raises(ValueError, match="distributed.*requires|"
                       "requires tiled"):
        write_geotiff(df, out, (0.0, 0.0, 4.0, 2.0), 4, 2,
                      tiled=False, engine="distributed")
    with pytest.raises(ValueError, match="agg must be"):
        write_geotiff(df, out, (0.0, 0.0, 4.0, 2.0), 4, 2, agg="p99")


def test_projected_crs_key_is_3072():
    """ADVICE r5: projected CRS codes belong under ProjectedCSTypeGeoKey
    (3072), geographic ones under GeographicTypeGeoKey (2048) — GDAL
    misreads a projected code stored under 2048."""
    import struct as _struct

    def geo_keys(buf):
        g = decode_geotiff(buf)
        # re-parse the raw GeoKeyDirectory (tag 34735)
        e = g._e
        (n,) = _struct.unpack_from(e + "H", buf, 4 if e == "<" else 4)
        tags = g._read_ifd(_struct.unpack_from(e + "I", buf, 4)[0])
        return [int(v) for v in tags[34735]], g

    band = np.zeros((8, 8), dtype=np.uint8)
    keys, g = geo_keys(encode_geotiff(band, (0.0, 0.0, 8.0, 8.0),
                                      epsg=3857))
    kv = {keys[k]: keys[k + 3] for k in range(4, len(keys) - 3, 4)}
    assert kv[1024] == 1          # GTModelType = projected
    assert 3072 in kv and kv[3072] == 3857
    assert 2048 not in kv
    assert g.epsg == 3857         # reader picks up key 3072

    keys, g = geo_keys(encode_geotiff(band, (0.0, 0.0, 8.0, 8.0),
                                      epsg=4326))
    kv = {keys[k]: keys[k + 3] for k in range(4, len(keys) - 3, 4)}
    assert kv[1024] == 2          # geographic
    assert 2048 in kv and kv[2048] == 4326
    assert 3072 not in kv
    assert g.epsg == 4326


def test_write_geotiff_distributed_bytes_equal_driver(spark, tmp_path):
    """The distributed sink (executor-side tile encode + streamed
    driver assembly) must produce a byte-identical file to the driver
    in-memory encoder — same blocks, same container layout."""
    from pure_python_geospatial_export_spark.session import local_df
    from pure_python_geospatial_export_spark.sources.geotiff import (
        write_geotiff,
    )

    rng = np.random.default_rng(3)
    n = 5_000
    rows = [(float(x), float(y), float(v)) for x, y, v in zip(
        rng.uniform(0.0, 10.0, n), rng.uniform(0.0, 6.0, n),
        rng.integers(0, 100, n))]
    df = local_df(spark, rows, ["lon", "lat", "value"]).repartition(7)

    # 600x520: multiple 256-tiles incl. partial edge/corner tiles
    kw = dict(bbox=(0.0, 0.0, 10.0, 6.0), width=600, height=520,
              agg="mean", nodata=-1.0, tiled=True, tile_size=256)
    p_drv = str(tmp_path / "drv.tif")
    p_dst = str(tmp_path / "dst.tif")
    r1 = write_geotiff(df, p_drv, engine="driver", **kw)
    r2 = write_geotiff(df, p_dst, engine="distributed", **kw)
    b1 = open(p_drv, "rb").read()
    b2 = open(p_dst, "rb").read()
    assert b1 == b2
    assert r1 == {**r2, "path": p_drv}

    # uncompressed variant too (different block framing)
    kw["compression"] = "none"
    write_geotiff(df, p_drv, engine="driver", **kw)
    write_geotiff(df, p_dst, engine="distributed", **kw)
    assert open(p_drv, "rb").read() == open(p_dst, "rb").read()


def test_write_geotiff_distributed_beyond_driver_guard(spark, tmp_path):
    """>64M pixels — the regime the driver collect refused — now
    writes with bounded driver memory; spot pixels and georeference
    verified through the engine's own decoder."""
    from pure_python_geospatial_export_spark.session import local_df
    from pure_python_geospatial_export_spark.sources.geotiff import (
        write_geotiff,
    )

    w, h = 16384, 8192  # 134M px, sparse points
    bbox = (0.0, -90.0, 360.0, 90.0)
    rows = [(0.011, 89.989, 7.0),       # pixel (0, 0)
            (359.989, -89.989, 9.0),    # pixel (w-1, h-1)
            (180.0 + 1e-3, -1e-3, 5.0)]
    df = local_df(spark, rows, ["lon", "lat", "value"])

    with pytest.raises(ValueError, match="driver-assembly"):
        write_geotiff(df, str(tmp_path / "x.tif"), bbox, w, h,
                      engine="driver")

    out = str(tmp_path / "big.tif")
    res = write_geotiff(df, out, bbox, w, h, agg="sum", nodata=0.0,
                        engine="auto")  # auto -> distributed
    assert res["n_pixels"] == 3 and res["n_rows"] == 3
    g = decode_geotiff(open(out, "rb").read())
    assert (g.width, g.height) == (w, h)
    assert g.bbox == (0.0, -90.0, 360.0, 90.0)
    # decode only the tiles containing the three points
    hits = {}
    for idx, (py0, px0, arr) in enumerate(g.blocks()):
        nz = np.nonzero(arr[:, :, 0])
        for yy, xx in zip(*nz):
            hits[(px0 + xx, py0 + yy)] = float(arr[yy, xx, 0])
    assert hits == {(0, 0): 7.0, (w - 1, h - 1): 9.0,
                    (8192, 4096): 5.0}
