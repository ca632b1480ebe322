"""WKB / EWKB codec — byte-exact re-implementation of the reference surface.

Behavioral contract (golden-fixture verified, see tests/test_wkb.py; layout
oracle: /root/reference/docs/wkb_detail.md and
/root/reference/ppge-tests/test-geomet/wkb_test.py):

* 1 endian byte (0x00 big / 0x01 little) + 4 type bytes + payload.
* Type codes: 2D = 1..7, Z = 0x3E9.., M = 0x7D1.., ZM = 0xBB9.. in type
  order Point, LineString, Polygon, MultiPoint, MultiLineString,
  MultiPolygon, GeometryCollection (ref geomet/wkb.py:45-95). For little
  endian the 4 type bytes are byte-reversed.
* EWKB: SRID presence flags the high byte 0x20 and a 4-byte int SRID
  follows the type bytes (ref geomet/wkb.py:353-378).
* Dump dimensionality inferred from the first vertex: 2 -> 2D, 3 -> Z
  (never M), 4 -> ZM (ref geomet/wkb.py:186-206). Empty geometry ->
  ValueError (ambiguous dims, ref geomet/wkb.py:245-249).
* Multi* members carry full per-member endian+type headers
  (ref geomet/wkb.py:482-492).
* Load promotes XYM to XYZM-like XYZ with Z=0.0 inserted at index 2
  (ref geomet/wkb.py:626-633); SRID is returned under both ``meta.srid``
  and ``crs.properties.name='EPSG<n>'`` (ref geomet/wkb.py:328-336);
  GeometryCollections reject mixed dimensionality (ref geomet/wkb.py:874-890).

Original implementation: coordinate blocks are packed/unpacked with numpy
(``ndarray.tobytes`` / ``np.frombuffer``) over an explicit offset cursor —
no byte-at-a-time iteration. Batch entry points serve Arrow pandas UDFs.
"""

from __future__ import annotations

import numpy as np

from .geojson import GEOM_TYPES, is_empty, num_dims, srid_keys

BIG_ENDIAN = b"\x00"
LITTLE_ENDIAN = b"\x01"
SRID_FLAG = 0x20

#: dimensionality -> type-code offset (2D/Z/M/ZM; ref geomet/wkb.py:45-95)
_DIM_OFFSET = {"2D": 0, "Z": 0x3E8, "M": 0x7D0, "ZM": 0xBB8}
_NDIM_TO_DIM = {2: "2D", 3: "Z", 4: "ZM"}  # dump side: 3 ordinates => Z
_TYPE_INDEX = {t: i + 1 for i, t in enumerate(GEOM_TYPES)}

#: int type code -> (geojson type, n ordinates stored, insert Z for M?)
_CODE_TABLE = {}
for _dim, _off in _DIM_OFFSET.items():
    for _t, _i in _TYPE_INDEX.items():
        _n = {"2D": 2, "Z": 3, "M": 3, "ZM": 4}[_dim]
        _CODE_TABLE[_off + _i] = (_t, _n, _dim == "M")


def _type_header(geom_type: str, ndim: int, big_endian: bool, srid) -> bytes:
    code = _TYPE_INDEX[geom_type] + _DIM_OFFSET[_NDIM_TO_DIM[ndim]]
    raw = code.to_bytes(4, "big")
    if srid is not None:
        raw = bytes([SRID_FLAG]) + raw[1:]
    if not big_endian:
        raw = raw[::-1]
    out = (BIG_ENDIAN if big_endian else LITTLE_ENDIAN) + raw
    if srid is not None:
        out += int(srid).to_bytes(4, "big" if big_endian else "little",
                                  signed=True)
    return out


def _pack_coords(coords, ndim: int, big_endian: bool) -> bytes:
    """Pack a flat list of vertices as float64 — vectorized via numpy."""
    arr = np.asarray(coords, dtype=">f8" if big_endian else "<f8")
    if arr.ndim == 1:  # single vertex
        arr = arr.reshape(1, -1)
    if arr.shape[-1] != ndim:
        raise ValueError("inconsistent vertex dimensionality")
    return arr.tobytes()


def _i32(value: int, big_endian: bool) -> bytes:
    return int(value).to_bytes(4, "big" if big_endian else "little",
                               signed=True)


def _dump_body(geom_type: str, coords, ndim: int, big_endian: bool) -> bytes:
    if geom_type == "Point":
        return _pack_coords(coords, ndim, big_endian)
    if geom_type == "LineString":
        return _i32(len(coords), big_endian) + _pack_coords(
            coords, ndim, big_endian
        )
    if geom_type == "Polygon":
        out = [_i32(len(coords), big_endian)]
        for ring in coords:
            out.append(_i32(len(ring), big_endian))
            out.append(_pack_coords(ring, ndim, big_endian))
        return b"".join(out)
    # Multi* members each restate a full endian+type header
    member_type = {
        "MultiPoint": "Point",
        "MultiLineString": "LineString",
        "MultiPolygon": "Polygon",
    }[geom_type]
    header = _type_header(member_type, ndim, big_endian, None)
    out = [_i32(len(coords), big_endian)]
    for member in coords:
        out.append(header)
        out.append(_dump_body(member_type, member, ndim, big_endian))
    return b"".join(out)


def dumps(geom: dict, big_endian: bool = True) -> bytes:
    """GeoJSON-like dict -> WKB/EWKB bytes (byte-exact vs the reference)."""
    geom_type = geom.get("type")
    if geom_type not in _TYPE_INDEX:
        raise ValueError("Unsupported geometry type '%s'" % geom_type)
    if is_empty(geom):
        raise ValueError(
            "Empty geometries cannot be represented in WKB. Reason: The "
            "dimensionality of the WKB would be ambiguous."
        )
    srid = geom.get("meta", {}).get("srid")
    ndim = num_dims(geom)

    if geom_type == "GeometryCollection":
        geoms = geom["geometries"]
        body = _i32(len(geoms), big_endian) + b"".join(
            dumps(g, big_endian=big_endian) for g in geoms
        )
    else:
        body = _dump_body(geom_type, geom["coordinates"], ndim, big_endian)
    return _type_header(geom_type, ndim, big_endian, srid) + body


class _Cursor:
    """Offset-based reader over a WKB buffer (no per-byte iteration)."""

    __slots__ = ("buf", "off")

    def __init__(self, buf: bytes):
        self.buf = memoryview(buf)
        self.off = 0

    def take(self, n: int) -> memoryview:
        end = self.off + n
        if end > len(self.buf):
            raise ValueError("truncated WKB: wanted %d bytes at offset %d"
                             % (n, self.off))
        out = self.buf[self.off:end]
        self.off = end
        return out

    def i32(self, big_endian: bool) -> int:
        return int.from_bytes(self.take(4),
                              "big" if big_endian else "little", signed=True)

    def f64_block(self, n_vals: int, big_endian: bool) -> np.ndarray:
        raw = self.take(8 * n_vals)
        return np.frombuffer(raw, dtype=">f8" if big_endian else "<f8")


def _verts_to_list(arr: np.ndarray, nstored: int, promote_m: bool):
    """(N*nstored,) float block -> list of vertex lists; XYM gets Z=0.0
    inserted at index 2 (ref geomet/wkb.py:626-633)."""
    pts = arr.reshape(-1, nstored)
    if promote_m:
        pts = np.insert(pts, 2, 0.0, axis=1)
    return pts.tolist()


def _load_header(cur: _Cursor):
    endian_byte = bytes(cur.take(1))
    if endian_byte == BIG_ENDIAN:
        big_endian = True
    elif endian_byte == LITTLE_ENDIAN:
        big_endian = False
    else:
        raise ValueError(
            "Invalid endian byte: '0x%s'. Expected 0x00 or 0x01"
            % endian_byte.hex()
        )
    raw = bytes(cur.take(4))
    if not big_endian:
        raw = raw[::-1]
    has_srid = bool(raw[0] & SRID_FLAG)
    code = int.from_bytes(bytes([raw[0] & ~SRID_FLAG]) + raw[1:], "big")
    entry = _CODE_TABLE.get(code)
    if entry is None:
        raise ValueError("Unsupported WKB type code: %d" % code)
    srid = cur.i32(big_endian) if has_srid else None
    geom_type, nstored, promote_m = entry
    return big_endian, geom_type, nstored, promote_m, srid


def _load_geom(cur: _Cursor) -> dict:
    big_endian, geom_type, nstored, promote_m, srid = _load_header(cur)

    if geom_type == "Point":
        verts = _verts_to_list(cur.f64_block(nstored, big_endian),
                               nstored, promote_m)
        result = dict(type="Point", coordinates=verts[0])
    elif geom_type == "LineString":
        n = cur.i32(big_endian)
        verts = _verts_to_list(cur.f64_block(n * nstored, big_endian),
                               nstored, promote_m)
        result = dict(type="LineString", coordinates=verts)
    elif geom_type == "Polygon":
        n_rings = cur.i32(big_endian)
        rings = []
        for _ in range(n_rings):
            n = cur.i32(big_endian)
            rings.append(_verts_to_list(
                cur.f64_block(n * nstored, big_endian), nstored, promote_m))
        result = dict(type="Polygon", coordinates=rings)
    elif geom_type in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        n = cur.i32(big_endian)
        members = [_load_geom(cur) for _ in range(n)]
        result = dict(
            type=geom_type,
            coordinates=[m["coordinates"] for m in members],
        )
    else:  # GeometryCollection
        n = cur.i32(big_endian)
        # XYM members are promoted to XYZM on load, so an M collection
        # expects 4 ordinates per vertex (ref geomet/wkb.py:874-890)
        expected_ndim = 4 if promote_m else nstored
        geometries = []
        for _ in range(n):
            g = _load_geom(cur)
            if num_dims(g) != expected_ndim:
                raise ValueError("Cannot mix dimensionality in a geometry")
            geometries.append(g)
        result = dict(type="GeometryCollection", geometries=geometries)

    if srid is not None:
        result.update(srid_keys(srid))
    return result


def loads(buf: bytes) -> dict:
    """WKB/EWKB bytes -> GeoJSON-like dict."""
    return _load_geom(_Cursor(buf))


# ---------------------------------------------------------------------------
# Batch (pandas.Series) entry points for Arrow-vectorized Spark UDFs
# ---------------------------------------------------------------------------


def dumps_batch(geoms, big_endian: bool = True):
    """Map ``dumps`` over GeoJSON dicts -> list[bytes|None] (null on failure,
    the P8 malformed-geometry guard)."""
    out = []
    for g in geoms:
        if g is None:
            out.append(None)
            continue
        try:
            out.append(dumps(g, big_endian=big_endian))
        except Exception:
            out.append(None)
    return out


def loads_batch(bufs):
    """Map ``loads`` over WKB byte strings -> list[dict|None]."""
    out = []
    for b in bufs:
        if b is None:
            out.append(None)
            continue
        try:
            out.append(loads(bytes(b)))
        except Exception:
            out.append(None)
    return out
