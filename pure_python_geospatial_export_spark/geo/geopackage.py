"""GeoPackage geometry-blob codec (C5) — byte-exact vs the reference.

Layout (ref geomet/geopackage.py:163-183, spec
http://www.geopackage.org/spec/#gpb_format): magic ``GP``, version 0, a
flags byte (bit0 endianness, bits1-3 envelope indicator, bit4 empty),
int32 SRID, optional envelope of 4/6/8 doubles, then a plain WKB body
(no SRID flag inside the WKB — the header owns it; ref
geomet/geopackage.py:99-104). On load, a header SRID overrides any WKB
SRID and the envelope surfaces as ``bbox`` (ref :107-160).
"""

from __future__ import annotations

import struct

from . import wkb as wkbmod
from .geojson import srid_keys

MAGIC = b"GP"
VERSION = 0

#: envelope indicator -> number of doubles in the envelope
_INDICATOR_TO_NDOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}
#: envelope length (list entries) -> indicator (3 dims default to Z=2)
_LEN_TO_INDICATOR = {0: 0, 4: 1, 6: 2, 8: 4}


def dumps(geom: dict, big_endian: bool = True) -> bytes:
    """GeoJSON-like dict -> GeoPackage blob. ``meta.srid`` goes into the
    header (default 0); a ``bbox`` key becomes the envelope."""
    envelope = list(geom.get("bbox", []))
    srid = int(geom.get("meta", {}).get("srid", 0))
    try:
        indicator = _LEN_TO_INDICATOR[len(envelope)]
    except KeyError:
        raise ValueError(
            "Bounding box must be of length 2*n where n is the number of "
            "dimensions represented in the contained geometries."
        )
    empty = 1 if len(geom.get("coordinates", [])) == 0 else 0

    flags = 0
    if empty:
        flags = 1 << 3
    flags |= indicator
    flags = (flags << 1) | (0 if big_endian else 1)

    token = ">" if big_endian else "<"
    header = struct.pack(
        token + "BBBBI", MAGIC[0], MAGIC[1], VERSION, flags, srid
    )
    if envelope:
        header += struct.pack(
            token + "d" * _INDICATOR_TO_NDOUBLES[indicator], *envelope
        )

    body = geom
    if "meta" in geom or "crs" in geom or "bbox" in geom:
        body = {k: v for k, v in geom.items()
                if k not in ("meta", "crs", "bbox")}
    return header + wkbmod.dumps(body, big_endian=big_endian)


def loads(buf: bytes) -> dict:
    """GeoPackage blob -> GeoJSON-like dict (+ ``bbox`` if enveloped;
    header SRID overrides WKB SRID)."""
    if len(buf) < 8:
        raise ValueError("Could not read Geopackage geometry "
                         "because of errors: header too short")
    flags = buf[3]
    little = flags & 0x01
    token = "<" if little else ">"
    g, p, version, _flags, srid = struct.unpack(token + "BBBBI", buf[:8])
    if bytes([g, p]) != MAGIC:
        raise ValueError("Could not read Geopackage geometry because of "
                         "errors: Missing Geopackage header magic bytes")
    if version != VERSION:
        raise ValueError("Could not read Geopackage geometry because of "
                         "errors: Geopackage version must be 0")
    indicator = (flags & 0x0F) >> 1
    if indicator > 4:
        raise ValueError("Could not read Geopackage geometry because of "
                         "errors: Envelope indicator must be between 0-4")
    ndoubles = _INDICATOR_TO_NDOUBLES[indicator]
    off = 8
    envelope = None
    if ndoubles:
        envelope = struct.unpack(
            token + "d" * ndoubles, buf[off:off + 8 * ndoubles]
        )
        off += 8 * ndoubles

    result = wkbmod.loads(buf[off:])
    if srid:
        result.update(srid_keys(srid))
    if envelope:
        result["bbox"] = list(envelope)
    return result
