"""Pure-stdlib image codecs: PNG (zlib inflate + unfilter) and BMP.

This container has no imaging libraries, but PNG needs only ``zlib``
(stdlib) plus the five scanline filters, and uncompressed BMP is plain
``struct`` — so image decode for the two formats is implemented REAL
here, replacing the round-2 stub for them. JPEG/GIF/WebP decode still
raises (entropy coders genuinely need a library).

Scope: PNG bit depth 8, color types 0/2/3/4/6, non-interlaced;
BMP 24/32-bit uncompressed (BI_RGB), top-down or bottom-up. Decoders
return ``(height, width, channels)`` uint8 numpy arrays (RGB/RGBA/gray).
The unfilter loop is row-sequential (Paeth depends on the left
neighbor); it is correctness-first — at production scale you would
swap in a native decoder behind the same ``decode_image`` signature.

``encode_png`` (filter 0) and ``encode_bmp`` exist so pipelines can
write thumbnails and tests can synthesize payloads without any
third-party dependency.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8 array (palette expanded to RGB)."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    plte = None
    header = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # incl. CRC (not verified: decode-only path)
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if header is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = header
    if depth != 8:
        raise NotImplementedError("PNG bit depth %d (only 8)" % depth)
    if interlace != 0:
        raise NotImplementedError("interlaced PNG")
    if color not in _PNG_CHANNELS:
        raise ValueError("PNG color type %d" % color)
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = ch
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = (line + prev) & 0xFF
        else:
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:  # sub
                    base = left
                elif ftype == 3:  # average
                    base = (left + up) >> 1
                elif ftype == 4:  # paeth
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    base = (
                        left if pa <= pb and pa <= pc
                        else up if pb <= pc else ul
                    )
                else:
                    raise ValueError("PNG filter type %d" % ftype)
                cur[x] = (line[x] + base) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 array -> PNG bytes (filter 0, no interlace)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", crc
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + px[y].tobytes() for y in range(h)
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP bytes -> (h, w, 3|4) uint8 RGB(A)."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core header")
    w, h_raw = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise NotImplementedError("compressed BMP (BI code %d)"
                                  % compression)
    if bpp not in (24, 32):
        raise NotImplementedError("BMP bpp %d (only 24/32)" % bpp)
    h = abs(h_raw)
    nch = bpp // 8
    row_stride = (w * nch + 3) & ~3
    px = np.zeros((h, w, nch), dtype=np.uint8)
    for row in range(h):
        start = offset + row * row_stride
        line = np.frombuffer(
            data, dtype=np.uint8, count=w * nch, offset=start
        ).reshape(w, nch)
        y = h - 1 - row if h_raw > 0 else row  # bottom-up default
        px[y] = line
    # BGR(A) -> RGB(A)
    out = px[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]
    return out


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array -> 24-bit bottom-up BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("encode_bmp expects RGB")
    row_stride = (w * 3 + 3) & ~3
    pad = row_stride - w * 3
    body = bytearray()
    for row in range(h - 1, -1, -1):
        body += px[row][:, [2, 1, 0]].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    offset = 14 + 40
    size = offset + len(body)
    header = (
        b"BM" + struct.pack("<IHHI", size, 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(body)


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes -> (h, w, c) uint8 pixels. PNG and BMP
    decode for real (stdlib only); other formats raise
    NotImplementedError (JPEG/GIF/WebP need a real codec library)."""
    if data.startswith(PNG_SIG):
        return decode_png(data)
    if data.startswith(b"BM"):
        return decode_bmp(data)
    raise NotImplementedError(
        "only PNG and BMP decode without imaging libraries"
    )


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (h, w, c) -> (out_h, out_w, c)."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys[:, None], xs[None, :]]


def _gray(px: np.ndarray) -> np.ndarray:
    """(h, w[, c]) -> float64 gray plane; alpha excluded (the
    image_feature convention: 2-channel is gray+alpha, 4 is RGBA)."""
    if px.ndim == 3:
        nc = 1 if px.shape[2] in (1, 2) else 3
        return px[:, :, :nc].mean(axis=2)
    return px.astype(np.float64)


_BIT_POS = np.arange(64, dtype=np.uint64)


def _check_hash_size(hash_size: int) -> None:
    if not 1 <= hash_size * hash_size <= 64:
        raise ValueError(
            "hash_size^2 must fit the 64-bit fingerprint "
            "(1 <= hash_size <= 8), got %r" % (hash_size,)
        )


def ahash(px: np.ndarray, hash_size: int = 8) -> int:
    """Average hash: gray -> hash_size^2 nearest-neighbor downsample,
    bit i (= row*hash_size + col, LSB first) set iff the cell is
    STRICTLY brighter than the mean. Near-identical images (resize,
    mild noise, recompression) land within a few bits of Hamming
    distance — the classic cheap perceptual fingerprint."""
    _check_hash_size(hash_size)
    g = _gray(px)
    small = resize_nearest(
        g[:, :, None], hash_size, hash_size
    )[:, :, 0].astype(np.float64)
    bits = (small > small.mean()).ravel()
    n = hash_size * hash_size
    val = np.bitwise_or.reduce(
        bits.astype(np.uint64) << _BIT_POS[:n]
    )
    return int(np.int64(np.uint64(val)))


def dhash(px: np.ndarray, hash_size: int = 8) -> int:
    """Difference hash: gray -> (hash_size x hash_size+1) downsample,
    bit i (= row*hash_size + col, LSB first) set iff pixel[r, c+1] >
    pixel[r, c] — encodes horizontal gradients, more robust than ahash
    to global brightness shifts."""
    _check_hash_size(hash_size)
    g = _gray(px)
    small = resize_nearest(
        g[:, :, None], hash_size, hash_size + 1
    )[:, :, 0].astype(np.float64)
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    n = hash_size * hash_size
    val = np.bitwise_or.reduce(
        bits.astype(np.uint64) << _BIT_POS[:n]
    )
    return int(np.int64(np.uint64(val)))


def image_feature(px: np.ndarray, grid: int = 4) -> np.ndarray:
    """Deterministic float32 feature: per-cell mean brightness of a
    grid x grid downsample plus global mean/std — the embedding-ish
    vector the similarity operators consume."""
    if px.ndim == 3:
        # color channels only: 2-channel is gray+ALPHA (PNG color type
        # 4) — averaging alpha in would brighten every opaque pixel
        nc = 1 if px.shape[2] in (1, 2) else 3
        gray = px[:, :, :nc].mean(axis=2)
    else:
        gray = px
    small = resize_nearest(
        gray[:, :, None].astype(np.uint8), grid, grid
    )[:, :, 0].astype(np.float64)
    feats = np.concatenate([
        small.ravel() / 255.0,
        [gray.mean() / 255.0, gray.std() / 255.0],
    ])
    return feats.astype(np.float32)
