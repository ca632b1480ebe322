"""Geohash codec — base32 Z-order cell strings over EPSG:4326.

Engine-added capability (the reference has no cell index at all; its only
spatial pruning is the per-record bbox skip,
ref ppge/pyshp/__init__.py:1381-1388). Geohash is the interoperable
STRING form of the engine's Morton/Z-order cell ids (geo/cells.py): the
same lon-first bit interleave, chunked 5 bits at a time into the standard
base32 alphabet, so external systems (Elasticsearch, Redis GEO, Uber's
movement data, most tile caches) can consume the engine's spatial keys
directly.

The encoder exists in three bit-identical forms:

* :func:`geohash_col` — pure Spark column arithmetic (floor / shift /
  mask / element_at), JVM-side and whole-stage-codegen'd: at 10^12 rows
  the geohash derive runs at scan speed with no Python in the path;
* :func:`geohash_sql` — the same arithmetic as ANSI SQL for the DuckDB
  oracle (bit-level parity: quantization is one correctly-rounded IEEE
  add/div/mul per axis, everything after is exact integer arithmetic);
* :func:`encode_geohash` — numpy batch kernel for Arrow/mapInPandas use
  and for tests.

Semantics match the classic bisection algorithm exactly FOR EVERY
DOUBLE, including coordinates within 1 ulp of a cell edge: the fast
floor quantization is followed by an exact-boundary correction (cell
edges are exact dyadic doubles, so the at-most-one-cell floor error is
detectable and repairable with a +-1 adjustment — see ``_quantize_np``).
Property-tested against a bit-by-bit reference implementation on both
random and boundary-adjacent points. Even interleave positions
(MSB-first) take longitude bits, odd take latitude; cell edges follow
the engine's convention that lon=180 / lat=90 clamp into the last cell
so every valid coordinate maps to exactly one geohash.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 12  # 60 interleaved bits — comfortably int64

_CHAR_TO_VAL = {c: i for i, c in enumerate(ALPHABET)}
_ALPH_ARR = np.array(list(ALPHABET))
_VAL_LUT = np.full(128, -1, dtype=np.int64)
for _i, _c in enumerate(ALPHABET):
    _VAL_LUT[ord(_c)] = _i


def _check_precision(precision: int) -> int:
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(
            "precision must be in [1, %d]" % MAX_PRECISION
        )
    return int(precision)


def _bit_split(precision: int) -> Tuple[int, int, int]:
    """(total_bits, lon_bits, lat_bits) for a precision."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2  # lon leads the interleave
    return bits, lon_bits, bits - lon_bits


def _quantize_np(vals: np.ndarray, lo: float, span: float,
                 nbits: int) -> np.ndarray:
    # Fast floor, then an exact-boundary correction so the result
    # equals the textbook bisection for EVERY double, not just points
    # away from cell edges. Cell boundaries lo + q*span/2^k are exact
    # doubles (span/2^k is 45*2^j and every multiple in range has
    # <= 53 significant bits; adding lo = -span/2, itself a boundary
    # multiple, stays representable, so the IEEE ops below are exact),
    # while the fast floor's three roundings can misplace a point
    # within ~1 ulp of an edge by at most one cell (error < 2^-22
    # cells), so a single +-1 adjustment restores exactness.
    n = np.int64(1) << np.int64(nbits)
    step = span / np.float64(n)  # exact: 45 * 2^j
    q = np.floor((vals - lo) / span * np.float64(n)).astype(np.int64)
    np.clip(q, 0, n - 1, out=q)
    q -= vals < (q.astype(np.float64) * step + lo)
    q += vals >= ((q + 1).astype(np.float64) * step + lo)
    np.clip(q, 0, n - 1, out=q)
    return q


def xy_to_geohash(x, y, precision: int) -> np.ndarray:
    """Vectorized grid coordinates (lon-index, lat-index at the
    precision's bit split) -> geohash strings."""
    precision = _check_precision(precision)
    bits, lon_bits, lat_bits = _bit_split(precision)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.zeros_like(x)
    for k in range(lon_bits):
        z |= ((x >> np.int64(lon_bits - 1 - k)) & 1) << np.int64(
            bits - 1 - 2 * k
        )
    for k in range(lat_bits):
        z |= ((y >> np.int64(lat_bits - 1 - k)) & 1) << np.int64(
            bits - 2 - 2 * k
        )
    out = np.full(z.shape, "", dtype="<U%d" % precision)
    for c in range(precision):
        chunk = (z >> np.int64(5 * (precision - 1 - c))) & 31
        out = np.char.add(out, _ALPH_ARR[chunk])
    return out


def encode_geohash(lons, lats, precision: int = 9) -> np.ndarray:
    """Vectorized (lon, lat) -> geohash strings at ``precision`` chars."""
    precision = _check_precision(precision)
    _bits, lon_bits, lat_bits = _bit_split(precision)
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    x = _quantize_np(lons, -180.0, 360.0, lon_bits)
    y = _quantize_np(lats, -90.0, 180.0, lat_bits)
    return xy_to_geohash(x, y, precision)


def decode_geohash(ghs) -> Tuple[np.ndarray, np.ndarray,
                                 np.ndarray, np.ndarray]:
    """Vectorized geohash strings -> (lon_min, lat_min, lon_max, lat_max).

    All inputs must share one precision (one string length).
    """
    ghs = np.ascontiguousarray(np.asarray(ghs, dtype="U"))
    if ghs.size == 0:
        e = np.empty(0, dtype=np.float64)
        return e, e.copy(), e.copy(), e.copy()
    lengths = np.char.str_len(ghs)
    precision = int(lengths.flat[0])
    if not (lengths == precision).all():
        raise ValueError("mixed geohash precisions in one batch")
    _check_precision(precision)
    bits, lon_bits, lat_bits = _bit_split(precision)
    # chars -> 5-bit values -> interleaved z
    codes = ghs.view(np.uint32).reshape(ghs.shape + (-1,))[
        ..., :precision
    ].astype(np.int64)
    if (codes >= 128).any():
        raise ValueError("invalid geohash character")
    vals = _VAL_LUT[codes]
    if (vals < 0).any():
        raise ValueError("invalid geohash character")
    z = np.zeros(ghs.shape, dtype=np.int64)
    for c in range(precision):
        z = (z << np.int64(5)) | vals[..., c]
    x = np.zeros_like(z)
    y = np.zeros_like(z)
    for k in range(lon_bits):
        x |= ((z >> np.int64(bits - 1 - 2 * k)) & 1) << np.int64(
            lon_bits - 1 - k
        )
    for k in range(lat_bits):
        y |= ((z >> np.int64(bits - 2 - 2 * k)) & 1) << np.int64(
            lat_bits - 1 - k
        )
    nx = np.float64(np.int64(1) << np.int64(lon_bits))
    ny = np.float64(np.int64(1) << np.int64(lat_bits))
    lon_min = x / nx * 360.0 - 180.0
    lat_min = y / ny * 180.0 - 90.0
    lon_max = (x + 1) / nx * 360.0 - 180.0
    lat_max = (y + 1) / ny * 180.0 - 90.0
    return lon_min, lat_min, lon_max, lat_max


def geohash_center(ghs) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized geohash strings -> cell-center (lon, lat)."""
    x0, y0, x1, y1 = decode_geohash(ghs)
    return (x0 + x1) / 2.0, (y0 + y1) / 2.0


def geohash_neighbors(gh: str) -> List[str]:
    """The up-to-8 neighboring geohashes of ``gh`` (same precision).

    Longitude wraps across the antimeridian; rows beyond the poles are
    dropped (a polar cell has 5 neighbors). Order is row-major from the
    south-west, excluding ``gh`` itself.
    """
    precision = _check_precision(len(gh))
    _, lon_bits, lat_bits = _bit_split(precision)
    x0, y0, x1, y1 = decode_geohash([gh])
    nx = 1 << lon_bits
    ny = 1 << lat_bits
    cx = int(np.floor((x0[0] + 180.0) / 360.0 * nx + 0.5))
    cy = int(np.floor((y0[0] + 90.0) / 180.0 * ny + 0.5))
    out: List[str] = []
    for dy in (-1, 0, 1):
        yy = cy + dy
        if not 0 <= yy < ny:
            continue
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            xx = (cx + dx) % nx
            lon = (xx + 0.5) / nx * 360.0 - 180.0
            lat = (yy + 0.5) / ny * 180.0 - 90.0
            out.append(str(encode_geohash([lon], [lat], precision)[0]))
    return out


def geohash_cover(rings, precision: int, edges: str = "planar",
                  max_sagitta_rad: float = 2e-5):
    """Geohashes covering a polygon (GeoJSON ring list), tagged
    ``full`` -> [(geohash, is_full)].

    The geohash sibling of ``cells.polygon_cover`` over the codec's
    ANISOTROPIC grid (lon gets the extra interleave bit at odd total
    bits): candidate cells seed from each ring's bbox range with a
    +-1-cell safety margin (the raw floor can misplace a bbox edge
    within 1 ulp of a cell boundary; margin cells that don't truly
    touch are removed by the exact pruning below, so the result is
    boundary-safe without being conservative). ``is_full`` means the
    cell rectangle is certainly entirely inside the polygon (all four
    corners inside and no polygon edge's bbox overlaps the cell —
    never false-positive), so points in full cells skip the exact
    ray-cast refine.

    ``edges='geodesic'`` follows the engine's densify-then-planar
    recipe (operators/tiles.py): rings densify along great circles to
    ``max_sagitta_rad`` (default 2e-5 rad ~ 127 m) ONCE, then cover /
    full-flag / any downstream refine all run planar on the densified
    rings — mutually exact against consumers using the same densified
    geometry.
    """
    from . import kernels
    from .kernels import points_in_polygon, ring_bbox

    if edges == "geodesic":
        from .geodesic import densify_ring_geodesic

        rings = [
            densify_ring_geodesic(r, max_sagitta_rad) for r in rings
        ]
    elif edges != "planar":
        raise ValueError(
            "edges must be 'planar' or 'geodesic', got %r" % edges
        )

    precision = _check_precision(precision)
    _bits, lon_bits, lat_bits = _bit_split(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    w, h = 360.0 / nx, 180.0 / ny

    # seam-crossing rings become their [-180, 180] lobes, exactly as in
    # cells.polygon_cover — bbox seeding must never span the seam
    rings = kernels.expand_antimeridian_rings(rings)
    if not rings:
        return []

    pairs = []
    for r in rings:
        bb = ring_bbox(np.asarray(r, dtype=np.float64)[:, :2])
        x0 = max(0, int(np.floor((bb[0] + 180.0) / 360.0 * nx)) - 1)
        x1 = min(nx - 1, int(np.floor((bb[2] + 180.0) / 360.0 * nx)) + 1)
        y0 = max(0, int(np.floor((bb[1] + 90.0) / 180.0 * ny)) - 1)
        y1 = min(ny - 1, int(np.floor((bb[3] + 90.0) / 180.0 * ny)) + 1)
        gx, gy = np.meshgrid(
            np.arange(x0, x1 + 1, dtype=np.int64),
            np.arange(y0, y1 + 1, dtype=np.int64),
        )
        pairs.append(gx.ravel() * np.int64(ny) + gy.ravel())
    cand = np.unique(np.concatenate(pairs))
    x = cand // np.int64(ny)
    y = cand % np.int64(ny)

    lon0 = -180.0 + x.astype(np.float64) * w
    lat0 = -90.0 + y.astype(np.float64) * h
    lon1 = lon0 + w
    lat1 = lat0 + h

    corners_x = np.stack([lon0, lon1, lon0, lon1], axis=1).ravel()
    corners_y = np.stack([lat0, lat0, lat1, lat1], axis=1).ravel()
    corner_inside = points_in_polygon(
        corners_x, corners_y, rings
    ).reshape(-1, 4)
    any_corner = corner_inside.any(axis=1)
    all_corners = corner_inside.all(axis=1)

    edge_touch = np.zeros(len(cand), dtype=bool)
    vertex_in_cell = np.zeros(len(cand), dtype=bool)
    for ring in rings:
        arr = np.asarray(ring, dtype=np.float64)[:, :2]
        ex0 = np.minimum(arr[:-1, 0], arr[1:, 0])
        ex1 = np.maximum(arr[:-1, 0], arr[1:, 0])
        ey0 = np.minimum(arr[:-1, 1], arr[1:, 1])
        ey1 = np.maximum(arr[:-1, 1], arr[1:, 1])
        t = (
            (lon0[:, None] <= ex1[None, :])
            & (lon1[:, None] >= ex0[None, :])
            & (lat0[:, None] <= ey1[None, :])
            & (lat1[:, None] >= ey0[None, :])
        )
        edge_touch |= t.any(axis=1)
        vx = (
            (arr[None, :, 0] >= lon0[:, None])
            & (arr[None, :, 0] <= lon1[:, None])
            & (arr[None, :, 1] >= lat0[:, None])
            & (arr[None, :, 1] <= lat1[:, None])
        )
        vertex_in_cell |= vx.any(axis=1)

    keep = any_corner | edge_touch | vertex_in_cell
    full = all_corners & ~edge_touch
    ghs = xy_to_geohash(x[keep], y[keep], precision)
    return [
        (str(g), bool(f)) for g, f in zip(ghs, full[keep].tolist())
    ]


def _quantize_col(val: Column, lo: float, span: float,
                  nbits: int) -> Column:
    # fast floor + exact-boundary correction — see _quantize_np
    n = 1 << nbits
    step = span / float(n)
    q = F.floor((val - F.lit(lo)) / F.lit(span) * F.lit(float(n)))
    q = F.least(
        F.greatest(q.cast("long"), F.lit(0).cast("long")),
        F.lit(n - 1).cast("long"),
    )
    q = q - F.when(
        val < q.cast("double") * F.lit(step) + F.lit(lo), F.lit(1)
    ).otherwise(F.lit(0)).cast("long")
    q = q + F.when(
        val >= (q + F.lit(1)).cast("double") * F.lit(step) + F.lit(lo),
        F.lit(1),
    ).otherwise(F.lit(0)).cast("long")
    return F.least(
        F.greatest(q, F.lit(0).cast("long")),
        F.lit(n - 1).cast("long"),
    )


def geohash_col(lon: Column, lat: Column, precision: int = 9) -> Column:
    """Geohash as a pure Spark column expression (no Python in the path).

    Bit-identical to :func:`encode_geohash` and :func:`geohash_sql`:
    the quantization is one IEEE add/div/mul per axis and the
    interleave/base32 steps are exact integer arithmetic.
    """
    precision = _check_precision(precision)
    bits, lon_bits, lat_bits = _bit_split(precision)
    x = _quantize_col(lon, -180.0, 360.0, lon_bits)
    y = _quantize_col(lat, -90.0, 180.0, lat_bits)
    z = F.lit(0).cast("long")
    for k in range(lon_bits):
        z = z + F.shiftleft(
            F.shiftright(x, lon_bits - 1 - k).bitwiseAND(F.lit(1)),
            bits - 1 - 2 * k,
        )
    for k in range(lat_bits):
        z = z + F.shiftleft(
            F.shiftright(y, lat_bits - 1 - k).bitwiseAND(F.lit(1)),
            bits - 2 - 2 * k,
        )
    alph = F.array(*[F.lit(c) for c in ALPHABET])
    chars = [
        F.element_at(
            alph,
            (
                F.shiftright(z, 5 * (precision - 1 - c))
                .bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lon_expr: str, lat_expr: str, precision: int = 9) -> str:
    """The same geohash arithmetic as an ANSI-SQL expression (DuckDB)."""
    precision = _check_precision(precision)
    bits, lon_bits, lat_bits = _bit_split(precision)

    def quant(expr: str, lo: str, span: str, nbits: int) -> str:
        # fast floor + exact-boundary correction — see _quantize_np
        n = 1 << nbits
        step = float(span) / float(n)
        q0 = (
            "least(greatest(CAST(floor((%s + %s) / %s * %d.0) AS BIGINT),"
            " 0), %d)" % (expr, lo, span, n, n - 1)
        )
        q1 = (
            "(%s - CASE WHEN %s < CAST(%s AS DOUBLE) * %r - %s"
            " THEN 1 ELSE 0 END)" % (q0, expr, q0, step, lo)
        )
        q2 = (
            "(%s + CASE WHEN %s >= CAST(%s + 1 AS DOUBLE) * %r - %s"
            " THEN 1 ELSE 0 END)" % (q1, expr, q1, step, lo)
        )
        return "least(greatest(%s, 0), %d)" % (q2, n - 1)

    x = quant(lon_expr, "180.0", "360.0", lon_bits)
    y = quant(lat_expr, "90.0", "180.0", lat_bits)
    terms = [
        "(((%s >> %d) & 1) << %d)" % (x, lon_bits - 1 - k, bits - 1 - 2 * k)
        for k in range(lon_bits)
    ] + [
        "(((%s >> %d) & 1) << %d)" % (y, lat_bits - 1 - k, bits - 2 - 2 * k)
        for k in range(lat_bits)
    ]
    z = "(" + " + ".join(terms) + ")"
    chars = [
        "substr('%s', CAST((%s >> %d) & 31 AS INTEGER) + 1, 1)"
        % (ALPHABET, z, 5 * (precision - 1 - c))
        for c in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"
