"""Vectorized geometry kernels (numpy) — the engine's batch compute core.

Each kernel reproduces the observable semantics of a reference routine
(cited per function) but is re-derived as an array program: points are
processed in whole Arrow batches inside pandas UDFs, never row-at-a-time.

The ray-cast point-in-ring kernel preserves the reference's exact crossing
rules (>= comparisons, MacMartin above/below discard) so that join outputs
match the reference row-for-row — including points exactly on edges.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

Bbox = Tuple[float, float, float, float]

#: chunk size for the points axis of the (points x edges) crossing matrix;
#: bounds kernel working memory to ~chunk * n_edges * 8B per temp array,
#: independent of Arrow batch size.
_PIP_CHUNK = 4096

#: cap on TOTAL CELLS (points x edges) per chunk: a 4096-point chunk
#: against an 8000-vertex admin boundary is a 262MB float64 temporary
#: (x several live at once) — memory-bandwidth-bound, and concurrent
#: refine workers then thrash each other (measured: a salted spatial
#: join's reduce stage did 20x the single-worker wall on 9 workers).
#: 2M cells keeps temps ~16MB — cache-resident, compute-bound, and
#: parallel-friendly. Chunking never changes results, only locality.
_PIP_CELL_BUDGET = 2_000_000


def signed_area(ring: np.ndarray, fast: bool = False) -> float:
    """Signed ring area, >= 0 for counter-clockwise orientation.

    Semantics of ref ppge/pyshp/__init__.py:201-214 (closed-ring shoelace,
    2x area when ``fast``); z/m ordinates beyond the first two are ignored.
    """
    ring = np.asarray(ring, dtype=np.float64)
    x = ring[:, 0]
    y = ring[:, 1]
    # closed ring: wrap with the second vertex like the reference does
    x_ext = np.concatenate([x, x[1:2]])
    y_ext = np.concatenate([y, y[1:2]])
    i = np.arange(1, len(ring))
    area2 = float(np.sum(x_ext[i] * (y_ext[i + 1] - y_ext[i - 1])))
    return area2 if fast else area2 / 2.0


def is_cw(ring) -> bool:
    """True for clockwise (negatively signed area); ref :217-222."""
    return signed_area(ring, fast=True) < 0


def rewind(ring):
    """Reverse vertex order; ref :225-227."""
    return list(reversed(list(ring)))


def ring_bbox(ring) -> Bbox:
    """(xmin, ymin, xmax, ymax) of a ring; ref :230-234."""
    arr = np.asarray(ring, dtype=np.float64)
    return (
        float(arr[:, 0].min()),
        float(arr[:, 1].min()),
        float(arr[:, 0].max()),
        float(arr[:, 1].max()),
    )


def bbox_overlap(b1: Bbox, b2: Bbox) -> bool:
    """Axis-aligned rectangle intersection; ref :237-242."""
    return (
        b1[0] <= b2[2] and b1[2] >= b2[0] and b1[1] <= b2[3] and b1[3] >= b2[1]
    )


def bbox_contains(b1: Bbox, b2: Bbox) -> bool:
    """Strict containment of b2 in b1; ref :245-250."""
    return b1[0] < b2[0] and b1[2] > b2[2] and b1[1] < b2[1] and b1[3] > b2[3]


def bbox_overlap_mask(
    px_min, py_min, px_max, py_max, bbox: Bbox
) -> np.ndarray:
    """Vectorized bbox-overlap of N boxes against one box -> bool[N]."""
    return (
        (px_min <= bbox[2])
        & (px_max >= bbox[0])
        & (py_min <= bbox[3])
        & (py_max >= bbox[1])
    )


def points_in_ring(
    points_x: np.ndarray, points_y: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Ray-cast crossing-parity containment of N points in one ring.

    Vectorized re-derivation of the reference's scalar MacMartin kernel
    (ref ppge/pyshp/__init__.py:253-295): shoot a +X ray per point, count
    edge crossings, preserving the exact >= comparison rules so boundary
    behavior matches the reference bit-for-bit. Edges whose endpoints lie
    on the same side of the test Y are discarded by a boolean mask (the
    MacMartin shortcut expressed as vectorized selection).

    :returns: bool[N] inside flags.
    """
    ring = np.asarray(ring, dtype=np.float64)
    x0 = ring[:-1, 0]  # edge start vertices (ring is closed)
    y0 = ring[:-1, 1]
    x1 = ring[1:, 0]
    y1 = ring[1:, 1]

    px = np.asarray(points_x, dtype=np.float64)
    py = np.asarray(points_y, dtype=np.float64)
    inside = np.zeros(len(px), dtype=bool)

    chunk = max(16, min(_PIP_CHUNK,
                        _PIP_CELL_BUDGET // max(1, len(x0))))
    for lo in range(0, len(px), chunk):
        hi = min(lo + chunk, len(px))
        tx = px[lo:hi, None]  # (n, 1)
        ty = py[lo:hi, None]

        yflag0 = y0[None, :] >= ty  # (n, m)
        yflag1 = y1[None, :] >= ty
        straddle = yflag0 != yflag1

        xflag0 = x0[None, :] >= tx
        xflag1 = x1[None, :] >= tx
        same_x_side = xflag0 == xflag1

        # both endpoints right of the point -> certain hit
        certain = straddle & same_x_side & xflag0

        # endpoints on opposite X sides -> compute ray intersection.
        # denominator y0-y1 is nonzero wherever straddle holds.
        denom = y0[None, :] - y1[None, :]
        denom = np.where(denom == 0.0, 1.0, denom)
        # lanes where straddle is False can overflow (tiny denom under
        # a huge dx) — they're masked out below, so suppress only
        # those warnings here rather than training readers to ignore
        # numpy warnings globally
        with np.errstate(over="ignore", invalid="ignore"):
            crossing_x = x1[None, :] - (y1[None, :] - ty) * (
                x0[None, :] - x1[None, :]
            ) / denom
        computed = straddle & ~same_x_side & (crossing_x >= tx)

        crossings = (certain | computed).sum(axis=1)
        inside[lo:hi] = (crossings % 2).astype(bool)
    return inside


def ring_contains_point(ring, point) -> bool:
    """Scalar convenience wrapper over :func:`points_in_ring`; ref :253-295."""
    res = points_in_ring(
        np.array([point[0]]), np.array([point[1]]), np.asarray(ring)
    )
    return bool(res[0])


def ring_contains_ring(ring1, ring2) -> bool:
    """All vertices of ring2 inside ring1; ref :346-348."""
    arr = np.asarray(ring2, dtype=np.float64)
    return bool(points_in_ring(arr[:, 0], arr[:, 1], np.asarray(ring1)).all())


def ring_crosses_antimeridian(ring) -> bool:
    """True when any edge jumps more than 180 degrees in longitude — the
    standard convention (RFC 7946 §3.1.9) that such an edge takes the
    short way around, i.e. crosses the +-180 seam. Alaska/Fiji-style
    rings digitized in [-180, 180] hit this; a deliberate planar edge
    wider than a hemisphere does not round-trip this convention and must
    be pre-split by the caller."""
    lon = np.asarray(ring, dtype=np.float64)[:, 0]
    return bool((np.abs(np.diff(lon)) > 180.0).any())


def _clip_ring_halfplane(
    ring: np.ndarray, line_x: float, keep_left: bool
) -> Optional[np.ndarray]:
    """Sutherland-Hodgman clip of a closed ring against the half-plane
    x <= line_x (or x >= line_x). Driver-side, per-polygon — not a hot
    path. Returns a closed ring or None when nothing remains.
    Delegates to the two-axis generalization :func:`_clip_ring_axis`
    (one clipper, one set of degenerate-case rules)."""
    return _clip_ring_axis(
        np.asarray(ring, dtype=np.float64), line_x, 0, keep_left
    )


def _clip_ring_axis(
    ring: np.ndarray, line: float, axis: int, keep_low: bool
) -> Optional[np.ndarray]:
    """Sutherland-Hodgman clip against ``coord[axis] <= line`` (or >=).
    Generalizes :func:`_clip_ring_halfplane` to both axes (tile/bbox
    clipping needs y cuts too). Returns a closed ring or None."""
    out: List[List[float]] = []
    for i in range(len(ring) - 1):
        p, q = ring[i], ring[i + 1]
        pin = p[axis] <= line if keep_low else p[axis] >= line
        qin = q[axis] <= line if keep_low else q[axis] >= line
        if pin:
            out.append([p[0], p[1]])
            if not qin:
                t = (line - p[axis]) / (q[axis] - p[axis])
                v = [0.0, 0.0]
                v[axis] = line
                v[1 - axis] = p[1 - axis] + t * (q[1 - axis]
                                                 - p[1 - axis])
                out.append(v)
        elif qin:
            t = (line - p[axis]) / (q[axis] - p[axis])
            v = [0.0, 0.0]
            v[axis] = line
            v[1 - axis] = p[1 - axis] + t * (q[1 - axis] - p[1 - axis])
            out.append(v)
    if len(out) < 3:
        return None
    out.append(list(out[0]))
    return np.asarray(out, dtype=np.float64)


def clip_ring_bbox(ring, bbox) -> Optional[np.ndarray]:
    """Clip a closed ring to a bbox (four successive half-plane cuts).
    Returns the clipped closed ring or None when nothing remains.
    Concave rings crossing a side multiple times come back as one ring
    joined by zero-width bridges along the cut line — crossing-parity
    tests and signed areas are unaffected (same convention as the
    antimeridian seam split)."""
    x0, y0, x1, y1 = (float(v) for v in bbox)
    arr = np.asarray(ring, dtype=np.float64)[:, :2]
    for line, axis, keep_low in (
        (x0, 0, False),
        (x1, 0, True),
        (y0, 1, False),
        (y1, 1, True),
    ):
        arr = _clip_ring_axis(arr, line, axis, keep_low)
        if arr is None:
            return None
    return arr


def _edge_pair_hits(p: np.ndarray, q: np.ndarray):
    """(proper, touch) boolean matrices over all edge pairs of closed
    rings ``p`` and ``q`` — the matrix form of
    :func:`segments_intersect_any` (which keeps its own early-exit
    copy of this math for the hot join path). Used by ring-simplicity
    validation, which needs per-pair results to mask adjacency."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    p1, p2 = p[:-1], p[1:]
    q1, q2 = q[:-1], q[1:]

    def cross(o, d, pts):
        return (d[..., 0] * (pts[..., 1] - o[..., 1])
                - d[..., 1] * (pts[..., 0] - o[..., 0]))

    dp = p2 - p1
    dq = q2 - q1
    P1, P2 = p1[:, None, :], p2[:, None, :]
    Q1, Q2 = q1[None, :, :], q2[None, :, :]
    DP, DQ = dp[:, None, :], dq[None, :, :]
    d1 = cross(P1, DP, Q1)
    d2 = cross(P1, DP, Q2)
    d3 = cross(Q1, DQ, P1)
    d4 = cross(Q1, DQ, P2)
    proper = (
        ((d1 > 0) & (d2 < 0) | (d1 < 0) & (d2 > 0))
        & ((d3 > 0) & (d4 < 0) | (d3 < 0) & (d4 > 0))
    )

    def on_seg(s1, s2, pts, d):
        return (
            (d == 0)
            & (pts[..., 0] >= np.minimum(s1[..., 0], s2[..., 0]))
            & (pts[..., 0] <= np.maximum(s1[..., 0], s2[..., 0]))
            & (pts[..., 1] >= np.minimum(s1[..., 1], s2[..., 1]))
            & (pts[..., 1] <= np.maximum(s1[..., 1], s2[..., 1]))
        )

    touch = (
        on_seg(P1, P2, Q1, d1) | on_seg(P1, P2, Q2, d2)
        | on_seg(Q1, Q2, P1, d3) | on_seg(Q1, Q2, P2, d4)
    )
    return proper, touch


def ring_self_intersects(ring) -> bool:
    """True when a CLOSED ring's boundary is not simple: any pair of
    NON-adjacent edges crosses or touches (adjacent edges legitimately
    share their common endpoint; the first and last edge are adjacent
    through the closure point). Zero-length edges and spikes are
    separate validity checks — this detects crossings only."""
    arr = np.asarray(ring, dtype=np.float64)[:, :2]
    n = len(arr) - 1  # edge count
    if n < 3:
        return False
    proper, touch = _edge_pair_hits(arr, arr)
    hits = proper | touch
    idx = np.arange(n)
    adjacent = (
        (np.abs(idx[:, None] - idx[None, :]) <= 1)
        | ((idx[:, None] == 0) & (idx[None, :] == n - 1))
        | ((idx[:, None] == n - 1) & (idx[None, :] == 0))
    )
    return bool((hits & ~adjacent).any())


def segments_intersect_any(a: np.ndarray, b: np.ndarray) -> bool:
    """True when ANY edge of closed ring ``a`` intersects any edge of
    closed ring ``b`` (proper crossings, collinear overlaps, and
    endpoint touches all count). Vectorized (|a| x |b|) orientation
    tests — both rings are small-polygon sized, so the dense matrix is
    the fast path."""
    p = np.asarray(a, dtype=np.float64)
    q = np.asarray(b, dtype=np.float64)
    p1, p2 = p[:-1], p[1:]
    q1, q2 = q[:-1], q[1:]

    def cross(o, d, pts):
        # orientation of pts relative to segment (o -> o+d), broadcast
        return (d[..., 0] * (pts[..., 1] - o[..., 1])
                - d[..., 1] * (pts[..., 0] - o[..., 0]))

    dp = p2 - p1
    dq = q2 - q1
    P1, P2 = p1[:, None, :], p2[:, None, :]
    Q1, Q2 = q1[None, :, :], q2[None, :, :]
    DP, DQ = dp[:, None, :], dq[None, :, :]
    d1 = cross(P1, DP, Q1)
    d2 = cross(P1, DP, Q2)
    d3 = cross(Q1, DQ, P1)
    d4 = cross(Q1, DQ, P2)
    proper = (
        ((d1 > 0) & (d2 < 0) | (d1 < 0) & (d2 > 0))
        & ((d3 > 0) & (d4 < 0) | (d3 < 0) & (d4 > 0))
    )
    if bool(proper.any()):
        return True

    def on_seg(s1, s2, pts, d):
        return (
            (d == 0)
            & (pts[..., 0] >= np.minimum(s1[..., 0], s2[..., 0]))
            & (pts[..., 0] <= np.maximum(s1[..., 0], s2[..., 0]))
            & (pts[..., 1] >= np.minimum(s1[..., 1], s2[..., 1]))
            & (pts[..., 1] <= np.maximum(s1[..., 1], s2[..., 1]))
        )
    touch = (
        on_seg(P1, P2, Q1, d1) | on_seg(P1, P2, Q2, d2)
        | on_seg(Q1, Q2, P1, d3) | on_seg(Q1, Q2, P2, d4)
    )
    return bool(touch.any())


def polygons_intersect(rings_a, rings_b) -> bool:
    """Exact "intersects" predicate between two even-odd polygons given
    as GeoJSON ring lists (boundary contact counts). True iff a vertex
    of either polygon lies inside the other, or any boundary edges
    cross/touch — which covers containment, partial overlap, and
    touch; a probe sitting wholly inside a HOLE fails all three (its
    vertices test outside by parity, and no edges meet)."""
    a = [np.asarray(r, dtype=np.float64)[:, :2] for r in rings_a]
    b = [np.asarray(r, dtype=np.float64)[:, :2] for r in rings_b]
    va = np.concatenate([r[:-1] for r in a])
    vb = np.concatenate([r[:-1] for r in b])
    if points_in_polygon(va[:, 0], va[:, 1], rings_b).any():
        return True
    if points_in_polygon(vb[:, 0], vb[:, 1], rings_a).any():
        return True
    for ra in a:
        bb_a = ring_bbox(ra)
        for rb in b:
            if not bbox_overlap(bb_a, ring_bbox(rb)):
                continue
            if segments_intersect_any(ra, rb):
                return True
    return False


def lines_intersect_polygon(lines, rings_b) -> bool:
    """Exact "intersects" between a set of polylines (open; no
    interior) and an even-odd polygon: any polyline vertex inside the
    polygon, or any polyline segment crossing/touching any ring edge.
    A polyline fully inside a HOLE fails both."""
    ls = [np.asarray(line, dtype=np.float64)[:, :2] for line in lines]
    v = np.concatenate(ls)
    if points_in_polygon(v[:, 0], v[:, 1], rings_b).any():
        return True
    for line in ls:
        bb = ring_bbox(line)
        for rb in rings_b:
            arr = np.asarray(rb, dtype=np.float64)[:, :2]
            if not bbox_overlap(bb, ring_bbox(arr)):
                continue
            if segments_intersect_any(line, arr):
                return True
    return False


def simplify_line(points, tolerance: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification: keep the subset of
    vertices whose removal would deviate the line by more than
    ``tolerance`` (perpendicular distance). Endpoints always survive.
    Iterative stack (no recursion limit); distances vectorized per
    segment. Deterministic: the farthest-point tie breaks on the lowest
    index (argmax)."""
    arr = np.asarray(points, dtype=np.float64)[:, :2]
    n = len(arr)
    if n <= 2:
        return arr.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        seg = arr[j] - arr[i]
        span = float(np.hypot(seg[0], seg[1]))
        mid = arr[i + 1:j] - arr[i]
        if span == 0.0:
            d = np.hypot(mid[:, 0], mid[:, 1])
        else:
            d = np.abs(mid[:, 0] * seg[1] - mid[:, 1] * seg[0]) / span
        k = int(np.argmax(d))
        if float(d[k]) > tolerance:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return arr[keep]


def simplify_ring(ring, tolerance: float) -> Optional[np.ndarray]:
    """Douglas-Peucker for a CLOSED ring: the ring is split at its two
    mutually farthest vertices (so no edge of the closed shape is
    anchored arbitrarily), each half simplifies as a polyline, and the
    halves rejoin closed. Returns None when the ring collapses below 3
    distinct vertices (degenerate at this tolerance) — callers drop it,
    which is the correct rendering semantics for a sub-tolerance
    feature."""
    arr = np.asarray(ring, dtype=np.float64)[:, :2]
    if len(arr) > 0 and (arr[0] == arr[-1]).all():
        arr = arr[:-1]
    if len(arr) < 3:
        return None
    # anchor at the farthest pair from vertex 0 (O(n) twice — adequate
    # anchor quality without the O(n^2) diameter)
    d0 = np.hypot(*(arr - arr[0]).T)
    a = int(np.argmax(d0))
    da = np.hypot(*(arr - arr[a]).T)
    b = int(np.argmax(da))
    a, b = min(a, b), max(a, b)
    if a == b:
        return None
    half1 = simplify_line(arr[a:b + 1], tolerance)
    half2 = simplify_line(
        np.concatenate([arr[b:], arr[:a + 1]]), tolerance
    )
    out = np.concatenate([half1[:-1], half2[:-1]])
    # dedupe consecutive coincident vertices left by the join
    dif = np.diff(np.concatenate([out, out[:1]]), axis=0)
    mask = (np.abs(dif) > 0).any(axis=1)
    out = out[mask]
    if len(out) < 3:
        return None
    return np.concatenate([out, out[:1]])


def split_ring_antimeridian(ring) -> List[np.ndarray]:
    """Split a dateline-crossing ring into lobes entirely within
    [-180, 180], each a valid closed planar ring.

    Longitudes are first unwrapped into a continuous frame (every edge
    takes the short way around), the unwrapped ring is clipped at each
    seam line 180 + 360k it straddles (half-plane Sutherland-Hodgman —
    multi-crossing rings yield lobes joined by zero-width seam bridges,
    which cancel in crossing-parity tests), and each lobe is shifted by
    a multiple of 360 back into [-180, 180]. Even-odd parity over the
    lobes equals parity over the spherical ring for every point off the
    seam line, so downstream kernels/covers need no other change."""
    import math

    arr = np.asarray(ring, dtype=np.float64)[:, :2]
    lon = arr[:, 0]
    d = np.diff(lon)
    shift = np.zeros(len(lon))
    shift[1:] = np.cumsum(
        np.where(d > 180.0, -360.0, np.where(d < -180.0, 360.0, 0.0))
    )
    pts = np.column_stack([lon + shift, arr[:, 1]])
    # POLE-ENCIRCLING rings wind once around in longitude, so the
    # unwrapped polyline ends 360 deg from where it started — an OPEN
    # curve with no chart-bounded interior. Close it over the pole on
    # the side of the ring's mean latitude (the polar-cap convention:
    # an Antarctic coastline ring means the south cap): walk from the
    # last vertex to the pole, across at pole latitude, and back down
    # to the first vertex. The subsequent seam clipping then yields
    # lobes whose planar interior is exactly the cap.
    wind = int(round((pts[-1, 0] - pts[0, 0]) / 360.0))
    if wind:
        if abs(wind) > 1:
            raise ValueError(
                "ring winds %d times around the globe — not a valid "
                "polygon boundary" % wind
            )
        pole = 90.0 if float(np.mean(arr[:-1, 1])) >= 0.0 else -90.0
        closure = np.array([
            [pts[-1, 0], pole],
            [pts[0, 0], pole],
            [pts[0, 0], pts[0, 1]],
        ])
        pts = np.vstack([pts, closure])
    lo, hi = float(pts[:, 0].min()), float(pts[:, 0].max())
    k0 = math.ceil((lo - 180.0) / 360.0)
    k1 = math.floor((hi - 180.0) / 360.0)
    seams = [
        180.0 + 360.0 * k
        for k in range(k0, k1 + 1)
        if lo < 180.0 + 360.0 * k < hi
    ]
    pieces = [pts]
    for line_x in seams:
        nxt = []
        for p in pieces:
            for q in (
                _clip_ring_halfplane(p, line_x, keep_left=True),
                _clip_ring_halfplane(p, line_x, keep_left=False),
            ):
                if q is not None:
                    nxt.append(q)
        pieces = nxt
    out = []
    for p in pieces:
        c = (float(p[:, 0].min()) + float(p[:, 0].max())) / 2.0
        k = math.floor(c / 360.0 + 0.5)
        if k:
            p = p.copy()
            p[:, 0] -= 360.0 * k
        out.append(p)
    return out


def expand_antimeridian_rings(rings: Sequence) -> List[np.ndarray]:
    """Normalize a GeoJSON ring list: dateline-crossing rings are replaced
    by their [-180, 180] lobes (see :func:`split_ring_antimeridian`);
    non-crossing rings pass through unchanged. Idempotent."""
    out: List[np.ndarray] = []
    for ring in rings:
        arr = np.asarray(ring, dtype=np.float64)[:, :2]
        if ring_crosses_antimeridian(arr):
            out.extend(split_ring_antimeridian(arr))
        else:
            out.append(arr)
    return out


def points_in_polygon(
    points_x: np.ndarray, points_y: np.ndarray, rings: Sequence
) -> np.ndarray:
    """Even-odd containment of N points in a polygon given as GeoJSON rings
    (first exterior, rest holes). Crossing parity across all rings — a point
    is inside iff it is inside an odd number of rings, which equals
    "in exterior and not in a hole" for valid non-nested rings.

    Dateline-crossing rings (any edge spanning > 180 deg of longitude —
    the RFC 7946 short-way convention) are split into [-180, 180] lobes
    first, so Alaska/Fiji-style polygons test correctly on both sides of
    the seam; rings already within the seam are untouched (reference
    planar semantics preserved bit-for-bit).
    """
    px = np.asarray(points_x, dtype=np.float64)
    py = np.asarray(points_y, dtype=np.float64)
    inside = np.zeros(len(px), dtype=bool)
    for arr in expand_antimeridian_rings(rings):
        # cheap bbox prefilter per ring (the P5 pushdown idea, ref :1381-1388)
        bb = ring_bbox(arr)
        cand = (px >= bb[0]) & (px <= bb[2]) & (py >= bb[1]) & (py <= bb[3])
        if not cand.any():
            continue
        sub = points_in_ring(px[cand], py[cand], arr)
        idx = np.flatnonzero(cand)
        inside[idx] ^= sub
    return inside


def ring_sample(ring, ccw: bool = False) -> Tuple[float, float]:
    """Interior sample point of a ring via the first non-collinear vertex
    triplet whose orientation matches the ring and whose centroid passes the
    point-in-ring test. Semantics of ref ppge/pyshp/__init__.py:298-343.
    """
    coords = [list(p) for p in ring]
    triplet: List[list] = []

    def stream():
        for p in coords:
            yield p
        yield coords[1]

    for p in stream():
        if p not in triplet:
            triplet.append(p)
        if len(triplet) == 3:
            (ax, ay), (bx, by), (cx, cy) = (
                triplet[0][:2],
                triplet[1][:2],
                triplet[2][:2],
            )
            is_line = (ay - by) * (ax - cx) == (ay - cy) * (ax - bx)
            if not is_line:
                closed = triplet + [triplet[0]]
                if ccw == (not is_cw(np.asarray(closed)[:, :2])):
                    xm = (ax + bx + cx) / 3.0
                    ym = (ay + by + cy) / 3.0
                    if ring_contains_point(np.asarray(coords)[:, :2],
                                           (xm, ym)):
                        return xm, ym
            triplet.pop(0)
    raise ValueError("Unable to find a ring sample point.")


def organize_polygon_rings(
    rings: Sequence, return_errors: Optional[dict] = None
) -> List[List]:
    """Group closed rings into polygons: CW rings are exteriors, CCW are
    holes; holes are matched to exteriors by bbox containment, then a
    point-in-ring test on a hole sample point, then smallest-|area| tiebreak;
    orphan holes are promoted to exteriors; all-hole input is treated as
    exteriors. Semantics of ref ppge/pyshp/__init__.py:351-473.
    """
    exteriors, holes = [], []
    for ring in rings:
        (exteriors if is_cw(np.asarray(ring)[:, :2]) else holes).append(
            list(ring)
        )

    if len(exteriors) == 1:
        return [[exteriors[0]] + holes]

    if not exteriors:
        if return_errors is not None:
            return_errors["polygon_only_holes"] = len(holes)
        return [[h] for h in holes]

    if not holes:
        return [[e] for e in exteriors]

    ext_arrays = [np.asarray(e)[:, :2] for e in exteriors]
    ext_bboxes = [ring_bbox(a) for a in ext_arrays]
    ext_areas = [abs(signed_area(a, fast=True)) for a in ext_arrays]

    assignments: dict = {}
    orphan_holes = []
    for hole_i, hole in enumerate(holes):
        hole_arr = np.asarray(hole)[:, :2]
        hb = ring_bbox(hole_arr)
        candidates = [
            i for i, eb in enumerate(ext_bboxes) if bbox_contains(eb, hb)
        ]
        if len(candidates) > 1:
            sample = ring_sample(hole, ccw=not is_cw(hole_arr))
            candidates = [
                i
                for i in candidates
                if ring_contains_point(ext_arrays[i], sample)
            ]
        if len(candidates) > 1:
            candidates = [min(candidates, key=lambda i: ext_areas[i])]
        if not candidates:
            orphan_holes.append(hole_i)
        else:
            assignments.setdefault(candidates[0], []).append(hole_i)

    polys = []
    for ext_i, ext in enumerate(exteriors):
        polys.append([ext] + [holes[h] for h in assignments.get(ext_i, [])])
    for hole_i in orphan_holes:
        polys.append([holes[hole_i]])
    if orphan_holes and return_errors is not None:
        return_errors["polygon_orphaned_holes"] = len(orphan_holes)
    return polys
