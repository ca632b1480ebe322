"""Geodesic (great-circle-edge) polygon containment and ring densify.

The planar kernels (geo/kernels.py) treat polygon edges as straight
lines in lon/lat space — the reference's semantics (ref
ppge/pyshp/__init__.py:253-295 ray cast). Layers whose edges are defined
as GEODESICS (great-circle arcs, the convention of most global datasets)
need a matching pair: an exact containment kernel and a conservative
cell cover. This module provides the kernel and the densify helper; the
cover lives in geo/cells.py (``polygon_cover(..., edges='geodesic')``).

Containment approach: gnomonic projection about the polygon's vertex
centroid. Great circles map to STRAIGHT LINES under the gnomonic
projection, so the existing planar ray-cast runs EXACTLY on the
projected coordinates — no densification error in the predicate itself.
Valid for polygons contained in the open hemisphere around the
projection center (any sub-hemisphere polygon); query points on the far
hemisphere are outside by definition. Polygons spanning a full
hemisphere raise.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .kernels import points_in_ring


def unit_vectors(lon, lat) -> np.ndarray:
    """(lon, lat) degrees -> (N, 3) unit vectors on the sphere."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return np.stack([cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)],
                    axis=-1)


def lonlat_from_vectors(vecs: np.ndarray):
    """(N, 3) unit vectors -> (lon, lat) degrees."""
    v = np.asarray(vecs, dtype=np.float64)
    lat = np.degrees(np.arcsin(np.clip(v[..., 2], -1.0, 1.0)))
    lon = np.degrees(np.arctan2(v[..., 1], v[..., 0]))
    return lon, lat


def _tangent_basis(c: np.ndarray):
    """Orthonormal (e1, e2) spanning the tangent plane at unit vector c."""
    north = np.array([0.0, 0.0, 1.0])
    e1 = np.cross(north, c)
    n = np.linalg.norm(e1)
    if n < 1e-12:  # center at a pole: use x-axis instead
        e1 = np.cross(np.array([1.0, 0.0, 0.0]), c)
        n = np.linalg.norm(e1)
    e1 = e1 / n
    e2 = np.cross(c, e1)
    return e1, e2


def gnomonic_center(rings: Sequence) -> np.ndarray:
    """Projection center: normalized mean of all ring vertices."""
    pts = np.concatenate([
        np.asarray(r, dtype=np.float64)[:, :2] for r in rings
    ])
    vecs = unit_vectors(pts[:, 0], pts[:, 1])
    c = vecs.mean(axis=0)
    n = np.linalg.norm(c)
    if n < 1e-9:
        raise ValueError(
            "polygon vertices have no well-defined hemisphere center "
            "(antipodally balanced) — geodesic containment undefined"
        )
    return c / n


def gnomonic_project(vecs: np.ndarray, c: np.ndarray):
    """Project unit vectors onto the tangent plane at c.

    Returns (x, y, front) where ``front`` marks vectors on the open
    hemisphere around c (projectable); x/y are NaN elsewhere.
    """
    e1, e2 = _tangent_basis(c)
    d = vecs @ c
    front = d > 1e-12
    with np.errstate(divide="ignore", invalid="ignore"):
        x = np.where(front, (vecs @ e1) / d, np.nan)
        y = np.where(front, (vecs @ e2) / d, np.nan)
    return x, y, front


def points_in_polygon_geodesic(
    points_lon, points_lat, rings: Sequence
) -> np.ndarray:
    """Even-odd containment of N points in a polygon whose edges are
    great-circle arcs. Exact (projection maps arcs to straight lines);
    crossing parity across all rings, like the planar
    ``points_in_polygon``. Raises if the polygon is not sub-hemisphere.
    """
    c = gnomonic_center(rings)
    proj_rings = []
    for r in rings:
        arr = np.asarray(r, dtype=np.float64)[:, :2]
        rx, ry, front = gnomonic_project(
            unit_vectors(arr[:, 0], arr[:, 1]), c
        )
        if not front.all():
            raise ValueError(
                "polygon spans beyond the hemisphere around its vertex "
                "centroid — geodesic containment limited to "
                "sub-hemisphere polygons"
            )
        proj_rings.append(np.stack([rx, ry], axis=1))

    pvec = unit_vectors(
        np.asarray(points_lon, dtype=np.float64),
        np.asarray(points_lat, dtype=np.float64),
    )
    px, py, front = gnomonic_project(pvec, c)
    inside = np.zeros(len(px), dtype=bool)
    if front.any():
        acc = np.zeros(int(front.sum()), dtype=bool)
        for pr in proj_rings:
            acc ^= points_in_ring(px[front], py[front], pr)
        inside[front] = acc
    return inside


def slerp(a: np.ndarray, b: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """Spherical linear interpolation between unit vectors a, b at
    fractions ts in [0, 1] -> (len(ts), 3)."""
    dot = float(np.clip(a @ b, -1.0, 1.0))
    theta = np.arccos(dot)
    if theta < 1e-12:
        return np.repeat(a[None, :], len(ts), axis=0)
    s = np.sin(theta)
    w1 = np.sin((1.0 - ts) * theta) / s
    w2 = np.sin(ts * theta) / s
    out = w1[:, None] * a[None, :] + w2[:, None] * b[None, :]
    return out / np.linalg.norm(out, axis=1)[:, None]


def densify_ring_geodesic(ring, max_sagitta_rad: float = 2e-5
                          ) -> np.ndarray:
    """Insert intermediate points along each edge's great circle so the
    remaining chord deviates from the arc by at most ``max_sagitta_rad``
    (angular). Sagitta of a segment of angular length theta is
    ~theta^2/8, so segments are split to length sqrt(8*sagitta).
    Returns an (M, 2) lon/lat array (closed like the input)."""
    arr = np.asarray(ring, dtype=np.float64)[:, :2]
    vecs = unit_vectors(arr[:, 0], arr[:, 1])
    seg_max = np.sqrt(8.0 * max_sagitta_rad)
    out = [vecs[0]]
    for i in range(len(vecs) - 1):
        a, b = vecs[i], vecs[i + 1]
        theta = float(np.arccos(np.clip(a @ b, -1.0, 1.0)))
        m = max(1, int(np.ceil(theta / seg_max)))
        ts = np.arange(1, m + 1, dtype=np.float64) / m
        out.append(slerp(a, b, ts))
    dense = np.vstack([np.atleast_2d(v) for v in out])
    lon, lat = lonlat_from_vectors(dense)
    return np.stack([lon, lat], axis=1)
