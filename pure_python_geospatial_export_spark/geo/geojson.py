"""GeoJSON-like dict geometry model — the interchange IR of the engine.

The engine carries geometries between Spark stages as WKT strings (or WKB
binary); inside vectorized kernels they are materialized as GeoJSON-like
dicts ``{"type": ..., "coordinates": ...}`` exactly like the reference
library's IR (see /root/reference/geomet/tool.py:46-64 — every codec in the
reference converts through the same dict form).

This module holds the shared vocabulary: type tables, dimensionality
inference, and coordinate flattening.
"""

from __future__ import annotations

from typing import Any, Iterator

GEOM_TYPES = (
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
)

#: UPPERCASE WKT tag -> mixed-case GeoJSON type
WKT_TO_GEOJSON_TYPE = {t.upper(): t for t in GEOM_TYPES}

#: nesting depth of the coordinates array per type (Point=1 ... MultiPolygon=4)
COORD_DEPTH = {
    "Point": 1,
    "LineString": 2,
    "MultiPoint": 2,
    "Polygon": 3,
    "MultiLineString": 3,
    "MultiPolygon": 4,
}


def flatten_coords(obj: Any) -> Iterator[float]:
    """Yield every ordinate in an arbitrarily nested coordinates list.

    Mirrors the observable behavior of the reference's
    ``util.flatten_multi_dim`` (ref geomet/util.py) used for EMPTY checks:
    a geometry is empty iff this yields nothing.
    """
    stack = [obj]
    out = []
    while stack:
        item = stack.pop()
        if isinstance(item, (list, tuple)):
            stack.extend(reversed(item))
        elif item is not None:
            out.append(item)
    return iter(out)


def is_empty(geom: dict) -> bool:
    if geom["type"] == "GeometryCollection":
        return len(geom.get("geometries", ())) == 0
    try:
        next(flatten_coords(geom["coordinates"]))
        return False
    except StopIteration:
        return True


def first_vertex(geom: dict):
    """First vertex (list of 2-4 ordinates) of a non-empty geometry."""
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        return c
    if t in ("LineString", "MultiPoint"):
        return c[0]
    if t in ("Polygon", "MultiLineString"):
        return c[0][0]
    if t == "MultiPolygon":
        return c[0][0][0]
    if t == "GeometryCollection":
        for g in geom["geometries"]:
            if g["type"] != "GeometryCollection":
                return first_vertex(g)
        return None
    raise ValueError("Unsupported geometry type '%s'" % t)


def num_dims(geom: dict) -> int:
    """Dimensionality inferred from the first vertex (2 -> 2D, 3 -> Z, 4 -> ZM).

    Same inference rule as the reference WKB dumper (3 ordinates are always
    interpreted as XYZ, never XYM — ref geomet/wkb.py:186-206).
    """
    v = first_vertex(geom)
    if v is None:
        raise ValueError("cannot infer dimensionality of empty geometry")
    return len(v)


def get_srid(geom: dict):
    """Resolve SRID from ``meta.srid`` and/or ``crs.properties.name``.

    Conflict between the two raises ValueError with the reference's message
    (ref geomet/wkt.py:88-102).
    """
    meta_srid = geom.get("meta", {}).get("srid")
    crs_srid = geom.get("crs", {}).get("properties", {}).get("name")
    if crs_srid is not None:
        crs_srid = crs_srid.replace("EPSG", "")
    if (
        meta_srid is not None
        and crs_srid is not None
        and str(meta_srid) != str(crs_srid)
    ):
        raise ValueError(
            "Ambiguous CRS/SRID values: %s and %s" % (meta_srid, crs_srid)
        )
    return meta_srid if meta_srid is not None else crs_srid


def _round_coords(coords, precision: int):
    if isinstance(coords, (list, tuple)):
        return [_round_coords(c, precision) for c in coords]
    return round(coords, precision)


def round_geom(geom: dict, precision: int) -> dict:
    """Round all coordinates to ``precision`` decimals (C7/A7 parity with
    ref geomet/util.py:73-108); GeometryCollections recurse."""
    if geom["type"] == "GeometryCollection":
        return dict(
            type="GeometryCollection",
            geometries=[round_geom(g, precision)
                        for g in geom["geometries"]],
        )
    return dict(type=geom["type"],
                coordinates=_round_coords(geom["coordinates"], precision))


def srid_keys(srid: int) -> dict:
    """The dual meta/crs SRID representation the reference emits on WKB load
    (ref geomet/wkb.py:328-336)."""
    return {
        "meta": {"srid": int(srid)},
        "crs": {"type": "name", "properties": {"name": "EPSG%s" % srid}},
    }
