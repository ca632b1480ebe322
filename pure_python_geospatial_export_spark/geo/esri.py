"""EsriJSON <-> GeoJSON codec (C6) — semantics-exact vs the reference
(ref geomet/esri.py): load dispatches on the ``rings``/``paths``/``x``/
``points`` keys; Esri polygons always load as MultiPolygon with
None-separated ring splitting; dump attaches ``spatialReference`` with
SRID from meta/crs (default 4326).
"""

from __future__ import annotations

import json

from .wkt import InvalidGeoJSONException


def _extract_srid(obj):
    meta_srid = obj.get("meta", {}).get("srid")
    crs_srid = obj.get("crs", {}).get("properties", {}).get("name")
    if crs_srid is not None:
        crs_srid = crs_srid.replace("EPSG:", "")
    if (
        meta_srid is not None
        and crs_srid is not None
        and str(meta_srid) != str(crs_srid)
    ):
        raise ValueError(
            "Ambiguous CRS/SRID values: %s and %s" % (meta_srid, crs_srid)
        )
    return (meta_srid or crs_srid) or 4326


def dumps(geom: dict, srid=None) -> dict:
    """GeoJSON-like dict -> EsriJSON dict."""
    t = geom.get("type", "").lower()
    if srid is None:
        srid = _extract_srid(geom)
    sr = {"wkid": srid}
    coords = geom.get("coordinates")
    if t == "point":
        return {"x": coords[0], "y": coords[1], "spatialReference": sr}
    if t == "multipoint":
        return {"points": coords, "spatialReference": sr}
    if t in ("linestring", "multilinestring"):
        paths = [coords] if t == "linestring" else coords
        return {"paths": paths, "spatialReference": sr}
    if t in ("polygon", "multipolygon"):
        polys = [coords] if t == "polygon" else coords
        rings = []
        for poly in polys:
            if len(poly) == 1:
                rings.append(poly[0])
            else:
                for ring in poly:
                    rings.append([list(c) for c in ring])
        return {"rings": rings, "spatialReference": sr}
    raise InvalidGeoJSONException("Invalid GeoJSON type %s" % geom)


def loads(string) -> dict:
    """EsriJSON (string or dict) -> GeoJSON-like dict."""
    data = json.loads(string) if isinstance(string, str) else string
    if "rings" in data:
        return _rings_to_gj(data)
    if "paths" in data:
        return {
            "type": "MultiLineString",
            "coordinates": [
                [((pt[0], pt[1]) if pt else None) for pt in part]
                for part in data["paths"]
            ],
        }
    if "x" in data or "y" in data:
        if data.get("x") is None or data.get("y") is None:
            return {"type": "Point", "coordinates": ()}
        return {"type": "Point", "coordinates": (data["x"], data["y"])}
    if "points" in data:
        return {"type": "MultiPoint",
                "coordinates": list(data["points"])}
    raise InvalidGeoJSONException("Invalid EsriJSON: %s" % string)


def _rings_to_gj(data) -> dict:
    def split_ring(ring):
        part = []
        for item in ring:
            if item is None:
                if part:
                    yield part
                part = []
            else:
                part.append((item[0], item[1]))
        if part:
            yield part

    return {
        "type": "MultiPolygon",
        "coordinates": [list(split_ring(r)) for r in data["rings"]],
    }
