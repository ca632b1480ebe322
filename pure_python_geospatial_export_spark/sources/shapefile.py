"""ESRI Shapefile codec (.shp/.shx/.dbf) + Spark source/sink.

From-scratch implementation of the reference's shapefile surface
(reader: ref ppge/pyshp/__init__.py:1341-1451 shp, :1584-1782 dbf;
writer: :2144-2250 headers, :2273-2478 shp/shx records, :2480-2596 dbf
records; GeoJSON conversion: :506-698), byte-compatible on write and
semantics-identical on read (golden-tested against the reference's own
fixture shapefiles).

Architecture: the codec is pure bytes<->dict functions (numpy block
unpacking, no per-coordinate struct calls). Spark integration:

* ``read_shapefile`` — polygon layers are dimension data; the loader
  parses driver-side and returns a DataFrame (broadcast side of joins).
  For huge shapefile collections, ``decode_shp_bytes``/``decode_dbf_bytes``
  are plain functions usable inside ``binaryFile`` + ``mapInPandas``.
* ``write_shapefile_df`` — mirrors the reference export lifecycle
  (ref ppge/__init__.py:192-271): shapetype inferred from the first
  non-null geometry (G3), mismatched types skipped, Point promoted to
  MultiPoint, null geometries as NULL shapes, fixed WGS-84 .prj.
"""

from __future__ import annotations

import datetime
import struct
import time
from typing import IO, Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..geo import kernels
from ..geo import wkt as wktmod

NULL = 0
POINT = 1
POLYLINE = 3
POLYGON = 5
MULTIPOINT = 8
POINTZ = 11
POLYLINEZ = 13
POLYGONZ = 15
MULTIPOINTZ = 18
POINTM = 21
POLYLINEM = 23
POLYGONM = 25
MULTIPOINTM = 28
MULTIPATCH = 31

NODATA = -10e38

_HAS_BBOX = (3, 5, 8, 13, 15, 18, 23, 25, 28, 31)
_HAS_PARTS = (3, 5, 13, 15, 23, 25, 31)
_HAS_Z = (13, 15, 18, 31)
_HAS_M = (13, 15, 18, 23, 25, 28, 31)
_SINGLE_POINT = (1, 11, 21)

PRJ_WGS84 = (
    b'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    b'298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    b'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
    b'0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    b'AUTHORITY["EPSG","4326"]]'
)


# ---------------------------------------------------------------------------
# .shp decode
# ---------------------------------------------------------------------------


def decode_shp_bytes(buf: bytes) -> Tuple[dict, List[dict]]:
    """Parse a whole .shp byte string -> (header dict, list of shape dicts).

    Shape dict: {oid, shape_type, points: Nx2 list, parts: list,
    z: list|None, m: list|None (None entries = NODATA)}.
    """
    if len(buf) < 100:
        raise ValueError("not a shapefile: header too short")
    (file_code,) = struct.unpack(">i", buf[0:4])
    if file_code != 9994:
        raise ValueError("not a shapefile: bad file code %d" % file_code)
    (length_words,) = struct.unpack(">i", buf[24:28])
    (shape_type,) = struct.unpack("<i", buf[32:36])
    bbox = list(struct.unpack("<4d", buf[36:68]))
    zbox = list(struct.unpack("<2d", buf[68:84]))
    mbox_raw = struct.unpack("<2d", buf[84:100])
    mbox = [m if m > NODATA else None for m in mbox_raw]
    header = {
        "shape_type": shape_type,
        "bbox": bbox,
        "zbox": zbox,
        "mbox": mbox,
        "length": length_words * 2,
    }

    shapes = []
    off = 100
    oid = 0
    end = min(len(buf), length_words * 2)
    while off + 8 <= end:
        _recnum, content_words = struct.unpack(">2i", buf[off:off + 8])
        body_start = off + 8
        next_off = body_start + content_words * 2
        shapes.append(_decode_record(buf, body_start, next_off, oid))
        off = next_off
        oid += 1
    return header, shapes


def _f64(buf, off, n) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f8", count=n, offset=off)


def _decode_record(buf: bytes, off: int, next_off: int, oid: int) -> dict:
    (st,) = struct.unpack("<i", buf[off:off + 4])
    off += 4
    shape = {"oid": oid, "shape_type": st, "points": [], "parts": [],
             "z": None, "m": None}
    if st == NULL:
        return shape
    if st in _HAS_BBOX:
        shape["bbox"] = list(_f64(buf, off, 4))
        off += 32
    n_parts = n_points = 0
    if st in _HAS_PARTS:
        (n_parts,) = struct.unpack("<i", buf[off:off + 4])
        off += 4
    if st in _HAS_BBOX:
        (n_points,) = struct.unpack("<i", buf[off:off + 4])
        off += 4
    if n_parts:
        shape["parts"] = list(
            np.frombuffer(buf, dtype="<i4", count=n_parts, offset=off)
        )
        off += 4 * n_parts
    if st == MULTIPATCH:
        shape["part_types"] = list(
            np.frombuffer(buf, dtype="<i4", count=n_parts, offset=off)
        )
        off += 4 * n_parts
    if n_points:
        pts = _f64(buf, off, 2 * n_points).reshape(-1, 2)
        shape["points"] = [list(p) for p in pts]
        off += 16 * n_points
    if st in _HAS_Z:
        off += 16  # z range
        shape["z"] = list(_f64(buf, off, n_points))
        off += 8 * n_points
    if st in _HAS_M:
        # M block is optional: presence determined by remaining length
        if next_off - off >= 16:
            off += 16
        if next_off - off >= n_points * 8:
            mvals = _f64(buf, off, n_points)
            shape["m"] = [float(m) if m > NODATA else None for m in mvals]
            off += 8 * n_points
        else:
            shape["m"] = [None] * n_points
    if st in _SINGLE_POINT:
        shape["points"] = [list(_f64(buf, off, 2))]
        off += 16
        if st == POINTZ:
            shape["z"] = [float(_f64(buf, off, 1)[0])]
            off += 8
        if st in (POINTZ, POINTM):
            if next_off - off >= 8:
                m = float(_f64(buf, off, 1)[0])
                off += 8
            else:
                m = NODATA
            shape["m"] = [m if m > NODATA else None]
    return shape


def decode_shx_bytes(buf: bytes) -> List[Tuple[int, int]]:
    """.shx index -> [(record byte offset, content length in bytes)]
    (SURVEY S3, ref ppge/pyshp/__init__.py:1453-1490): O(1) random access
    into the .shp; subsumed by parquet layout in the engine but provided
    for format parity."""
    (length_words,) = struct.unpack(">i", buf[24:28])
    n = (length_words * 2 - 100) // 8
    out = []
    off = 100
    for _ in range(n):
        o, length = struct.unpack(">2i", buf[off:off + 8])
        out.append((o * 2, length * 2))
        off += 8
    return out


def read_shapefile_zip(spark, zip_path: str, encoding: str = "utf-8"):
    """Shapefile-inside-zip source (SURVEY S5): auto-discovers the single
    .shp member (ref ppge/pyshp/__init__.py:967-1055) and loads via the
    in-memory codec."""
    import zipfile

    with zipfile.ZipFile(zip_path) as z:
        shp_names = [n for n in z.namelist() if n.lower().endswith(".shp")]
        if len(shp_names) != 1:
            raise ValueError(
                "zip must contain exactly one .shp member, found %s"
                % shp_names
            )
        base = shp_names[0][:-4]
        shp_buf = z.read(shp_names[0])
        try:
            dbf_buf = z.read(base + ".dbf")
        except KeyError:
            dbf_buf = None

    return _bufs_to_df(spark, shp_buf, dbf_buf, encoding)


def _bufs_to_df(spark, shp_buf: bytes, dbf_buf: Optional[bytes],
                encoding: str = "utf-8"):
    """Decode in-memory .shp/.dbf buffers to the (oid, wkt, *attrs)
    DataFrame shared by the zip and URL sources. Either buffer may be
    missing (the reference tolerates dbf-only and shp-only loads): a
    dbf-only source yields records with null geometry."""
    shapes: List[dict] = []
    if shp_buf:
        _hdr, shapes = decode_shp_bytes(shp_buf)
    fields: List[Tuple[str, str, int, int]] = []
    records: List[list] = []
    if dbf_buf:
        fields, records = decode_dbf_bytes(dbf_buf, encoding)
    rows = []
    n = max(len(shapes), len(records))
    for i in range(n):
        if i < len(shapes):
            geom = shape_to_geojson(shapes[i])
            wkt_str = wktmod.dumps(geom) if geom is not None else None
        else:
            wkt_str = None
        attrs = records[i] if i < len(records) else [None] * len(fields)
        rows.append(tuple([i, wkt_str] + list(attrs)))

    # explicit schema: inference would fail on all-null columns (e.g.
    # dbf-only loads have a null wkt for every row); attr types come
    # from the first non-null decoded value per column
    import pyspark.sql.types as SqlT

    def _attr_type(col_idx):
        for r in rows:
            v = r[2 + col_idx]
            if v is None:
                continue
            if isinstance(v, bool):
                return SqlT.BooleanType()
            if isinstance(v, int):
                return SqlT.LongType()
            if isinstance(v, float):
                return SqlT.DoubleType()
            if isinstance(v, datetime.date):
                return SqlT.DateType()
            return SqlT.StringType()
        return SqlT.StringType()

    schema = SqlT.StructType(
        [
            SqlT.StructField("oid", SqlT.LongType(), False),
            SqlT.StructField("wkt", SqlT.StringType(), True),
        ]
        + [
            SqlT.StructField(f[0], _attr_type(j), True)
            for j, f in enumerate(fields)
        ]
    )
    return spark.createDataFrame(rows, schema)


def read_shapefile_url(spark, url: str, encoding: str = "utf-8"):
    """Shapefile-over-HTTP source (SURVEY S5, the URL half): fetches the
    ``.shp``/``.shx``/``.dbf`` siblings of ``url`` (any extension or
    none) and decodes in memory, mirroring the reference's download-and-
    load behavior (ref ppge/pyshp/__init__.py:1057-1093): members that
    404 are tolerated; it is an error only when NEITHER .shp nor .dbf
    could be fetched. ``file://`` URLs work too (used by the offline
    test fixture)."""
    import posixpath
    from urllib.error import HTTPError, URLError
    from urllib.parse import urlparse, urlunparse
    from urllib.request import Request, urlopen

    info = urlparse(url)
    base_path = posixpath.splitext(info.path)[0]
    bufs = {}
    for ext in ("shp", "shx", "dbf"):
        parts = list(info)
        parts[2] = base_path + "." + ext
        member_url = urlunparse(parts)
        try:
            req = Request(member_url,
                          headers={"User-agent": "ppge-spark/1.0"})
            with urlopen(req) as resp:
                bufs[ext] = resp.read()
        except (HTTPError, URLError, OSError):
            pass
    if "shp" not in bufs and "dbf" not in bufs:
        raise ValueError("No shp or dbf file found at url: %s" % url)
    return _bufs_to_df(spark, bufs.get("shp", b""), bufs.get("dbf"),
                       encoding)


def bundle_shapefile_zip(basename: str, zip_buffer: IO[bytes],
                         shp: IO[bytes], shx: IO[bytes], dbf: IO[bytes],
                         prj: IO[bytes]) -> None:
    """Bundle shapefile parts into a zip, 10 MB chunked streaming
    (SURVEY S9, ref ppge/__init__.py:97-134)."""
    import zipfile

    with zipfile.ZipFile(zip_buffer, "w", zipfile.ZIP_DEFLATED) as z:
        for buf, ext in ((shp, ".shp"), (shx, ".shx"), (dbf, ".dbf"),
                         (prj, ".prj")):
            info = zipfile.ZipInfo("%s%s" % (basename, ext))
            info.compress_type = zipfile.ZIP_DEFLATED
            with z.open(info, "w") as member:
                while True:
                    chunk = buf.read(10 * 1024 * 1024)
                    if not chunk:
                        break
                    member.write(chunk)


# ---------------------------------------------------------------------------
# .dbf decode
# ---------------------------------------------------------------------------


def decode_dbf_bytes(buf: bytes, encoding: str = "utf-8"
                     ) -> Tuple[List[Tuple[str, str, int, int]], List[list]]:
    """Parse a whole .dbf byte string -> (field tuples, record rows).

    Value decode rules match ref ppge/pyshp/__init__.py:1718-1780 (N/F
    numeric strings with QGIS '*' null, D dates, L logicals, C text)."""
    numrec, header_len, rec_len = struct.unpack("<xxxxLHH", buf[:12])
    fields = []
    off = 32
    while off < header_len - 1 and buf[off:off + 1] != b"\r":
        name = buf[off:off + 11].split(b"\0", 1)[0].decode("ascii",
                                                           "replace")
        ftype = buf[off + 11:off + 12].decode("ascii")
        size = buf[off + 16]
        deci = buf[off + 17]
        fields.append((name, ftype, size, deci))
        off += 32

    records = []
    off = header_len
    for _ in range(numrec):
        if off + rec_len > len(buf):
            break
        row_raw = buf[off:off + rec_len]
        off += rec_len
        if row_raw[0:1] != b" ":
            continue  # deleted record
        vals = []
        p = 1
        for name, ftype, size, deci in fields:
            raw = row_raw[p:p + size]
            p += size
            vals.append(_decode_dbf_value(raw, ftype, deci, encoding))
        records.append(vals)
    return fields, records


def _decode_dbf_value(raw: bytes, ftype: str, deci: int, encoding: str):
    if ftype in ("N", "F"):
        v = raw.split(b"\0")[0].replace(b"*", b"").strip()
        if v == b"":
            return None
        if deci:
            try:
                return float(v)
            except ValueError:
                return None
        try:
            return int(v)
        except ValueError:
            try:
                return int(float(v))
            except ValueError:
                return None
    if ftype == "D":
        stripped = raw.replace(b"\x00", b"").replace(b" ", b"").replace(
            b"0", b"")
        if not stripped:
            return None
        try:
            return datetime.date(
                int(raw[:4]), int(raw[4:6]), int(raw[6:8])
            )
        except Exception:
            return raw.strip().decode(encoding, "replace")
    if ftype == "L":
        if raw == b" ":
            return None
        if raw in b"YyTt1":
            return True
        if raw in b"NnFf0":
            return False
        return None
    return raw.decode(encoding, "replace").strip().rstrip("\x00")


# ---------------------------------------------------------------------------
# shape <-> GeoJSON (C8 / C9)
# ---------------------------------------------------------------------------


def shape_to_geojson(shape: dict) -> Optional[dict]:
    """Shape dict -> GeoJSON dict; semantics of ``__geo_interface__``
    (ref ppge/pyshp/__init__.py:506-616)."""
    st = shape["shape_type"]
    pts = shape["points"]
    parts = list(shape["parts"])
    if st == NULL:
        return None
    if st in (POINT, POINTM, POINTZ):
        if not pts:
            return {"type": "Point", "coordinates": []}
        return {"type": "Point", "coordinates": list(pts[0])}
    if st in (MULTIPOINT, MULTIPOINTM, MULTIPOINTZ):
        return {"type": "MultiPoint", "coordinates": [list(p) for p in pts]}
    if st in (POLYLINE, POLYLINEM, POLYLINEZ):
        if not parts:
            return {"type": "LineString", "coordinates": []}
        if len(parts) == 1:
            return {"type": "LineString",
                    "coordinates": [list(p) for p in pts]}
        bounds = parts + [len(pts)]
        return {
            "type": "MultiLineString",
            "coordinates": [
                [list(p) for p in pts[bounds[i]:bounds[i + 1]]]
                for i in range(len(parts))
            ],
        }
    if st in (POLYGON, POLYGONM, POLYGONZ):
        if not parts:
            return {"type": "Polygon", "coordinates": []}
        bounds = parts + [len(pts)]
        rings = [
            [list(p) for p in pts[bounds[i]:bounds[i + 1]]]
            for i in range(len(parts))
        ]
        polys = kernels.organize_polygon_rings(rings)
        if len(polys) == 1:
            return {"type": "Polygon", "coordinates": polys[0]}
        return {"type": "MultiPolygon", "coordinates": polys}
    raise ValueError("Shape type %d cannot be represented as GeoJSON" % st)


def geojson_to_shape(geom: Optional[dict]) -> dict:
    """GeoJSON dict -> shape dict incl. ring rewinding (exterior CW, holes
    CCW — the shapefile convention, ref ppge/pyshp/__init__.py:618-698)."""
    if not geom:
        return {"shape_type": NULL, "points": [], "parts": []}
    t = geom["type"]
    if t == "Point":
        return {"shape_type": POINT, "points": [list(geom["coordinates"])],
                "parts": [0]}
    if t in ("MultiPoint", "LineString"):
        st = MULTIPOINT if t == "MultiPoint" else POLYLINE
        return {
            "shape_type": st,
            "points": [list(p) for p in geom["coordinates"]],
            "parts": [0],
        }
    if t == "MultiLineString":
        points: List[list] = []
        parts = []
        for ls in geom["coordinates"]:
            parts.append(len(points))
            points.extend([list(p) for p in ls])
        return {"shape_type": POLYLINE, "points": points, "parts": parts}
    if t in ("Polygon", "MultiPolygon"):
        polys = (
            [geom["coordinates"]] if t == "Polygon" else geom["coordinates"]
        )
        points = []
        parts = []
        for poly in polys:
            for i, ring in enumerate(poly):
                ring = [list(p) for p in ring]
                cw = kernels.is_cw(np.asarray(ring)[:, :2])
                if (i == 0 and not cw) or (i > 0 and cw):
                    ring = kernels.rewind(ring)
                parts.append(len(points))
                points.extend(ring)
        return {"shape_type": POLYGON, "points": points, "parts": parts}
    raise ValueError("Cannot create Shape from GeoJSON type '%s'" % t)


# ---------------------------------------------------------------------------
# writer (byte-compatible with the reference writer)
# ---------------------------------------------------------------------------


class ShapefileWriter:
    """Streaming .shp/.shx/.dbf writer; output bytes match the reference
    writer for the same inputs (headers finalized on close, running
    bboxes, dbf field/record packing)."""

    def __init__(self, shp: IO[bytes], shx: IO[bytes], dbf: IO[bytes],
                 shape_type: int = NULL, encoding: str = "utf-8"):
        self.shp, self.shx, self.dbf = shp, shx, dbf
        self.shape_type = shape_type
        self.encoding = encoding
        self.fields: List[Tuple[str, str, int, int]] = []
        self._num_shapes = 0
        self._num_records = 0
        self._bbox: Optional[list] = None
        self._zbox: Optional[list] = None
        self._mbox: Optional[list] = None
        self._content_bytes = 0
        # reserve headers
        self.shp.write(b"\0" * 100)
        self.shx.write(b"\0" * 100)

    def field(self, name: str, field_type: str = "C", size: int = 50,
              decimal: int = 0) -> None:
        # fixed sizes for date/logical fields (ref pyshp field(), :2763-2775)
        if field_type == "D":
            size, decimal = 8, 0
        elif field_type == "L":
            size, decimal = 1, 0
        self.fields.append((name, field_type, int(size), int(decimal)))

    # -- shp ---------------------------------------------------------------

    def _grow_bbox(self, pts) -> None:
        if not pts:
            return
        # slice xy per point: tuples may be ragged (xyz vs xyzm) or
        # carry None measures, which np.asarray would choke on
        arr = np.asarray([p[:2] for p in pts], dtype=np.float64)
        lo = arr.min(axis=0)
        hi = arr.max(axis=0)
        if self._bbox is None:
            self._bbox = [lo[0], lo[1], hi[0], hi[1]]
        else:
            self._bbox = [
                min(self._bbox[0], lo[0]),
                min(self._bbox[1], lo[1]),
                max(self._bbox[2], hi[0]),
                max(self._bbox[3], hi[1]),
            ]

    def _grow_zbox(self, zvals) -> None:
        lo, hi = min(zvals), max(zvals)
        if self._zbox is None:
            self._zbox = [lo, hi]
        else:
            self._zbox = [min(self._zbox[0], lo), max(self._zbox[1], hi)]

    def _grow_mbox(self, mvals) -> None:
        lo, hi = min(mvals), max(mvals)
        if self._mbox is None:
            self._mbox = [lo, hi]
        else:
            self._mbox = [min(self._mbox[0], lo), max(self._mbox[1], hi)]

    def shape(self, shape: dict) -> None:
        st = shape["shape_type"]
        if self.shape_type == NULL and st != NULL:
            self.shape_type = st
        if st != NULL and st != self.shape_type:
            raise ValueError(
                "The shape's type (%s) must match the type of the "
                "shapefile (%s)." % (st, self.shape_type)
            )
        offset = self.shp.tell()
        self._num_shapes += 1
        body = bytearray(struct.pack("<i", st))
        pts = shape.get("points") or []
        if st != NULL:
            self._grow_bbox(pts)
        if st in _HAS_BBOX:
            arr = np.asarray([p[:2] for p in pts], dtype=np.float64)
            body += struct.pack(
                "<4d",
                arr[:, 0].min(), arr[:, 1].min(),
                arr[:, 0].max(), arr[:, 1].max(),
            )
        if st in _HAS_PARTS:
            body += struct.pack("<i", len(shape.get("parts") or []))
        if st in _HAS_BBOX:
            body += struct.pack("<i", len(pts))
            if st in _HAS_PARTS:
                for p in shape.get("parts") or []:
                    body += struct.pack("<i", p)
            if st == MULTIPATCH:
                # part-type ints follow the part offsets (ESRI spec;
                # ref pyshp __shape :2120-2123 writes partTypes here)
                for pt in shape.get("part_types") or []:
                    body += struct.pack("<i", pt)
            arr = np.asarray([p[:2] for p in pts], dtype=np.float64)
            body += arr.astype("<f8").tobytes()
        if st in _HAS_Z:
            # extremes come from the POINT TUPLES (missing 3rd dim -> 0),
            # even when z values are supplied separately — a reference
            # quirk preserved for byte parity (ref __zbox :2082-2099 is
            # points-based while the values may come from s.z)
            zext = [(p[2] if len(p) > 2 else 0.0) for p in pts]
            body += struct.pack("<2d", min(zext), max(zext))
            self._grow_zbox(zext)
            z = shape.get("z") or zext
            body += np.asarray(z, dtype="<f8").tobytes()
        if st in _HAS_M:
            mpos = 3 if st in _HAS_Z else 2
            # extremes: valid point-tuple m values only; all-missing ->
            # (NODATA, NODATA), as the reference __mbox does (:2101-2125)
            mvalid = [
                p[mpos] for p in pts
                if len(p) > mpos and p[mpos] is not None
            ]
            mext = mvalid if mvalid else [NODATA]
            body += struct.pack("<2d", min(mext), max(mext))
            self._grow_mbox(mext)
            m = shape.get("m")
            if m is None:
                m = [
                    (p[mpos] if len(p) > mpos and p[mpos] is not None
                     else NODATA)
                    for p in pts
                ]
            m = [NODATA if v is None else v for v in m]
            body += np.asarray(m, dtype="<f8").tobytes()
        if st in _SINGLE_POINT:
            body += struct.pack("<2d", pts[0][0], pts[0][1])
            if st == POINTZ:
                self._grow_zbox(
                    [pts[0][2] if len(pts[0]) > 2 else 0.0]
                )
                z = shape.get("z") or [
                    pts[0][2] if len(pts[0]) > 2 else 0.0
                ]
                body += struct.pack("<d", z[0])
            if st in (POINTZ, POINTM):
                mpos = 3 if st == POINTZ else 2
                pm = (pts[0][mpos]
                      if len(pts[0]) > mpos and pts[0][mpos] is not None
                      else None)
                self._grow_mbox([pm if pm is not None else NODATA])
                m = shape.get("m")
                if m and m[0] is not None:
                    mv = m[0]
                elif pm is not None:
                    mv = pm
                else:
                    mv = NODATA
                body += struct.pack("<d", mv)

        length_words = len(body) // 2
        self.shp.write(struct.pack(">2i", self._num_shapes, length_words))
        self.shp.write(bytes(body))
        self._content_bytes += 8 + len(body)
        self.shx.write(struct.pack(">2i", offset // 2, length_words))

    def null(self) -> None:
        self.shape({"shape_type": NULL, "points": [], "parts": []})

    def multipatch(self, parts, part_types) -> None:
        """MULTIPATCH write helper (SURVEY S6 extension, ref
        ppge/pyshp/__init__.py:2713-2721): ``parts`` is a list of 3D
        surface patches (lists of xyz[m] points), ``part_types`` one
        ESRI part-type int per patch (0=TRIANGLE_STRIP, 1=TRIANGLE_FAN,
        2=OUTER_RING, 3=INNER_RING, 4=FIRST_RING, 5=RING)."""
        points: List[list] = []
        offsets: List[int] = []
        for part in parts:
            offsets.append(len(points))
            points.extend([list(p) for p in part])
        self.shape({
            "shape_type": MULTIPATCH,
            "points": points,
            "parts": offsets,
            "part_types": list(part_types),
        })

    # -- dbf ---------------------------------------------------------------

    def record(self, **values) -> None:
        if self._num_records == 0:
            self._write_dbf_header()
        row = bytearray(b" ")
        for name, ftype, size, deci in self.fields:
            value = values.get(name)
            if value is None:
                value = ""  # reference maps None/missing to "" (ref :2504)
            row += _encode_dbf_value(value, ftype, size, deci,
                                     self.encoding)
        self.dbf.write(bytes(row))
        self._num_records += 1

    def _write_dbf_header(self) -> None:
        if not self.fields:
            raise ValueError("dbf must contain at least one field")
        year, month, day = time.localtime()[:3]
        header_len = len(self.fields) * 32 + 33
        record_len = sum(f[2] for f in self.fields) + 1
        self.dbf.seek(0)
        self.dbf.write(struct.pack(
            "<BBBBLHH20x", 3, year - 1900, month, day, 0, header_len,
            record_len,
        ))
        for name, ftype, size, deci in self.fields:
            nb = name.encode(self.encoding).replace(b" ", b"_")
            nb = nb[:10].ljust(11).replace(b" ", b"\x00")
            self.dbf.write(struct.pack(
                "<11sc4xBB14x", nb, ftype.encode("ascii"), size, deci
            ))
        self.dbf.write(b"\r")

    def balance(self) -> None:
        """Pad shape/record counts equal (SURVEY A6, ref
        ppge/pyshp/__init__.py:2598-2605): extra shapes get empty records,
        extra records get null shapes."""
        while self._num_records < self._num_shapes:
            self.record()
        while self._num_shapes < self._num_records:
            self.null()

    # -- finalize ----------------------------------------------------------

    def close(self) -> None:
        # shp/shx headers
        for f, length_words in (
            (self.shp, (100 + self._content_bytes) // 2),
            (self.shx, (100 + self._num_shapes * 8) // 2),
        ):
            f.seek(0)
            f.write(struct.pack(">6i", 9994, 0, 0, 0, 0, 0))
            f.write(struct.pack(">i", length_words))
            f.write(struct.pack("<2i", 1000, self.shape_type))
            bbox = self._bbox if (self.shape_type != NULL and self._bbox
                                  ) else [0, 0, 0, 0]
            f.write(struct.pack("<4d", *bbox))
            # header zbox only for Z types EXCL. multipatch; mbox for all
            # M-capable types incl. 31 (ref __shapefileHeader :2178-2198)
            zbox = (self._zbox if self.shape_type in (11, 13, 15, 18)
                    and self._zbox else [0, 0])
            mbox = (self._mbox
                    if self.shape_type in (11, 13, 15, 18, 21, 23, 25,
                                           28, 31) and self._mbox
                    else [0, 0])
            f.write(struct.pack("<4d", zbox[0], zbox[1], mbox[0], mbox[1]))
            f.seek(0, 2)
        # dbf record count (the reference writer emits no 0x1a EOF byte)
        if self._num_records and self.fields:
            self.dbf.seek(4)
            self.dbf.write(struct.pack("<L", self._num_records))
            self.dbf.seek(0, 2)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _encode_dbf_value(value, ftype: str, size: int, deci: int,
                      encoding: str) -> bytes:
    missing = value is None or value == ""
    ftype = ftype.upper()
    if ftype in ("N", "F"):
        if missing:
            return b"*" * size
        if not deci:
            try:
                iv = int(value)
            except ValueError:
                iv = int(float(value))
            return format(iv, "d")[:size].rjust(size).encode("ascii")
        return format(float(value), ".%df" % deci)[:size].rjust(
            size).encode("ascii")
    if ftype == "D":
        if isinstance(value, datetime.date):
            return b"%04d%02d%02d" % (value.year, value.month, value.day)
        if isinstance(value, (list, tuple)) and len(value) == 3:
            return b"%04d%02d%02d" % tuple(value)
        if missing:
            return b"0" * 8
        if isinstance(value, str) and len(value) == 8:
            return value.encode("ascii")
        raise ValueError("bad date value %r" % (value,))
    if ftype == "L":
        if missing:
            return b" "
        if value in (True, 1):
            return b"T"
        if value in (False, 0):
            return b"F"
        return b" "
    return str(value).encode(encoding)[:size].ljust(size)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def read_shapefile(spark, shp_path: str, dbf_path: Optional[str] = None,
                   encoding: str = "utf-8"):
    """Small-layer loader: .shp + .dbf -> DataFrame with ``oid``, ``wkt``
    (16-decimal), plus one column per dbf field (J1 positional join of
    shapes to records, ref ppge/pyshp/__init__.py:1879-1903)."""
    with open(shp_path, "rb") as f:
        _hdr, shapes = decode_shp_bytes(f.read())
    fields: List[Tuple[str, str, int, int]] = []
    records: List[list] = []
    if dbf_path is None:
        dbf_path = shp_path[:-4] + ".dbf"
    try:
        with open(dbf_path, "rb") as f:
            fields, records = decode_dbf_bytes(f.read(), encoding)
    except FileNotFoundError:
        pass

    rows = []
    for i, sh in enumerate(shapes):
        geom = shape_to_geojson(sh)
        wkt_str = wktmod.dumps(geom) if geom is not None else None
        attrs = records[i] if i < len(records) else [None] * len(fields)
        rows.append(tuple([i, wkt_str] + list(attrs)))
    names = ["oid", "wkt"] + [f[0] for f in fields]
    return spark.createDataFrame(rows, names)


def write_shapefile_df(
    df,
    schema,  # list of export.Field
    shp: IO[bytes],
    shx: IO[bytes],
    dbf: IO[bytes],
    prj: IO[bytes],
    geom_key: str,
    geom_format,
    order_col: Optional[str] = None,
) -> None:
    """DataFrame -> shapefile, reference export lifecycle
    (ref ppge/__init__.py:192-271): infer shapetype from first non-null
    geometry, skip type-mismatched shapes, promote Point->MultiPoint,
    null-shape for unparseable geometry, fixed WGS-84 .prj."""
    from pyspark.sql import functions as F

    from .export import FieldType, parse_geometry_safely

    # case-SENSITIVE field resolution (match the reference's row-dict
    # lookups; see sources/export.py)
    cols = [
        F.col("`%s`" % f.name) if f.name in df.columns
        else F.lit(None).cast("string").alias(f.name)
        for f in schema
    ]
    src = df.select(*(cols + ([order_col] if order_col else [])))
    if order_col:
        src = src.orderBy(order_col)

    def shapetype_of(geom) -> int:
        parsed = parse_geometry_safely(geom, geom_format)
        if parsed is None:
            return NULL
        t = parsed.get("type", "").upper()
        if t in ("POINT", "MULTIPOINT"):
            return MULTIPOINT
        if t in ("LINESTRING", "MULTILINESTRING"):
            return POLYLINE
        if t in ("POLYGON", "MULTIPOLYGON"):
            return POLYGON
        return NULL

    rows = [r.asDict() for r in src.toLocalIterator()]
    shapetype = NULL
    for row in rows:
        st = shapetype_of(row.get(geom_key))
        if st != NULL:
            shapetype = st
            break

    writer = ShapefileWriter(shp, shx, dbf, shape_type=shapetype)
    type_map = {
        FieldType.STR: "C", FieldType.INT: "N", FieldType.FLOAT: "F",
        FieldType.BOOL: "L",
    }
    for f in schema:
        if f.name != geom_key:
            writer.field(f.name, type_map.get(f.type, "C"))

    from .export import _convert

    for row in rows:
        geometry = row.get(geom_key)
        parsed = parse_geometry_safely(geometry, geom_format)
        if parsed is not None and shapetype_of(geometry) != shapetype:
            continue  # type-mismatch skip (ref ppge/__init__.py:244-249)
        record = {}
        for f in schema:
            if f.name == geom_key:
                continue
            record[f.name] = _convert(f, row.get(f.name))
        writer.record(**record)
        if parsed is not None:
            if parsed["type"] == "Point":
                parsed = {
                    "type": "MultiPoint",
                    "coordinates": [parsed["coordinates"]],
                }
            writer.shape(geojson_to_shape(parsed))
        else:
            writer.null()
    writer.close()
    prj.write(PRJ_WGS84)
