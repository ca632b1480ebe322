"""GeoPackage CONTAINER source/sink — stdlib ``sqlite3``, no GDAL.

Completes the geometry-blob codec (geo/geopackage.py, byte-exact vs
the reference's geomet/geopackage.py) into a full interop surface: a
``.gpkg`` file IS a SQLite database with spec-mandated metadata tables
(``gpkg_spatial_ref_sys``, ``gpkg_contents``,
``gpkg_geometry_columns``; spec http://www.geopackage.org/spec/), and
Python ships SQLite in the standard library, so reading and writing
real GeoPackages needs no third-party codec.

Scale shapes, honestly stated:

- **Read is distributed.** A feature table is split into rowid ranges
  on the driver (two cheap ``MIN``/``MAX`` queries); each Spark task
  opens the file read-only (SQLite supports unlimited concurrent
  readers) and scans only its range through the rowid primary-key
  index — no full-table scan per task, no driver materialization.
  This is the same block-range pattern as the binaryFile GeoTIFF
  ingest.
- **Write is a driver-side export sink** — a ``.gpkg`` is a single
  SQLite file with a single writer, exactly like the reference's
  shapefile sink, so it shares that contract: bounded result layers
  out; memory is bounded by streaming ``toLocalIterator`` partition
  batches into chunked ``executemany``. The 100 TB interchange path
  is GeoParquet (sources/geoparquet.py); this sink exists so engine
  results drop into QGIS/GDAL/sqlite tooling unmodified.

Geometry travels as the spec's GP-header blob. When writing from a
WKB column the header (magic, version, flags, SRID, envelope
indicator 0) is a CONSTANT byte prefix, so blob wrapping happens
JVM-side as ``concat(lit(header), wkb)`` — no Python in the
distributed part of the write path either.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo.geopackage import _INDICATOR_TO_NDOUBLES

#: SQLite application_id for GeoPackage files ('GPKG' big-endian).
GPKG_APPLICATION_ID = 0x47504B47
#: GeoPackage version stamp (1.2 -> 10200) written to user_version.
GPKG_USER_VERSION = 10200

#: fixed last_change stamp: the engine's outputs are bit-reproducible
#: by policy, and a wall-clock default would make two runs of the same
#: job produce different files. Callers exporting for catalog tooling
#: that reads last_change can pass their own stamp.
DEFAULT_LAST_CHANGE = "2000-01-01T00:00:00.000Z"

_WGS84_DEFINITION = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG",'
    '"6326"]],PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]]'
)

_SPARK_TO_SQLITE = {
    T.LongType: "INTEGER",
    T.IntegerType: "MEDIUMINT",
    T.ShortType: "SMALLINT",
    T.ByteType: "TINYINT",
    T.DoubleType: "DOUBLE",
    T.FloatType: "FLOAT",
    T.StringType: "TEXT",
    T.BinaryType: "BLOB",
    T.BooleanType: "BOOLEAN",
}


def gpkg_header_bytes(srid: int, big_endian: bool = False) -> bytes:
    """The 8-byte GP blob header for an envelope-free geometry —
    constant per (srid, endianness), which is what lets the writer
    wrap WKB into GP blobs with a JVM-side concat."""
    flags = 0 if big_endian else 1
    token = ">" if big_endian else "<"
    return struct.pack(token + "BBBBI", ord("G"), ord("P"), 0, flags,
                       int(srid))


def gpkg_blob_to_wkb(buf: bytes) -> bytes:
    """Strip the GP header (variable length: 8 bytes + envelope) and
    return the plain WKB body. Pure slicing — no decode."""
    if len(buf) < 8 or buf[0:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    indicator = (buf[3] >> 1) & 0x7
    try:
        nd = _INDICATOR_TO_NDOUBLES[indicator]
    except KeyError:
        raise ValueError(
            "invalid GeoPackage envelope indicator %d" % indicator
        )
    return buf[8 + 8 * nd:]


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def list_gpkg_layers(path: str) -> List[dict]:
    """Feature layers in the file: [{table, geom_col, geometry_type,
    srs_id}] from gpkg_contents x gpkg_geometry_columns."""
    with _ro_connect(path) as conn:
        rows = conn.execute(
            "SELECT c.table_name, g.column_name, "
            "g.geometry_type_name, g.srs_id "
            "FROM gpkg_contents c "
            "JOIN gpkg_geometry_columns g "
            "ON g.table_name = c.table_name "
            "WHERE c.data_type = 'features' ORDER BY c.table_name"
        ).fetchall()
    return [
        {"table": t, "geom_col": g, "geometry_type": ty, "srs_id": s}
        for t, g, ty, s in rows
    ]


def _ro_connect(path: str) -> sqlite3.Connection:
    return sqlite3.connect(
        "file:%s?mode=ro" % path, uri=True, check_same_thread=False
    )


def _sqlite_decl_to_spark(decl: str) -> T.DataType:
    d = (decl or "").upper()
    if "BOOL" in d:
        return T.BooleanType()
    if "INT" in d:
        return T.LongType()
    if any(k in d for k in ("REAL", "DOUB", "FLOA")):
        return T.DoubleType()
    if any(k in d for k in ("CHAR", "TEXT", "CLOB", "DATE", "TIME")):
        return T.StringType()
    return T.BinaryType()


def read_gpkg(
    spark: SparkSession,
    path: str,
    table: Optional[str] = None,
    geom_as: str = "wkb",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Distributed read of one feature table -> DataFrame with an
    ``fid`` long column, the attribute columns (SQLite declared types
    mapped to Spark types), and the geometry column as ``binary`` —
    plain WKB when ``geom_as='wkb'`` (GP header stripped per row, a
    slice), the raw GP blob when ``geom_as='gpkg'``.

    Parallelism: the rowid span is split into ``num_partitions``
    ranges (default: defaultParallelism) on the driver; each task
    opens the SQLite file read-only and walks only its range via the
    integer-primary-key index. Range splitting by rowid is exact for
    the common gap-free case and merely unbalanced (never wrong) when
    deletes left gaps."""
    if geom_as not in ("wkb", "gpkg"):
        raise ValueError("geom_as must be 'wkb' or 'gpkg'")
    layers = list_gpkg_layers(path)
    if not layers:
        raise ValueError("no feature layers in %s" % path)
    if table is None:
        if len(layers) > 1:
            raise ValueError(
                "multiple layers %s — pass table="
                % [ly["table"] for ly in layers]
            )
        layer = layers[0]
    else:
        try:
            layer = next(ly for ly in layers if ly["table"] == table)
        except StopIteration:
            raise ValueError(
                "no feature layer %r (have %s)"
                % (table, [ly["table"] for ly in layers])
            )
    tbl, geom_col = layer["table"], layer["geom_col"]

    with _ro_connect(path) as conn:
        info = conn.execute(
            "PRAGMA table_info(%s)" % _qident(tbl)
        ).fetchall()
        lo_hi = conn.execute(
            "SELECT MIN(_rowid_), MAX(_rowid_) FROM %s" % _qident(tbl)
        ).fetchone()
    # (cid, name, decl_type, notnull, default, pk)
    pk_cols = [r[1] for r in info if r[5]]
    attr_cols = [
        (r[1], r[2]) for r in info
        if r[1] != geom_col and r[1] not in pk_cols
    ]
    fields = [T.StructField("fid", T.LongType(), False)]
    for name, decl in attr_cols:
        fields.append(
            T.StructField(name, _sqlite_decl_to_spark(decl), True)
        )
    fields.append(T.StructField(geom_col, T.BinaryType(), True))
    schema = T.StructType(fields)

    lo, hi = lo_hi
    if lo is None:  # empty table
        return spark.createDataFrame([], schema)
    n_parts = int(
        num_partitions or spark.sparkContext.defaultParallelism
    )
    n_parts = max(1, min(n_parts, hi - lo + 1))
    step = (hi - lo + 1 + n_parts - 1) // n_parts
    ranges = [
        (lo + i * step, min(hi, lo + (i + 1) * step - 1))
        for i in range(n_parts)
        if lo + i * step <= hi
    ]

    from ..session import local_df

    # range partitioning puts exactly one contiguous rowid range per
    # task (hash would collide ranges into shared tasks at random)
    rdf = local_df(spark, ranges, ["_lo", "_hi"]).repartitionByRange(
        len(ranges), "_lo"
    )
    select_cols = (
        ["_rowid_ AS fid"]
        + [_qident(c) for c, _ in attr_cols]
        + [_qident(geom_col)]
    )
    sql = (
        "SELECT %s FROM %s WHERE _rowid_ BETWEEN ? AND ? "
        "ORDER BY _rowid_" % (", ".join(select_cols), _qident(tbl))
    )
    out_names = (
        ["fid"] + [c for c, _ in attr_cols] + [geom_col]
    )
    bool_cols = [
        name for name, decl in attr_cols
        if isinstance(_sqlite_decl_to_spark(decl), T.BooleanType)
    ]
    strip = geom_as == "wkb"

    def scan(batches) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        conn = _ro_connect(path)
        try:
            for pdf in batches:
                for lo_i, hi_i in zip(pdf["_lo"], pdf["_hi"]):
                    rows = conn.execute(
                        sql, (int(lo_i), int(hi_i))
                    ).fetchall()
                    if not rows:
                        continue
                    out = pd.DataFrame(rows, columns=out_names)
                    if strip:
                        out[geom_col] = [
                            None if b is None else gpkg_blob_to_wkb(b)
                            for b in out[geom_col]
                        ]
                    for bc in bool_cols:
                        out[bc] = out[bc].map(
                            lambda v: None if v is None else bool(v)
                        )
                    yield out
        finally:
            conn.close()

    return rdf.mapInPandas(scan, schema)


def _qident(name: str) -> str:
    if '"' in name:
        raise ValueError("invalid identifier %r" % name)
    return '"%s"' % name


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------


def write_gpkg(
    df: DataFrame,
    path: str,
    table: str,
    geom_col: str = "geom",
    geom_format: str = "wkb",
    geometry_type: str = "GEOMETRY",
    srid: int = 4326,
    bbox: Optional[Tuple[float, float, float, float]] = None,
    identifier: Optional[str] = None,
    last_change: str = DEFAULT_LAST_CHANGE,
    batch_rows: int = 10_000,
) -> int:
    """Export ``df`` as a spec-conformant single-layer GeoPackage;
    returns the feature count.

    ``geom_format='wkb'``: the geometry column holds plain WKB and is
    wrapped into GP blobs JVM-side (constant envelope-free header +
    concat) before any row reaches the driver. ``'gpkg'``: the column
    already holds GP blobs and passes through untouched.

    Driver-side single-writer sink by nature (one SQLite file) — the
    shapefile-writer contract. Memory stays bounded: rows stream
    through ``toLocalIterator`` one partition at a time into chunked
    ``executemany`` inserts inside a single transaction.

    ``bbox`` (min_x, min_y, max_x, max_y) fills gpkg_contents extents;
    None leaves them NULL (spec-legal). Attribute columns must be
    scalar (long/int/double/float/string/binary/bool) — arrays and
    structs have no GeoPackage attribute encoding and raise."""
    if geom_format not in ("wkb", "gpkg"):
        raise ValueError("geom_format must be 'wkb' or 'gpkg'")
    if geom_col not in df.columns:
        raise ValueError("missing geometry column %r" % geom_col)
    if table.lower().startswith("gpkg_") or '"' in table:
        raise ValueError("invalid layer name %r" % table)

    attr_fields = []
    for f in df.schema.fields:
        if f.name == geom_col:
            if not isinstance(f.dataType, T.BinaryType):
                raise ValueError(
                    "%s must be binary (%s), got %s"
                    % (geom_col, geom_format, f.dataType.simpleString())
                )
            continue
        try:
            sqlt = _SPARK_TO_SQLITE[type(f.dataType)]
        except KeyError:
            raise ValueError(
                "column %r: %s has no GeoPackage attribute encoding"
                % (f.name, f.dataType.simpleString())
            )
        attr_fields.append((f.name, sqlt))

    if geom_format == "wkb":
        header = gpkg_header_bytes(srid)
        wrapped = df.withColumn(
            geom_col,
            F.when(
                F.col(geom_col).isNotNull(),
                F.concat(F.lit(header), F.col(geom_col)),
            ),
        )
    else:
        wrapped = df
    # geometry last so the insert template is stable
    ordered = wrapped.select(
        *[n for n, _ in attr_fields], geom_col
    )

    if os.path.exists(path):
        os.remove(path)
    conn = sqlite3.connect(path)
    try:
        conn.execute("PRAGMA application_id = %d" % GPKG_APPLICATION_ID)
        conn.execute("PRAGMA user_version = %d" % GPKG_USER_VERSION)
        _create_metadata_tables(conn)
        cols_sql = ", ".join(
            "%s %s" % (_qident(n), t) for n, t in attr_fields
        )
        conn.execute(
            "CREATE TABLE %s (fid INTEGER PRIMARY KEY AUTOINCREMENT%s, "
            "%s BLOB)"
            % (
                _qident(table),
                (", " + cols_sql) if attr_fields else "",
                _qident(geom_col),
            )
        )
        conn.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, "
            "identifier, description, last_change, min_x, min_y, "
            "max_x, max_y, srs_id) VALUES (?, 'features', ?, '', ?, "
            "?, ?, ?, ?, ?)",
            (
                table,
                identifier or table,
                last_change,
                bbox[0] if bbox else None,
                bbox[1] if bbox else None,
                bbox[2] if bbox else None,
                bbox[3] if bbox else None,
                srid,
            ),
        )
        conn.execute(
            "INSERT INTO gpkg_geometry_columns (table_name, "
            "column_name, geometry_type_name, srs_id, z, m) "
            "VALUES (?, ?, ?, ?, 0, 0)",
            (table, geom_col, geometry_type, srid),
        )
        insert = "INSERT INTO %s (%s) VALUES (%s)" % (
            _qident(table),
            ", ".join(
                [_qident(n) for n, _ in attr_fields]
                + [_qident(geom_col)]
            ),
            ", ".join("?" * (len(attr_fields) + 1)),
        )
        n = 0
        chunk: list = []
        for row in ordered.toLocalIterator(prefetchPartitions=True):
            chunk.append(tuple(row))
            if len(chunk) >= batch_rows:
                conn.executemany(insert, chunk)
                n += len(chunk)
                chunk = []
        if chunk:
            conn.executemany(insert, chunk)
            n += len(chunk)
        conn.commit()
        return n
    finally:
        conn.close()


def _create_metadata_tables(conn: sqlite3.Connection) -> None:
    conn.execute(
        "CREATE TABLE gpkg_spatial_ref_sys ("
        "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
        "organization TEXT NOT NULL, "
        "organization_coordsys_id INTEGER NOT NULL, "
        "definition TEXT NOT NULL, description TEXT)"
    )
    conn.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?, ?, ?, ?, ?, ?)",
        [
            # the three spec-mandated rows (requirement 11)
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined",
             "undefined cartesian coordinate reference system"),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined",
             "undefined geographic coordinate reference system"),
            ("WGS 84 geodetic", 4326, "EPSG", 4326, _WGS84_DEFINITION,
             "longitude/latitude coordinates in decimal degrees"),
        ],
    )
    conn.execute(
        "CREATE TABLE gpkg_contents ("
        "table_name TEXT NOT NULL PRIMARY KEY, "
        "data_type TEXT NOT NULL, identifier TEXT UNIQUE, "
        "description TEXT DEFAULT '', "
        "last_change DATETIME NOT NULL, "
        "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
        "srs_id INTEGER, "
        "CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id) "
        "REFERENCES gpkg_spatial_ref_sys(srs_id))"
    )
    conn.execute(
        "CREATE TABLE gpkg_geometry_columns ("
        "table_name TEXT NOT NULL, column_name TEXT NOT NULL, "
        "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
        "z TINYINT NOT NULL, m TINYINT NOT NULL, "
        "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, "
        "column_name), "
        "CONSTRAINT fk_gc_tn FOREIGN KEY (table_name) "
        "REFERENCES gpkg_contents(table_name), "
        "CONSTRAINT fk_gc_srs FOREIGN KEY (srs_id) "
        "REFERENCES gpkg_spatial_ref_sys(srs_id))"
    )
