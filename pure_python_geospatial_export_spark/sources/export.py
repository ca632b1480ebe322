"""Export sinks — byte-exact GeoJSON FeatureCollection and CSV-with-WKT.

Reproduces the reference export surface (ref ppge/__init__.py:192-355)
Spark-first:

* The per-row feature/CSV payload is computed DISTRIBUTED in an Arrow
  batch kernel (``mapInPandas``) — each partition emits its lines.
* Single-file, input-ordered exports (the reference's contract) assemble
  the partition outputs on the driver via ``toLocalIterator`` — an O(rows)
  stream, never a full collect. At 100 TB you'd use ``lines_df.write.text``
  to get a sharded export instead; both modes share the same kernel.

Layout contract (golden-tested against reference-recorded bytes):
* GeoJSON: header ``{"type": "FeatureCollection", "features": [`` then
  per row ``[,]\\n<json.dumps(feature)>`` and footer ``\\n]}\\n``; feature
  key order type/geometry/properties (ref ppge/__init__.py:274-309).
* CSV: DictWriter layout, geometry re-dumped as 16-decimal WKT, geometry
  column named geometry -> WKT -> geometry_N on conflict
  (ref ppge/__init__.py:312-355, :45-64).
* Unparseable/null geometry -> null feature geometry / empty CSV cell
  (P8 guard, ref ppge/__init__.py:137-162); field cast failure raises
  ``ValueError("Field '<name>' conversion error: ...")``.
"""

from __future__ import annotations

import csv
import enum
import io
import json
from dataclasses import dataclass
from typing import IO, Iterator, List, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..geo import wkt as wktmod


class FieldType(enum.Enum):
    INT = "int"
    FLOAT = "float"
    STR = "str"
    BYTES = "bytes"
    BOOL = "bool"
    GEOM = "geom"
    GEOG = "geog"


class GeometryFormat(enum.Enum):
    WKT = "wkt"
    GEOJSON = "geojson"


@dataclass
class Field:
    name: str
    type: Union[FieldType, str]
    nullable: bool = True


_CASTS = {
    FieldType.INT: int,
    FieldType.FLOAT: float,
    FieldType.STR: str,
    FieldType.BOOL: bool,
    FieldType.BYTES: bytes,
}


def geometry_column_name(existing: set) -> str:
    """geometry -> WKT -> geometry_N conflict resolution
    (ref ppge/__init__.py:45-64)."""
    if "geometry" not in existing:
        return "geometry"
    if "WKT" not in existing:
        return "WKT"
    counter = 1
    while "geometry_%d" % counter in existing:
        counter += 1
    return "geometry_%d" % counter


def parse_geometry_safely(geometry, geom_format: GeometryFormat):
    """Parse WKT/GeoJSON; None on any failure (ref ppge/__init__.py:137-162)."""
    if geometry is None:
        return None
    try:
        if geom_format == GeometryFormat.WKT:
            if isinstance(geometry, str):
                return wktmod.loads(geometry)
            return geometry
        if isinstance(geometry, str):
            return json.loads(geometry)
        return geometry
    except (json.JSONDecodeError, TypeError, ValueError):
        return None


def _convert(field: Field, value):
    # NOTE: casts apply unconditionally like the reference's converters
    # (ref ppge/__init__.py:67-94) — so a null STR value becomes the string
    # "None"; null enforcement in the reference is decorative (SURVEY §1.2)
    # and is intentionally not reproduced.
    cast = _CASTS.get(field.type, lambda x: x)
    try:
        return cast(value)
    except Exception as e:  # noqa: BLE001 — reference wraps any cast error
        raise ValueError(
            "Field '%s' conversion error: %s" % (field.name, e)
        )


def _feature_line(row: dict, schema: List[Field], geom_key: str,
                  geom_format: GeometryFormat) -> str:
    geometry = parse_geometry_safely(row.get(geom_key), geom_format)
    properties = {}
    for field in schema:
        if field.name == geom_key:
            continue
        properties[field.name] = _convert(field, row.get(field.name))
    feature = {"type": "Feature", "geometry": geometry,
               "properties": properties}
    return json.dumps(feature)


def _csv_line(row: dict, schema: List[Field], geom_key: str,
              geom_format: GeometryFormat, geom_col: str,
              fieldnames: List[str]) -> str:
    geometry = parse_geometry_safely(row.get(geom_key), geom_format)
    out = {}
    for field in schema:
        if field.name == geom_key:
            continue
        out[field.name] = _convert(field, row.get(field.name))
    out[geom_col] = wktmod.dumps(geometry) if geometry is not None else None
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=fieldnames, lineterminator="")
    w.writerow(out)
    return buf.getvalue()


_LINE_SCHEMA = StructType([StructField("line", StringType(), True)])


def _lines_df(df: DataFrame, schema: List[Field], geom_key: str,
              geom_format: GeometryFormat, kind: str,
              order_col: str | None) -> DataFrame:
    """Distributed line computation via mapInPandas (Arrow batches)."""
    fieldnames = None
    geom_col = None
    if kind == "csv":
        existing = {f.name for f in schema}
        geom_col = geometry_column_name(existing)
        fieldnames = [f.name for f in schema if f.name != geom_key]
        fieldnames.append(geom_col)

    out_schema = StructType(list(_LINE_SCHEMA))
    # schema fields resolve CASE-SENSITIVELY against the input columns,
    # like the reference's row-dict lookups (a schema asking for 'name'
    # against a CSV with header 'NAME' yields None -> str(None) == "None";
    # Spark's case-insensitive resolution would silently find it)
    cols = [
        F.col("`%s`" % f.name) if f.name in df.columns
        else F.lit(None).cast("string").alias(f.name)
        for f in schema
    ]
    if order_col:
        out_schema = StructType(
            list(_LINE_SCHEMA) + [df.schema[order_col]]
        )
        src = df.select(*cols, order_col)
    else:
        src = df.select(*cols)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # normalize pandas NaN/NaT back to None so null semantics match
            # the reference's row dicts exactly
            rows = pdf.astype(object).where(pdf.notnull(), None).to_dict(
                "records")
            if kind == "geojson":
                lines = [
                    _feature_line(r, schema, geom_key, geom_format)
                    for r in rows
                ]
            else:
                lines = [
                    _csv_line(r, schema, geom_key, geom_format, geom_col,
                              fieldnames)
                    for r in rows
                ]
            out = pd.DataFrame({"line": lines})
            if order_col:
                out[order_col] = pdf[order_col].values
            yield out

    return src.mapInPandas(emit, out_schema)


def export_to_geojson(
    df: DataFrame,
    schema: List[Field],
    geojsonfile: IO[bytes],
    geom_key: str,
    geom_format: GeometryFormat,
    order_col: str | None = None,
) -> None:
    """Single-file FeatureCollection export, reference-exact bytes."""
    lines = _lines_df(df, schema, geom_key, geom_format, "geojson",
                      order_col)
    if order_col:
        lines = lines.orderBy(order_col)
    text = io.TextIOWrapper(geojsonfile, encoding="utf-8")
    text.write('{"type": "FeatureCollection", "features": [')
    first = True
    for row in lines.toLocalIterator():
        text.write("%s\n%s" % ("" if first else ",", row["line"]))
        first = False
    text.write("\n]}\n")
    text.flush()
    text.detach()


def export_to_csv(
    df: DataFrame,
    schema: List[Field],
    csvfile: IO[bytes],
    geom_key: str,
    geom_format: GeometryFormat,
    order_col: str | None = None,
) -> None:
    """Single-file CSV-with-WKT export, reference-exact bytes."""
    existing = {f.name for f in schema}
    geom_col = geometry_column_name(existing)
    fieldnames = [f.name for f in schema if f.name != geom_key]
    fieldnames.append(geom_col)

    lines = _lines_df(df, schema, geom_key, geom_format, "csv", order_col)
    if order_col:
        lines = lines.orderBy(order_col)
    text = io.TextIOWrapper(csvfile, encoding="utf-8", newline="")
    header = io.StringIO()
    csv.DictWriter(header, fieldnames=fieldnames).writeheader()
    text.write(header.getvalue())
    for row in lines.toLocalIterator():
        text.write(row["line"] + "\r\n")
    text.flush()
    text.detach()


def export_sharded(
    df: DataFrame,
    schema: List[Field],
    path: str,
    geom_key: str,
    geom_format: GeometryFormat,
    kind: str = "geojson",
) -> None:
    """Scale path: one newline-delimited part file per partition
    (GeoJSON features or CSV rows), written by executors — no driver
    assembly. This is the 100 TB egress mode."""
    _lines_df(df, schema, geom_key, geom_format, kind, None).select(
        F.col("line")
    ).write.mode("overwrite").text(path)
