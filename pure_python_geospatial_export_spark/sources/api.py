"""Reference-parity public API — the 6 ``process_*`` entry points.

A user of the reference (ref ppge/__init__.py:358-459) switches to the
engine by replacing their row iterator with a DataFrame; the warehouse
presets are identical: BigQuery mode = geometry under ``geom`` as WKT,
Snowflake mode = geometry under ``GEOM`` as GeoJSON strings. Output bytes
match the reference exactly (golden-tested).
"""

from __future__ import annotations

from typing import IO, List, Optional

from pyspark.sql import DataFrame

from .export import (
    Field,
    GeometryFormat,
    export_to_csv,
    export_to_geojson,
)
from .shapefile import write_shapefile_df


def process_bigquery_df_to_shapefile(
    df: DataFrame, schema: List[Field], shp: IO[bytes], shx: IO[bytes],
    dbf: IO[bytes], prj: IO[bytes], order_col: Optional[str] = None,
) -> None:
    write_shapefile_df(df, schema, shp, shx, dbf, prj, "geom",
                       GeometryFormat.WKT, order_col=order_col)


def process_snowflake_df_to_shapefile(
    df: DataFrame, schema: List[Field], shp: IO[bytes], shx: IO[bytes],
    dbf: IO[bytes], prj: IO[bytes], order_col: Optional[str] = None,
) -> None:
    write_shapefile_df(df, schema, shp, shx, dbf, prj, "GEOM",
                       GeometryFormat.GEOJSON, order_col=order_col)


def process_bigquery_df_to_geojson(
    df: DataFrame, schema: List[Field], geojsonfile: IO[bytes],
    order_col: Optional[str] = None,
) -> None:
    export_to_geojson(df, schema, geojsonfile, "geom", GeometryFormat.WKT,
                      order_col=order_col)


def process_snowflake_df_to_geojson(
    df: DataFrame, schema: List[Field], geojsonfile: IO[bytes],
    order_col: Optional[str] = None,
) -> None:
    export_to_geojson(df, schema, geojsonfile, "GEOM",
                      GeometryFormat.GEOJSON, order_col=order_col)


def process_bigquery_df_to_csv(
    df: DataFrame, schema: List[Field], csvfile: IO[bytes],
    order_col: Optional[str] = None,
) -> None:
    export_to_csv(df, schema, csvfile, "geom", GeometryFormat.WKT,
                  order_col=order_col)


def process_snowflake_df_to_csv(
    df: DataFrame, schema: List[Field], csvfile: IO[bytes],
    order_col: Optional[str] = None,
) -> None:
    export_to_csv(df, schema, csvfile, "GEOM", GeometryFormat.GEOJSON,
                  order_col=order_col)
