"""GeoJSON sources: FeatureCollection files and newline-delimited
Features -> DataFrame(fid, wkt, properties).

The engine already writes GeoJSON (sources/export.py byte-parity sink,
ref ppge/api.py); this closes the read direction so round trips stay
inside the engine. Geometries land as WKT (the engine's interchange
column, via geo/wkt.dumps — same 16-decimal semantics as the sink) and
properties as a JSON object string (schema-stable regardless of
per-feature attribute drift — callers project with
``F.get_json_object`` / ``from_json``).

Two shapes:

* :func:`read_geojson` — one FeatureCollection document. Parsed
  driver-side (a single JSON document cannot be split anyway) and
  distributed via the Arrow local-table path. For files; bounded.
* :func:`read_geojson_lines` — newline-delimited Features (the
  crawl-scale interchange format). ``spark.read.text`` splits the scan
  across executors and a ``mapInPandas`` kernel parses per batch, so
  this path scales with the cluster; malformed lines null out
  (``mode='permissive'``, the P8 null-guard convention) or raise
  (``mode='failfast'``).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..geo import wkt as wkt_mod

OUT_SCHEMA = StructType([
    StructField("fid", StringType(), True),
    StructField("wkt", StringType(), True),
    StructField("properties", StringType(), True),
])


def _feature_to_row(feat: dict):
    if not isinstance(feat, dict) or feat.get("type") != "Feature":
        raise ValueError("not a GeoJSON Feature")
    geom = feat.get("geometry")
    wkt = wkt_mod.dumps(geom) if geom is not None else None
    fid = feat.get("id")
    fid = None if fid is None else str(fid)
    props = feat.get("properties")
    props_json = None if props is None else json.dumps(props)
    return fid, wkt, props_json


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """One FeatureCollection (or single Feature) document -> DataFrame."""
    from ..session import local_df

    with open(path) as f:
        doc = json.load(f)
    if doc.get("type") == "FeatureCollection":
        feats = doc.get("features", [])
    elif doc.get("type") == "Feature":
        feats = [doc]
    else:
        raise ValueError(
            "expected FeatureCollection or Feature, got %r"
            % doc.get("type")
        )
    rows = [_feature_to_row(ft) for ft in feats]
    if not rows:
        return spark.createDataFrame([], OUT_SCHEMA)
    return local_df(spark, rows, ["fid", "wkt", "properties"])


def read_geojson_lines(
    spark: SparkSession, path: str, mode: str = "permissive"
) -> DataFrame:
    """Newline-delimited GeoJSON Features -> DataFrame, executor-side
    parse (scales with the input). ``mode='permissive'`` turns a
    malformed line into an all-null row (count them with
    ``WHERE wkt IS NULL AND properties IS NULL``); ``'failfast'``
    raises with the offending line."""
    if mode not in ("permissive", "failfast"):
        raise ValueError("mode must be 'permissive' or 'failfast'")
    failfast = mode == "failfast"

    def kernel(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            fids, wkts, props = [], [], []
            for line in pdf["value"]:
                try:
                    row = _feature_to_row(json.loads(line))
                except Exception:
                    if failfast:
                        raise ValueError(
                            "malformed GeoJSON line: %.200s" % line
                        )
                    row = (None, None, None)
                fids.append(row[0])
                wkts.append(row[1])
                props.append(row[2])
            yield pd.DataFrame({
                "fid": pd.Series(fids, dtype=object),
                "wkt": pd.Series(wkts, dtype=object),
                "properties": pd.Series(props, dtype=object),
            })

    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    return lines.mapInPandas(kernel, OUT_SCHEMA)
