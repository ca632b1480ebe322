"""Deterministic page geolocation — the engine's point-derivation contract.

Every page's (lon, lat) derives from sha256 of its url (FIXTURES.md §1):

    lon = (int(sha256(url)[:8],  16) % 3600000) / 10000 - 180
    lat = (int(sha256(url)[8:16], 16) % 1800000) / 10000 -  90

This single module pins the formula for the Spark engine, the DuckDB
oracle (``*_SQL`` strings), the pure-Python test oracle, and the numpy
batch kernel — all four produce bit-identical doubles (int64-exact hash
slices, identical IEEE divisions).

The Spark form is PURE COLUMN ARITHMETIC (sha2/conv/pmod) — JVM-side,
whole-stage-codegen'd, no Python in the hot path. At 10^12 rows this is
the difference between a scan-speed derive and an Arrow round-trip.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LON_MOD = 3_600_000
LAT_MOD = 1_800_000
SCALE = 10_000.0


def lon_col(url: Column) -> Column:
    h = F.sha2(url, 256)
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % LON_MOD
    ) / F.lit(SCALE) - F.lit(180.0)


def lat_col(url: Column) -> Column:
    h = F.sha2(url, 256)
    return (
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % LAT_MOD
    ) / F.lit(SCALE) - F.lit(90.0)


def with_point(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach derived (lon, lat) columns to a pages-like DataFrame."""
    return df.withColumn("lon", lon_col(F.col(url_col))).withColumn(
        "lat", lat_col(F.col(url_col))
    )


def point_sql(url_expr: str) -> tuple[str, str]:
    """(lon_sql, lat_sql) — the same formula in ANSI SQL for DuckDB oracles."""
    lon = (
        "(CAST(concat('0x', substr(sha256(%s), 1, 8)) AS BIGINT) %% %d)"
        " / %s - 180.0" % (url_expr, LON_MOD, "10000.0")
    )
    lat = (
        "(CAST(concat('0x', substr(sha256(%s), 9, 8)) AS BIGINT) %% %d)"
        " / %s - 90.0" % (url_expr, LAT_MOD, "10000.0")
    )
    return lon, lat


def derive_point_py(url: str) -> tuple[float, float]:
    """Pure-Python oracle (tests)."""
    h = hashlib.sha256(url.encode("utf-8")).hexdigest()
    lon = (int(h[:8], 16) % LON_MOD) / SCALE - 180.0
    lat = (int(h[8:16], 16) % LAT_MOD) / SCALE - 90.0
    return lon, lat


def derive_points_np(urls) -> tuple[np.ndarray, np.ndarray]:
    """numpy batch kernel (for in-kernel use, e.g. lineage metrics)."""
    lons = np.empty(len(urls), dtype=np.float64)
    lats = np.empty(len(urls), dtype=np.float64)
    for i, u in enumerate(urls):
        lons[i], lats[i] = derive_point_py(u)
    return lons, lats
