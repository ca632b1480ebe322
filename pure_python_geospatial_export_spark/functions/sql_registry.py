"""SQL-callable registration of the engine's geometry/text functions.

``register_sql_functions(spark)`` exposes the Arrow-batched codec
kernels to ``spark.sql(...)`` under a ``ppge_`` prefix, so a user who
drove the reference as a function library can drive this engine from
plain SQL:

    SELECT ppge_wkt_to_wkb(wkt) FROM layer
    SELECT ppge_geom_type(wkt), ppge_wkt_norm(wkt) FROM layer
    SELECT ppge_nfc(text) FROM documents

Only functions that genuinely need Python (the byte-exact codecs, NFC)
are registered — predicates and grid math stay column expressions /
plain SQL (they compile into codegen; wrapping them in UDFs would only
slow them down). All registered functions are Arrow-batched
(ArrowEvalPython), never row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import geom_udfs as G
from .text import nfc_normalize

PREFIX = "ppge_"


def register_sql_functions(
    spark: SparkSession, prefix: str = PREFIX
) -> list[str]:
    """Register the engine's Python-kernel functions for SQL use.
    Returns the registered names. Idempotent (re-registration
    replaces)."""
    from .text import nfc_udf

    entries = {
        "wkt_norm": G.wkt_roundtrip,       # canonical 16-digit WKT
        "geom_type": G.geom_type_of_wkt,
        "wkt_to_wkb": G.wkt_to_wkb,
        "wkb_to_wkt": G.wkb_to_wkt,
        "nfc": nfc_udf(),  # the SAME udf as the column API
        "geohash_center": _geohash_center_udf(),
    }
    names = []
    for name, fn in entries.items():
        full = prefix + name
        spark.udf.register(full, fn)
        names.append(full)
    names.append(_register_geohash_fn(spark, prefix))
    return names


def _register_geohash_fn(spark: SparkSession, prefix: str) -> str:
    """``ppge_geohash(lon, lat, p)`` as a pure SQL scalar function —
    NO Python: the interleave arithmetic stays inside whole-stage
    codegen. Registered at precision 12 and truncated to ``p``; the
    geohash grids NEST (precision p is the first p characters of
    precision 12 — bit truncation is the coarser floor, and the
    exact-boundary correction preserves bisection semantics at every
    level), verified against encode_geohash in tests. ``p`` outside
    [1, 12] yields NULL."""
    from ..geo.geohash import geohash_sql

    name = prefix + "geohash"
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION %s"
        "(lon DOUBLE, lat DOUBLE, p INT) RETURNS STRING RETURN "
        "CASE WHEN p >= 1 AND p <= 12 THEN substr(%s, 1, p) END"
        % (name, geohash_sql("lon", "lat", 12))
    )
    return name


def _geohash_center_udf():
    """Arrow-batched geohash -> cell-center decode (genuinely needs
    Python: string parsing + deinterleave loops). Mixed precisions in
    one batch are handled by per-length sub-batches; invalid or
    out-of-range geohashes decode to NULL."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ..geo import geohash as gh

    def _center(s):
        arr = s.to_numpy(dtype=object)
        lon = np.full(len(arr), np.nan)
        lat = np.full(len(arr), np.nan)
        lens = np.array([
            len(x) if isinstance(x, str) else -1 for x in arr
        ])
        for length in np.unique(lens):
            if not 1 <= length <= gh.MAX_PRECISION:
                continue
            idx = np.where(lens == length)[0]
            batch = arr[idx].astype("U%d" % length)
            ok = np.array([
                all(c in gh._CHAR_TO_VAL for c in x) for x in batch
            ])
            if ok.any():
                glon, glat = gh.geohash_center(batch[ok])
                lon[idx[ok]] = glon
                lat[idx[ok]] = glat
        # Float64 extension arrays map NaN -> NULL through Arrow (a
        # valid geohash can never decode to NaN, so this is lossless)
        return pd.DataFrame({
            "lon": pd.array(lon, dtype="Float64"),
            "lat": pd.array(lat, dtype="Float64"),
        })

    # non-annotated form: pandas_udf type-hint inspection breaks under
    # `from __future__ import annotations` (round-4 pitfall)
    return F.pandas_udf(_center, "lon double, lat double")


__all__ = ["register_sql_functions", "nfc_normalize"]
