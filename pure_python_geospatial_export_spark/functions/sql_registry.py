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
    }
    names = []
    for name, fn in entries.items():
        full = prefix + name
        spark.udf.register(full, fn)
        names.append(full)
    return names


__all__ = ["register_sql_functions", "nfc_normalize"]
