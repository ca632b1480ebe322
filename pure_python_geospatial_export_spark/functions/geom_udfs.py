"""Arrow-batched geometry UDFs + pure-column spatial expressions.

Two tiers, chosen per the UDFs-are-the-slow-path rule:

* PURE COLUMN expressions (JVM, whole-stage codegen): cell ids, grid
  coords, bbox predicates, tile math — everything arithmetic.
* pandas UDFs (Arrow batch transfer): only where geometry PARSING or the
  exact ray-cast kernel is genuinely needed (WKT/WKB codecs, PIP refine).
  All of them call the vectorized batch kernels from ``geo/``; none loop
  per row at the Spark boundary.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    StringType,
)

from ..geo import kernels
from ..geo import wkb as wkbmod
from ..geo import wkt as wktmod

# ---------------------------------------------------------------------------
# pure-column spatial expressions (JVM side, no Python)
# ---------------------------------------------------------------------------


def grid_xy_cols(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    """Integer grid coords at ``res`` — same clamping as geo.cells.cell_xy."""
    n = 1 << res
    x = F.least(
        F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)),
                   F.lit(0)),
        F.lit(n - 1),
    )
    y = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n)),
                   F.lit(0)),
        F.lit(n - 1),
    )
    return x.cast("long"), y.cast("long")


def cell_id_col(lon: Column, lat: Column, res: int) -> Column:
    """Canonical cell id as plain arithmetic (matches geo.cells.encode and
    the DuckDB oracle formula exactly)."""
    x, y = grid_xy_cols(lon, lat, res)
    return (F.lit(res * (2**58)) + x * F.lit(2**29) + y).cast("long")


def bbox_overlap_col(
    xmin1: Column, ymin1: Column, xmax1: Column, ymax1: Column,
    xmin2: Column, ymin2: Column, xmax2: Column, ymax2: Column,
) -> Column:
    """Vectorized bbox-overlap predicate (SURVEY P3) as a column expr."""
    return (
        (xmin1 <= xmax2) & (xmax1 >= xmin2) & (ymin1 <= ymax2)
        & (ymax1 >= ymin2)
    )


def point_in_bbox_col(
    lon: Column, lat: Column,
    xmin: float, ymin: float, xmax: float, ymax: float,
) -> Column:
    return (
        (lon >= F.lit(xmin)) & (lon <= F.lit(xmax))
        & (lat >= F.lit(ymin)) & (lat <= F.lit(ymax))
    )


# ---------------------------------------------------------------------------
# pandas UDFs (Arrow batches; vectorized kernels inside)
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def wkt_roundtrip(wkt_in: pd.Series) -> pd.Series:
    """WKT -> GeoJSON dict -> WKT at 16 decimals (the C1/C2 composition the
    north rule requires byte-for-byte; malformed -> null)."""
    geoms = wktmod.loads_batch(wkt_in.tolist())
    return pd.Series(wktmod.dumps_batch(geoms), dtype=object)


@F.pandas_udf(StringType())
def geom_type_of_wkt(wkt_in: pd.Series) -> pd.Series:
    geoms = wktmod.loads_batch(wkt_in.tolist())
    return pd.Series(
        [g["type"] if g else None for g in geoms], dtype=object
    )


@F.pandas_udf(BinaryType())
def wkt_to_wkb(wkt_in: pd.Series) -> pd.Series:
    """WKT -> big-endian WKB (C1 -> C3 pipeline)."""
    geoms = wktmod.loads_batch(wkt_in.tolist())
    return pd.Series(wkbmod.dumps_batch(geoms), dtype=object)


@F.pandas_udf(StringType())
def wkb_to_wkt(wkb_in: pd.Series) -> pd.Series:
    """WKB -> WKT at 16 decimals (C4 -> C1)."""
    geoms = wkbmod.loads_batch(wkb_in.tolist())
    return pd.Series(wktmod.dumps_batch(geoms), dtype=object)


def make_pip_refine(rings_by_id: Dict[int, dict], edges: str = "planar"):
    """Factory: exact point-in-polygon refine UDF for a broadcastable
    polygon layer.

    The returned pandas UDF evaluates (polygon_id, lon, lat) -> inside
    using the vectorized ray-cast kernel (or the gnomonic-projection
    geodesic kernel for ``edges='geodesic'``), batching rows PER POLYGON
    within each Arrow batch (after the cell equi-join, batches are
    dominated by few polygons, so the kernel runs on large point blocks).

    ``rings_by_id`` rides along in the UDF closure — serialized once per
    executor by Spark, the broadcast pattern for dimension data.
    """
    plain = {
        int(pid): [np.asarray(r, dtype=np.float64)[:, :2]
                   for r in info["rings"]]
        for pid, info in rings_by_id.items()
    }
    if edges == "geodesic":
        from ..geo.geodesic import points_in_polygon_geodesic as _pip
    elif edges == "planar":
        _pip = kernels.points_in_polygon
    else:
        raise ValueError("edges must be 'planar' or 'geodesic', got %r"
                         % edges)

    @F.pandas_udf(BooleanType())
    def pip_refine(polygon_id: pd.Series, lon: pd.Series,
                   lat: pd.Series) -> pd.Series:
        out = np.zeros(len(polygon_id), dtype=bool)
        pids = polygon_id.to_numpy()
        lons = lon.to_numpy(dtype=np.float64)
        lats = lat.to_numpy(dtype=np.float64)
        for pid in np.unique(pids):
            rings = plain.get(int(pid))
            if rings is None:
                continue
            mask = pids == pid
            out[mask] = _pip(lons[mask], lats[mask], rings)
        return pd.Series(out)

    return pip_refine
