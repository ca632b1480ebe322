"""Polygon layers: reference fixture states + synthetic grids with holes.

The Wyoming/Colorado WKT strings are carried VERBATIM from the reference
fixture CSVs (/root/reference/wy-co-wkt-bigquery.csv) — they are the
polygons the reference's own e2e tests join points against
(ref ppge-tests/test-ppge.py:55-68: Cheyenne∈Wyoming, Denver∈Colorado).

``polygon_cells`` turns a (small) polygon layer into its cell-cover
relation — the broadcast side of the spatial join: one row per
(polygon, covering cell), tagged ``is_full`` for cells provably interior
(those skip the exact PIP refine).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (used by callers)
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..geo import cells as cellmod
from ..geo import wkt as wktmod
from ..session import local_df

#: verbatim from /root/reference/wy-co-wkt-bigquery.csv
WYOMING_WKT = (
    "POLYGON ((-111.020843268199 44.9981946924588,-111.020843268199 "
    "41.0013336343981,-104.052453769699 41.0013336343981,-104.052453769699 "
    "44.9981946924588,-111.020843268199 44.9981946924588))"
)
COLORADO_WKT = (
    "POLYGON ((-109.042545474199 41.0034439410838,-109.042545474199 "
    "36.9963964708165,-102.041551293899 36.9963964708165,-102.041551293899 "
    "41.0034439410838,-109.042545474199 41.0034439410838))"
)

FIXTURE_POLYGONS: List[Tuple[int, str, str]] = [
    (1, "Wyoming", WYOMING_WKT),
    (2, "Colorado", COLORADO_WKT),
]


def fixture_layer(spark: SparkSession) -> DataFrame:
    """The reference's two-state polygon layer as a DataFrame."""
    return local_df(spark, FIXTURE_POLYGONS,
                    ["polygon_id", "name", "wkt"])


def grid_layer(
    spark: SparkSession,
    nx: int = 8,
    ny: int = 8,
    bbox: Tuple[float, float, float, float] = (-130.0, 20.0, -60.0, 55.0),
    hole_every: int = 10,
) -> DataFrame:
    """Synthetic nx*ny grid of polygons over ``bbox``; every ``hole_every``-th
    cell carries a centered hole (exercises ring assembly + hole semantics,
    FIXTURES.md §2 scale variant)."""
    rows = []
    w = (bbox[2] - bbox[0]) / nx
    h = (bbox[3] - bbox[1]) / ny
    pid = 1000
    for iy in range(ny):
        for ix in range(nx):
            x0 = bbox[0] + ix * w
            y0 = bbox[1] + iy * h
            x1, y1 = x0 + w, y0 + h
            rings = [
                [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]]
            ]
            if hole_every and pid % hole_every == 0:
                cx0, cy0 = x0 + w * 0.4, y0 + h * 0.4
                cx1, cy1 = x0 + w * 0.6, y0 + h * 0.6
                rings.append(
                    [[cx0, cy0], [cx1, cy0], [cx1, cy1], [cx0, cy1],
                     [cx0, cy0]]
                )
            geom = dict(type="Polygon", coordinates=rings)
            rows.append((pid, "grid_%d_%d" % (ix, iy), wktmod.dumps(geom)))
            pid += 1
    return local_df(spark, rows, ["polygon_id", "name", "wkt"])


def load_rings(polygons: DataFrame) -> Dict[int, dict]:
    """Collect a SMALL polygon layer to the driver as
    {polygon_id: {"name", "rings"}}. Polygon layers are the dimension side
    of the join (thousands of rows, not 10^12) — collecting them is the
    broadcast-hash-join pattern, not a scalability leak."""
    out = {}
    for row in polygons.select("polygon_id", "name", "wkt").collect():
        geom = wktmod.loads(row["wkt"])
        if geom["type"] == "Polygon":
            rings = geom["coordinates"]
        elif geom["type"] == "MultiPolygon":
            # flatten: treat every part's rings together (even-odd safe)
            rings = [r for poly in geom["coordinates"] for r in poly]
        else:
            raise ValueError(
                "polygon layer row %s has non-polygon type %s"
                % (row["polygon_id"], geom["type"])
            )
        out[int(row["polygon_id"])] = {"name": row["name"], "rings": rings}
    return out


_CELLS_SCHEMA = StructType(
    [
        StructField("polygon_id", LongType(), False),
        StructField("name", StringType(), False),
        StructField("cell_id", LongType(), False),
        StructField("is_full", BooleanType(), False),
    ]
)


def polygon_cells(
    spark: SparkSession, rings_by_id: Dict[int, dict], res: int,
    edges: str = "planar",
) -> DataFrame:
    """Explode polygons to their covering cells at ``res`` -> broadcastable
    (polygon_id, name, cell_id, is_full) relation. ``edges`` selects the
    planar (reference) or geodesic edge interpretation."""
    rows = []
    for pid, info in rings_by_id.items():
        for cid, full in cellmod.polygon_cover(info["rings"], res,
                                               edges=edges):
            rows.append((pid, info["name"], cid, full))
    return local_df(spark, rows, _CELLS_SCHEMA)
