"""pure_python_geospatial_export_spark — a PySpark-native spatial-join +
tiling engine with the data-processing capabilities of
migurski/Pure-Python-Geospatial-Export, re-expressed Spark-first.

Layering:

* ``geo``        — pure numpy/python kernels: byte-exact WKT/WKB codecs,
                   ray-cast PIP, ring assembly, hierarchical cell index.
* ``functions``  — Spark column expressions + Arrow pandas UDFs (point
                   derivation, cell ids, geometry codecs, text analysis).
* ``operators``  — DataFrame operators: spatial join, kNN, tiles, dedup
                   (exact/MinHash/SimHash), similarity search, multimodal.
* ``sources``    — pages synthesis, polygon layers, shapefile I/O,
                   GeoJSON/CSV export sinks.
* ``plans``      — per-partition lineage metrics, resumable runs.
* ``streaming``  — Structured Streaming ingest + windowed cell counts.
"""

from .geo import wkb, wkt  # noqa: F401
from .geo.cells import cell_id, morton_id, polygon_cover  # noqa: F401
from .geo.kernels import (  # noqa: F401
    organize_polygon_rings,
    points_in_polygon,
    points_in_ring,
    signed_area,
)
from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
