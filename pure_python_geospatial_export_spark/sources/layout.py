"""Iceberg-style spatial table layout: cell-partitioned, Morton-clustered.

The scan-level spatial pushdown the reference hand-rolls (seek past
non-matching record bodies via bbox headers, ref
ppge/pyshp/__init__.py:1381-1388) becomes PHYSICAL LAYOUT here:

* the table is written partitioned by a coarse cell (``part_cell``, low
  resolution) — spatial predicates on cells turn into partition pruning
  the Catalyst optimizer applies for free;
* within each partition, rows are sorted by the fine-resolution Morton
  code — neighbors cluster into the same parquet row groups, so
  row-group min/max stats prune fine-grained cell ranges too.

At 100 TB this is the difference between scanning the world and scanning
one state's worth of files for a regional query.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geom_udfs import cell_id_col, grid_xy_cols
from ..geo import cells as cellmod

PART_RES = 3   # 8x8 world partitions by default
SORT_RES = 12  # fine Morton clustering


def morton_col(lon, lat, res: int):
    """Z-order code as a column expression (bit-interleave via shifts)."""
    x, y = grid_xy_cols(lon, lat, res)

    def spread(v):
        v = v.cast("long")
        masks = [
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ]
        for shift, mask in masks:
            v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
        return v

    return spread(x).bitwiseOR(F.shiftleft(spread(y), 1))


def write_spatial_table(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    part_res: int = PART_RES,
    sort_res: int = SORT_RES,
    mode: str = "overwrite",
) -> None:
    """Write a points table cell-partitioned + Morton-sorted."""
    out = (
        df.withColumn(
            "part_cell", cell_id_col(F.col(lon), F.col(lat), part_res)
        )
        .withColumn("morton", morton_col(F.col(lon), F.col(lat), sort_res))
        .repartition("part_cell")
        # sort by the partition column FIRST: the partitioned-write path
        # re-sorts rows by partition key when its required ordering is not
        # already satisfied, and that sort need not be stable — sorting by
        # (part_cell, morton) satisfies the writer and keeps morton order
        .sortWithinPartitions("part_cell", "morton")
    )
    out.write.mode(mode).partitionBy("part_cell").parquet(path)


def read_cells(
    spark: SparkSession,
    path: str,
    cell_ids: Iterable[int],
    part_res: int = PART_RES,
) -> DataFrame:
    """Read only the partitions covering the requested (any-resolution)
    cells — spatial predicate -> partition pruning."""
    parents = set()
    for c in cell_ids:
        x, y, res = cellmod.decode(int(c))
        r = int(res)
        if r < part_res:
            raise ValueError("query cells must be at res >= part_res")
        shift = r - part_res
        parents.add(int(cellmod.encode(int(x) >> shift, int(y) >> shift,
                                       part_res)))
    df = spark.read.parquet(path)
    return df.where(F.col("part_cell").isin(sorted(parents)))


def read_bbox(
    spark: SparkSession,
    path: str,
    bbox,
    part_res: int = PART_RES,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Read rows intersecting a bbox: partition pruning on the coarse
    cells covering the bbox + exact bbox filter (P3) on the survivors."""
    cover = cellmod.bbox_cover(tuple(bbox), part_res)
    df = spark.read.parquet(path).where(
        F.col("part_cell").isin([int(c) for c in cover])
    )
    return df.where(
        (F.col(lon) >= F.lit(bbox[0])) & (F.col(lon) <= F.lit(bbox[2]))
        & (F.col(lat) >= F.lit(bbox[1])) & (F.col(lat) <= F.lit(bbox[3]))
    )


def compact_spatial_table(
    spark: SparkSession,
    path: str,
    out_path: str | None = None,
) -> None:
    """Compact a spatial table in place (or to ``out_path``): streaming
    ingest (stream_to_spatial_table) lands one small file per
    micro-batch per partition, and small files erode both scan
    throughput and row-group pruning. Rewrites each ``part_cell``
    partition as one Morton-sorted file via dynamic partition overwrite
    — only partitions present in the input are replaced, so compaction
    composes with ongoing ingest of OTHER regions.

    In-place mode stages through ``<path>/_compact_tmp`` (underscore
    prefix: invisible to Spark's file listing) because Spark cannot
    overwrite a path it is reading from, then swaps each partition dir
    ATOMICALLY via ``renameat2(RENAME_EXCHANGE)`` — a concurrent reader
    always lists either the old files or the compacted file, never a
    missing partition and never a mix. On filesystems/kernels without
    the exchange syscall it falls back to backup-rename (old ->
    ``.__bak__`` -> new in -> drop backup): still no data-loss window on
    crash (the backup survives until the new data is in place), at the
    cost of a microsecond listing gap.
    """
    import shutil
    import os as _os

    df = spark.read.parquet(path)
    staged = out_path or _os.path.join(path, "_compact_tmp")
    out = df.repartition("part_cell").sortWithinPartitions(
        "part_cell", "morton"
    )
    conf = spark.conf
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = conf.get(key, None)
    conf.set(key, "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("part_cell").parquet(
            staged
        )
    finally:
        if prev is None:
            conf.unset(key)
        else:
            conf.set(key, prev)
    if out_path is None:
        for name in _os.listdir(staged):
            if not name.startswith("part_cell="):
                continue
            dst = _os.path.join(path, name)
            src = _os.path.join(staged, name)
            if not _os.path.exists(dst):
                shutil.move(src, dst)
            elif _exchange_dirs(src, dst):
                pass  # atomic swap; src now holds the pre-compact files
            else:
                bak = dst + ".__bak__"
                shutil.rmtree(bak, ignore_errors=True)
                _os.rename(dst, bak)
                _os.rename(src, dst)
                shutil.rmtree(bak)
        shutil.rmtree(staged, ignore_errors=True)


def _exchange_dirs(a: str, b: str) -> bool:
    """Atomically swap two paths with Linux ``renameat2(RENAME_EXCHANGE)``
    (no instant at which either path is absent). Returns False when the
    syscall/libc wrapper is unavailable or fails (caller falls back)."""
    import ctypes
    import ctypes.util
    import os as _os

    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                           use_errno=True)
        fn = libc.renameat2
    except (OSError, AttributeError):
        return False
    at_fdcwd = -100
    rename_exchange = 2
    ret = fn(at_fdcwd, _os.fsencode(a), at_fdcwd, _os.fsencode(b),
             rename_exchange)
    return ret == 0


def read_polygon(
    spark: SparkSession,
    path: str,
    rings,
    part_res: int = PART_RES,
    edges: str = "planar",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Read rows CONTAINED in a polygon from the spatial table: the
    polygon's cell cover at ``part_res`` prunes partitions (full cells
    skip the exact test entirely, boundary cells run the ray-cast
    kernel) — the read-path composition of the flagship join's
    full/boundary split with the physical layout's pruning."""
    import pandas as pd

    from ..geo import kernels
    from ..geo.geodesic import points_in_polygon_geodesic

    cover = cellmod.polygon_cover(rings, part_res, edges=edges)
    if not cover:
        df = spark.read.parquet(path)
        return df.where(F.lit(False))
    full_cells = [c for c, f in cover if f]
    boundary_cells = [c for c, f in cover if not f]
    df = spark.read.parquet(path)
    full_rows = df.where(F.col("part_cell").isin(full_cells))

    pip = (points_in_polygon_geodesic if edges == "geodesic"
           else kernels.points_in_polygon)
    plain = [list(map(list, r)) for r in rings]

    def refine(batches):
        for pdf in batches:
            keep = pip(pdf[lon].to_numpy(), pdf[lat].to_numpy(), plain)
            yield pdf[pd.Series(keep, index=pdf.index)]

    boundary = df.where(F.col("part_cell").isin(boundary_cells))
    refined = boundary.mapInPandas(refine, df.schema)
    return full_rows.unionByName(refined)
