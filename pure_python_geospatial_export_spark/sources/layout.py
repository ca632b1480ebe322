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
    df = read_snapshot(spark, path)
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
    df = read_snapshot(spark, path).where(
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

    Consistency contract: the swap is atomic at the LISTING level — a
    reader never lists a missing or half-swapped partition. A reader
    that planned its scan against the PRE-swap listing, however, can
    hit FILE_NOT_EXIST when its planned file is replaced mid-read and
    must retry (Spark's standard behavior for files updated underneath
    a scan). For all-old-or-all-new reads WITHOUT that retry — and for
    multi-partition compactions as one transactional snapshot — use
    :func:`compact_spatial_table_snapshot`, which keeps old files
    alive until :func:`expire_snapshots`.
    """
    import shutil
    import os as _os

    if out_path is None and read_manifest(path) is not None:
        raise ValueError(
            "table at %r uses manifest commits — use "
            "compact_spatial_table_snapshot (the per-partition dir swap "
            "would invalidate the manifest's file list)" % (path,)
        )
    df = read_snapshot(spark, path)
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


# ---------------------------------------------------------------------------
# snapshot manifests: one-rename multi-partition commits
# ---------------------------------------------------------------------------
#
# renameat2 swaps make each PARTITION's compaction atomic, but a
# multi-partition compaction is many swaps — a concurrent reader can see
# partition A compacted and partition B not yet (consistent data, mixed
# snapshot). The manifest turns the whole table state into ONE pointer:
# `_MANIFEST` lists the exact data files of the current snapshot, new
# snapshots stage their files under fresh names (never clobbering live
# ones), and a single atomic `os.replace` of the manifest publishes the
# complete new file set. Readers resolve the manifest and read exactly
# those files (partition pruning still applies — the files keep their
# `part_cell=` directories via basePath). Old files stay on disk until
# `expire_snapshots` — the Iceberg snapshot-expiry contract — so a
# reader that resolved the previous manifest keeps a complete,
# consistent view.

MANIFEST_NAME = "_MANIFEST"


def _manifest_file(path: str) -> str:
    import os as _os

    return _os.path.join(path, MANIFEST_NAME)


def read_manifest(path: str) -> dict | None:
    """Current snapshot manifest ``{"snapshot": int, "files": [rel]}``,
    or None for a manifest-less table."""
    import json

    try:
        with open(_manifest_file(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def atomic_write_text(path: str, text: str) -> None:
    """Durably publish ``text`` at ``path`` with write -> fsync ->
    rename -> fsync(parent dir): readers see the old content or the
    complete new content, and the rename itself survives a crash (the
    parent-directory fsync is what makes the new name durable). The
    shared commit primitive under the layout manifest and the
    streaming-cluster pointer."""
    import os as _os
    import tempfile

    parent = _os.path.dirname(_os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=parent, prefix="._commit")
    try:
        with _os.fdopen(fd, "w") as f:
            f.write(text)
            f.flush()
            _os.fsync(f.fileno())
        _os.replace(tmp, path)
        dfd = _os.open(parent, _os.O_RDONLY)
        try:
            _os.fsync(dfd)
        finally:
            _os.close(dfd)
    except BaseException:
        if _os.path.exists(tmp):
            _os.unlink(tmp)
        raise


def _commit_manifest(path: str, snapshot: int, files: list[str]) -> None:
    import json
    import os as _os

    body = json.dumps({"snapshot": snapshot, "files": sorted(files)})
    # history manifest first (time travel), THEN the current pointer —
    # a reader resolving snapshot N always finds manifest-v N complete
    atomic_write_text(
        _os.path.join(path, "_manifest-v%06d.json" % snapshot), body
    )
    atomic_write_text(_manifest_file(path), body)


def list_snapshots(path: str) -> list[int]:
    """Snapshot ids with a retained history manifest, ascending."""
    import os as _os
    import re as _re

    out = []
    for name in _os.listdir(path):
        m = _re.match(r"^_manifest-v(\d+)\.json$", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_manifest_at(path: str, snapshot: int) -> dict:
    """A specific snapshot's manifest (requires its history file;
    raises if it was never written or has been cleaned up)."""
    import json
    import os as _os

    p = _os.path.join(path, "_manifest-v%06d.json" % int(snapshot))
    try:
        with open(p) as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValueError(
            "snapshot %d has no retained manifest at %r (available: %s)"
            % (snapshot, path, list_snapshots(path))
        )


def snapshot_diff(path: str, a: int, b: int) -> dict:
    """File-level diff between two snapshots:
    {"added": [...], "removed": [...], "unchanged_count": n} — what a
    compaction or ingest actually rewrote."""
    fa = set(read_manifest_at(path, a)["files"])
    fb = set(read_manifest_at(path, b)["files"])
    return {
        "added": sorted(fb - fa),
        "removed": sorted(fa - fb),
        "unchanged_count": len(fa & fb),
    }


def _list_data_files(path: str) -> list[str]:
    import os as _os

    out = []
    for name in sorted(_os.listdir(path)):
        if not name.startswith("part_cell="):
            continue
        pdir = _os.path.join(path, name)
        for f in sorted(_os.listdir(pdir)):
            if f.endswith(".parquet"):
                out.append(_os.path.join(name, f))
    return out


def init_manifest(path: str) -> dict:
    """Adopt an existing (plain-directory) spatial table into manifest
    commits: snapshot 0 = the files currently on disk."""
    m = read_manifest(path)
    if m is not None:
        return m
    files = _list_data_files(path)
    _commit_manifest(path, 0, files)
    return {"snapshot": 0, "files": sorted(files)}


def read_snapshot(
    spark: SparkSession, path: str, snapshot: int | None = None
) -> DataFrame:
    """Read the table's current snapshot — or, with ``snapshot=N``,
    TIME-TRAVEL to a historical one (valid until
    :func:`expire_snapshots` removes its files; the manifest history
    outlives the data so attempts past expiry fail with a clear
    missing-file error rather than silently reading the wrong data).
    Reads exactly the manifest's files (basePath keeps the
    ``part_cell`` partition column and its pruning); falls back to a
    plain directory read when the table has no manifest."""
    import os as _os

    if snapshot is not None:
        m = read_manifest_at(path, snapshot)
    else:
        m = read_manifest(path)
        if m is None:
            return spark.read.parquet(path)
    files = [_os.path.join(path, f) for f in m["files"]]
    return spark.read.option("basePath", path).parquet(*files)


def compact_spatial_table_snapshot(
    spark: SparkSession, path: str
) -> dict:
    """Compact ALL partitions as one transactional snapshot:

    1. read the current snapshot (manifest-resolved);
    2. write the compacted copy to a staging dir;
    3. move each staged file into its live partition dir under a
       snapshot-unique name (live files are never touched);
    4. publish with ONE atomic manifest replace.

    A concurrent reader resolves either the old manifest (all old
    files, still on disk) or the new one (all new files) — never a
    partition-mixed state. Returns the new manifest. Old-snapshot
    files remain until :func:`expire_snapshots`."""
    import os as _os
    import shutil

    m = init_manifest(path)
    snap = int(m["snapshot"]) + 1
    df = read_snapshot(spark, path)
    staged = _os.path.join(path, "_compact_tmp")
    (
        df.repartition("part_cell")
        .sortWithinPartitions("part_cell", "morton")
        .write.mode("overwrite")
        .partitionBy("part_cell")
        .parquet(staged)
    )
    new_files = []
    for name in sorted(_os.listdir(staged)):
        if not name.startswith("part_cell="):
            continue
        live = _os.path.join(path, name)
        _os.makedirs(live, exist_ok=True)
        sdir = _os.path.join(staged, name)
        for f in sorted(_os.listdir(sdir)):
            if not f.endswith(".parquet"):
                continue
            newname = "snap%06d-%s" % (snap, f)
            _os.rename(_os.path.join(sdir, f),
                       _os.path.join(live, newname))
            new_files.append(_os.path.join(name, newname))
    _commit_manifest(path, snap, new_files)
    shutil.rmtree(staged, ignore_errors=True)
    return {"snapshot": snap, "files": sorted(new_files)}


def expire_snapshots(path: str) -> int:
    """Delete data files not referenced by the CURRENT manifest (the
    previous snapshots' files kept for in-flight readers). Run once
    older readers are done — Iceberg's snapshot-expiry contract.
    Returns the number of files removed."""
    import os as _os

    m = read_manifest(path)
    if m is None:
        raise ValueError("expire_snapshots requires a manifest table")
    keep = set(m["files"])
    removed = 0
    for rel in _list_data_files(path):
        if rel not in keep:
            _os.unlink(_os.path.join(path, rel))
            removed += 1
    return removed


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
        df = read_snapshot(spark, path)
        return df.where(F.lit(False))
    full_cells = [c for c, f in cover if f]
    boundary_cells = [c for c, f in cover if not f]
    df = read_snapshot(spark, path)
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
