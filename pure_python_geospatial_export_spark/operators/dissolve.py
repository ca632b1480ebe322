"""Polygon dissolve — merge a fact-scale polygon table into
overlap-connected groups.

The classic GIS "dissolve" (flatten a parcel/footprint layer into
contiguous blobs), decomposed into Spark-native steps so nothing
quadratic sits on a scale path:

1. :func:`polygon_self_overlap_pairs` — the exact "intersects"
   self-join. One Arrow pass extracts each polygon's bbox
   (``spatial_join.attach_probe_bboxes`` — WKT parsed once, malformed
   rows drop); candidate cells are the bbox's grid-range cross product
   (pure column ``sequence`` explodes); a single equi self-join on
   ``cell_id`` proposes pairs. Pairs are deduplicated WITHOUT a
   ``distinct`` shuffle: a pair is emitted only from its CANONICAL cell
   — the cell containing the south-west corner of the two bboxes'
   intersection, which both sides provably cover — so every colliding
   pair surfaces exactly once. Only bbox-overlapping candidates run the
   exact kernel (``kernels.polygons_intersect``; geodesic edges via the
   great-circle variants), Arrow-batched over the pair's two WKTs.
2. :func:`dissolve` — connected components over the pair graph
   (``dedup.duplicate_clusters``: label propagation + pointer jumping,
   O(log diameter) rounds), with non-colliding singletons unioned back
   as their own groups.
3. :func:`dissolve_groups` — per-group rollup: member count and the
   merged vertex bbox.

Scale notes: the self-join shuffles each polygon once per covered cell
(pick ``res`` so typical geometries span O(1) cells); hot cells are
bounded by ``max_bucket`` exactly like the MinHash band join —
explicitly capped, never silently quadratic. The verify step ships each
candidate pair's two WKTs; geometries are small by contract (parcels,
footprints), so the pair relation stays skinny.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geom_udfs import grid_xy_cols
from .spatial_join import DEFAULT_RES, attach_probe_bboxes

__all__ = [
    "polygon_self_overlap_pairs",
    "dissolve",
    "dissolve_groups",
]


def polygon_self_overlap_pairs(
    df: DataFrame,
    id_col: str = "id",
    wkt_col: str = "wkt",
    res: int = DEFAULT_RES,
    edges: str = "planar",
    max_bucket: int | None = None,
    strategy: str = "join",
) -> DataFrame:
    """Exact polygon-vs-polygon "intersects" self-join ->
    ``(id_a, id_b)`` with ``id_a < id_b`` (boundary contact counts).

    ``max_bucket`` caps the per-cell candidate fan-out (rows kept per
    cell, ordered by id for determinism) — the boilerplate-flood guard;
    ``None`` disables the cap.

    ``strategy``: ``"join"`` (default) shuffles both explode sides
    into a hash equi self-join on the cell — two exchanges, the shape
    AQE can skew-split; ``"grouped"`` shuffles the exploded relation
    ONCE and forms pairs per cell inside a batched group walk
    (vectorized bbox prefilter + canonical-cell dedupe + in-kernel
    verify, each group member's WKT parsed at most once). Identical
    pair sets (asserted in tests); measured A/B in
    scripts/dissolve_strategy_ab.py.
    """
    if strategy not in ("join", "grouped"):
        raise ValueError("strategy must be 'join' or 'grouped'")
    geodesic = edges == "geodesic"
    src = df.select(F.col(id_col).alias("_id"),
                    F.col(wkt_col).alias("_wkt"))
    with_bbox = attach_probe_bboxes(src, geodesic)
    if strategy == "grouped":
        return _pairs_grouped(with_bbox, res, geodesic, max_bucket)
    return _pairs_from_bboxes(with_bbox, res, geodesic, max_bucket)


def _pairs_grouped(
    with_bbox: DataFrame,
    res: int,
    geodesic: bool,
    max_bucket: int | None,
) -> DataFrame:
    """Single-exchange pair formation: explode to cells, ONE hash
    repartition on the cell, then per-cell pair enumeration inside the
    batched group walk (triu index broadcast over the cell's bboxes —
    bounded by ``max_bucket``, the same flood guard as the join path)."""
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    from ..geo import cells as cellmod
    from ..geo import kernels
    from ..geo import wkt as wktmod
    from .grouped import ordered_group_map
    from .spatial_join import _probe_parts

    gx0, gy0 = grid_xy_cols(F.col("_xmin"), F.col("_ymin"), res)
    gx1, gy1 = grid_xy_cols(F.col("_xmax"), F.col("_ymax"), res)
    cand = (
        with_bbox
        .withColumn("_gx", F.explode(F.sequence(gx0, gx1)))
        .withColumn("_gy", F.explode(F.sequence(gy0, gy1)))
        .select("_id", "_wkt", "_xmin", "_ymin", "_xmax", "_ymax",
                "_gx", "_gy")
    )
    out_schema = StructType([
        StructField("id_a", cand.schema["_id"].dataType, True),
        StructField("id_b", cand.schema["_id"].dataType, True),
    ])

    def pair_group(key, pdf):
        if max_bucket is not None:
            pdf = pdf.iloc[:max_bucket]  # rows arrive sorted by _id
        n = len(pdf)
        empty = pd.DataFrame({"id_a": [], "id_b": []})
        if n < 2:
            return empty
        x0 = pdf["_xmin"].to_numpy()
        y0 = pdf["_ymin"].to_numpy()
        x1 = pdf["_xmax"].to_numpy()
        y1 = pdf["_ymax"].to_numpy()
        i, j = np.triu_indices(n, k=1)
        mask = (
            (x0[i] <= x1[j]) & (x0[j] <= x1[i])
            & (y0[i] <= y1[j]) & (y0[j] <= y1[i])
        )
        i, j = i[mask], j[mask]
        if len(i):
            # canonical-cell dedupe, vectorized over surviving pairs
            cgx, cgy = cellmod.cell_xy(
                np.maximum(x0[i], x0[j]), np.maximum(y0[i], y0[j]), res
            )
            keep = (cgx == int(key[0])) & (cgy == int(key[1]))
            i, j = i[keep], j[keep]
        if not len(i):
            return empty
        ids = pdf["_id"].to_numpy()
        wkts = pdf["_wkt"].to_numpy()
        parsed: dict = {}

        def parts(idx):
            got = parsed.get(idx)
            if got is None:
                try:
                    got = _probe_parts(wktmod.loads(wkts[idx]))
                except Exception:
                    got = ("bad", None)
                parsed[idx] = got
            return got

        out_a, out_b = [], []
        for ii, jj in zip(i.tolist(), j.tolist()):
            if ids[ii] == ids[jj]:
                # duplicate-id rows: the join strategy's strict
                # id_a < id_b filter drops self-pairs — mirror it
                continue
            ka, ra = parts(ii)
            kb, rb = parts(jj)
            if ka != "area" or kb != "area":
                continue
            if geodesic:
                from ..geo.geodesic import polygons_intersect_geodesic
                hit = polygons_intersect_geodesic(ra, rb)
            else:
                hit = kernels.polygons_intersect(ra, rb)
            if hit:
                out_a.append(ids[ii])
                out_b.append(ids[jj])
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return ordered_group_map(
        cand, ["_gx", "_gy"], pair_group, out_schema,
        sort_cols=["_id"],
    )


def _pairs_from_bboxes(
    with_bbox: DataFrame,
    res: int,
    geodesic: bool,
    max_bucket: int | None,
) -> DataFrame:
    """The pair join over a prepared (_id, _wkt, _xmin.._ymax) frame."""
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    from ..geo import kernels
    from ..geo import wkt as wktmod
    from .spatial_join import _probe_parts

    gx0, gy0 = grid_xy_cols(F.col("_xmin"), F.col("_ymin"), res)
    gx1, gy1 = grid_xy_cols(F.col("_xmax"), F.col("_ymax"), res)
    cand = (
        with_bbox
        .withColumn("_gx", F.explode(F.sequence(gx0, gx1)))
        .withColumn("_gy", F.explode(F.sequence(gy0, gy1)))
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_gx", "_gy").orderBy("_id")
        cand = (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket)
            .drop("_rn")
        )

    a = cand.select(
        F.col("_id").alias("id_a"), F.col("_wkt").alias("_wkt_a"),
        F.col("_xmin").alias("_ax0"), F.col("_ymin").alias("_ay0"),
        F.col("_xmax").alias("_ax1"), F.col("_ymax").alias("_ay1"),
        "_gx", "_gy",
    )
    b = cand.select(
        F.col("_id").alias("id_b"), F.col("_wkt").alias("_wkt_b"),
        F.col("_xmin").alias("_bx0"), F.col("_ymin").alias("_by0"),
        F.col("_xmax").alias("_bx1"), F.col("_ymax").alias("_by1"),
        "_gx", "_gy",
    )
    # canonical-cell dedupe: both bboxes cover the cell holding the SW
    # corner of their intersection, so emitting the pair only there
    # yields each colliding pair exactly once — no distinct shuffle.
    ix0 = F.greatest(F.col("_ax0"), F.col("_bx0"))
    iy0 = F.greatest(F.col("_ay0"), F.col("_by0"))
    cgx, cgy = grid_xy_cols(ix0, iy0, res)
    joined = (
        a.join(b, ["_gx", "_gy"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            (F.col("_ax0") <= F.col("_bx1"))
            & (F.col("_bx0") <= F.col("_ax1"))
            & (F.col("_ay0") <= F.col("_by1"))
            & (F.col("_by0") <= F.col("_ay1"))
        )
        .where((F.col("_gx") == cgx) & (F.col("_gy") == cgy))
        .select("id_a", "id_b", "_wkt_a", "_wkt_b")
    )

    out_schema = StructType([
        joined.schema["id_a"],
        joined.schema["id_b"],
    ])

    def verify_kernel(batches):
        for pdf in batches:
            keep = []
            for sa, sb in zip(pdf["_wkt_a"], pdf["_wkt_b"]):
                try:
                    ka, ra = _probe_parts(wktmod.loads(sa))
                    kb, rb = _probe_parts(wktmod.loads(sb))
                    if ka != "area" or kb != "area":
                        # dissolve is a polygon operator: non-areal
                        # rows never merge (they stay singletons)
                        keep.append(False)
                        continue
                    if geodesic:
                        from ..geo.geodesic import (
                            polygons_intersect_geodesic,
                        )
                        keep.append(
                            bool(polygons_intersect_geodesic(ra, rb))
                        )
                    else:
                        keep.append(
                            bool(kernels.polygons_intersect(ra, rb))
                        )
                except Exception:
                    keep.append(False)
            mask = pd.Series(keep, index=pdf.index)
            yield pdf.loc[mask, ["id_a", "id_b"]]

    return joined.mapInPandas(verify_kernel, out_schema)


def _prepared_bboxes(df: DataFrame, id_col: str, wkt_col: str,
                     geodesic: bool) -> DataFrame:
    """ONE parse pass, materialized (localCheckpoint — the
    near_duplicates_minhash precedent): the frame feeds both sides of
    the pair self-join, the valid-id set, and the group rollup, and the
    CC loop re-references its lineage every iteration."""
    src = df.select(F.col(id_col).alias("_id"),
                    F.col(wkt_col).alias("_wkt"))
    return attach_probe_bboxes(
        src, geodesic, include_raw=True
    ).localCheckpoint(eager=True)


def _members_from_bboxes(
    with_bbox: DataFrame,
    id_col: str,
    res: int,
    geodesic: bool,
    max_bucket: int | None,
    max_iters: int,
    strategy: str = "join",
) -> DataFrame:
    from .dedup import duplicate_clusters

    # materialize pairs: duplicate_clusters walks its input once per
    # CC round — an unmaterialized self-join would re-run every round
    pair_fn = (
        _pairs_grouped if strategy == "grouped" else _pairs_from_bboxes
    )
    pairs = pair_fn(
        with_bbox, res, geodesic, max_bucket
    ).localCheckpoint(eager=True)
    clustered = duplicate_clusters(pairs, max_iters=max_iters).select(
        F.col("id").alias(id_col), F.col("cluster_id").alias("group_id")
    )
    singles = (
        with_bbox.select(F.col("_id").alias(id_col))
        .join(clustered.select(id_col), id_col, "left_anti")
        .select(F.col(id_col), F.col(id_col).alias("group_id"))
    )
    return clustered.unionByName(singles)


def dissolve(
    df: DataFrame,
    id_col: str = "id",
    wkt_col: str = "wkt",
    res: int = DEFAULT_RES,
    edges: str = "planar",
    max_bucket: int | None = None,
    max_iters: int = 20,
    strategy: str = "join",
) -> DataFrame:
    """Overlap-connected component labels -> ``(id, group_id)`` with
    ``group_id`` = the minimum member id; polygons that touch nothing
    form singleton groups of themselves. Malformed geometries drop
    (the P8 null-guard semantics — they join no group). ``strategy``
    as in :func:`polygon_self_overlap_pairs`."""
    geodesic = edges == "geodesic"
    with_bbox = _prepared_bboxes(df, id_col, wkt_col, geodesic)
    return _members_from_bboxes(
        with_bbox, id_col, res, geodesic, max_bucket, max_iters,
        strategy,
    )


def dissolve_groups(
    df: DataFrame,
    id_col: str = "id",
    wkt_col: str = "wkt",
    res: int = DEFAULT_RES,
    edges: str = "planar",
    max_bucket: int | None = None,
    max_iters: int = 20,
    strategy: str = "join",
) -> DataFrame:
    """Dissolved-group rollup -> ``(group_id, n_members, xmin, ymin,
    xmax, ymax)`` — the merged VERTEX bbox of every member (planar
    extent; geodesic edge bulges pad only the internal cover, never
    the reported extent). The WKT parse runs ONCE: the same
    materialized frame feeds the pair join, the singleton set, and
    this rollup. ``strategy`` as in
    :func:`polygon_self_overlap_pairs`."""
    geodesic = edges == "geodesic"
    with_bbox = _prepared_bboxes(df, id_col, wkt_col, geodesic)
    members = _members_from_bboxes(
        with_bbox, id_col, res, geodesic, max_bucket, max_iters,
        strategy,
    )
    boxes = with_bbox.select(
        F.col("_id").alias(id_col),
        "_rxmin", "_rymin", "_rxmax", "_rymax",
    )
    return (
        members.join(boxes, id_col)
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("_rxmin").alias("xmin"),
            F.min("_rymin").alias("ymin"),
            F.max("_rxmax").alias("xmax"),
            F.max("_rymax").alias("ymax"),
        )
    )
