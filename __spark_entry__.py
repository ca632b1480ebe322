"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial join on sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ the corpus-curation operators); ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for every SQL-expressible query. Column names
and arithmetic are mirrored exactly so the driver's value-hash compare is
bit-level.

Doc points derive from the pinned sha256 formula
(pure_python_geospatial_export_spark/functions/points.py) applied to a
synthetic per-doc url ``doc://<doc_id>`` — identical string on both sides.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pure_python_geospatial_export_spark.functions import text as T
from pure_python_geospatial_export_spark.functions.geom_udfs import (
    cell_id_col,
    point_in_bbox_col,
    wkt_roundtrip,
)
from pure_python_geospatial_export_spark.functions.points import (
    lat_col,
    lon_col,
    point_sql,
)
from pure_python_geospatial_export_spark.geo import geohash as _geohash
from pure_python_geospatial_export_spark.geo import wkt as wktmod
from pure_python_geospatial_export_spark.operators import dedup, similarity
from pure_python_geospatial_export_spark.operators.knn import (
    knn_exact,
    knn_join,
    knn_join_complete,
)
from pure_python_geospatial_export_spark.operators.spatial_join import (
    spatial_join,
)
from pure_python_geospatial_export_spark.operators.tiles import tile_stats
from pure_python_geospatial_export_spark.sources.export import (
    Field,
    FieldType,
    GeometryFormat,
    _lines_df,
)

HERE = os.path.dirname(os.path.abspath(__file__))

# ---------------------------------------------------------------------------
# shared polygon layer: the two reference states + a 4x4 grid (some holed)
# ---------------------------------------------------------------------------

_URL_EXPR_SQL = "concat('doc://', CAST(doc_id AS VARCHAR))"
_LON_SQL, _LAT_SQL = point_sql(_URL_EXPR_SQL)

PTS_CTE = (
    "WITH pts AS (SELECT doc_id, %s AS lon, %s AS lat FROM documents)"
    % (_LON_SQL, _LAT_SQL)
)


def _rects():
    """(polygon_id, name, outer(x0,y0,x1,y1), hole|None) — single source of
    truth for both the Spark layer (as WKT) and the SQL oracle predicates."""
    rects = [
        (1, "Wyoming",
         (-111.020843268199, 41.0013336343981,
          -104.052453769699, 44.9981946924588), None),
        (2, "Colorado",
         (-109.042545474199, 36.9963964708165,
          -102.041551293899, 41.0034439410838), None),
    ]
    x0w, y0w, x1w, y1w = -130.0, 20.0, -60.0, 55.0
    nx = ny = 4
    w = (x1w - x0w) / nx
    h = (y1w - y0w) / ny
    pid = 1000
    for iy in range(ny):
        for ix in range(nx):
            ox0 = x0w + ix * w
            oy0 = y0w + iy * h
            outer = (ox0, oy0, ox0 + w, oy0 + h)
            hole = None
            if pid % 3 == 0:
                hole = (ox0 + w * 0.4, oy0 + h * 0.4,
                        ox0 + w * 0.6, oy0 + h * 0.6)
            rects.append((pid, "grid_%d_%d" % (ix, iy), outer, hole))
            pid += 1
    return rects


def _rect_ring(x0, y0, x1, y1):
    return [[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]]


def _layer_df(spark: SparkSession) -> DataFrame:
    rows = []
    for pid, name, outer, hole in _rects():
        rings = [_rect_ring(*outer)]
        if hole:
            rings.append(_rect_ring(*hole))
        rows.append(
            (pid, name, wktmod.dumps(dict(type="Polygon",
                                          coordinates=rings)))
        )
    from pure_python_geospatial_export_spark.session import local_df
    return local_df(spark, rows, ["polygon_id", "name", "wkt"])


def _rect_pred_sql(outer, hole) -> str:
    x0, y0, x1, y1 = outer
    pred = (
        "lon >= %r AND lon <= %r AND lat >= %r AND lat <= %r"
        % (x0, x1, y0, y1)
    )
    if hole:
        hx0, hy0, hx1, hy1 = hole
        pred += (
            " AND NOT (lon > %r AND lon < %r AND lat > %r AND lat < %r)"
            % (hx0, hx1, hy0, hy1)
        )
    return pred


def _docs_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    url = F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    return docs.withColumn("lon", lon_col(url)).withColumn(
        "lat", lat_col(url)
    )


def _tile_sql(res: int, lon="lon", lat="lat") -> str:
    n = 1 << res
    x = (
        "least(greatest(CAST(floor((%s + 180.0) / 360.0 * %d) AS BIGINT), "
        "0), %d)" % (lon, n, n - 1)
    )
    y = (
        "least(greatest(CAST(floor((%s + 90.0) / 180.0 * %d) AS BIGINT), "
        "0), %d)" % (lat, n, n - 1)
    )
    return "(%d + (%s) * %d + (%s))" % (res * (2**58), x, 2**29, y)


# ---------------------------------------------------------------------------
# golden WKT round-trip cases (reference-recorded 16-decimal strings)
# ---------------------------------------------------------------------------


def _golden_wkts():
    path = os.path.join(HERE, "tests", "fixtures", "golden_geometry.json")
    with open(path) as f:
        golden = json.load(f)
    return sorted(
        (name, e["wkt_16"]) for name, e in golden["dumps"].items()
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _docs_points(spark, sf_dir)
    return (
        spatial_join(pts, _layer_df(spark), res=7)
        .select("doc_id", "name")
    )


# Geodesic layer: great-circle-edge polygons (one strongly bulging
# triangle, one holed square). Single source of truth for the Spark
# layer (WKT) and the generated SQL oracle.
GEODESIC_LAYER = [
    (1, "bulge_north", [
        [[-60.0, 45.0], [60.0, 45.0], [0.0, 80.0], [-60.0, 45.0]],
    ]),
    (2, "holed_south", [
        [[-30.0, -40.0], [10.0, -40.0], [10.0, -10.0], [-30.0, -10.0],
         [-30.0, -40.0]],
        [[-20.0, -30.0], [-5.0, -30.0], [-5.0, -20.0], [-20.0, -20.0],
         [-20.0, -30.0]],
    ]),
]


def _geodesic_layer_df(spark: SparkSession) -> DataFrame:
    from pure_python_geospatial_export_spark.session import local_df
    rows = [
        (pid, name,
         wktmod.dumps(dict(type="Polygon", coordinates=rings)))
        for pid, name, rings in GEODESIC_LAYER
    ]
    return local_df(spark, rows, ["polygon_id", "name", "wkt"])


def _q_pip_join_geodesic(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _docs_points(spark, sf_dir)
    return (
        spatial_join(pts, _geodesic_layer_df(spark), res=6,
                     edges="geodesic")
        .select("doc_id", "name")
    )


def _geodesic_oracle_sql() -> str:
    """Generate the DuckDB twin of the geodesic join: per polygon, the
    gnomonic projection constants (center + tangent basis + projected
    ring vertices) are computed here in numpy and EMBEDDED as literals;
    the SQL projects each point and counts edge crossings (even-odd).
    Straight lines in the projected plane ARE the great-circle edges, so
    this is exact; engine/DuckDB trig may differ by ulps, which can only
    flip measure-zero boundary points (none in the derived-point
    fixture)."""
    from pure_python_geospatial_export_spark.geo import geodesic as geod

    parts = []
    for _pid, name, rings in GEODESIC_LAYER:
        # plain python floats: %r of a numpy scalar is not a SQL literal
        # under numpy >= 2.0 ("np.float64(...)")
        c = [float(v) for v in geod.gnomonic_center(rings)]
        e1, e2 = geod._tangent_basis(
            __import__("numpy").asarray(c, dtype="float64")
        )
        e1 = [float(v) for v in e1]
        e2 = [float(v) for v in e2]
        proj_rings = []
        for r in rings:
            arr = __import__("numpy").asarray(r, dtype="float64")[:, :2]
            rx, ry, front = geod.gnomonic_project(
                geod.unit_vectors(arr[:, 0], arr[:, 1]),
                __import__("numpy").asarray(c, dtype="float64"),
            )
            proj_rings.append(list(zip(rx.tolist(), ry.tolist())))

        terms = []
        for pr in proj_rings:
            for (x1, y1), (x2, y2) in zip(pr[:-1], pr[1:]):
                if y1 == y2:
                    continue  # horizontal edge: never crosses the ray
                terms.append(
                    "CASE WHEN ((%(y1)r <= py AND %(y2)r > py) OR "
                    "(%(y2)r <= py AND %(y1)r > py)) AND "
                    "px < %(x1)r + (py - %(y1)r) * %(dx)r / %(dy)r "
                    "THEN 1 ELSE 0 END"
                    % {"x1": x1, "y1": y1, "y2": y2,
                       "dx": x2 - x1, "dy": y2 - y1}
                )
        proj = (
            "SELECT doc_id, "
            "(vx*%(e1x)r + vy*%(e1y)r + vz*%(e1z)r) / d AS px, "
            "(vx*%(e2x)r + vy*%(e2y)r + vz*%(e2z)r) / d AS py, "
            "d > 1e-12 AS front FROM ("
            "SELECT doc_id, vx, vy, vz, "
            "vx*%(cx)r + vy*%(cy)r + vz*%(cz)r AS d FROM ("
            "SELECT doc_id, "
            "cos(radians(lat)) * cos(radians(lon)) AS vx, "
            "cos(radians(lat)) * sin(radians(lon)) AS vy, "
            "sin(radians(lat)) AS vz FROM pts))"
            % {"e1x": e1[0], "e1y": e1[1], "e1z": e1[2],
               "e2x": e2[0], "e2y": e2[1], "e2z": e2[2],
               "cx": c[0], "cy": c[1], "cz": c[2]}
        )
        parts.append(
            "SELECT doc_id, '%s' AS name FROM (%s) "
            "WHERE front AND ((%s) %% 2 = 1)"
            % (name, proj, " + ".join(terms))
        )
    return PTS_CTE + " " + " UNION ALL ".join(parts)


def _geojson_lines_sql() -> str:
    """DuckDB twin of the GeoJSON feature lines: both engines print
    doubles shortest-round-trip (python repr == DuckDB VARCHAR cast), so
    the feature string can be assembled with plain concatenation —
    verified byte-identical on the fixture."""
    return PTS_CTE + (
        ", langd AS (SELECT doc_id, lang FROM documents) "
        "SELECT '{\"type\": \"Feature\", \"geometry\": "
        "{\"type\": \"Point\", \"coordinates\": [' "
        "|| CAST(p.lon AS VARCHAR) || ', ' || CAST(p.lat AS VARCHAR) || "
        "']}, \"properties\": {\"doc_id\": ' || "
        "CAST(p.doc_id AS VARCHAR) || ', \"lang\": \"' || l.lang || "
        "'\"}}' AS line "
        "FROM pts p JOIN langd l USING (doc_id) WHERE p.doc_id < 100"
    )


def _q_pip_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same semantics and same oracle as pip_join — runs the hot-cell
    # SALTED SHUFFLE strategy instead of the broadcast cover, so the
    # driver gate proves the skew path end to end (threshold forced low
    # enough that salting actually engages on the fixture)
    pts = _docs_points(spark, sf_dir)
    return (
        spatial_join(pts, _layer_df(spark), res=7,
                     strategy="shuffle_salted", hot_cell_threshold=20)
        .select("doc_id", "name")
    )


def _q_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE pass over the points: the 18 bbox predicates become a broadcast
    # nested-loop join against an inline bbox dimension (18 rows), instead
    # of the former 18-branch union (18 scans of the same table). The
    # predicate is the same P3 bbox-contains column expression per pair.
    from pure_python_geospatial_export_spark.session import local_df

    pts = _docs_points(spark, sf_dir)
    boxes = local_df(
        spark,
        [(name, x0, y0, x1, y1)
         for _pid, name, (x0, y0, x1, y1), _hole in _rects()],
        ["name", "_x0", "_y0", "_x1", "_y1"],
    )
    hits = pts.join(
        F.broadcast(boxes),
        (F.col("lon") >= F.col("_x0")) & (F.col("lon") <= F.col("_x1"))
        & (F.col("lat") >= F.col("_y0")) & (F.col("lat") <= F.col("_y1")),
    )
    return hits.groupBy("name").agg(F.count(F.lit(1)).alias("n_docs"))


# Seam-crossing polygon (RFC 7946 short-way edges: 150E..150W band with a
# 170E..170W hole) — single source of truth for the Spark layer and the
# SQL oracle. Exercises the planar antimeridian lobe split end to end
# (cover seeding + kernel refine on both sides of +-180).
ANTIMERIDIAN_WKT = (
    "POLYGON ((150 20, 150 70, -150 70, -150 20, 150 20), "
    "(170 40, 170 55, -170 55, -170 40, 170 40))"
)


def _q_pip_join_antimeridian(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.session import local_df

    pts = _docs_points(spark, sf_dir)
    layer = local_df(spark, [(1, "seam_band", ANTIMERIDIAN_WKT)],
                     ["polygon_id", "name", "wkt"])
    return (
        spatial_join(pts, layer, res=6)
        .select("doc_id", "name")
    )


def _q_polygon_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # areal probes: a square of doc-dependent size around each doc
    # point, joined to the rectangle layer by the exact "intersects"
    # predicate. Rectangle-vs-rectangle(-with-hole) intersects is pure
    # interval arithmetic, so the oracle mirrors it in SQL: overlap the
    # outer box, minus probes STRICTLY inside a hole's open interior
    # (boundary contact counts as intersecting on both sides). Probe
    # coords round to 6 decimals before the WKT text so the parsed
    # doubles equal the oracle's round(x, 6).
    from pure_python_geospatial_export_spark.operators.spatial_join import (
        polygon_overlap_join,
    )

    pts = _docs_points(spark, sf_dir)
    half = F.lit(0.2) + (F.col("doc_id") % 4).cast("double") * F.lit(0.15)
    x0 = F.round(F.col("lon") - half, 6)
    x1 = F.round(F.col("lon") + half, 6)
    y0 = F.round(F.col("lat") - half, 6)
    y1 = F.round(F.col("lat") + half, 6)
    probe_wkt = F.format_string(
        "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, "
        "%.6f %.6f))",
        x0, y0, x1, y0, x1, y1, x0, y1, x0, y0,
    )
    probes = pts.select("doc_id", probe_wkt.alias("wkt"))
    return polygon_overlap_join(
        probes, _layer_df(spark), res=6, id_col="doc_id"
    ).select("doc_id", "name")


# Pole-encircling rings (planar polar-cap convention): a ring winding
# once around in longitude bounds the cap on the side of its mean
# latitude. The Antarctic ring winds eastward, the Arctic ring westward —
# both directions must behave identically under even-odd parity.
POLAR_CAP_WKTS = [
    (1, "antarctic", "POLYGON ((" + ", ".join(
        "%d -70" % x for x in list(range(0, 181, 30))
        + list(range(-150, 1, 30))
    ) + "))"),
    (2, "arctic", "POLYGON ((" + ", ".join(
        "%d 75" % x for x in list(range(0, -181, -30))
        + list(range(150, -1, -30))
    ) + "))"),
]


def _q_pip_join_polar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.session import local_df

    pts = _docs_points(spark, sf_dir)
    layer = local_df(spark, POLAR_CAP_WKTS,
                     ["polygon_id", "name", "wkt"])
    return (
        spatial_join(pts, layer, res=6)
        .select("doc_id", "name")
    )


def _q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _docs_points(spark, sf_dir)
    return pts.select(
        "doc_id",
        cell_id_col(F.col("lon"), F.col("lat"), 6).alias("tile_id"),
    )


def _q_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _docs_points(spark, sf_dir)
    return tile_stats(pts, 5).select(
        "tile_id", "n_points", "xmin", "ymin", "xmax", "ymax"
    )


def _q_mercator_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.tiles import (
        mercator_tile_cols,
        quadkey_col,
    )
    pts = _docs_points(spark, sf_dir)
    tx, ty = mercator_tile_cols(F.col("lon"), F.col("lat"), 6)
    return pts.select(
        "doc_id", tx.alias("tx"), ty.alias("ty")
    ).withColumn("quadkey", quadkey_col(F.col("tx"), F.col("ty"), 6))


def _q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.tiles import (
        tile_pyramid,
    )
    pts = _docs_points(spark, sf_dir)
    base = tile_stats(pts, 4)
    return tile_pyramid(base, 4, 2).select(
        "level", "tile_id", F.col("n_points").cast("long").alias(
            "n_points"),
        "xmin", "ymin", "xmax", "ymax",
    )


def _q_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _docs_points(spark, sf_dir)
    nbrs = pts.select(F.col("doc_id").alias("nbr_id"), "lon", "lat")
    return knn_join(pts, nbrs, "doc_id", "nbr_id", k=3, res=3, ring=1)


def _q_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _docs_points(spark, sf_dir)
    nbrs = pts.select(F.col("doc_id").alias("nbr_id"), "lon", "lat")
    return knn_exact(pts, nbrs, "doc_id", "nbr_id", k=2)


def _q_knn_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-completion grid kNN (operators/knn.knn_join_complete):
    certificate + ring doubling. res=2 is deliberately coarse so
    ring-1 certificates FAIL for many lefts and the expansion path is
    what the oracle verifies — the result must equal brute-force kNN
    bit for bit."""
    pts = _docs_points(spark, sf_dir)
    nbrs = pts.select(F.col("doc_id").alias("nbr_id"), "lon", "lat")
    return knn_join_complete(pts, nbrs, "doc_id", "nbr_id", k=3,
                             res=2, ring=1)


def _both_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    return docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(_both_docs(spark, sf_dir), "doc_id",
                                  "text")


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "doc_id", T.fingerprint(F.col("text")).alias("fp")
    )


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.stopword_ratio(F.col("text")).alias("stop_ratio"),
        T.punct_ratio(F.col("text")).alias("punct_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
    )


def _q_lang_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "doc_id", T.lang_id(F.col("text")).alias("lang_pred")
    )


def _q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    return similarity.cosine_topk(
        emb, queries, "vec_id", "embedding", "query_id", "qvec", k=5
    )


def _q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF-PQ end to end (build -> probe -> ADC shortlist -> int8-SQ
    # intermediate rerank -> exact rerank): with every inverted list
    # probed, rerank >= corpus size, AND sq_keep >= corpus size, the
    # served top-k is EXACTLY the brute-force cosine top-k BY
    # CONSTRUCTION — every approximate stage runs but keeps its whole
    # candidate set, so no ADC/int8 quantization error can evict a
    # true neighbor (the LSH recall-1 fixture pattern). A small
    # sq_keep would instead rest on the fixture's kth-vs-sq_keep-th
    # cosine gap exceeding the int8 error — empirical, and silently
    # breakable by a fixture regeneration. The selective-sq_keep
    # accuracy trade is pinned by scripts/ann_recall_bench.py and the
    # unit recall tests, not the bit oracle. Exercises the whole index
    # lifecycle including the sq.parquet relation.
    from pure_python_geospatial_export_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk_indexed,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    base = _scratch_dir("ivfpq", sf_dir)
    build_ivfpq_index(
        emb, "vec_id", "embedding", base, n_centroids=8,
        m_subspaces=8, lloyd_iters=2,
    )
    return ivfpq_topk_indexed(
        spark, base, queries, emb, "vec_id", "embedding",
        "query_id", "qvec", k=5, n_probe=8, rerank=10000,
        sq_keep=10000,
    )


def _q_events_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage (SURVEY §2.5): per-user running event
    count and cumulative value, plus previous event type (lag)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("int").alias("seq"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
        .over(w).alias("running_cents"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


def _q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column extraction: sum of props.k per event_type."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "doc_id",
        T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def _q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each 'error' event picks up the latest prior (or
    simultaneous) 'click' by the same user."""
    from pure_python_geospatial_export_spark.operators.asof import asof_join

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("long")
        .alias("click_cents"),
    )
    out = asof_join(errors, clicks, key="user_id",
                    right_cols=["click_id", "click_cents"])
    return out.select(
        "event_id", "user_id",
        F.col("asof_click_id").alias("prev_click_id"),
        F.col("asof_click_cents").alias("prev_click_cents"),
    )


def _q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.withColumn("window_start", F.date_trunc("hour", F.col("ts")))
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100.0 + 0.5).cast("long")
            ).alias("sum_cents"),
        )
    )


def _q_wkt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.session import local_df
    df = local_df(spark, _golden_wkts(), ["case_id", "wkt"])
    return df.select(
        "case_id", wkt_roundtrip(F.col("wkt")).alias("wkt_out")
    )


def _q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same planted-twin fixture as minhash_pairs (suffix-appended copies
    # are true near-dups); natural word-salad 3-gram overlap tops out
    # ~0.03, so threshold 0.5 isolates exactly the planted pairs
    from pure_python_geospatial_export_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    base = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).where(F.col("doc_id") < 120).select("doc_id", "text")
    planted = base.select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzz")).alias("text"),
    )
    return ngram_jaccard_pairs(
        base.unionAll(planted), "doc_id", "text", threshold=0.5
    )


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # near-dup fixture: every doc + a one-token-appended mutation
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzz")).alias("text"),
    )
    return dedup.near_duplicates_minhash(
        docs.unionByName(mutated), "doc_id", "text", threshold=0.5
    )


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzz")).alias("text"),
    )
    sim = dedup.simhash(docs.unionByName(mutated), "doc_id", "text")
    return dedup.simhash_near_pairs(sim, "doc_id", max_hamming=3)


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # near-dup fixture: every base vector + 150 perturbed copies
    # (component +0.01 -> cosine ~0.995-0.997 vs the base). The banded
    # LSH candidate stage has recall ~1-6e-11 per planted pair at this
    # cosine, so the output equals the exact threshold pair set and the
    # all-pairs DuckDB oracle can verify it bit-for-bit.
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    planted = emb.where(F.col("vec_id") < 150).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") + F.lit(0.01)
        ).alias("vec"),
    )
    return similarity.embedding_near_duplicates(
        base.unionByName(planted), "vec_id", "vec",
        threshold=0.99, n_bands=16, band_planes=8, dim=64,
    )


def _q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.tiles import (
        zonal_stats,
    )
    pts = _docs_points(spark, sf_dir).withColumn(
        "v", (F.col("doc_id") % 100).cast("long")
    )
    return zonal_stats(pts, _layer_df(spark), "v", res=7)


def _q_zonal_geotiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Real-raster zonal statistics (round-5): a deterministic world
    # raster (288x144, 1.25-degree pixels, v = (px*7 + py*13) % 1000)
    # is encoded as an actual GeoTIFF — tiled + deflate + horizontal
    # predictor, the full codec surface — written to scratch, read
    # back through the binaryFile Spark source, and joined to the
    # polygon layer. The oracle recomputes the closed form with
    # generate_series, so the whole encode -> decode -> pixel-center
    # georeference -> PIP join -> aggregate pipeline is bit-checked.
    # Pixel centers land on *.625/*.375 degree offsets; every rect
    # boundary sits on a different residue mod 1.25, so no center is
    # ON a boundary and ray-cast vs closed-rect semantics agree.
    import atexit
    import shutil
    import tempfile

    import numpy as np

    from pure_python_geospatial_export_spark.operators.tiles import (
        zonal_stats,
    )
    from pure_python_geospatial_export_spark.sources.geotiff import (
        encode_geotiff,
        read_geotiff,
    )

    w, h = 288, 144
    px = np.arange(w, dtype=np.int64)[None, :]
    py = np.arange(h, dtype=np.int64)[:, None]
    band = ((px * 7 + py * 13) % 1000).astype(np.int32)
    buf = encode_geotiff(
        band, (-180.0, -90.0, 180.0, 90.0),
        compression="deflate", tiled=True, tile_size=48, predictor=2,
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "ppge_geotiff-uid%d-pid%d" % (os.getuid(), os.getpid()),
    )
    os.makedirs(base, exist_ok=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    path = os.path.join(base, "world.tif")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf)
    os.replace(tmp, path)

    pixels = read_geotiff(spark, path).withColumn(
        "v", F.col("value").cast("long")
    )
    return zonal_stats(pixels, _layer_df(spark), "v", res=7)


def _q_top_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.sketch import (
        top_keys_per_group,
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pts = _docs_points(spark, sf_dir).select("doc_id", "lon", "lat")
    df = pts.join(docs.select("doc_id", "source"), "doc_id").withColumn(
        "cell_id", cell_id_col(F.col("lon"), F.col("lat"), 1)
    )
    return top_keys_per_group(df, ["cell_id"], "source", k=3).select(
        "cell_id", "source", "n", "rank"
    )


def _q_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.curate import (
        stratified_hash_sample,
    )
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "lang")
    return stratified_hash_sample(
        docs, "doc_id", "lang",
        {"en": 0.5, "de": 0.25}, default_fraction=0.1,
    )


# synthetic URL per document — ONE expression string valid in BOTH Spark
# SQL and DuckDB (concat/CASE/%), so the Spark query (via F.expr) and the
# oracle share it verbatim; exercises www-stripping, ccTLD second-level
# domains, ports, userinfo, path depth, extensions, and query strings
# Deterministic PII planting (the corpus itself is PII-free word salad):
# valid in BOTH Spark SQL and DuckDB — one string, two engines, so the
# synthesized column is identical on each side of the oracle compare.
_PII_SYNTH_SQL = (
    "concat(text, "
    "CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', "
    "CAST(doc_id AS STRING), '@example.org now') ELSE '' END, "
    "CASE WHEN doc_id % 4 = 0 THEN concat(' from 10.', "
    "CAST(doc_id % 200 AS STRING), '.0.', "
    "CAST(doc_id % 250 AS STRING), ' logged') ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN concat(' call 555-010', "
    "CAST(doc_id % 1000 AS STRING), ' today') ELSE '' END)"
)


def _q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.functions import pii as P

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    aug = docs.select("doc_id", F.expr(_PII_SYNTH_SQL).alias("text2"))
    t = F.col("text2")
    return aug.select(
        "doc_id",
        P.email_count(t).alias("n_emails"),
        P.phone_count(t).alias("n_phones"),
        P.ipv4_count(t).alias("n_ips"),
        P.pii_hit(t).alias("has_pii"),
        P.redact_pii(t).alias("redacted"),
    )


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.curate import (
        repetition_stats,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return repetition_stats(docs)


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.curate import (
        weighted_sample,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return weighted_sample(
        docs, "doc_id", "n_chars", k=5, group_cols=["source"]
    ).select("doc_id", "source", "n_chars")


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.curate import (
        tfidf_top_terms,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return tfidf_top_terms(docs, k=5)


def _q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.pack import (
        pack_sequences,
        packing_efficiency,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return packing_efficiency(pack_sequences(docs, 96), 96)


def _q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.events import (
        funnel_counts,
        funnel_stages,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return funnel_counts(
        funnel_stages(ev, ["view", "click", "purchase"])
    )


def _q_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # END-TO-END curation preset, fully oracled: plant a near-dup twin
    # (suffix — the proven recall-1 LSH fixture), an exact duplicate,
    # and sub-token-floor junk per base doc, then run the whole
    # cost-ordered pipeline (quality/lang filters -> exact dedup ->
    # MinHash near-dup). The oracle recomputes every stage in SQL; the
    # near-dup stage's LSH recall is deterministically 1 here (only the
    # planted twins sit above the threshold, jaccard ~0.96 vs a ~0.03
    # natural ceiling), so the exact all-pairs SQL is the twin.
    from pure_python_geospatial_export_spark.operators.curate import (
        curate_corpus,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).where(F.col("doc_id") < 150).select("doc_id", "text")
    near = docs.select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzz")).alias("text"),
    )
    exact = docs.select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"), "text"
    )
    junk = docs.select(
        (F.col("doc_id") + F.lit(300000)).alias("doc_id"),
        F.lit("x").alias("text"),
    )
    corpus = docs.unionAll(near).unionAll(exact).unionAll(junk)
    out = curate_corpus(
        corpus,
        min_quality=0.3,
        keep_langs=["en"],
        near_dup_threshold=0.5,
        min_tokens=5,
    )
    return out.select("doc_id")


def _q_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.pack import (
        pack_sequences,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return pack_sequences(docs, 96).select(
        "source", "doc_id", "n_tokens", "pack_id", "pack_offset",
        "overflow",
    )


_URL_SYNTH_SQL = (
    "concat('https://', "
    "CASE WHEN doc_id % 3 = 0 THEN 'user@www.' ELSE '' END, "
    "source, "
    "CASE WHEN doc_id % 4 = 0 THEN '.co.uk' "
    "WHEN doc_id % 4 = 1 THEN '.com:8080' "
    "WHEN doc_id % 4 = 2 THEN '.org' ELSE '.io' END, "
    "CASE WHEN doc_id % 5 = 0 THEN '' "
    "WHEN doc_id % 5 = 1 THEN '/a' "
    "WHEN doc_id % 5 = 2 THEN '/a/b/c' "
    "WHEN doc_id % 5 = 3 THEN '/img/photo.JPG?w=1' "
    "ELSE '/docs/paper.pdf' END)"
)


def _q_url_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.functions import urls as U

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    with_url = docs.select(
        "doc_id", F.expr(_URL_SYNTH_SQL).alias("url")
    )
    host = U.url_host(F.col("url"))
    return with_url.select(
        "doc_id",
        host.alias("host"),
        U.registered_domain(host).alias("domain"),
        U.url_path_depth(F.col("url")).alias("depth"),
        U.url_extension(F.col("url")).alias("ext"),
        U.url_is_media(F.col("url")).alias("is_media"),
    )


def _q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-domain quota sampling (curate.quota_sample):
    at most 20 docs per source, picked by the md5-hash order — a pure
    function of (source, doc_id), so the DuckDB twin selects the
    identical rows."""
    from pure_python_geospatial_export_spark.operators.curate import (
        quota_sample,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return quota_sample(docs, "source", "doc_id", quota=20).select(
        "doc_id", "source"
    )


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-overlap scan (curate.ngram_contamination, n=8 token
    shingles): benchmark = every 10th doc, scanned corpus = all docs.
    The 'benchmark' docs flag themselves at contamination 1.0; any
    organic 8-gram overlap flags other docs too — the oracle recomputes
    the full overlap exactly."""
    from pure_python_geospatial_export_spark.operators.curate import (
        ngram_contamination,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bench = docs.where(F.col("doc_id") % 10 == 0)
    return ngram_contamination(docs, bench, "doc_id", "text", "text",
                               n=8)


def _q_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact within-300km haversine pairs among the derived doc points
    (operators/knn.radius_join, latitude-adaptive candidate fan-out).
    The oracle recomputes every pair with the identical clamped
    haversine arithmetic — sin/cos/asin agree bitwise between the JVM
    and DuckDB's libm on this fixture (hash-checked)."""
    from pure_python_geospatial_export_spark.operators.knn import (
        radius_join,
    )

    pts = _docs_points(spark, sf_dir).select("doc_id", "lon", "lat")
    pairs = radius_join(
        pts.select(F.col("doc_id").alias("id_a"), "lon", "lat"),
        pts.select(F.col("doc_id").alias("id_b"), "lon", "lat"),
        "id_a", "id_b", radius_km=300.0, res=6,
    )
    # distances rounded to 6 decimals (~1mm): JVM and DuckDB libm trig
    # drift by 1 ulp on a couple of fixture pairs — the PAIR SET is
    # bit-stable, the 15th decimal of the distance is not
    return pairs.where(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", F.round("dist_km", 6).alias("dist_km")
    )


def _q_hh_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable SpaceSaving heavy hitters (operators/sketch.py): top-5
    sources per language. Fixture has ~20 distinct sources per lang,
    far below m=64, so EVERY per-partition summary is exact (no
    eviction: err = 0, pmin = 0) and the merged output equals the exact
    top-k bit-for-bit with lo = est = hi — deterministically oracled
    regardless of partitioning, the same fixture-pins-the-sketch trick
    as the LSH queries."""
    from pure_python_geospatial_export_spark.operators.sketch import (
        heavy_hitters_sketch,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return heavy_hitters_sketch(docs, ["lang"], "source", k=5, m=64)


def _q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.streaming.sessions import (
        sessionize_batch,
    )
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    s = sessionize_batch(ev, gap_seconds=1800)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def _q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    cents = "CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("percentile(%s, 0.5)" % cents).alias("p50_cents"),
        F.expr("percentile(%s, 0.9)" % cents).alias("p90_cents"),
    )


def _q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixture chosen so the sketch is EXACT (k = 4096 >= every group's
    # row count at the gate SF — same trick as the LSH recall-1
    # oracles), so the bounded-state path equals the full type-1
    # quantile the DuckDB twin computes; the ~1/sqrt(k) sampling regime
    # is property-tested in tests/test_sketch.py instead.
    from pure_python_geospatial_export_spark.operators.sketch import (
        quantile_estimate,
        quantile_sample,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    sample = quantile_sample(
        ev, ["event_type"], "value", "event_id", k=4096
    )
    return quantile_estimate(
        sample, ["event_type"], [0.1, 0.5, 0.9, 0.99]
    )


def _q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.events import (
        funnel_stages,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return funnel_stages(ev, ["view", "click", "purchase"])


def _q_events_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.events import (
        cohort_retention,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return cohort_retention(ev, period="week")


def _scratch_dir(kind: str, sf_dir: str) -> str:
    """uid + pid + sf-scoped /tmp scratch for queries that must write
    an on-disk artifact before serving (mirrors session.py's warehouse
    fix): a fixed world-shared /tmp name collides across users
    (permission errors) and across concurrent runs of the same sf_dir
    (mixed results). pid scoping means each process leaks a scratch
    copy unless cleaned: register atexit removal (the query's
    DataFrame must be consumed before interpreter exit anyway) and
    purge siblings of THIS uid whose owning process is gone."""
    import atexit
    import hashlib
    import re as _re
    import shutil
    import tempfile

    tmp_root = tempfile.gettempdir()
    mine = _re.compile(
        r"^ppge_%s-uid%d-pid(\d+)_" % (_re.escape(kind), os.getuid())
    )
    for name in os.listdir(tmp_root):
        m = mine.match(name)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(tmp_root, name),
                          ignore_errors=True)
        except PermissionError:
            pass  # pid reused by another user: leave it alone
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    base = os.path.join(
        tmp_root,
        "ppge_%s-uid%d-pid%d_%s" % (kind, os.getuid(), os.getpid(),
                                    tag),
    )
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


def _q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hypertable continuous aggregate: build the day-chunked layout +
    # precomputed rollup in a scratch dir, then serve precomputed-days
    # UNION fresh-tail — the result must equal a flat recompute over the
    # raw events (the DuckDB oracle), proving the chunk/tail seam.
    from pure_python_geospatial_export_spark.sources.timeseries import (
        serve_rollup,
        write_events_table,
        write_rollup,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    base = _scratch_dir("tsroll", sf_dir)
    write_events_table(ev, os.path.join(base, "events"))
    write_rollup(
        spark, os.path.join(base, "events"), os.path.join(base, "rollup")
    )
    return serve_rollup(
        spark,
        os.path.join(base, "events"),
        os.path.join(base, "rollup"),
        "2024-01-21",
    )


def _q_gpkg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full GeoPackage CONTAINER lifecycle: derive document points ->
    # vectorized POINT WKB -> write a REAL .gpkg (SQLite file with
    # spec metadata tables, GP blob wrapping JVM-side) -> distributed
    # rowid-range read back -> strip GP headers -> decode coordinate
    # doubles. The lon/lat bits ride through IEEE-754 bytes unchanged
    # end to end, so the output equals the pts derivation EXACTLY —
    # the oracle recomputes it straight from the documents table.
    from pure_python_geospatial_export_spark.functions.geom_udfs import (
        lonlat_to_wkb_point,
        wkb_point_lat,
        wkb_point_lon,
    )
    from pure_python_geospatial_export_spark.sources.gpkg import (
        read_gpkg,
        write_gpkg,
    )

    pts = _docs_points(spark, sf_dir).select("doc_id", "lon", "lat")
    wkb = pts.select(
        "doc_id",
        lonlat_to_wkb_point("lon", "lat").alias("geom"),
    )
    base = _scratch_dir("gpkg", sf_dir)
    os.makedirs(base, exist_ok=True)  # sqlite won't mkdir, Spark would
    path = os.path.join(base, "docs.gpkg")
    write_gpkg(wkb, path, "docs", geometry_type="POINT")
    back = read_gpkg(spark, path, num_partitions=4)
    return back.select(
        F.col("doc_id"),
        wkb_point_lon("geom").alias("lon"),
        wkb_point_lat("geom").alias("lat"),
    )


def _q_dissolve_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    # polygon dissolve: doc-derived rectangles merged into
    # overlap-connected groups (exact self-overlap pairs -> label
    # propagation CC -> group rollup). Rect-vs-rect intersect is pure
    # interval arithmetic so the oracle mirrors the pair graph in SQL
    # and computes the same components with a recursive closure CTE;
    # coords round to 6 decimals before the WKT text so the parsed
    # doubles equal the oracle's round(x, 6) (the polygon_overlap
    # recipe).
    from pure_python_geospatial_export_spark.operators.dissolve import (
        dissolve_groups,
    )

    # 21 is coprime to 4 so the surviving doc_ids exercise all four
    # rect sizes (a % 20 filter would pin doc_id % 4 == 0)
    pts = _docs_points(spark, sf_dir).where(F.col("doc_id") % 21 == 0)
    half = F.lit(0.5) + (F.col("doc_id") % 4).cast("double") * F.lit(0.3)
    x0 = F.round(F.col("lon") - half, 6)
    x1 = F.round(F.col("lon") + half, 6)
    y0 = F.round(F.col("lat") - half, 6)
    y1 = F.round(F.col("lat") + half, 6)
    probe_wkt = F.format_string(
        "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, "
        "%.6f %.6f))",
        x0, y0, x1, y0, x1, y1, x0, y1, x0, y0,
    )
    probes = pts.select(F.col("doc_id").alias("id"),
                        probe_wkt.alias("wkt"))
    return dissolve_groups(probes, res=6).select(
        "group_id", "n_members", "xmin", "ymin", "xmax", "ymax"
    )


def _q_dissolve_rects_grouped(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    # the single-exchange grouped pair strategy against the SAME
    # recursive-closure oracle — bit-level proof the group-walk
    # variant computes identical components
    from pure_python_geospatial_export_spark.operators.dissolve import (
        dissolve_groups,
    )

    pts = _docs_points(spark, sf_dir).where(F.col("doc_id") % 21 == 0)
    half = F.lit(0.5) + (F.col("doc_id") % 4).cast("double") * F.lit(0.3)
    x0 = F.round(F.col("lon") - half, 6)
    x1 = F.round(F.col("lon") + half, 6)
    y0 = F.round(F.col("lat") - half, 6)
    y1 = F.round(F.col("lat") + half, 6)
    probe_wkt = F.format_string(
        "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, "
        "%.6f %.6f))",
        x0, y0, x1, y0, x1, y1, x0, y1, x0, y0,
    )
    probes = pts.select(F.col("doc_id").alias("id"),
                        probe_wkt.alias("wkt"))
    return dissolve_groups(probes, res=6, strategy="grouped").select(
        "group_id", "n_members", "xmin", "ymin", "xmax", "ymax"
    )


def _q_geom_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # validity QA gate: five geometry classes built per doc_id residue
    # (valid rect / bowtie / open ring / repeated vertex / degenerate
    # triangle), classified geometrically by validate_geometries. The
    # oracle knows each row's truth BY CONSTRUCTION (the residue), so
    # the rollup proves the classifier end to end.
    from pure_python_geospatial_export_spark.operators.validate import (
        validate_geometries,
    )

    pts = _docs_points(spark, sf_dir)
    x0, y0 = F.col("lon"), F.col("lat")
    x1, y1 = F.col("lon") + F.lit(0.5), F.col("lat") + F.lit(0.5)
    cls = F.col("doc_id") % 5
    wkt = (
        F.when(cls == 1, F.format_string(
            "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, "
            "%.6f %.6f))",
            x0, y0, x1, y0, x0, y1, x1, y1, x0, y0))  # bowtie
        .when(cls == 2, F.format_string(
            "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f))",
            x0, y0, x1, y0, x1, y1, x0, y1))          # open ring
        .when(cls == 3, F.format_string(
            "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, "
            "%.6f %.6f, %.6f %.6f))",
            x0, y0, x1, y0, x1, y0, x1, y1, x0, y1, x0, y0))  # repeat
        .when(cls == 4, F.format_string(
            "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f))",
            x0, y0, x1, y1, x0, y0))                  # 3 points
        .otherwise(F.format_string(
            "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, "
            "%.6f %.6f))",
            x0, y0, x1, y0, x1, y1, x0, y1, x0, y0))  # valid rect
    )
    probes = pts.select("doc_id", wkt.alias("wkt"))
    return (
        validate_geometries(probes)
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.max(F.col("is_valid").cast("int")).alias("any_valid"),
        )
    )


def _q_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    # geohash cell rollup: derived document points bucketed by a coarse
    # precision-2 geohash (pure column arithmetic, JVM-side), with the
    # lexicographic min/max of each cell's full-precision (9-char)
    # geohash — exercising both ends of the codec. Geohash strings are
    # exact integer interleave + base32 after one IEEE quantization per
    # axis, so both engines produce identical strings.
    from pure_python_geospatial_export_spark.geo.geohash import (
        geohash_col,
    )

    pts = _docs_points(spark, sf_dir)
    return (
        pts.select(
            geohash_col(F.col("lon"), F.col("lat"), 2).alias("gh2"),
            geohash_col(F.col("lon"), F.col("lat"), 9).alias("gh9"),
        )
        .groupBy("gh2")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("gh9").alias("gh9_min"),
            F.max("gh9").alias("gh9_max"),
        )
    )


def _q_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hypertable continuous aggregate for the NON-additive aggregate:
    # per-(day, event_type) HLL register relations precomputed into
    # day chunks, served as precomputed-before-cutoff UNION
    # tail-recompute, merged across days by register max. The oracle
    # computes registers FLAT from raw events — equality proves the
    # chunk/tail seam loses nothing (register max is lossless), the
    # distinct-rollup twin of time_rollup's additive-seam proof. The
    # corrected estimate is bit-oracled via the precomputed
    # linear-counting table (see hll_cells / hll_estimate).
    from pure_python_geospatial_export_spark.sources.timeseries import (
        serve_distinct_rollup,
        write_distinct_rollup,
        write_events_table,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    base = _scratch_dir("hllroll", sf_dir)
    write_events_table(ev, os.path.join(base, "events"))
    write_distinct_rollup(
        spark, os.path.join(base, "events"),
        os.path.join(base, "droll"), p=10,
    )
    return serve_distinct_rollup(
        spark,
        os.path.join(base, "events"),
        os.path.join(base, "droll"),
        "2024-01-21",
        p=10,
    )


def _q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed-width integer bins: pure arithmetic (no ln/boundary-ulp
    # risk), min/max are order-independent — fully deterministic
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.withColumn(
            "bin", F.floor(F.col("value") / F.lit(25.0)).cast("int")
        )
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )


def _q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.withColumn("hr", F.hour("ts"))
        .rollup("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def _q_kmv_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct-url estimates per coarse cell via MERGED fine-cell
    # sketches — equality with the oracle (which computes each coarse
    # cell directly from raw rows) proves the merge property
    from pure_python_geospatial_export_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )
    pts = _docs_points(spark, sf_dir).withColumn(
        "url", F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    )
    fine = pts.withColumn(
        "cell_id", cell_id_col(F.col("lon"), F.col("lat"), 1)
    ).withColumn(
        "cell_fine", cell_id_col(F.col("lon"), F.col("lat"), 3)
    )
    sk = kmv_sketch(fine, ["cell_id", "cell_fine"], "url", k=16)
    merged = kmv_merge(sk, ["cell_id"], k=16)
    return merged.select(
        "cell_id", kmv_estimate("sketch", 16).alias("est_distinct")
    )


def _q_hll_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyperLogLog distinct-url state per coarse cell via MERGED
    # fine-cell register relations — equality with the oracle (which
    # computes each coarse cell's registers directly from raw rows)
    # proves the register-wise-max merge is lossless. Output pins the
    # full integer sketch state (zeros + scaled harmonic sum — exact
    # BIGINTs, order-free) plus the CORRECTED estimate: the raw branch
    # is one double division of exact operands, and the linear-counting
    # branch reads a Python-precomputed m*ln(m/zeros) lookup table
    # embedded as literals on BOTH engine sides — in-engine ln is
    # measurably 1-ulp divergent (JVM vs DuckDB libm), table literals
    # are data.
    from pure_python_geospatial_export_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )
    pts = _docs_points(spark, sf_dir).withColumn(
        "url", F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    )
    fine = pts.withColumn(
        "cell_id", cell_id_col(F.col("lon"), F.col("lat"), 1)
    ).withColumn(
        "cell_fine", cell_id_col(F.col("lon"), F.col("lat"), 3)
    )
    sk = hll_sketch(fine, ["cell_id", "cell_fine"], "url", p=8)
    merged = hll_merge(sk, ["cell_id"])
    return hll_estimate(merged, ["cell_id"], p=8)


def _q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # KMV set-operation estimates (the capability HLL lacks): per-source
    # vocabulary sketches, then union / Jaccard / intersection estimates
    # for every source pair from the SKETCHES alone — the oracle
    # recomputes the same estimator from raw rows, pinning the whole
    # pipeline (tokenize -> hash -> per-source bottom-k -> pairwise
    # union-sample arithmetic) bit-for-bit. 20 sources -> 190 pairs;
    # the pair join is broadcast-sized by construction (one row per
    # source).
    from pure_python_geospatial_export_spark.functions.text import (
        tokens_col,
    )
    from pure_python_geospatial_export_spark.operators.sketch import (
        kmv_overlap_cols,
        kmv_sketch,
    )
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    toks = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    sk = kmv_sketch(toks, ["source"], "tok", k=32)
    a = sk.select(F.col("source").alias("source_a"),
                  F.col("sketch").alias("_sa"))
    b = sk.select(F.col("source").alias("source_b"),
                  F.col("sketch").alias("_sb"))
    pairs = a.join(F.broadcast(b),
                   F.col("source_a") < F.col("source_b"))
    est_u, jac, est_i = kmv_overlap_cols("_sa", "_sb", k=32)
    return pairs.select(
        "source_a", "source_b",
        est_u.alias("est_union"),
        jac.alias("jaccard"),
        est_i.alias("est_intersection"),
    )


def _q_events_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pure_python_geospatial_export_spark.operators.asof import (
        range_join,
    )
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("end_ts"),
    )
    j = range_join(errors, clicks, key="user_id", left_ts="ts",
                   bucket_seconds=900)
    return j.groupBy("click_id").agg(
        F.count(F.lit(1)).alias("n_errors")
    )


def _q_geojson_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # doc_id < 100 (not .limit) so the row set is order-independent and
    # the DuckDB twin selects the identical rows
    pts = _docs_points(spark, sf_dir).where(F.col("doc_id") < 100)
    src = pts.select(
        "doc_id",
        F.concat(
            F.lit("POINT ("), F.col("lon").cast("string"), F.lit(" "),
            F.col("lat").cast("string"), F.lit(")"),
        ).alias("geom"),
        "lang",
    )
    schema = [
        Field("geom", FieldType.GEOM),
        Field("doc_id", FieldType.INT),
        Field("lang", FieldType.STR),
    ]
    return _lines_df(src, schema, "geom", GeometryFormat.WKT, "geojson",
                     None)


def _q_tile_mvt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mapbox Vector Tile encode -> independent wire decode, per res-5
    # tile: the output columns are computed FROM THE DECODED BYTES, so
    # the DuckDB twin (closed-form quantization arithmetic) bit-checks
    # the whole varint/zigzag/command pipeline, not just the counts.
    # res 5: cell w=11.25, h=5.625 are exact binary fractions, so the
    # quantizer's scale constants (4096/11.25, 4096/5.625) are the same
    # IEEE doubles on both engines (mirrored in the oracle SQL).
    import pandas as pd

    from pure_python_geospatial_export_spark.geo import mvt
    from pure_python_geospatial_export_spark.operators.tiles import (
        encode_mvt_points,
    )
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    pts = _docs_points(spark, sf_dir).select("doc_id", "lon", "lat")
    enc = encode_mvt_points(pts, res=5, id_col="doc_id")

    out_schema = StructType([
        StructField("tile_id", LongType(), False),
        StructField("n_features", IntegerType(), False),
        StructField("sum_px", LongType(), False),
        StructField("sum_py", LongType(), False),
        StructField("sum_ids", LongType(), False),
    ])

    def _decode(batches):
        for pdf in batches:
            rows = []
            for tile_id, buf in zip(pdf["tile_id"], pdf["mvt"]):
                tile = mvt.decode_tile(bytes(buf))
                (layer,) = tile["layers"]
                su = sv = sid = 0
                for f in layer["features"]:
                    ((u, v),) = f["parts"][0]
                    su += u
                    sv += v
                    sid += f["id"]
                rows.append((int(tile_id), len(layer["features"]),
                             su, sv, sid))
            yield pd.DataFrame(
                rows,
                columns=["tile_id", "n_features", "sum_px", "sum_py",
                         "sum_ids"],
            )

    return enc.mapInPandas(_decode, out_schema)


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet-style boilerplate-line removal. Multi-line docs are built
    # deterministically from the documents table (footer on even ids,
    # a unique tail per id) with the SAME concat mirrored in the
    # oracle; output is the reassembled clean text + line stats, so
    # explode/census/anti-join/reassembly are all bit-checked.
    from pure_python_geospatial_export_spark.operators.curate import (
        remove_boilerplate_lines,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .where(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit("\n"),
                F.when(F.col("doc_id") % 2 == 0,
                       F.lit("standard footer boilerplate"))
                .otherwise(
                    F.concat(F.lit("tail-"),
                             F.col("doc_id").cast("string"))
                ),
            ).alias("text"),
        )
    )
    return remove_boilerplate_lines(docs, min_docs=3)


def _q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Lee-et-al-style exact duplicate-SPAN removal (round 5): docs get
    # a deterministically planted shared passage (every third doc) and
    # a unique tail; any 8-token window shared by >= 3 docs is cut from
    # every doc. The oracle recomputes the gram census (same md5 keys),
    # coverage, and reassembly in SQL, so explode/census/semi/anti/
    # rebuild are all bit-checked.
    from pure_python_geospatial_export_spark.operators.curate import (
        remove_duplicate_spans,
    )

    passage = ("all rights reserved this document is provided as is "
               "without warranty of any kind either express or implied")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .where(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.when(F.col("doc_id") % 3 == 0, F.lit(passage))
                .otherwise(
                    F.concat(F.lit("tail marker "),
                             F.col("doc_id").cast("string"))
                ),
            ).alias("text"),
        )
    )
    return remove_duplicate_spans(docs, ngram=8, min_docs=3)


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed-budget document chunking with overlap: pure column math
    # (tokenize + slice), mirrored token-for-token in the oracle
    from pure_python_geospatial_export_spark.operators.pack import (
        chunk_documents,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .where(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    return chunk_documents(docs, chunk_tokens=40, overlap=8)


def _q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # data-mixing sampler: per-language quotas from target fractions,
    # hash-rank selection (the quota_sample family invariance)
    from pure_python_geospatial_export_spark.operators.curate import (
        mixture_sample,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "lang")
    return mixture_sample(
        docs, "lang", "doc_id",
        {"en": 0.5, "de": 0.2}, total=200, default_frac=0.1,
    )


def _q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet-style char-trigram LM quality scoring: train on docs with
    # id >= 300, score docs with id < 200. Costs are integer
    # milli-nats (round(-ln(p)*1e6) per DISTINCT gram x integer
    # occurrence count) so the BIGINT sums compare bit-level — a float
    # log-prob sum would be addition-order sensitive.
    from pure_python_geospatial_export_spark.operators.curate import (
        char_lm_counts,
        perplexity_score,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    model = char_lm_counts(docs.where(F.col("doc_id") >= 300))
    return perplexity_score(
        docs.where(F.col("doc_id") < 200), model
    )


def _q_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Perceptual image near-dup, end to end: a 63-bit target hash h is
    # derived from doc_id in COLUMN MATH (Fibonacci-mix of doc_id//4,
    # xor a <=1-bit noise per doc — so each 4-doc family is a planted
    # near-dup cluster); a kernel renders h as a 16x16 BMP of 2x2
    # black/white blocks; the REAL pipeline (BMP decode -> ahash ->
    # banded Hamming join) must recover exactly h per doc (ahash of a
    # 0/255 block image is its own bit pattern, and the 16->8 nearest
    # resize picks block corners) — the DuckDB twin recomputes h
    # closed-form and all-pairs-filters, so pair set, distances, AND
    # raw hash values are bit-checked through encode/decode/banding.
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from pure_python_geospatial_export_spark.operators import (
        imaging,
        multimodal,
    )
    from pure_python_geospatial_export_spark.operators.dedup import (
        hamming_near_pairs,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id").where(F.col("doc_id") < 400)
    )
    # (doc_id//4) * odd ~2^56 constant: with doc_id < 400 the group id
    # g <= 99, so g * K < 2^63 and BOTH engines compute the exact
    # product — no wrap semantics needed (Spark 4 runs ANSI mode, so a
    # wrapping multiply would throw)
    k_mix = 81205437596873861
    m = F.col("doc_id") % 4
    base = F.expr("doc_id DIV 4") * F.lit(k_mix)
    noise = F.when(m == 3, F.lit(4)).otherwise(m).cast("long")
    src = docs.select("doc_id", base.bitwiseXOR(noise).alias("h"))

    pay_schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
    ])
    pos = np.arange(64, dtype=np.uint64)

    def _render(batches):
        for pdf in batches:
            payloads = []
            for hval in pdf["h"]:
                bits = (np.uint64(hval) >> pos) & np.uint64(1)
                px8 = (bits.reshape(8, 8) * 255).astype(np.uint8)
                px16 = px8.repeat(2, axis=0).repeat(2, axis=1)
                px = np.stack([px16] * 3, axis=2)
                payloads.append(imaging.encode_bmp(px))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": payloads,
            })

    ph = multimodal.perceptual_hash(
        src.mapInPandas(_render, pay_schema),
        payload_col="payload", id_col="doc_id", algo="ahash",
    )  # note: output id column is named media_id
    pairs = hamming_near_pairs(
        ph, "media_id", hash_col="phash", max_hamming=3
    )
    return pairs.join(
        ph.select(F.col("media_id").alias("id_a"),
                  F.col("phash").alias("ph_a")),
        "id_a",
    ).select("id_a", "id_b", "hamming", "ph_a")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial join + tile assignment on sf0.001 documents."""
    sf_dir = "/root/testdata/sf0.001"
    pts = _docs_points(spark, sf_dir)
    joined = spatial_join(pts, _layer_df(spark), res=7)
    return joined.select(
        "doc_id",
        "name",
        cell_id_col(F.col("lon"), F.col("lat"), 6).alias("cell_id"),
    )


# Queries whose driver output is derivable from (or equal to) another
# registered query's, folded out of the driver-facing registry to stay
# under the driver's observed ~50-row artifact ceiling (VERDICT r3 #1).
# They remain first-class: extra_queries()/extra_oracle_sql() feed the
# local bit-level parity gate in tests/test_oracle_parity.py.
#   pip_join_salted   == pip_join output (salted-vs-broadcast equality)
#   knn_exact         == brute-force verify twin of knn_grid
#   funnel_counts     ⊂ events_funnel
#   pack_efficiency   ⊂ pack_docs
#   doc_sample        ⊂ weighted_sample/domain_quota (hash-threshold family)
#   top_sources       == exact twin of hh_sketch's top-k question
#   value_histogram   ⊂ events-family fixed-bin aggregations
# plus OVER-CEILING entries: genuinely new operators added after the
# driver registry reached the 50-row ceiling — same local bit-level
# gate, just not competing for driver artifact rows:
#   line_dedup        (round-4 boilerplate-line removal)
#   lm_perplexity     (round-4 char-trigram LM quality scoring)
#   doc_chunks        (round-4 fixed-budget chunking with overlap)
#   mixture_sample    (round-4 data-mixing sampler)
#   zonal_geotiff     (round-5 real-raster GeoTIFF ingest)
_FOLDED_QUERIES = (
    "pip_join_salted",
    "knn_exact",
    "knn_complete",
    "funnel_counts",
    "pack_efficiency",
    "doc_sample",
    "top_sources",
    "value_histogram",
    "line_dedup",
    "lm_perplexity",
    "doc_chunks",
    "mixture_sample",
    "zonal_geotiff",
    "span_dedup",
    "ann_ivfpq",
    "hll_cells",
    "kmv_overlap",
    "distinct_rollup",
    "gpkg_roundtrip",
    "geohash_cells",
    "dissolve_rects",
    "dissolve_rects_grouped",
    "geom_validate",
)


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Never-/least-recently-driver-verified entries lead the dict so a
    # row cap or timeout in the driver's checker can't starve them again.
    return {
        "jaccard_pairs": _q_jaccard_pairs,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "embedding_near_dup": _q_embedding_near_dup,
        "geojson_lines": _q_geojson_lines,
        "tile_mvt": _q_tile_mvt,
        "image_phash": _q_image_phash,
        "pip_join": _q_pip_join,
        "pip_join_geodesic": _q_pip_join_geodesic,
        "pip_join_salted": _q_pip_join_salted,
        "pip_join_antimeridian": _q_pip_join_antimeridian,
        "pip_join_polar": _q_pip_join_polar,
        "polygon_overlap": _q_polygon_overlap,
        "bbox_filter": _q_bbox_filter,
        "tile_assign": _q_tile_assign,
        "zonal_stats": _q_zonal_stats,
        "tile_stats": _q_tile_stats,
        "tile_pyramid": _q_tile_pyramid,
        "mercator_tiles": _q_mercator_tiles,
        "knn_grid": _q_knn_grid,
        "knn_exact": _q_knn_exact,
        "knn_complete": _q_knn_complete,
        "dedup_exact": _q_dedup_exact,
        "fingerprint": _q_fingerprint,
        "text_quality": _q_text_quality,
        "lang_pred": _q_lang_pred,
        "similarity_topk": _q_similarity_topk,
        "ann_ivfpq": _q_ann_ivfpq,
        "events_window": _q_events_window,
        "events_running": _q_events_running,
        "events_asof": _q_events_asof,
        "events_range": _q_events_range,
        "kmv_cells": _q_kmv_cells,
        "hll_cells": _q_hll_cells,
        "kmv_overlap": _q_kmv_overlap,
        "distinct_rollup": _q_distinct_rollup,
        "gpkg_roundtrip": _q_gpkg_roundtrip,
        "geohash_cells": _q_geohash_cells,
        "dissolve_rects": _q_dissolve_rects,
        "dissolve_rects_grouped": _q_dissolve_rects_grouped,
        "geom_validate": _q_geom_validate,
        "hh_sketch": _q_hh_sketch,
        "radius_pairs": _q_radius_pairs,
        "url_features": _q_url_features,
        "pii_scan": _q_pii_scan,
        "repetition": _q_repetition,
        "pack_docs": _q_pack_docs,
        "curate_pipeline": _q_curate_pipeline,
        "pack_efficiency": _q_pack_efficiency,
        "funnel_counts": _q_funnel_counts,
        "tfidf_terms": _q_tfidf,
        "weighted_sample": _q_weighted_sample,
        "domain_quota": _q_domain_quota,
        "decontaminate": _q_decontaminate,
        "doc_sample": _q_doc_sample,
        "top_sources": _q_top_sources,
        "events_quantiles": _q_events_quantiles,
        "quantile_sketch": _q_quantile_sketch,
        "events_funnel": _q_events_funnel,
        "events_cohort": _q_events_cohort,
        "time_rollup": _q_time_rollup,
        "value_histogram": _q_value_histogram,
        "events_sessions": _q_events_sessions,
        "events_rollup": _q_events_rollup,
        "events_json": _q_events_json,
        "bpe_tokens": _q_bpe_tokens,
        "wkt_roundtrip": _q_wkt_roundtrip,
        "line_dedup": _q_line_dedup,
        "lm_perplexity": _q_lm_perplexity,
        "doc_chunks": _q_doc_chunks,
        "mixture_sample": _q_mixture_sample,
        "zonal_geotiff": _q_zonal_geotiff,
        "span_dedup": _q_span_dedup,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        k: v for k, v in _all_queries().items() if k not in _FOLDED_QUERIES
    }


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Folded (driver-redundant) queries, still bit-verified locally."""
    return {
        k: v for k, v in _all_queries().items() if k in _FOLDED_QUERIES
    }


def _all_oracle_sql() -> dict[str, str]:
    # pip_join: per-polygon containment predicates (rectangles +-holes)
    pip_parts = [
        "SELECT doc_id, '%s' AS name FROM pts WHERE %s"
        % (name, _rect_pred_sql(outer, hole))
        for _pid, name, outer, hole in _rects()
    ]
    pip_sql = PTS_CTE + " " + " UNION ALL ".join(pip_parts)

    # seam-crossing band: containment on the circle = OR of the two
    # lobes' lon ranges; the hole (also crossing) is excluded with the
    # strict-interior convention the rectangular oracles use
    pip_antimeridian_sql = PTS_CTE + (
        " SELECT doc_id, 'seam_band' AS name FROM pts"
        " WHERE lat >= 20.0 AND lat <= 70.0"
        " AND (lon >= 150.0 OR lon <= -150.0)"
        " AND NOT (lat > 40.0 AND lat < 55.0"
        " AND (lon > 170.0 OR lon < -170.0))"
    )

    # polar caps are constant-latitude boundaries, so the planar cap
    # interior is a pure latitude predicate — trivially SQL-expressible
    pip_polar_sql = PTS_CTE + (
        " SELECT doc_id, 'antarctic' AS name FROM pts WHERE lat < -70.0"
        " UNION ALL"
        " SELECT doc_id, 'arctic' AS name FROM pts WHERE lat > 75.0"
    )

    # rectangle-probe "intersects": interval overlap on the outer box,
    # minus probes strictly inside a hole's open interior
    _pb_cte = (
        ", pb AS (SELECT doc_id, "
        "round(lon - (0.2 + CAST(doc_id % 4 AS DOUBLE) * 0.15), 6) "
        "AS px0, "
        "round(lon + (0.2 + CAST(doc_id % 4 AS DOUBLE) * 0.15), 6) "
        "AS px1, "
        "round(lat - (0.2 + CAST(doc_id % 4 AS DOUBLE) * 0.15), 6) "
        "AS py0, "
        "round(lat + (0.2 + CAST(doc_id % 4 AS DOUBLE) * 0.15), 6) "
        "AS py1 FROM pts)"
    )
    overlap_parts = []
    for _pid, rname, (ox0, oy0, ox1, oy1), hole in _rects():
        pred = (
            "px0 <= %r AND px1 >= %r AND py0 <= %r AND py1 >= %r"
            % (ox1, ox0, oy1, oy0)
        )
        if hole:
            hx0, hy0, hx1, hy1 = hole
            pred += (
                " AND NOT (px0 > %r AND px1 < %r"
                " AND py0 > %r AND py1 < %r)"
                % (hx0, hx1, hy0, hy1)
            )
        overlap_parts.append(
            "SELECT doc_id, '%s' AS name FROM pb WHERE %s"
            % (rname, pred)
        )
    polygon_overlap_sql = (
        PTS_CTE + _pb_cte + " " + " UNION ALL ".join(overlap_parts)
    )

    bbox_parts = [
        "SELECT doc_id, '%s' AS name FROM pts WHERE %s"
        % (name, _rect_pred_sql(outer, None))
        for _pid, name, outer, _h in _rects()
    ]
    bbox_sql = (
        PTS_CTE
        + ", hits AS (" + " UNION ALL ".join(bbox_parts) + ") "
        + "SELECT name, COUNT(*) AS n_docs FROM hits GROUP BY name"
    )

    tile_assign_sql = (
        PTS_CTE + " SELECT doc_id, %s AS tile_id FROM pts" % _tile_sql(6)
    )

    tile_stats_sql = (
        PTS_CTE
        + " SELECT %s AS tile_id, COUNT(*) AS n_points, "
          "min(lon) AS xmin, min(lat) AS ymin, "
          "max(lon) AS xmax, max(lat) AS ymax "
          "FROM pts GROUP BY 1" % _tile_sql(5)
    )

    # web-mercator: same ln/tan/cos formulas in DuckDB; a floor-boundary
    # flip would need a point within ~1 ulp of a tile edge (none in the
    # derived-point fixture; verified bit-equal)
    _qk_digits = " || ".join(
        "CAST(((tx >> %d) & 1) + ((ty >> %d) & 1) * 2 AS VARCHAR)"
        % (5 - i, 5 - i)
        for i in range(6)
    )
    mercator_sql = (
        PTS_CTE
        + ", m AS (SELECT doc_id, "
        "greatest(least(CAST(floor((lon + 180.0) / 360.0 * 64.0) "
        "AS BIGINT), 63), 0) AS tx, "
        "greatest(least(CAST(floor((1.0 - ln(tan(radians("
        "greatest(least(lat, 85.05112878), -85.05112878))) + 1.0 / "
        "cos(radians(greatest(least(lat, 85.05112878), -85.05112878)))) "
        "/ pi()) / 2.0 * 64.0) AS BIGINT), 63), 0) AS ty FROM pts) "
        "SELECT doc_id, tx, ty, " + _qk_digits + " AS quadkey FROM m"
    )

    # each pyramid level recomputed directly at its own resolution —
    # equality proves the hierarchical rollup cascade
    tile_pyramid_sql = PTS_CTE + " " + " UNION ALL ".join(
        "SELECT CAST(%d AS INTEGER) AS level, %s AS tile_id, "
        "COUNT(*) AS n_points, min(lon) AS xmin, min(lat) AS ymin, "
        "max(lon) AS xmax, max(lat) AS ymax FROM pts GROUP BY 2"
        % (r, _tile_sql(r))
        for r in (4, 3, 2)
    )

    n3 = 1 << 3
    knn_grid_sql = (
        PTS_CTE
        + """, g AS (
            SELECT doc_id, lon, lat,
              least(greatest(CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n1}) AS gx,
              least(greatest(CAST(floor((lat + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n1}) AS gy
            FROM pts
          ), pairs AS (
            SELECT a.doc_id AS doc_id, b.doc_id AS nbr_id,
              (a.lon - b.lon) * (a.lon - b.lon)
              + (a.lat - b.lat) * (a.lat - b.lat) AS dist_sq
            FROM g a JOIN g b
              ON a.doc_id <> b.doc_id
             AND least(abs(a.gx - b.gx), {n} - abs(a.gx - b.gx)) <= 1
             AND abs(a.gy - b.gy) <= 1
          )
          SELECT doc_id, nbr_id, dist_sq, rank FROM (
            SELECT doc_id, nbr_id, dist_sq,
              CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY dist_sq ASC, nbr_id ASC) AS INTEGER) AS rank
            FROM pairs
          ) WHERE rank <= 3""".format(n=n3, n1=n3 - 1)
    )

    knn_complete_sql = (
        PTS_CTE
        + """ SELECT doc_id, nbr_id, dist_sq, rank FROM (
            SELECT a.doc_id AS doc_id, b.doc_id AS nbr_id,
              (a.lon - b.lon) * (a.lon - b.lon)
              + (a.lat - b.lat) * (a.lat - b.lat) AS dist_sq,
              CAST(row_number() OVER (PARTITION BY a.doc_id
                   ORDER BY (a.lon - b.lon) * (a.lon - b.lon)
                          + (a.lat - b.lat) * (a.lat - b.lat) ASC,
                          b.doc_id ASC) AS INTEGER) AS rank
            FROM pts a JOIN pts b ON a.doc_id <> b.doc_id
          ) WHERE rank <= 3"""
    )

    knn_exact_sql = (
        PTS_CTE
        + """ SELECT doc_id, nbr_id, dist_sq, rank FROM (
            SELECT a.doc_id AS doc_id, b.doc_id AS nbr_id,
              (a.lon - b.lon) * (a.lon - b.lon)
              + (a.lat - b.lat) * (a.lat - b.lat) AS dist_sq,
              CAST(row_number() OVER (PARTITION BY a.doc_id
                   ORDER BY (a.lon - b.lon) * (a.lon - b.lon)
                          + (a.lat - b.lat) * (a.lat - b.lat) ASC,
                          b.doc_id ASC) AS INTEGER) AS rank
            FROM pts a JOIN pts b ON a.doc_id <> b.doc_id
          ) WHERE rank <= 2"""
    )

    dedup_exact_sql = (
        "WITH both_docs AS (SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 100000, text FROM documents) "
        "SELECT md5(text) AS text_hash, min(doc_id) AS rep_id, "
        "COUNT(*) AS n_dups FROM both_docs GROUP BY 1"
    )

    fingerprint_sql = (
        "SELECT doc_id, %s AS fp FROM documents" % T.fingerprint_sql("text")
    )

    text_quality_sql = (
        "SELECT doc_id, CAST(%s AS INTEGER) AS n_tokens, %s AS stop_ratio, "
        "%s AS punct_ratio, %s AS quality FROM documents"
        % (
            T.token_count_sql("text"),
            T.stopword_ratio_sql("text"),
            T.punct_ratio_sql("text"),
            T.quality_score_sql("text"),
        )
    )

    lang_pred_sql = (
        "SELECT doc_id, %s AS lang_pred FROM documents"
        % T.lang_id_sql("text")
    )

    similarity_sql = """
        WITH q AS (
          SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
          FROM embeddings WHERE vec_id < 5
        ), base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        ), scored AS (
          SELECT q.query_id, base.vec_id,
            list_dot_product(q.qvec, base.vec)
              / (sqrt(list_dot_product(q.qvec, q.qvec))
                 * sqrt(list_dot_product(base.vec, base.vec))) AS score
          FROM base, q WHERE q.query_id <> base.vec_id
        )
        SELECT query_id, vec_id, score, rank FROM (
          SELECT query_id, vec_id, score,
            CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rank
          FROM scored
        ) WHERE rank <= 5"""

    events_sql = (
        "SELECT date_trunc('hour', ts) AS window_start, event_type, "
        "COUNT(*) AS n_events, "
        "CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS sum_cents "
        "FROM events GROUP BY 1, 2"
    )

    events_running_sql = (
        "SELECT event_id, user_id, "
        "CAST(row_number() OVER w AS INTEGER) AS seq, "
        "CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w "
        "AS BIGINT) AS running_cents, "
        "lag(event_type) OVER w AS prev_type "
        "FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    )

    events_asof_sql = (
        "WITH errors AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'error'), "
        "clicks AS (SELECT user_id, ts, event_id AS click_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS click_cents "
        "FROM events WHERE event_type = 'click') "
        "SELECT e.event_id, e.user_id, c.click_id AS prev_click_id, "
        "c.click_cents AS prev_click_cents "
        "FROM errors e ASOF LEFT JOIN clicks c "
        "ON e.user_id = c.user_id AND e.ts >= c.ts"
    )

    zonal_parts = [
        "SELECT CAST(%d AS BIGINT) AS polygon_id, '%s' AS name, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(v) AS BIGINT) AS sum_val, AVG(v) AS mean_val, "
        "MIN(v) AS min_val, MAX(v) AS max_val "
        "FROM vpts WHERE %s HAVING COUNT(*) > 0"
        % (pid, name, _rect_pred_sql(outer, hole))
        for pid, name, outer, hole in _rects()
    ]
    zonal_sql = (
        PTS_CTE
        + ", vpts AS (SELECT doc_id, lon, lat, "
        "CAST(doc_id % 100 AS BIGINT) AS v FROM pts) "
        + " UNION ALL ".join(zonal_parts)
    )

    # zonal_geotiff: the Spark side decodes pixel values and centers
    # from REAL GeoTIFF bytes; the oracle recomputes the closed form.
    # lon/lat mirror the reader's arithmetic order exactly —
    # origin + (p + 0.5) * scale with scale 1.25 (exact binary), so
    # the doubles agree bit-for-bit.
    zonal_geotiff_parts = [
        "SELECT CAST(%d AS BIGINT) AS polygon_id, '%s' AS name, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(v) AS BIGINT) AS sum_val, AVG(v) AS mean_val, "
        "MIN(v) AS min_val, MAX(v) AS max_val "
        "FROM rast WHERE %s HAVING COUNT(*) > 0"
        % (pid, name, _rect_pred_sql(outer, hole))
        for pid, name, outer, hole in _rects()
    ]
    zonal_geotiff_sql = (
        "WITH rast AS (SELECT "
        "-180.0 + (CAST(px AS DOUBLE) + 0.5) * 1.25 AS lon, "
        "90.0 - (CAST(py AS DOUBLE) + 0.5) * 1.25 AS lat, "
        "CAST((px * 7 + py * 13) % 1000 AS BIGINT) AS v "
        "FROM generate_series(0, 287) t(px), "
        "generate_series(0, 143) s(py)) "
        + " UNION ALL ".join(zonal_geotiff_parts)
    )

    from pure_python_geospatial_export_spark.operators.sketch import (
        kmv_hash_sql,
    )
    # Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    # (1-f)*lo + f*hi interpolation — verified bit-equal on this fixture
    events_quantiles_sql = (
        "SELECT event_type, COUNT(*) AS n_events, "
        "quantile_cont(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0.5) "
        "AS p50_cents, "
        "quantile_cont(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0.9) "
        "AS p90_cents "
        "FROM events GROUP BY 1"
    )

    events_sessions_sql = (
        "WITH e AS (SELECT user_id, event_id, ts, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR CAST(epoch(ts) AS BIGINT) "
        "- lag(CAST(epoch(ts) AS BIGINT)) OVER w > 1800 "
        "THEN 1 ELSE 0 END AS new_s FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT user_id, ts, CAST(SUM(new_s) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM e) "
        "SELECT user_id, session_seq, COUNT(*) AS n_events, "
        "MIN(ts) AS session_start, MAX(ts) AS session_end "
        "FROM s GROUP BY 1, 2"
    )

    events_rollup_sql = (
        "SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr, "
        "COUNT(*) AS n_events FROM events "
        "GROUP BY ROLLUP(event_type, CAST(hour(ts) AS INTEGER))"
    )

    top_sources_sql = (
        PTS_CTE
        + ", src AS (SELECT %s AS cell_id, d.source AS source "
        "FROM pts p JOIN documents d USING (doc_id)), "
        "counts AS (SELECT cell_id, source, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM src GROUP BY 1, 2) "
        "SELECT cell_id, source, n, rank FROM ("
        "SELECT cell_id, source, n, CAST(row_number() OVER ("
        "PARTITION BY cell_id ORDER BY n DESC, source ASC) AS INTEGER) "
        "AS rank FROM counts) WHERE rank <= 3"
        % _tile_sql(1, "p.lon", "p.lat")
    )

    doc_sample_sql = (
        "SELECT doc_id, lang FROM documents "
        "WHERE %s < (CASE lang WHEN 'de' THEN 1073741824.0 "
        "WHEN 'en' THEN 2147483648.0 ELSE 429496729.6 END)"
        % kmv_hash_sql("CAST(doc_id AS VARCHAR) || ''")
    )

    kmv_sql = (
        PTS_CTE
        + ", hv AS (SELECT DISTINCT %s AS cell_id, %s AS h FROM pts), "
        "ranked AS (SELECT cell_id, h, row_number() OVER "
        "(PARTITION BY cell_id ORDER BY h) AS rn FROM hv), "
        "agg AS (SELECT cell_id, COUNT(*) AS nd, "
        "MAX(CASE WHEN rn = 16 THEN h END) AS kth "
        "FROM ranked GROUP BY cell_id) "
        "SELECT cell_id, CASE WHEN nd < 16 THEN CAST(nd AS DOUBLE) "
        "ELSE 64424509440.0 / CAST(kth AS DOUBLE) END AS est_distinct "
        "FROM agg"
        % (
            _tile_sql(1),
            kmv_hash_sql("'doc://' || CAST(doc_id AS VARCHAR)"),
        )
    )

    # hll_cells: registers from the same md5-prefix hash (bucket = low
    # 8 bits, rank via length(bin(rest)) — identical semantics in both
    # engines), harmonic sum as the exact scaled BIGINT. The estimate
    # numerator AND the linear-counting correction table are computed
    # in Python here (same arithmetic / libm as hll_estimate) and
    # embedded as literals — both engines parse identical
    # shortest-repr doubles, so even the corrected branch bit-matches.
    from pure_python_geospatial_export_spark.operators.sketch import (
        hll_correction_table,
        hll_numerator,
    )

    def _dlit(x: float) -> str:
        # DuckDB lexes a plain decimal literal as DECIMAL (here up to
        # DECIMAL(17,15)) and its DECIMAL->DOUBLE cast can land 1 ulp
        # off the correct double parse of the same digits; an exponent
        # forces the DOUBLE lexer path, which round-trips repr exactly.
        r = repr(float(x))
        return r if ("e" in r or "E" in r) else r + "e0"

    def _hll_tbl_sql(p: int) -> str:
        return "[" + ", ".join(
            _dlit(x) for x in hll_correction_table(p)
        ) + "]"

    def _hll_numer_lit(p: int) -> str:
        # shared with hll_estimate — incl. the m<128 alpha special
        # cases a local copy would miss
        return _dlit(hll_numerator(p))

    def _hll_est_case(p: int) -> str:
        m = 1 << p
        raw = (_hll_numer_lit(p) + " / CAST(harmonic AS DOUBLE)")
        return (
            "CASE WHEN (" + raw + ") <= " + _dlit(2.5 * m)
            + " AND zeros > 0 THEN (" + _hll_tbl_sql(p)
            + ")[CAST(zeros AS INTEGER)] ELSE " + raw + " END AS est"
        )

    hll_sql = (
        PTS_CTE
        + (
            ", hv AS (SELECT %s AS cell_id, %s AS h FROM pts), "
            "regs AS (SELECT cell_id, "
            "CAST(h %% 256 AS INTEGER) AS bucket, "
            "MAX(CASE WHEN CAST((h - (h %% 256)) / 256 AS BIGINT) > 0 "
            "THEN 25 - length(bin(CAST((h - (h %% 256)) / 256 "
            "AS BIGINT))) ELSE 25 END) AS reg FROM hv GROUP BY 1, 2), "
            % (
                _tile_sql(1),
                kmv_hash_sql("'doc://' || CAST(doc_id AS VARCHAR)"),
            )
        )
        + "agg AS (SELECT cell_id, COUNT(*) AS nb, "
        "CAST(SUM(CAST(pow(2.0, 40 - reg) AS BIGINT)) AS BIGINT) AS hs "
        "FROM regs GROUP BY 1), "
        "fin AS (SELECT cell_id, CAST(256 - nb AS BIGINT) AS zeros, "
        "CAST(hs + (256 - nb) * 1099511627776 AS BIGINT) AS harmonic "
        "FROM agg) "
        "SELECT cell_id, zeros, harmonic, " + _hll_est_case(8)
        + " FROM fin"
    )

    # kmv_overlap: per-source bottom-32 vocab sketches from raw rows,
    # then the identical union-sample estimator. 31 * 2^32 =
    # 133143986176 is the saturated-estimate numerator at k=32.
    kmv_overlap_sql = (
        "WITH tok AS (SELECT source, "
        "unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok "
        "FROM documents), "
        "hv AS (SELECT DISTINCT source, %s AS h FROM tok), "
        "ranked AS (SELECT source, h, row_number() OVER "
        "(PARTITION BY source ORDER BY h) AS rn FROM hv), "
        "sk AS (SELECT source, list(h ORDER BY h) AS s FROM ranked "
        "WHERE rn <= 32 GROUP BY 1), "
        "p AS (SELECT a.source AS source_a, b.source AS source_b, "
        "a.s AS sa, b.s AS sb FROM sk a JOIN sk b "
        "ON a.source < b.source), "
        "u AS (SELECT source_a, source_b, sa, sb, "
        "list_slice(list_sort(list_distinct(list_concat(sa, sb))), "
        "1, 32) AS un FROM p), "
        "est AS (SELECT source_a, source_b, "
        "CASE WHEN len(un) < 32 THEN CAST(len(un) AS DOUBLE) "
        "ELSE 133143986176.0 / CAST(un[32] AS DOUBLE) END AS eu, "
        "CAST(len(list_intersect(list_intersect(un, sa), sb)) "
        "AS DOUBLE) / CAST(len(un) AS DOUBLE) AS j FROM u) "
        "SELECT source_a, source_b, eu AS est_union, j AS jaccard, "
        "j * eu AS est_intersection FROM est"
        % kmv_hash_sql("tok")
    )

    # distinct_rollup: flat HLL register recompute from raw events at
    # p=10 (m=1024, 33-p=23) — the Spark side must reproduce it
    # through the day-chunked precompute + tail seam. Corrected
    # estimate via the same literal lookup table as hll_cells.
    # NULL user_ids must be dropped on BOTH sides: hll_sketch filters
    # value_col IS NOT NULL (countDistinct semantics), so the oracle
    # mirrors it — a NULL would otherwise hash to a NULL-bucket
    # register row here only.
    distinct_rollup_sql = (
        "WITH hv AS (SELECT event_type, %s AS h FROM events "
        "WHERE user_id IS NOT NULL), "
        "regs AS (SELECT event_type, "
        "CAST(h %% 1024 AS INTEGER) AS bucket, "
        "MAX(CASE WHEN CAST((h - (h %% 1024)) / 1024 AS BIGINT) > 0 "
        "THEN 23 - length(bin(CAST((h - (h %% 1024)) / 1024 "
        "AS BIGINT))) ELSE 23 END) AS reg FROM hv GROUP BY 1, 2), "
        "agg AS (SELECT event_type, COUNT(*) AS nb, "
        "CAST(SUM(CAST(pow(2.0, 40 - reg) AS BIGINT)) AS BIGINT) AS hs "
        "FROM regs GROUP BY 1), "
        "fin AS (SELECT event_type, CAST(1024 - nb AS BIGINT) AS zeros, "
        "CAST(hs + (1024 - nb) * 1099511627776 AS BIGINT) AS harmonic "
        "FROM agg) "
        "SELECT event_type, zeros, harmonic, "
        % (kmv_hash_sql("CAST(user_id AS VARCHAR)"),)
        + _hll_est_case(10)
        + " FROM fin"
    )

    events_range_sql = (
        "WITH errors AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'error'), "
        "clicks AS (SELECT event_id AS click_id, user_id, "
        "ts AS start_ts, ts + INTERVAL 15 MINUTE AS end_ts "
        "FROM events WHERE event_type = 'click') "
        "SELECT c.click_id, COUNT(*) AS n_errors "
        "FROM errors e JOIN clicks c ON e.user_id = c.user_id "
        "AND e.ts >= c.start_ts AND e.ts <= c.end_ts "
        "GROUP BY 1"
    )

    events_json_sql = (
        "SELECT event_type, "
        "CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
        "AS BIGINT) AS sum_k, "
        "COUNT(*) AS n_events FROM events GROUP BY 1"
    )

    bpe_tokens_sql = (
        "SELECT doc_id, CAST(%s AS INTEGER) AS n_bpe_tokens FROM documents"
        % T.bpe_token_count_sql("text")
    )

    wkt_values = ", ".join(
        "('%s', '%s')" % (cid, w.replace("'", "''"))
        for cid, w in _golden_wkts()
    )
    wkt_roundtrip_sql = (
        "SELECT case_id, wkt AS wkt_out FROM (VALUES %s) AS t(case_id, wkt)"
        % wkt_values
    )

    # LSH internals (blake2b minhash bands / random-plane sign buckets)
    # are not SQL-expressible, but on these fixtures the candidate stage
    # has recall 1 (deterministic — fixed seeds, fixed data, planted
    # near-dups far above the threshold), so the OUTPUT equals the exact
    # all-pairs threshold set, which DuckDB can compute directly. The
    # shingling (strip/split/3-gram/distinct) mirrors the Arrow kernel.
    # exact all-pairs n-gram Jaccard on a bounded subset (the no-LSH
    # small-data path gets its own driver-level evidence)
    jaccard_pairs_sql = """
        WITH alldocs AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 120
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text || ' zzzz' AS text
          FROM documents WHERE doc_id < 120
        ), toks AS (
          SELECT doc_id, text,
                 regexp_split_to_array(trim(text), '\\s+') AS t
          FROM alldocs
        ), sh AS (
          SELECT doc_id,
            CASE WHEN len(t) >= 3 THEN
              list_distinct(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
            ELSE [text] END AS shingles
          FROM toks
        )
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / CAST(len(list_distinct(
                    list_concat(a.shingles, b.shingles))) AS DOUBLE)
              AS jaccard
          FROM sh a, sh b WHERE a.doc_id < b.doc_id
        ) WHERE jaccard >= 0.5"""

    minhash_pairs_sql = """
        WITH alldocs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text || ' zzzz' AS text
          FROM documents
        ), toks AS (
          SELECT doc_id, text,
                 regexp_split_to_array(trim(text), '\\s+') AS t
          FROM alldocs
        ), sh AS (
          -- mirrors the Spark kernel's short-doc fallback: fewer than 3
          -- tokens -> the whole text is the single shingle (previously
          -- range(1, len-1) silently dropped such docs, making the gate
          -- depend on the fixture containing none)
          SELECT doc_id,
            CASE WHEN len(t) >= 3 THEN
              list_distinct(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
            ELSE [text] END AS shingles
          FROM toks
        )
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / CAST(len(list_distinct(
                    list_concat(a.shingles, b.shingles))) AS DOUBLE)
              AS jaccard
          FROM sh a, sh b WHERE a.doc_id < b.doc_id
        ) WHERE jaccard >= 0.5"""

    # SimHash mirrors across engines because the token hash is md5:
    # DuckDB's md5_number_upper reads the same 8 bytes little-endian — a
    # fixed bit permutation of Spark's conv() big-endian read, and
    # xor/bit_count are permutation-invariant, so hamming distances and
    # the <=3 pair set agree exactly. The 4x16-bit chunk candidate join
    # is COMPLETE for hamming<=3 (pigeonhole), so Spark's output equals
    # this all-pairs filter.
    simhash_pairs_sql = """
        WITH alldocs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text || ' zzzz' AS text
          FROM documents
        ), tok AS (
          SELECT doc_id,
            unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM alldocs
        ), votes AS (
          SELECT doc_id, r.b,
            SUM(CASE WHEN (md5_number_upper(t) >> r.b) & 1 = 1
                THEN 1 ELSE -1 END) AS v
          FROM tok CROSS JOIN range(0, 64) r(b)
          GROUP BY doc_id, r.b
        ), sim AS (
          SELECT doc_id,
            CAST(SUM(CASE WHEN v >= 0
                 THEN (CAST(1 AS UBIGINT) << b)
                 ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS s
          FROM votes GROUP BY doc_id
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
        FROM sim a, sim b
        WHERE a.doc_id < b.doc_id
          AND bit_count(xor(a.s, b.s)) <= 3"""

    embedding_near_dup_sql = """
        WITH base AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
          FROM embeddings
        ), planted AS (
          SELECT vec_id + 100000 AS vec_id,
            list_transform(embedding,
                           x -> CAST(x AS DOUBLE) + 0.01) AS vec
          FROM embeddings WHERE vec_id < 150
        ), u AS (
          SELECT * FROM base UNION ALL SELECT * FROM planted
        )
        SELECT id_a, id_b, score FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_dot_product(a.vec, b.vec)
              / (sqrt(list_dot_product(a.vec, a.vec))
                 * sqrt(list_dot_product(b.vec, b.vec))) AS score
          FROM u a, u b WHERE a.vec_id < b.vec_id
        ) WHERE score >= 0.99"""

    from pure_python_geospatial_export_spark.functions import urls as U
    from pure_python_geospatial_export_spark.operators.sketch import (
        kmv_hash_sql,
    )

    url_features_sql = (
        "WITH u AS (SELECT doc_id, %s AS url FROM documents), "
        "h AS (SELECT doc_id, url, %s AS host FROM u) "
        "SELECT doc_id, host, %s AS domain, "
        "CAST(%s AS INTEGER) AS depth, "
        "%s AS ext, %s AS is_media FROM h"
        % (
            _URL_SYNTH_SQL,
            U.url_host_sql("url"),
            U.registered_domain_sql("host"),
            U.url_path_depth_sql("url"),
            U.url_extension_sql("url"),
            U.url_is_media_sql("url"),
        )
    )

    # haversine mirrored term-for-term incl. the [0,1] clamp; 2R and
    # the /2.0 half-angles match the Spark column expression exactly
    _hav = (
        "2.0 * 6371.0088 * asin(sqrt(greatest(least("
        "sin(radians(b.lat - a.lat) / 2.0) "
        "* sin(radians(b.lat - a.lat) / 2.0) "
        "+ cos(radians(a.lat)) * cos(radians(b.lat)) "
        "* sin(radians(b.lon - a.lon) / 2.0) "
        "* sin(radians(b.lon - a.lon) / 2.0), 1.0), 0.0)))"
    )
    radius_pairs_sql = PTS_CTE + (
        " SELECT id_a, id_b, round(dist_km, 6) AS dist_km FROM ("
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, %s AS dist_km "
        "FROM pts a, pts b WHERE a.doc_id < b.doc_id) "
        "WHERE dist_km <= 300.0" % _hav
    )

    domain_quota_sql = (
        "WITH r AS (SELECT doc_id, source, row_number() OVER ("
        "PARTITION BY source ORDER BY %s ASC, doc_id ASC) AS rn "
        "FROM documents) "
        "SELECT doc_id, source FROM r WHERE rn <= 20"
        % kmv_hash_sql("CAST(doc_id AS VARCHAR)")
    )

    _sh8 = " || ' ' || ".join("t[i+%d]" % j for j in range(8)).replace(
        "t[i+0]", "t[i]"
    )
    from pure_python_geospatial_export_spark.functions import pii as P

    pii_scan_sql = (
        "WITH aug AS (SELECT doc_id, %s AS text2 FROM documents) "
        "SELECT doc_id, %s AS n_emails, %s AS n_phones, %s AS n_ips, "
        "%s AS has_pii, %s AS redacted FROM aug"
        % (
            _PII_SYNTH_SQL,
            P.email_count_sql("text2"),
            P.phone_count_sql("text2"),
            P.ipv4_count_sql("text2"),
            P.pii_hit_sql("text2"),
            P.redact_pii_sql("text2"),
        )
    )

    repetition_sql = (
        "WITH tk AS (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
        "st AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens, "
        "CAST(len(list_distinct(t)) AS INTEGER) AS n_distinct_tokens, t "
        "FROM tk), "
        "g AS (SELECT doc_id, n_tokens, n_distinct_tokens, "
        "unnest(list_transform(range(1, len(t)), "
        "i -> concat_ws(' ', t[i], t[i+1]))) AS gr "
        "FROM st WHERE n_tokens >= 2), "
        "c AS (SELECT doc_id, n_tokens, n_distinct_tokens, gr, "
        "count(*) AS cnt FROM g "
        "GROUP BY doc_id, n_tokens, n_distinct_tokens, gr), "
        "m AS (SELECT doc_id, n_tokens, n_distinct_tokens, "
        "max(cnt) AS top_gram_count FROM c "
        "GROUP BY doc_id, n_tokens, n_distinct_tokens) "
        "SELECT doc_id, n_tokens, n_distinct_tokens, top_gram_count, "
        "CAST(top_gram_count AS DOUBLE) / CAST(n_tokens - 1 AS DOUBLE) "
        "AS top_gram_frac, "
        "CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) "
        "AS distinct_ratio FROM m "
        "UNION ALL "
        "SELECT doc_id, n_tokens, n_distinct_tokens, "
        "CAST(0 AS BIGINT) AS top_gram_count, 0.0 AS top_gram_frac, "
        "CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) "
        "AS distinct_ratio FROM st WHERE n_tokens < 2"
    )

    curate_pipeline_sql = (
        "WITH alldocs AS ("
        "SELECT doc_id, text FROM documents WHERE doc_id < 150 "
        "UNION ALL SELECT doc_id + 100000 AS doc_id, "
        "text || ' zzzz' AS text FROM documents WHERE doc_id < 150 "
        "UNION ALL SELECT doc_id + 200000 AS doc_id, text "
        "FROM documents WHERE doc_id < 150 "
        "UNION ALL SELECT doc_id + 300000 AS doc_id, 'x' AS text "
        "FROM documents WHERE doc_id < 150), "
        "filt AS (SELECT doc_id, text FROM alldocs "
        "WHERE %s >= 5 AND (%s) >= 0.3 AND (%s) = 'en'), "
        "exd AS (SELECT doc_id, text FROM filt "
        "WHERE doc_id IN (SELECT min(doc_id) FROM filt "
        "GROUP BY text)), "
        "toks AS (SELECT doc_id, text, "
        "regexp_split_to_array(trim(text), '\\s+') AS t FROM exd), "
        "sh AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN "
        "list_distinct(list_transform(range(1, len(t) - 1), "
        "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) "
        "ELSE [text] END AS shingles FROM toks), "
        "drops AS (SELECT DISTINCT b.doc_id AS doc_id "
        "FROM sh a, sh b WHERE a.doc_id < b.doc_id AND "
        "CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) "
        "/ CAST(len(list_distinct(list_concat(a.shingles, "
        "b.shingles))) AS DOUBLE) >= 0.5) "
        "SELECT doc_id FROM exd "
        "WHERE doc_id NOT IN (SELECT doc_id FROM drops)"
        % (
            T.token_count_sql("text"),
            T.quality_score_sql("text"),
            T.lang_id_sql("text"),
        )
    )

    # greedy packing's bin state depends on the running result (a reset
    # whenever the fill WOULD overflow) — not prefix-sum expressible, so
    # the oracle walks each shard with a recursive CTE in the same
    # doc_id order the applyInPandas kernel uses.
    pack_docs_sql = (
        "WITH RECURSIVE s AS (SELECT source, doc_id, "
        "CAST(COALESCE(%s, 0) AS INTEGER) AS n_tokens, "
        "CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) "
        "AS BIGINT) AS rn FROM documents), "
        "r AS ("
        "SELECT source, doc_id, n_tokens, rn, CAST(0 AS BIGINT) AS "
        "pack_id, CAST(0 AS BIGINT) AS pack_offset, n_tokens AS fill "
        "FROM s WHERE rn = 1 "
        "UNION ALL "
        "SELECT s.source, s.doc_id, s.n_tokens, s.rn, "
        "CASE WHEN r.fill + s.n_tokens > 96 THEN r.pack_id + 1 "
        "ELSE r.pack_id END, "
        "CASE WHEN r.fill + s.n_tokens > 96 THEN CAST(0 AS BIGINT) "
        "ELSE CAST(r.fill AS BIGINT) END, "
        "CASE WHEN r.fill + s.n_tokens > 96 THEN s.n_tokens "
        "ELSE r.fill + s.n_tokens END "
        "FROM r JOIN s ON s.source = r.source AND s.rn = r.rn + 1) "
        "SELECT source, doc_id, n_tokens, pack_id, pack_offset, "
        "n_tokens > 96 AS overflow FROM r"
        % T.token_count_sql("text")
    )

    weighted_sample_sql = (
        "WITH s AS (SELECT doc_id, source, n_chars, "
        "round(pow((CAST(%s AS DOUBLE) + 1.0) / 4294967297.0, "
        "1.0 / CAST(n_chars AS DOUBLE)), 12) AS sc FROM documents "
        "WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0) "
        "SELECT doc_id, source, n_chars FROM "
        "(SELECT doc_id, source, n_chars, row_number() OVER "
        "(PARTITION BY source ORDER BY sc DESC, doc_id ASC) AS rn "
        "FROM s) WHERE rn <= 5"
        % kmv_hash_sql("CAST(doc_id AS VARCHAR) || ''")
    )

    tfidf_sql = (
        "WITH tk AS (SELECT doc_id, "
        "unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
        "FROM documents), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM tk "
        "GROUP BY doc_id, term), "
        "dfq AS (SELECT term, count(*) AS _df FROM tf GROUP BY term), "
        "n AS (SELECT count(*) AS _n FROM documents), "
        "sc AS (SELECT doc_id, tf.term AS term, tf, "
        "round(CAST(tf AS DOUBLE) * (ln((CAST(_n AS DOUBLE) + 1.0) / "
        "(CAST(_df AS DOUBLE) + 1.0)) + 1.0), 9) AS score "
        "FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n) "
        "SELECT doc_id, term, tf, score, rank FROM "
        "(SELECT *, CAST(row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score DESC, term ASC) AS INTEGER) AS rank FROM sc) "
        "WHERE rank <= 5"
    )

    decontaminate_sql = (
        "WITH tk AS (SELECT doc_id, text, "
        "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents), "
        "sh AS (SELECT doc_id, CASE WHEN len(t) >= 8 THEN "
        "list_distinct(list_transform(range(1, len(t) - 6), i -> %s)) "
        "ELSE [text] END AS shingles FROM tk), "
        "ds AS (SELECT doc_id, unnest(shingles) AS s FROM sh), "
        "bs AS (SELECT DISTINCT unnest(shingles) AS s FROM sh "
        "WHERE doc_id %% 10 = 0), "
        "tot AS (SELECT doc_id, count(*) AS n_shingles FROM ds "
        "GROUP BY 1), "
        "mt AS (SELECT doc_id, count(*) AS n_matched FROM ds "
        "WHERE s IN (SELECT s FROM bs) GROUP BY 1) "
        "SELECT tot.doc_id AS doc_id, n_shingles, n_matched, "
        "CAST(n_matched AS DOUBLE) / CAST(n_shingles AS DOUBLE) "
        "AS contamination FROM tot JOIN mt USING (doc_id)"
        % _sh8
    )

    events_funnel_sql = (
        "WITH e1 AS (SELECT user_id, ts, event_type, "
        "min(CASE WHEN event_type = 'view' THEN ts END) "
        "OVER (PARTITION BY user_id) AS t_1 FROM events), "
        "e2 AS (SELECT *, min(CASE WHEN event_type = 'click' "
        "AND ts > t_1 THEN ts END) "
        "OVER (PARTITION BY user_id) AS t_2 FROM e1), "
        "e3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' "
        "AND ts > t_2 THEN ts END) "
        "OVER (PARTITION BY user_id) AS t_3 FROM e2) "
        "SELECT user_id, max(t_1) AS t_1, max(t_2) AS t_2, "
        "max(t_3) AS t_3, CAST(CASE "
        "WHEN max(t_3) IS NOT NULL THEN 3 "
        "WHEN max(t_2) IS NOT NULL THEN 2 "
        "WHEN max(t_1) IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) "
        "AS reached FROM e3 GROUP BY user_id"
    )

    _dissolve_sql = (
        PTS_CTE.replace("WITH pts", "WITH RECURSIVE pts", 1)
        + ", rects AS (SELECT doc_id AS id, "
          "round(lon - (0.5 + CAST(doc_id % 4 AS DOUBLE) * 0.3), 6)"
          " AS x0, "
          "round(lon + (0.5 + CAST(doc_id % 4 AS DOUBLE) * 0.3), 6)"
          " AS x1, "
          "round(lat - (0.5 + CAST(doc_id % 4 AS DOUBLE) * 0.3), 6)"
          " AS y0, "
          "round(lat + (0.5 + CAST(doc_id % 4 AS DOUBLE) * 0.3), 6)"
          " AS y1 FROM pts WHERE doc_id % 21 = 0)"
          ", prs AS (SELECT a.id AS ia, b.id AS ib FROM rects a"
          " JOIN rects b ON a.id < b.id AND a.x0 <= b.x1"
          " AND b.x0 <= a.x1 AND a.y0 <= b.y1 AND b.y0 <= a.y1)"
          ", eg AS (SELECT ia AS src, ib AS dst FROM prs"
          " UNION ALL SELECT ib, ia FROM prs)"
          ", reach(node, r) AS (SELECT id, id FROM rects"
          " UNION SELECT eg.dst, reach.r FROM reach"
          " JOIN eg ON eg.src = reach.node)"
          ", labels AS (SELECT node AS id, min(r) AS group_id"
          " FROM reach GROUP BY node)"
          " SELECT group_id, COUNT(*) AS n_members,"
          " min(x0) AS xmin, min(y0) AS ymin,"
          " max(x1) AS xmax, max(y1) AS ymax"
          " FROM labels JOIN rects USING (id) GROUP BY 1"
    )

    return {
        "pip_join": pip_sql,
        "pip_join_geodesic": _geodesic_oracle_sql(),
        "pip_join_salted": pip_sql,
        "pip_join_antimeridian": pip_antimeridian_sql,
        "pip_join_polar": pip_polar_sql,
        "polygon_overlap": polygon_overlap_sql,
        "bbox_filter": bbox_sql,
        "tile_assign": tile_assign_sql,
        "zonal_stats": zonal_sql,
        "zonal_geotiff": zonal_geotiff_sql,
        "tile_stats": tile_stats_sql,
        "tile_pyramid": tile_pyramid_sql,
        "mercator_tiles": mercator_sql,
        "knn_grid": knn_grid_sql,
        "knn_exact": knn_exact_sql,
        "knn_complete": knn_complete_sql,
        "dedup_exact": dedup_exact_sql,
        "fingerprint": fingerprint_sql,
        "text_quality": text_quality_sql,
        "lang_pred": lang_pred_sql,
        "similarity_topk": similarity_sql,
        # generous-parameter IVF-PQ == brute force, same output shape
        "ann_ivfpq": similarity_sql,
        "events_window": events_sql,
        "events_running": events_running_sql,
        "events_asof": events_asof_sql,
        "events_range": events_range_sql,
        "kmv_cells": kmv_sql,
        "hll_cells": hll_sql,
        # gpkg_roundtrip: the container round-trip is the identity on
        # (doc_id, lon, lat) — doubles ride through IEEE bytes — so
        # the oracle is the bare point derivation.
        "gpkg_roundtrip": PTS_CTE + " SELECT doc_id, lon, lat FROM pts",
        # rect intersect == interval overlap, so the oracle rebuilds
        # the pair graph in SQL and takes min-id components with a
        # recursive closure (reach(node, r): r reaches node; UNION
        # dedups so it terminates)
        "dissolve_rects": _dissolve_sql,
        # the grouped pair strategy must compute the SAME components
        "dissolve_rects_grouped": _dissolve_sql,
        # each row's validity is known BY CONSTRUCTION from its
        # doc_id residue, so the oracle is a pure CASE rollup
        "geom_validate": (
            "SELECT CASE doc_id % 5"
            " WHEN 1 THEN 'self_intersection'"
            " WHEN 2 THEN 'open_ring'"
            " WHEN 3 THEN 'repeated_point'"
            " WHEN 4 THEN 'too_few_points' END AS reason,"
            " COUNT(*) AS n_docs,"
            " min(doc_id) AS min_doc, max(doc_id) AS max_doc,"
            " CAST(max(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)"
            " AS INTEGER) AS any_valid"
            " FROM documents GROUP BY 1"
        ),
        "geohash_cells": (
            PTS_CTE
            + ", gh AS (SELECT %s AS gh2, %s AS gh9 FROM pts)"
              " SELECT gh2, COUNT(*) AS n_docs,"
              " min(gh9) AS gh9_min, max(gh9) AS gh9_max"
              " FROM gh GROUP BY 1"
            % (_geohash.geohash_sql("lon", "lat", 2),
               _geohash.geohash_sql("lon", "lat", 9))
        ),
        "kmv_overlap": kmv_overlap_sql,
        "distinct_rollup": distinct_rollup_sql,
        "hh_sketch": (
            "WITH c AS (SELECT lang, source AS key, COUNT(*) AS est "
            "FROM documents GROUP BY 1, 2) "
            "SELECT * FROM (SELECT lang, key, est, est AS lo, est AS hi, "
            "CAST(row_number() OVER (PARTITION BY lang "
            "ORDER BY est DESC, key ASC) AS INTEGER) AS rank FROM c) "
            "WHERE rank <= 5"
        ),
        "radius_pairs": radius_pairs_sql,
        "url_features": url_features_sql,
        "pii_scan": pii_scan_sql,
        "repetition": repetition_sql,
        "pack_docs": pack_docs_sql,
        "curate_pipeline": curate_pipeline_sql,
        "tfidf_terms": tfidf_sql,
        "weighted_sample": weighted_sample_sql,
        "domain_quota": domain_quota_sql,
        "decontaminate": decontaminate_sql,
        "doc_sample": doc_sample_sql,
        "top_sources": top_sources_sql,
        "events_quantiles": events_quantiles_sql,
        "events_funnel": events_funnel_sql,
        "funnel_counts": (
            "WITH f AS (%s), "
            "s AS (SELECT unnest(range(1, reached + 1)) AS stage "
            "FROM f WHERE reached >= 1) "
            "SELECT CAST(stage AS INTEGER) AS stage, "
            "COUNT(*) AS n_users FROM s GROUP BY stage"
            % events_funnel_sql
        ),
        "pack_efficiency": (
            "WITH RECURSIVE s AS (SELECT source, doc_id, "
            "CAST(COALESCE(%s, 0) AS INTEGER) AS n_tokens, "
            "CAST(row_number() OVER (PARTITION BY source "
            "ORDER BY doc_id) AS BIGINT) AS rn FROM documents), "
            "r AS ("
            "SELECT source, doc_id, n_tokens, rn, CAST(0 AS BIGINT) "
            "AS pack_id, n_tokens AS fill FROM s WHERE rn = 1 "
            "UNION ALL "
            "SELECT s.source, s.doc_id, s.n_tokens, s.rn, "
            "CASE WHEN r.fill + s.n_tokens > 96 THEN r.pack_id + 1 "
            "ELSE r.pack_id END, "
            "CASE WHEN r.fill + s.n_tokens > 96 THEN s.n_tokens "
            "ELSE r.fill + s.n_tokens END "
            "FROM r JOIN s ON s.source = r.source AND "
            "s.rn = r.rn + 1), "
            "pb AS (SELECT source, pack_id, "
            "CAST(SUM(n_tokens) AS BIGINT) AS fill FROM r "
            "GROUP BY source, pack_id) "
            "SELECT source, COUNT(*) AS n_bins, "
            "CAST(SUM(fill) AS BIGINT) AS n_tokens, "
            "CAST(SUM(fill) AS DOUBLE) / "
            "CAST(COUNT(*) * 96 AS DOUBLE) AS fill_fraction "
            "FROM pb GROUP BY source"
            % T.token_count_sql("text")
        ),
        "events_cohort": (
            "WITH f AS (SELECT user_id, ts, "
            "min(ts) OVER (PARTITION BY user_id) AS first_ts "
            "FROM events), "
            "c AS (SELECT user_id, date_trunc('week', first_ts) AS "
            "cohort, CAST(floor(datediff('day', "
            "date_trunc('week', first_ts), date_trunc('week', ts)) "
            "/ 7.0) AS INTEGER) AS \"offset\" FROM f) "
            "SELECT cohort, \"offset\", count(DISTINCT user_id) "
            "AS n_users FROM c GROUP BY cohort, \"offset\""
        ),
        "value_histogram": (
            "SELECT event_type, "
            "CAST(floor(value / 25.0) AS INTEGER) AS bin, "
            "COUNT(*) AS n, min(value) AS vmin, max(value) AS vmax "
            "FROM events GROUP BY event_type, bin"
        ),
        "time_rollup": (
            "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
            "event_type, COUNT(*) AS n_events, "
            "CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS sum_cents "
            "FROM events GROUP BY 1, 2"
        ),
        "quantile_sketch": (
            "WITH g AS (SELECT event_type, list_sort(list(value)) AS vs "
            "FROM events GROUP BY event_type), "
            "q AS (SELECT CAST(unnest([0.1, 0.5, 0.9, 0.99]) AS DOUBLE) "
            "AS q) "
            "SELECT event_type, q, "
            "vs[CAST(greatest(ceil(q * len(vs)), 1) AS BIGINT)] AS est "
            "FROM g CROSS JOIN q"
        ),
        "events_sessions": events_sessions_sql,
        "events_rollup": events_rollup_sql,
        "events_json": events_json_sql,
        "bpe_tokens": bpe_tokens_sql,
        "wkt_roundtrip": wkt_roundtrip_sql,
        "jaccard_pairs": jaccard_pairs_sql,
        "minhash_pairs": minhash_pairs_sql,
        "simhash_pairs": simhash_pairs_sql,
        "embedding_near_dup": embedding_near_dup_sql,
        "geojson_lines": _geojson_lines_sql(),
        # tile_mvt: closed-form MVT quantization. Scale constants are
        # written as the same float expressions the kernel evaluates
        # (res-5 cell extents 11.25 / 5.625 are exact binary fractions,
        # so x1-x0 == 11.25 exactly and the division+multiply order
        # matches encode_mvt_points bit for bit).
        "tile_mvt": (
            PTS_CTE + ", "
            "q AS (SELECT doc_id, lon, lat, "
            "least(greatest(CAST(floor((lon + 180.0) / 360.0 * 32) "
            "AS BIGINT), 0), 31) AS tx, "
            "least(greatest(CAST(floor((lat + 90.0) / 180.0 * 32) "
            "AS BIGINT), 0), 31) AS ty FROM pts), "
            "px AS (SELECT doc_id, "
            "(5 * 288230376151711744 + tx * 536870912 + ty) AS tile_id, "
            "least(greatest(CAST(floor("
            "(lon - (-180.0 + tx * 11.25)) / 11.25 * 4096.0"
            ") AS BIGINT), 0), 4096) AS u, "
            "least(greatest(CAST(floor("
            "((-90.0 + (ty + 1) * 5.625) - lat) / 5.625 * 4096.0"
            ") AS BIGINT), 0), 4096) AS v FROM q) "
            "SELECT tile_id, CAST(COUNT(*) AS INTEGER) AS n_features, "
            "CAST(SUM(u) AS BIGINT) AS sum_px, "
            "CAST(SUM(v) AS BIGINT) AS sum_py, "
            "CAST(SUM(doc_id) AS BIGINT) AS sum_ids "
            "FROM px GROUP BY tile_id"
        ),
        # image_phash: closed-form recompute of the planted 63-bit
        # hash (exact small product, no wrap on either engine) and the
        # exact all-pairs Hamming filter
        "image_phash": (
            "WITH d AS (SELECT doc_id, "
            "(doc_id // 4) * 81205437596873861 AS base, "
            "CAST(CASE WHEN doc_id % 4 = 3 THEN 4 ELSE doc_id % 4 END "
            "AS BIGINT) AS noise "
            "FROM documents WHERE doc_id < 400), "
            "h AS (SELECT doc_id, xor(base, noise) AS h FROM d) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS hamming, "
            "a.h AS ph_a "
            "FROM h a, h b WHERE a.doc_id < b.doc_id "
            "AND bit_count(xor(a.h, b.h)) <= 3"
        ),
        # line_dedup: explode lines with ordinality, distinct-doc line
        # census, NOT IN the hot set, ordered string_agg reassembly
        "line_dedup": (
            "WITH d AS (SELECT doc_id, text || chr(10) || "
            "CASE WHEN doc_id % 2 = 0 "
            "THEN 'standard footer boilerplate' "
            "ELSE 'tail-' || CAST(doc_id AS VARCHAR) END AS text "
            "FROM documents WHERE doc_id < 300), "
            "l AS (SELECT doc_id, unnest(arr) AS line, "
            "generate_subscripts(arr, 1) AS i "
            "FROM (SELECT doc_id, string_split(text, chr(10)) AS arr "
            "FROM d)), "
            "hot AS (SELECT line FROM "
            "(SELECT DISTINCT doc_id, line FROM l) "
            "GROUP BY line HAVING COUNT(*) >= 3 "
            "AND trim(line) <> ''), "  # blank lines are structure
            "kept AS (SELECT doc_id, line, i FROM l "
            "WHERE line NOT IN (SELECT line FROM hot)), "
            "reb AS (SELECT doc_id, "
            "string_agg(line, chr(10) ORDER BY i) AS clean_text, "
            "COUNT(*) AS nk FROM kept GROUP BY doc_id) "
            "SELECT d2.doc_id, "
            "COALESCE(reb.clean_text, '') AS clean_text, "
            "CAST(len(string_split(d2.text, chr(10))) AS INTEGER) "
            "AS n_lines, "
            "CAST(len(string_split(d2.text, chr(10))) "
            "- COALESCE(reb.nk, 0) AS INTEGER) AS n_removed "
            "FROM d d2 LEFT JOIN reb ON d2.doc_id = reb.doc_id"
        ),
        # span_dedup: token-8-gram census over distinct docs (same md5
        # keys as Spark), coverage explode, anti join, ordered rebuild
        "span_dedup": (
            "WITH d AS (SELECT doc_id, text || ' ' || "
            "CASE WHEN doc_id % 3 = 0 THEN "
            "'all rights reserved this document is provided as is "
            "without warranty of any kind either express or implied' "
            "ELSE 'tail marker ' || CAST(doc_id AS VARCHAR) END "
            "AS text FROM documents WHERE doc_id < 300), "
            "t AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS toks "
            "FROM d), "
            "g AS (SELECT doc_id, u.j AS j, u.h AS h FROM "
            "(SELECT doc_id, unnest([{'j': j, 'h': "
            "md5(array_to_string(toks[j:j+7], ' '))} "
            "for j in range(1, len(toks) - 6)]) AS u "
            "FROM t WHERE len(toks) >= 8)), "
            "hot AS (SELECT h FROM "
            "(SELECT DISTINCT doc_id, h FROM g) "
            "GROUP BY h HAVING COUNT(*) >= 3), "
            "cov AS (SELECT DISTINCT doc_id, pos FROM "
            "(SELECT g.doc_id, unnest([g.j + k for k in "
            "range(0, 8)]) AS pos FROM g JOIN hot USING (h))), "
            "tok AS (SELECT doc_id, "
            "generate_subscripts(toks, 1) AS pos, "
            "unnest(toks) AS tk FROM t), "
            "kept AS (SELECT tok.doc_id, pos, tk FROM tok "
            "ANTI JOIN cov USING (doc_id, pos)), "
            "reb AS (SELECT doc_id, "
            "string_agg(tk, ' ' ORDER BY pos) AS clean_text, "
            "COUNT(*) AS nk FROM kept GROUP BY doc_id) "
            "SELECT t.doc_id, "
            "CASE WHEN len(t.toks) = COALESCE(reb.nk, 0) "
            "THEN d.text "  # nothing removed: original text untouched
            "ELSE COALESCE(reb.clean_text, '') END AS clean_text, "
            "CAST(len(t.toks) AS INTEGER) AS n_tokens, "
            "CAST(len(t.toks) - COALESCE(reb.nk, 0) AS INTEGER) "
            "AS n_removed "
            "FROM t LEFT JOIN reb ON t.doc_id = reb.doc_id "
            "JOIN d ON t.doc_id = d.doc_id"
        ),
        # lm_perplexity: trigram counts over the reference split,
        # Laplace costs in integer milli-nats, BIGINT sums
        "lm_perplexity": (
            "WITH normed AS (SELECT doc_id, '##' || regexp_replace("
            "regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), "
            "' +', ' ', 'g') AS p FROM documents), "
            "refg AS (SELECT unnest([substring(p, CAST(i AS INT), 3) "
            "for i in range(1, len(p) - 1)]) AS gram "
            "FROM normed WHERE doc_id >= 300), "
            "c3 AS (SELECT gram, COUNT(*) AS c_gram FROM refg "
            "GROUP BY gram), "
            "c2 AS (SELECT substring(gram, 1, 2) AS ctx, "
            "SUM(c_gram) AS c_ctx FROM c3 GROUP BY 1), "
            "model AS (SELECT gram, c_gram, c_ctx FROM c3 "
            "JOIN c2 ON substring(c3.gram, 1, 2) = c2.ctx), "
            "dg AS (SELECT doc_id, gram, COUNT(*) AS occ FROM "
            "(SELECT doc_id, unnest([substring(p, CAST(i AS INT), 3) "
            "for i in range(1, len(p) - 1)]) AS gram "
            "FROM normed WHERE doc_id < 200) GROUP BY doc_id, gram), "
            "scored AS (SELECT doc_id, "
            "CAST(SUM(occ) AS INTEGER) AS n_grams, "
            "CAST(SUM(CAST(round(-ln("
            "(CAST(COALESCE(c_gram, 0) AS DOUBLE) + 1.0) / "
            "(CAST(COALESCE(c_ctx, 0) AS DOUBLE) + 38.0)"
            ") * 1000000.0) AS BIGINT) * occ) AS BIGINT) "
            "AS cost_milli, "
            "CAST(SUM(CASE WHEN c_gram IS NULL THEN occ ELSE 0 END) "
            "AS INTEGER) AS n_oov "
            "FROM dg LEFT JOIN model USING (gram) GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(s.n_grams, 0) AS INTEGER) AS n_grams, "
            "CAST(COALESCE(s.cost_milli, 0) AS BIGINT) AS cost_milli, "
            "CAST(COALESCE(s.n_oov, 0) AS INTEGER) AS n_oov "
            "FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d "
            "LEFT JOIN scored s ON d.doc_id = s.doc_id"
        ),
        # doc_chunks: tokenize, chunk-count arithmetic (stride 32 =
        # 40 - 8 overlap), list_slice per chunk index
        "doc_chunks": (
            "WITH t AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS toks "
            "FROM documents WHERE doc_id < 300), "
            "c AS (SELECT doc_id, toks, CASE WHEN len(toks) <= 40 "
            "THEN 1 ELSE CAST(ceil((len(toks) - 40) / 32.0) AS INT) "
            "+ 1 END AS nc FROM t), "
            "e AS (SELECT doc_id, toks, unnest(range(0, nc)) "
            "AS chunk_idx FROM c) "
            "SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, "
            "array_to_string(list_slice(toks, chunk_idx * 32 + 1, "
            "chunk_idx * 32 + 40), ' ') AS chunk_text, "
            "CAST(len(list_slice(toks, chunk_idx * 32 + 1, "
            "chunk_idx * 32 + 40)) AS INTEGER) AS n_tokens FROM e"
        ),
        # mixture_sample: per-language quotas (0.5/0.2/default 0.1 of
        # 200) by the shared hash rank
        "mixture_sample": (
            "WITH r AS (SELECT doc_id, lang, row_number() OVER ("
            "PARTITION BY lang ORDER BY %s ASC, doc_id ASC) AS rn "
            "FROM documents) "
            "SELECT doc_id, lang FROM r WHERE rn <= "
            "CASE lang WHEN 'de' THEN 40 WHEN 'en' THEN 100 "
            "ELSE 20 END"
            % kmv_hash_sql("CAST(doc_id AS VARCHAR)")
        ),
    }


def oracle_sql() -> dict[str, str]:
    return {
        k: v
        for k, v in _all_oracle_sql().items()
        if k not in _FOLDED_QUERIES
    }


def extra_oracle_sql() -> dict[str, str]:
    """Oracle twins for the folded queries (local parity gate only)."""
    return {
        k: v for k, v in _all_oracle_sql().items() if k in _FOLDED_QUERIES
    }
