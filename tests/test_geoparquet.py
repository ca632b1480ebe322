"""GeoParquet export/import (sources/geoparquet.py): WKB geometry
column + spec footer metadata, written executor-side, round-tripping
through the engine's own byte-exact codecs."""

import json

import pyarrow.parquet as pq

from pure_python_geospatial_export_spark.geo import wkt as wktmod
from pure_python_geospatial_export_spark.session import local_df
from pure_python_geospatial_export_spark.sources.geoparquet import (
    export_geoparquet,
    read_geo_metadata,
    read_geoparquet,
)

ROWS = [
    (1, "alpha", "POINT (10 20)"),
    (2, "beta", "LINESTRING (0 0, 5 5, 10 0)"),
    (3, "gamma",
     "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 2 2))"),
    (4, "delta", "POINT (-170.5 -33.25)"),
]


def _export(spark, tmp_path, rows=ROWS):
    df = local_df(spark, rows, ["fid", "label", "wkt"])
    out = str(tmp_path / "gpq")
    stats = export_geoparquet(df, out).collect()
    return df, out, stats


def test_export_metadata_and_roundtrip(spark, tmp_path):
    df, out, stats = _export(spark, tmp_path)
    assert sum(r["n_rows"] for r in stats) == 4
    assert sum(r["n_geoms"] for r in stats) == 4

    metas = read_geo_metadata(out)
    assert metas, "every written file must carry the geo footer key"
    seen_types = set()
    for meta in metas.values():
        assert meta["version"] == "1.0.0"
        assert meta["primary_column"] == "geometry"
        gcol = meta["columns"]["geometry"]
        assert gcol["encoding"] == "WKB"
        assert gcol["crs"]["id"] == {"authority": "EPSG", "code": 4326}
        x0, y0, x1, y1 = gcol["bbox"]
        assert -180 <= x0 <= x1 <= 180 and -90 <= y0 <= y1 <= 90
        seen_types |= set(gcol["geometry_types"])
    assert seen_types == {"Point", "LineString", "Polygon"}

    # global bbox across files covers the fixture extent exactly
    xs0 = min(m["columns"]["geometry"]["bbox"][0]
              for m in metas.values())
    ys0 = min(m["columns"]["geometry"]["bbox"][1]
              for m in metas.values())
    xs1 = max(m["columns"]["geometry"]["bbox"][2]
              for m in metas.values())
    ys1 = max(m["columns"]["geometry"]["bbox"][3]
              for m in metas.values())
    assert (xs0, ys0, xs1, ys1) == (-170.5, -33.25, 10.0, 20.0)

    # read back: attributes intact, geometry decodes to the same shape
    back = {
        r["fid"]: (r["label"], r["wkt"])
        for r in read_geoparquet(spark, out).collect()
    }
    for fid, label, w in ROWS:
        assert back[fid][0] == label
        assert wktmod.loads(back[fid][1]) == wktmod.loads(w), fid


def test_malformed_wkt_yields_null_geometry(spark, tmp_path):
    rows = ROWS + [(5, "bad", "POLYGON ((not a ring")]
    df, out, stats = _export(spark, tmp_path, rows)
    assert sum(r["n_rows"] for r in stats) == 5
    assert sum(r["n_geoms"] for r in stats) == 4
    back = {r["fid"]: r["wkt"]
            for r in read_geoparquet(spark, out).collect()}
    assert back[5] is None
    assert back[1] is not None
    # types metadata excludes the failed row's nothing
    for meta in read_geo_metadata(out).values():
        assert "bad" not in json.dumps(meta)


def test_wkb_bytes_parse_with_plain_parquet_readers(spark, tmp_path):
    """The geometry column is ordinary WKB binary any parquet stack
    can read — check via raw pyarrow + our codec, no Spark reader."""
    from pure_python_geospatial_export_spark.geo import wkb as wkbmod

    _df, out, _stats = _export(spark, tmp_path)
    import os

    seen = 0
    for name in os.listdir(out):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(out, name))
        for fid, buf in zip(t["fid"].to_pylist(),
                            t["geometry"].to_pylist()):
            geom = wkbmod.loads(bytes(buf))
            want = wktmod.loads(dict(ROWS_BY_ID)[fid])
            assert geom == want
            seen += 1
    assert seen == 4


ROWS_BY_ID = [(r[0], r[2]) for r in ROWS]


def test_sql_registered_functions(spark):
    """register_sql_functions exposes the codec kernels to plain SQL;
    results equal the column-API twins and plans stay Arrow-batched."""
    from pure_python_geospatial_export_spark.functions.sql_registry import (
        register_sql_functions,
    )

    names = register_sql_functions(spark)
    assert set(names) == {
        "ppge_wkt_norm", "ppge_geom_type", "ppge_wkt_to_wkb",
        "ppge_wkb_to_wkt", "ppge_nfc", "ppge_geohash",
        "ppge_geohash_center",
    }
    df = local_df(spark, ROWS, ["fid", "label", "wkt"])
    df.createOrReplaceTempView("layer_v")
    out = spark.sql(
        "SELECT fid, ppge_geom_type(wkt) AS t, "
        "ppge_wkb_to_wkt(ppge_wkt_to_wkb(wkt)) AS rt, "
        "ppge_wkt_norm(wkt) AS norm, "
        "ppge_nfc('e\u0301') AS nfc "  # e + combining acute
        "FROM layer_v"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, plan  # Arrow only
    rows = {r["fid"]: r for r in out.collect()}
    for fid, _label, w in ROWS:
        g = wktmod.loads(w)
        assert rows[fid]["t"] == g["type"]
        assert wktmod.loads(rows[fid]["rt"]) == g
        assert rows[fid]["norm"] == wktmod.dumps(g, 16)
        assert rows[fid]["nfc"] == "é"
    # malformed input -> NULL through SQL too
    bad = spark.sql(
        "SELECT ppge_geom_type('POINT(nope') AS t"
    ).collect()[0]["t"]
    assert bad is None


def test_geometrycollection_no_misalignment(spark, tmp_path):
    """Regression: a GeometryCollection row once double-appended its
    WKB (bounds computed after the append), shifting every later row's
    geometry. GC now exports with proper bounds and alignment."""
    rows = [
        (1, "gc", "GEOMETRYCOLLECTION (POINT (5 6))"),
        (2, "p2", "POINT (1 2)"),
        (3, "p3", "POINT (3 4)"),
    ]
    df, out, stats = _export(spark, tmp_path, rows)
    assert sum(r["n_rows"] for r in stats) == 3
    assert sum(r["n_geoms"] for r in stats) == 3
    back = {r["fid"]: r["wkt"]
            for r in read_geoparquet(spark, out).collect()}
    assert set(back) == {1, 2, 3}
    assert wktmod.loads(back[2]) == wktmod.loads("POINT (1 2)")
    assert wktmod.loads(back[3]) == wktmod.loads("POINT (3 4)")
    assert wktmod.loads(back[1])["type"] == "GeometryCollection"
    # bbox includes the GC member; footer JSON stays finite
    for meta in read_geo_metadata(out).values():
        bb = meta["columns"]["geometry"]["bbox"]
        assert all(abs(v) < 1e6 for v in bb)
        assert json.dumps(meta)  # strictly serializable


def test_all_malformed_partition_stays_readable(spark, tmp_path):
    """Regression: an all-NULL geometry partition once wrote a
    null-typed column, crashing reads against binary-typed files."""
    rows = [(i, "bad%d" % i, "POLYGON ((oops") for i in range(6)]
    rows += [(100, "ok", "POINT (1 1)")]
    df = local_df(spark, rows, ["fid", "label", "wkt"]).repartition(4)
    out = str(tmp_path / "gpq_nulls")
    stats = export_geoparquet(df, out).collect()
    assert sum(r["n_geoms"] for r in stats) == 1
    back = {r["fid"]: r["wkt"]
            for r in read_geoparquet(spark, out).collect()}
    assert len(back) == 7
    assert back[100] is not None
    assert all(back[i] is None for i in range(6))


def test_passthrough_columns_keep_declared_types(spark, tmp_path):
    """Regression (round-5 advice): pass-through Arrow arrays were
    built with per-batch type inference, so (a) a batch whose string
    column was all-NULL inferred type 'null' and pa.concat_tables
    raised on mixed batches, and (b) a nullable long column — which
    pandas widens to float64 — silently exported as parquet DOUBLE.
    Arrays now carry explicit types derived from df.schema."""
    from pyspark.sql.types import LongType as _Long
    from pyspark.sql.types import StringType as _Str
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST

    schema = _ST([
        _SF("fid", _Long(), False),
        _SF("label", _Str(), True),
        _SF("score", _Long(), True),
        _SF("wkt", _Str(), True),
    ])
    # small maxRecordsPerBatch would also surface the mixed-batch
    # concat crash; one partition with NULL-only label rows plus one
    # with values exercises it across files regardless
    rows = [
        (1, None, None, "POINT (0 0)"),
        (2, None, 7, "POINT (1 1)"),
        (3, "tag", None, "POINT (2 2)"),
        (4, "tag", 9, "POINT (3 3)"),
    ]
    df = spark.createDataFrame(rows, schema).repartition(2)
    out = str(tmp_path / "gpq_types")
    export_geoparquet(df, out).collect()

    import os
    for name in os.listdir(out):
        if not name.endswith(".parquet"):
            continue
        sch = pq.read_schema(os.path.join(out, name))
        assert str(sch.field("fid").type) == "int64", name
        assert str(sch.field("label").type) in ("string", "large_string")
        # the NULL-bearing long column must NOT drift to double
        assert str(sch.field("score").type) == "int64", name
    back = {r["fid"]: (r["label"], r["score"])
            for r in read_geoparquet(spark, out).collect()}
    assert back == {1: (None, None), 2: (None, 7),
                    3: ("tag", None), 4: ("tag", 9)}


def test_export_rerun_is_idempotent(spark, tmp_path):
    """Regression: uuid filenames duplicated rows on re-execution;
    partition-id names + atomic replace overwrite instead."""
    df = local_df(spark, ROWS, ["fid", "label", "wkt"])
    out = str(tmp_path / "gpq_rerun")
    writer = export_geoparquet(df, out)
    writer.collect()
    writer.collect()  # second action re-runs the write
    export_geoparquet(df, out).collect()  # fresh plan, same output
    back = [r["fid"] for r in read_geoparquet(spark, out).collect()]
    assert sorted(back) == [1, 2, 3, 4]


def test_geometry_column_collision_raises(spark):
    import pytest

    df = local_df(spark, [(1, b"x", "POINT (0 0)")],
                  ["fid", "geometry", "wkt"])
    with pytest.raises(ValueError, match="already exists"):
        export_geoparquet(df, "/tmp/never")


def test_mixture_sample_validation_and_half_up(spark):
    import pytest

    from pure_python_geospatial_export_spark.operators.curate import (
        mixture_sample,
    )

    df = local_df(spark, [(i, ("a", "b")[i % 2]) for i in range(40)],
                  ["doc_id", "grp"])
    with pytest.raises(ValueError, match="target_fracs"):
        mixture_sample(df, "grp", "doc_id", {"a": -0.3}, total=10)
    # half-up: .5/.5 of 5 -> 3+3, not banker's 2+2
    kept = mixture_sample(
        df, "grp", "doc_id", {"a": 0.5, "b": 0.5}, total=5
    )
    counts = {}
    for r in kept.collect():
        counts[r["grp"]] = counts.get(r["grp"], 0) + 1
    assert counts == {"a": 3, "b": 3}
