"""As-of join semantics — row-atomicity of the matched right row.

DuckDB ASOF JOIN attaches the single latest right row; every right
attribute must come from THAT row, including its nulls. A per-column
last(..., ignorenulls) carry would backfill a null attribute from an
older row — this file pins the struct-carry fix.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from pure_python_geospatial_export_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_row_atomic_nulls(spark):
    right_schema = Ty.StructType([
        Ty.StructField("k", Ty.StringType()),
        Ty.StructField("ts", Ty.LongType()),
        Ty.StructField("a", Ty.LongType()),
        Ty.StructField("b", Ty.StringType()),
    ])
    right = _mk(spark, [
        ("u", 1, 100, "old"),
        ("u", 2, None, "new"),   # latest row has a NULL attribute
    ], right_schema)
    left_schema = Ty.StructType([
        Ty.StructField("k", Ty.StringType()),
        Ty.StructField("ts", Ty.LongType()),
        Ty.StructField("lid", Ty.LongType()),
    ])
    left = _mk(spark, [("u", 3, 1)], left_schema)

    out = asof_join(left, right, key="k").collect()
    assert len(out) == 1
    row = out[0].asDict()
    # both attributes from the SAME latest row (ts=2): a stays NULL
    assert row["asof_a"] is None
    assert row["asof_b"] == "new"


def test_asof_no_match_and_tie(spark):
    right_schema = Ty.StructType([
        Ty.StructField("k", Ty.StringType()),
        Ty.StructField("ts", Ty.LongType()),
        Ty.StructField("a", Ty.LongType()),
    ])
    right = _mk(spark, [("u", 5, 50)], right_schema)
    left_schema = Ty.StructType([
        Ty.StructField("k", Ty.StringType()),
        Ty.StructField("ts", Ty.LongType()),
        Ty.StructField("lid", Ty.LongType()),
    ])
    left = _mk(spark, [
        ("u", 4, 1),   # before any right row -> nulls
        ("u", 5, 2),   # exact tie -> matches (ts_right <= ts_left)
        ("v", 9, 3),   # key with no right rows -> nulls
    ], left_schema)

    rows = {r["lid"]: r.asDict() for r in asof_join(
        left, right, key="k").collect()}
    assert rows[1]["asof_a"] is None
    assert rows[2]["asof_a"] == 50
    assert rows[3]["asof_a"] is None


def test_asof_picks_latest_per_left_row(spark):
    right_schema = Ty.StructType([
        Ty.StructField("k", Ty.StringType()),
        Ty.StructField("ts", Ty.LongType()),
        Ty.StructField("a", Ty.LongType()),
    ])
    right = _mk(spark, [("u", t, t * 10) for t in (1, 3, 7)], right_schema)
    left_schema = Ty.StructType([
        Ty.StructField("k", Ty.StringType()),
        Ty.StructField("ts", Ty.LongType()),
        Ty.StructField("lid", Ty.LongType()),
    ])
    left = _mk(spark, [("u", t, t) for t in (2, 4, 6, 8)], left_schema)

    got = {
        r["lid"]: r["asof_a"]
        for r in asof_join(left, right, key="k").collect()
    }
    assert got == {2: 10, 4: 30, 6: 30, 8: 70}
