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


def test_range_join_matches_python_oracle(spark):
    """Bucketed interval join vs brute-force oracle: inclusive bounds,
    intervals spanning multiple buckets, per-key isolation, no dup
    pairs."""
    import datetime

    from pure_python_geospatial_export_spark.operators.asof import (
        range_join,
    )

    t0 = datetime.datetime(2026, 1, 1)

    def ts(minute):
        return t0 + datetime.timedelta(minutes=minute)

    rng_rows = [
        # (iv_id, key, start_min, end_min) — spans 1..4 buckets at 900s
        (1, "u", 0, 15),
        (2, "u", 10, 70),
        (3, "u", 100, 100),   # degenerate point interval
        (4, "v", 0, 60),
    ]
    left_rows = [
        (i, k, m) for i, (k, m) in enumerate(
            [("u", m) for m in (0, 5, 15, 16, 40, 70, 71, 100, 101)]
            + [("v", m) for m in (30, 61)]
        )
    ]
    right = spark.createDataFrame(
        [(i, k, ts(s), ts(e)) for i, k, s, e in rng_rows],
        "iv_id long, key string, start_ts timestamp, end_ts timestamp",
    )
    left = spark.createDataFrame(
        [(i, k, ts(m)) for i, k, m in left_rows],
        "lid long, key string, ts timestamp",
    )
    got = sorted(
        (int(r["lid"]), int(r["iv_id"]))
        for r in range_join(left, right, key="key",
                            bucket_seconds=900).collect()
    )
    exact = sorted(
        (li, ri)
        for li, lk, lm in left_rows
        for ri, rk, s, e in rng_rows
        if lk == rk and s <= lm <= e
    )
    assert got == exact
    assert len(got) == len(set(got))  # no duplicate pairs


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
