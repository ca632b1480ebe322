"""Bucketed tables: co-located joins plan with NO Exchange."""

import contextlib
import io

from pyspark.sql import functions as F

from pure_python_geospatial_export_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark):
    a = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("feat_a"),
    )
    b = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 11).alias("feat_b"),
    )
    write_bucketed(a, "bkt_a", "doc_id", n_buckets=8,
                   sort_cols=["doc_id"])
    write_bucketed(b, "bkt_b", "doc_id", n_buckets=8,
                   sort_cols=["doc_id"])

    ta = read_bucketed(spark, "bkt_a")
    tb = read_bucketed(spark, "bkt_b")

    # at test size the planner would broadcast (which bypasses bucketing
    # entirely); force the sort-merge path big tables take at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "doc_id")
        plan = _plan_str(joined)
        assert "Exchange" not in plan, plan  # the point of bucketing
        assert "SortMergeJoin" in plan
        assert joined.count() == 20000
        row = joined.where(F.col("doc_id") == 123).first()
        assert row["feat_a"] == 123 % 7 and row["feat_b"] == 123 % 11

        # aggregation on the bucket key is shuffle-free too
        agg = ta.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        assert "Exchange" not in _plan_str(agg)

        # control: the same join on NON-bucketed frames does shuffle
        control = _plan_str(a.join(b, "doc_id"))
        assert "Exchange" in control
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
