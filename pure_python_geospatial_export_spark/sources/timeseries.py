"""Hypertable-style time-chunked events layout + continuous aggregates.

The time-dimension sibling of the spatial layout (sources/layout.py):

* :func:`write_events_table` — events land partitioned by day chunk
  (``part_day=yyyy-MM-dd`` directories) and ts-sorted within files, so
  time-range predicates become partition pruning plus row-group min/max
  pruning, exactly like cells/Morton do for space. At 100 TB of events
  this is the difference between scanning years and scanning the
  queried days' files.
* :func:`read_time_range` — pruned range scan (string-ordered day
  partitions + exact ts residual filter).
* :func:`write_rollup` / :func:`serve_rollup` — the continuous
  aggregate: a per-(day, dims) rollup table is precomputed once, and a
  serving query answers "aggregate over [t0, now)" as
  precomputed-chunks UNION fresh-tail-recompute, the standard
  hypertable pattern — the raw scan is bounded by the tail, not the
  range. ``serve_rollup`` output is bit-equal to a flat recompute by
  construction (same column arithmetic on both branches), pinned by the
  equality test and the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY_FMT = "yyyy-MM-dd"


def _day_col(ts_col: str):
    return F.date_format(F.col(ts_col), DAY_FMT)


def write_events_table(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Write day-partitioned, ts-sorted events."""
    out = (
        df.withColumn("part_day", _day_col(ts_col))
        .repartition("part_day")
        # partition column first: the partitioned-write path re-sorts by
        # partition key when unsatisfied, and that sort need not be
        # stable (same rule as the spatial layout writer)
        .sortWithinPartitions("part_day", ts_col)
    )
    out.write.mode(mode).partitionBy("part_day").parquet(path)


def read_time_range(
    spark: SparkSession,
    path: str,
    start: str,
    end: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Rows with ``start <= ts < end`` (timestamp strings). Day
    partitions prune first (yyyy-MM-dd compares lexicographically), the
    exact ts predicate cleans up the boundary chunks; within surviving
    files the ts sort makes row-group stats prune sub-day ranges."""
    df = spark.read.parquet(path)
    return df.where(
        (F.col("part_day") >= F.lit(str(start)[:10]))
        & (F.col("part_day") <= F.lit(str(end)[:10]))
        & (F.col(ts_col) >= F.lit(start).cast("timestamp"))
        & (F.col(ts_col) < F.lit(end).cast("timestamp"))
    )


def _rollup_agg(df: DataFrame, dims, ts_col: str) -> DataFrame:
    return (
        df.withColumn("day", F.date_trunc("day", F.col(ts_col))
                      .cast("date"))
        .groupBy("day", *dims)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer cents: double sums are float-order-dependent and
            # would break both the rollup==flat equality and the oracle
            F.sum(
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                .cast("long")
            ).alias("sum_cents"),
        )
    )


def write_rollup(
    spark: SparkSession,
    events_path: str,
    rollup_path: str,
    dims=("event_type",),
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Precompute the per-(day, dims) continuous aggregate from a
    chunked events table. Day-partitioned so :func:`serve_rollup`'s
    precomputed branch prunes the same way the raw table does."""
    ev = spark.read.parquet(events_path)
    roll = _rollup_agg(ev, list(dims), ts_col).withColumn(
        "part_day", F.date_format(F.col("day"), DAY_FMT)
    )
    roll.write.mode(mode).partitionBy("part_day").parquet(rollup_path)


def _distinct_regs(df: DataFrame, dims, distinct_col: str, p: int,
                   ts_col: str) -> DataFrame:
    from ..operators.sketch import hll_sketch

    src = df.withColumn(
        "day", F.date_trunc("day", F.col(ts_col)).cast("date")
    ).withColumn("_dv", F.col(distinct_col).cast("string"))
    return hll_sketch(src, ["day"] + list(dims), "_dv", p=p)


def write_distinct_rollup(
    spark: SparkSession,
    events_path: str,
    rollup_path: str,
    dims=("event_type",),
    distinct_col: str = "user_id",
    p: int = 10,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Continuous aggregate for DISTINCT counts — the aggregate plain
    rollups cannot provide, because per-day distinct counts don't add
    across days. Precomputes a per-(day, dims) HyperLogLog register
    relation (``operators/sketch.hll_sketch``): registers merge by max
    across any day range, so one pass over each day's raw events is
    enough forever after. Day-partitioned like :func:`write_rollup` so
    the serving read prunes identically. State per (day, dims) group
    is <= 2^p rows."""
    ev = spark.read.parquet(events_path)
    regs = _distinct_regs(ev, list(dims), distinct_col, p, ts_col)
    out = regs.withColumn(
        "part_day", F.date_format(F.col("day"), DAY_FMT)
    )
    out.write.mode(mode).partitionBy("part_day").parquet(rollup_path)


def serve_distinct_rollup(
    spark: SparkSession,
    events_path: str,
    rollup_path: str,
    cutoff_day: str,
    dims=("event_type",),
    distinct_col: str = "user_id",
    p: int = 10,
    ts_col: str = "ts",
    correction: bool = True,
) -> DataFrame:
    """Distinct-count estimates over the WHOLE table as
    precomputed-registers-before-cutoff UNION tail-recomputed
    registers, merged per ``dims``: (dims..., zeros, harmonic, est).

    Register-wise max is lossless, so the result is bit-equal to a
    flat ``hll_sketch`` + ``hll_estimate`` over all raw events — the
    same chunk/tail-seam guarantee :func:`serve_rollup` gives for
    additive aggregates, extended to the non-additive one. The raw
    scan is bounded by the tail window."""
    from ..operators.sketch import hll_estimate, hll_merge

    dims = list(dims)
    pre = (
        spark.read.parquet(rollup_path)
        .where(F.col("part_day") < F.lit(cutoff_day))
        .select("day", *dims, "bucket", "reg")
    )
    tail_raw = spark.read.parquet(events_path).where(
        F.col("part_day") >= F.lit(cutoff_day)
    )
    tail = _distinct_regs(tail_raw, dims, distinct_col, p, ts_col)
    merged = hll_merge(pre.unionByName(tail), dims)
    return hll_estimate(merged, dims, p=p, correction=correction)


def serve_rollup(
    spark: SparkSession,
    events_path: str,
    rollup_path: str,
    cutoff_day: str,
    dims=("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Continuous-aggregate read: precomputed chunks strictly before
    ``cutoff_day`` (yyyy-MM-dd) unioned with a fresh recompute of the
    raw tail from the cutoff on. Equal to a flat recompute over
    everything; the raw scan is bounded by the tail window."""
    dims = list(dims)
    pre = (
        spark.read.parquet(rollup_path)
        .where(F.col("part_day") < F.lit(cutoff_day))
        .select("day", *dims, "n_events", "sum_cents")
    )
    tail_raw = spark.read.parquet(events_path).where(
        F.col("part_day") >= F.lit(cutoff_day)
    )
    tail = _rollup_agg(tail_raw, dims, ts_col)
    return pre.unionByName(tail)
