"""Event-sequence analytics: ordered funnels and cohort retention.

The two standard questions over an events table that plain groupBy can't
answer directly — "how many users did A then B then C, in order?" and
"of the users who first appeared in week W, how many came back k weeks
later?".

Both are built to run with ONE exchange on the user key:

* :func:`funnel_stages` chains per-user window minima — stage k's
  timestamp is the earliest qualifying event strictly after stage k-1's.
  Every window partitions by the same key with no ordering, so Spark
  satisfies the 2nd..Nth windows from the 1st's hash partitioning (the
  "windows keyed by the same columns run exchange-free" rule from the
  round-2 notes).
* :func:`cohort_retention` derives each user's cohort (truncated first
  activity) with one window, then aggregates (cohort, offset) distinct
  users — the second aggregation's shuffle carries one row per
  (cohort, offset, user), already combined map-side.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: List[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: Optional[int] = None,
) -> DataFrame:
    """-> (user, t_1..t_n, reached): per user, the earliest strictly
    ordered completion of each funnel stage, and how many stages were
    reached. ``within_seconds`` additionally requires every later stage
    to land within that horizon of the FIRST stage (the usual
    "converted within 7 days" variant). Strictly increasing timestamps:
    a tie between consecutive stages does not advance the funnel (same
    rule on both engines)."""
    if not stages:
        raise ValueError("stages must be non-empty")
    w = Window.partitionBy(user_col)
    out = events.select(user_col, ts_col, type_col)
    prev = None
    names = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
            if within_seconds is not None:
                cond = cond & (
                    F.unix_timestamp(F.col(ts_col))
                    <= F.unix_timestamp(F.col(names[0]))
                    + F.lit(int(within_seconds))
                )
        name = "t_%d" % (i + 1)
        out = out.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        names.append(name)
        prev = name
    reached = F.lit(0)
    for i, name in enumerate(names):
        reached = F.when(F.col(name).isNotNull(), F.lit(i + 1)) \
            .otherwise(reached)
    # per-user constants -> one row per user
    return (
        out.groupBy(user_col)
        .agg(*[F.max(n).alias(n) for n in names])
        .withColumn("reached", reached.cast("int"))
    )


def funnel_counts(funnel: DataFrame) -> DataFrame:
    """(stage, n_users) survivor counts from :func:`funnel_stages`
    output — stage k counts users with ``reached >= k`` (each user
    explodes into one row per stage they passed; guard keeps
    ``sequence`` ascending)."""
    return (
        funnel.where(F.col("reached") >= 1)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.col("reached"))
            ).alias("stage")
        )
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """-> (cohort, offset, n_users): users whose FIRST activity falls in
    truncated period ``cohort`` and who were active ``offset`` periods
    later (offset 0 = the cohort period itself). ``period`` is a
    ``date_trunc`` unit; offsets are floor(day-difference / period
    length) so both engines compute the identical integer."""
    days = {"week": 7, "day": 1}
    if period not in days:
        raise ValueError("period must be 'week' or 'day'")
    w = Window.partitionBy(user_col)
    first = F.min(ts_col).over(w)
    enriched = events.select(
        F.col(user_col),
        F.date_trunc(period, first).cast("date").alias("cohort"),
        F.floor(
            F.datediff(F.date_trunc(period, F.col(ts_col)),
                       F.date_trunc(period, first))
            / F.lit(days[period])
        ).cast("int").alias("offset"),
    )
    return enriched.groupBy("cohort", "offset").agg(
        F.countDistinct(user_col).alias("n_users")
    )
