"""As-of join (point-in-time join) and range (interval) join — SURVEY
§2.3 lists them among joins the reference lacks and the engine derives
from Spark primitives.

Semantics: for each left row, attach the most recent right row of the
same key with ``right.ts <= left.ts`` (DuckDB ``ASOF JOIN`` semantics,
which the oracle uses verbatim).

Plan: union the two sides with a side tag, one window pass per key
ordered by (ts, side) carrying the last-seen right attributes forward
(``last(..., ignorenulls=True)``), then keep left rows. One shuffle on
the key — the same cost as a sort-merge join, with no range-condition
explosion; skewed keys split by AQE.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: List[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: left columns + ``prefix``-ed right columns of the
    latest right row at-or-before each left timestamp (nulls if none)."""
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in (key, right_ts)]

    lhs = left.withColumn("_side", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    )
    # Carry ONE struct of all right columns (non-null exactly for right
    # rows, even when every field inside is null) so the matched right row
    # is atomic: all attributes come from the SAME latest row. Carrying
    # columns independently with last(..., ignorenulls) would backfill a
    # null attribute of the latest row from an OLDER row.
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_payload"),
    ).withColumn("_side", F.lit(0))

    merged = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps, so an exact
    # tie matches (ASOF's ts_right <= ts_left)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "_carry", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(prefix + c, F.col("_carry").getField(c))
    return out.drop("_side", "_ts", "_payload", "_carry")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_start: str = "start_ts",
    right_end: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval (range) join: every left row paired with every right
    interval of the same key with ``start <= ts <= end`` (inclusive).

    Plan: a naive theta join explodes the planner (O(n*m) per key); here
    each right interval is EXPLODED to the time buckets it overlaps
    (``sequence`` over bucket indices — pure columns), the left side gets
    its single bucket, and the join becomes an equi join on
    (key, bucket) + a residual between-filter. A left row's bucket
    matches an overlapping interval exactly once, so no dedup pass is
    needed. Size ``bucket_seconds`` near the typical interval length:
    each interval then lands in O(1) buckets and the shuffle stays
    linear in the data — the time-axis analogue of the grid kNN cell
    explode.
    """
    b = F.lit(int(bucket_seconds))
    # floor, not cast-truncate: buckets must be monotone across epoch 0
    lft = left.withColumn(
        "_bucket",
        F.floor(F.unix_timestamp(F.col(left_ts)) / b).cast("long"),
    )
    rgt = right.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(right_start)) / b)
            .cast("long"),
            F.floor(F.unix_timestamp(F.col(right_end)) / b).cast("long"),
        )),
    )
    joined = lft.join(rgt, [key, "_bucket"]).where(
        (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) <= F.col(right_end))
    )
    return joined.drop("_bucket")
