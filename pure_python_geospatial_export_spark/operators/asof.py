"""As-of join (point-in-time join) — SURVEY §2.3 lists it among joins the
reference lacks and the engine derives from Spark primitives.

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
