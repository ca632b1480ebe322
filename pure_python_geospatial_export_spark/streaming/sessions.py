"""Custom stateful streaming operator: event sessionization.

``applyInPandasWithState`` keyed by user: events within ``gap`` of each
other belong to one session; a longer silence closes the session and
emits (user_id, session_start, session_end, n_events, sum_value). This is
the engine's demonstration of arbitrary stateful processing — the piece
Structured Streaming's built-in windows can't express (variable-length,
data-driven windows).

State = the open session per user, carried across micro-batches. With an
event-time timeout the operator also closes sessions when the watermark
passes session_end + gap (late-data safe).
"""

from __future__ import annotations

import datetime
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), False),
    StructField("session_end", TimestampType(), False),
    StructField("n_events", LongType(), False),
    StructField("sum_value", DoubleType(), True),
])

STATE_SCHEMA = StructType([
    StructField("start_us", LongType(), False),
    StructField("end_us", LongType(), False),
    StructField("n", LongType(), False),
    StructField("sv", DoubleType(), False),
])

_US = 1_000_000


def _ts(us: int) -> datetime.datetime:
    return datetime.datetime.fromtimestamp(us / _US,
                                           tz=datetime.timezone.utc
                                           ).replace(tzinfo=None)


def make_sessionizer(gap_seconds: int = 1800, event_time_timeout=False):
    gap_us = gap_seconds * _US

    def sessionize(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, sv = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [_ts(start_us)],
                "session_end": [_ts(end_us)],
                "n_events": [n],
                "sum_value": [sv],
            })
            return

        events = pd.concat(list(pdfs))
        events = events.sort_values("ts")
        # pandas datetime64[ns] -> int64 is NANOSECONDS; convert to us
        ts_us = (events["ts"].astype("int64") // 1000).to_numpy()
        vals = events["value"].to_numpy()

        if state.exists:
            start_us, end_us, n, sv = state.get
        else:
            start_us = end_us = None
            n, sv = 0, 0.0

        closed = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if start_us is None:
                start_us, end_us, n, sv = t, t, 1, float(v)
            elif t - end_us <= gap_us:
                end_us, n, sv = t, n + 1, sv + float(v)
            else:
                closed.append((start_us, end_us, n, sv))
                start_us, end_us, n, sv = t, t, 1, float(v)

        state.update((start_us, end_us, n, sv))
        if event_time_timeout:
            # TTL compaction: arm a timer at session_end + gap. When the
            # watermark passes it, the open session closes through the
            # hasTimedOut branch above and its state is REMOVED — state
            # size stays proportional to users active within the
            # watermark horizon, not to all users ever seen. The timer
            # must sit strictly above the current watermark (Spark
            # rejects already-expired timestamps for late replays).
            wm_ms = state.getCurrentWatermarkMs()
            deadline_ms = end_us // 1000 + gap_seconds * 1000
            state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
        return_rows = closed
        if return_rows:
            yield pd.DataFrame({
                "user_id": [user_id] * len(return_rows),
                "session_start": [_ts(r[0]) for r in return_rows],
                "session_end": [_ts(r[1]) for r in return_rows],
                "n_events": [r[2] for r in return_rows],
                "sum_value": [r[3] for r in return_rows],
            })

    return sessionize


def sessionized_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    watermark: str = None,
) -> DataFrame:
    """events(ts, user_id, value) -> closed sessions (streaming or batch
    semantics decided by the input DataFrame).

    Pass ``watermark`` (e.g. ``"10 minutes"``) to bound state on an
    unbounded stream: a watermark is applied to ``ts`` and each open
    session arms an event-time timer at ``session_end + gap`` — once the
    watermark passes it, the session is emitted as closed and its state
    deleted, so state holds only users active within the horizon. With
    no watermark (default), open sessions persist indefinitely — fine
    for batch/finite replays, unbounded state on a true stream.
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return (
        events.select(user_col, "ts", "value")
        .groupBy(user_col)
        .applyInPandasWithState(
            make_sessionizer(gap_seconds,
                             event_time_timeout=watermark is not None),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Batch gaps-and-islands sessionization: adds ``session_seq`` (the
    per-user 1-based session index) to every event row.

    Pure window functions — a new session starts where the gap to the
    previous event exceeds ``gap_seconds``; the running sum of those
    flags numbers the sessions. One shuffle on the user key; fully
    SQL-expressible (the DuckDB twin in __spark_entry__ mirrors it),
    unlike the stateful streaming sessionizer above, which handles
    unbounded input with the same semantics per closed session.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # unix_timestamp, not unix_millis: it accepts TIMESTAMP_NTZ too
    sec = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(sec).over(w)
    new_sess = F.when(
        prev.isNull() | ((sec - prev) > F.lit(int(gap_seconds))),
        F.lit(1),
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.withColumn(
        "session_seq", F.sum(new_sess).over(wsum)
    )
