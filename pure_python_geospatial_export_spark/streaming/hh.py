"""Streaming heavy hitters: fold a key stream into per-group
SpaceSaving summaries maintained across micro-batches.

The streaming sibling of ``operators/sketch.heavy_hitters_sketch`` —
trending keys (domains, tokens, cells) tracked continuously with
bounded state per group (at most ``m`` counters), served without
touching raw history.

Each micro-batch reduces to EXACT per-(group, key) counts first (a
bounded groupBy — Spark's map-side partial aggregation does the heavy
lifting), then the counts fold into the persisted summary as WEIGHTED
SpaceSaving insertions (Metwally et al. 2005): a tracked key absorbs
its weight; an untracked one evicts the minimum counter c_min and
enters at ``c_min + w`` with ``err = c_min``. The classic invariants
survive weighted arrival — ``sum(cnt)`` equals the total stream
weight, every tracked count overestimates by at most its ``err``, and
any UNtracked key's true count is bounded by the minimum counter — so
:meth:`HeavyHitterState.top` serves [lo, hi] = [cnt - err, cnt]
brackets and every key with true frequency above N_group/m is
guaranteed tracked.

Insertions are order-sensitive, so the fold is made deterministic the
same way the KLL merge was (ADVICE r5): batch items insert in
(descending weight, ascending key) order.

Like the KLL fold (streaming/quantiles.py) and unlike the union-find
fold (streaming/cluster.py), SPACESAVING FOLDING IS NOT IDEMPOTENT —
re-folding a redelivered micro-batch double-counts. foreachBatch is
at-least-once, so the state reuses the transactional pattern: the
committed pointer records the last folded epoch id; a retry of a
committed epoch is a no-op; an epoch id BELOW the watermark means a
different query lifetime and raises (or :meth:`rebind`)."""

from __future__ import annotations

import os
from typing import List

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


class HeavyHitterState:
    """Persisted per-group SpaceSaving summary table with exactly-once
    micro-batch folding. Use :meth:`foreach_batch` as a stream sink,
    :meth:`current` for the summary rows, :meth:`top` for ranked
    estimates."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 group_cols: List[str], key_col: str = "key",
                 m: int = 256, keep_versions: int = 2):
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        if m < 1:
            raise ValueError("m must be >= 1")
        self.spark = spark
        self.state_dir = state_dir
        self.group_cols = list(group_cols)
        self.key_col = key_col
        self.m = int(m)
        self.keep_versions = keep_versions
        os.makedirs(state_dir, exist_ok=True)

    # -- pointer: "<version>:<last_epoch>" ----------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.state_dir, _POINTER)

    def _read_pointer(self):
        try:
            with open(self._pointer_path()) as f:
                raw = f.read().strip()
            if not raw:
                return None, -1
            version, epoch = raw.rsplit(":", 1)
            return (version if version != "-" else None), int(epoch)
        except FileNotFoundError:
            return None, -1

    def _commit(self, version: str, epoch: int) -> None:
        from ..sources.layout import atomic_write_text

        atomic_write_text(self._pointer_path(),
                          "%s:%d" % (version, epoch))

    # -- reads --------------------------------------------------------------

    def current(self):
        """Latest committed summary rows (group_cols..., key, cnt,
        err), or None before the first commit."""
        name, _epoch = self._read_pointer()
        if name is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.state_dir, name)
        )

    def top(self, k: int = 10):
        """(group_cols..., key, est, lo, hi, rank) from the committed
        state: est = the summary counter (an overestimate), lo =
        est - err, hi = est."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        cur = self.current()
        if cur is None:
            return None
        w = Window.partitionBy(*self.group_cols).orderBy(
            F.col("est").desc(), F.col("key").asc()
        )
        return (
            cur.select(
                *self.group_cols,
                "key",
                F.col("cnt").alias("est"),
                (F.col("cnt") - F.col("err")).alias("lo"),
                F.col("cnt").alias("hi"),
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )

    def rebind(self) -> None:
        """Accept a NEW streaming query (fresh checkpoint dir, epoch
        ids restarting at 0) while keeping the accumulated summaries:
        resets the committed epoch watermark to -1. Only call this
        when the old query is stopped."""
        cur_name, _epoch = self._read_pointer()
        self._commit(cur_name or "-", -1)

    # -- the fold -----------------------------------------------------------

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, StructField, StructType

        cur_name, last_epoch = self._read_pointer()
        if int(epoch_id) == last_epoch:
            # at-least-once redelivery of a committed epoch: the fold
            # is NOT idempotent, so the retry must fold nothing
            return
        if int(epoch_id) < last_epoch:
            raise RuntimeError(
                "epoch id %d regressed below the committed watermark "
                "%d: this state dir was folded by a different "
                "streaming query (fresh checkpoint dir?). Reuse the "
                "original checkpoint dir, or call rebind() to accept "
                "the new query's epoch numbering while keeping the "
                "accumulated summaries." % (int(epoch_id), last_epoch)
            )
        fresh = (
            batch_df.groupBy(*self.group_cols, self.key_col)
            .agg(F.count(F.lit(1)).alias("_w"))
            .select(
                *self.group_cols,
                F.col(self.key_col).alias("key"),
                "_w",
                F.lit(0).cast("long").alias("err"),
                F.lit(False).alias("_from_state"),
            )
        )
        if not fresh.take(1):
            # still advance the epoch so an empty batch is not
            # re-examined forever on restart
            self._commit(cur_name or "-", int(epoch_id))
            return
        prev = self.current()
        if prev is not None:
            tagged_prev = prev.select(
                *self.group_cols,
                "key",
                F.col("cnt").alias("_w"),
                "err",
                F.lit(True).alias("_from_state"),
            )
            unioned = tagged_prev.unionByName(fresh)
        else:
            unioned = fresh

        group_fields = [unioned.schema[g] for g in self.group_cols]
        key_field = unioned.schema["key"]
        out_schema = StructType(
            group_fields + [
                key_field,
                StructField("cnt", LongType(), False),
                StructField("err", LongType(), False),
            ]
        )
        m = self.m
        gcols = list(self.group_cols)

        def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
            gvals = tuple(pdf.iloc[0][g] for g in gcols)
            ss = {}
            st = pdf[pdf["_from_state"]]
            for key, w, err in zip(st["key"], st["_w"], st["err"]):
                ss[key] = [int(w), int(err)]
            batch = pdf[~pdf["_from_state"]].sort_values(
                ["_w", "key"], ascending=[False, True]
            )
            for key, w in zip(batch["key"], batch["_w"]):
                w = int(w)
                ent = ss.get(key)
                if ent is not None:
                    ent[0] += w
                elif len(ss) < m:
                    ss[key] = [w, 0]
                else:
                    mk = min(ss, key=lambda q: (ss[q][0], q))
                    mc = ss[mk][0]
                    del ss[mk]
                    ss[key] = [mc + w, mc]
            rows = [gvals + (key, cnt, err)
                    for key, (cnt, err) in ss.items()]
            return pd.DataFrame(
                rows, columns=gcols + ["key", "cnt", "err"]
            )

        merged = unioned.groupBy(*gcols).applyInPandas(
            fold_group, out_schema
        )
        next_n = (int(cur_name[1:]) + 1) if cur_name else 0
        version = "v%020d" % next_n
        out = os.path.join(self.state_dir, version)
        merged.write.mode("overwrite").parquet(out)
        self._commit(version, int(epoch_id))
        self._prune(version)

    def _prune(self, current: str) -> None:
        import shutil

        versions = sorted(
            n for n in os.listdir(self.state_dir)
            if n.startswith("v") and n[1:].isdigit()
        )
        for name in versions[:-self.keep_versions]:
            if name != current:
                shutil.rmtree(
                    os.path.join(self.state_dir, name),
                    ignore_errors=True,
                )


def heavy_hitters_sink(
    key_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_cols: List[str],
    key_col: str = "key",
    m: int = 256,
    trigger_available_now: bool = True,
):
    """Wire a key stream into a :class:`HeavyHitterState` fold.
    Returns (state, streaming_query)."""
    state = HeavyHitterState(key_stream.sparkSession, state_dir,
                             group_cols, key_col, m)
    writer = (
        key_stream.writeStream.foreachBatch(state.foreach_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return state, writer.start()
