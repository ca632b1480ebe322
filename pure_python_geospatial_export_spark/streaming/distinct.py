"""Streaming distinct counts: fold a value stream into per-group
HyperLogLog register relations maintained across micro-batches.

The streaming sibling of ``operators/sketch.hll_sketch`` — running
distinct-URL / distinct-user counts per group (cell, domain, day)
served continuously without touching raw history, in O(2^p) state per
group.

The structural contrast with streaming/quantiles.py is the point:
HLL's fold is register-wise MAX, which is idempotent and commutative,
so foreachBatch's at-least-once delivery needs NO transactional epoch
machinery — a redelivered micro-batch re-maxes the same registers into
the same state. The epoch id is still recorded and same-or-older
epochs are skipped, but purely as a work-avoidance optimization (and
to keep restart behavior predictable); folding them anyway would be
harmless, which is exactly the property KLL lacks. Commits reuse the
manifest-pointer idiom: new versioned directory, one atomic pointer
write, superseded versions pruned.
"""

from __future__ import annotations

import os
from typing import List

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


class DistinctState:
    """Persisted per-group HLL register table folded by micro-batch.
    Use :meth:`foreach_batch` as a stream sink, :meth:`current` for
    the register rows, :meth:`estimates` for distinct-count
    estimates."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 group_cols: List[str], value_col: str = "value",
                 p: int = 12, keep_versions: int = 2):
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        self.spark = spark
        self.state_dir = state_dir
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.p = int(p)
        self.keep_versions = keep_versions
        os.makedirs(state_dir, exist_ok=True)

    # -- pointer: "<version>:<last_epoch>" -----------------------------------

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

    # -- reads ---------------------------------------------------------------

    def current(self):
        """Latest committed register rows (group_cols..., bucket, reg),
        or None before the first commit."""
        name, _epoch = self._read_pointer()
        if name is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.state_dir, name)
        )

    def estimates(self, correction: bool = True):
        """(group_cols..., zeros, harmonic, est) from the committed
        state, or None before the first commit."""
        from ..operators.sketch import hll_estimate

        cur = self.current()
        if cur is None:
            return None
        return hll_estimate(cur, self.group_cols, p=self.p,
                            correction=correction)

    # -- the fold ------------------------------------------------------------

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators.sketch import hll_merge, hll_sketch

        cur_name, last_epoch = self._read_pointer()
        if int(epoch_id) <= last_epoch:
            # Work avoidance only: the max-fold is idempotent, so a
            # redelivered (or out-of-lifetime) epoch folding again
            # would be CORRECT, just wasted IO. No KLL-style
            # regression error is needed — a restarted query's
            # re-folds cannot corrupt the registers. Skipping equal
            # epochs keeps retries free; skipping lower ones assumes
            # a restarted-from-scratch source replays a prefix of
            # what is already folded (true for replayable sources).
            return
        fresh = hll_sketch(
            batch_df.select(*self.group_cols, self.value_col),
            self.group_cols, self.value_col, p=self.p,
        )
        if not fresh.take(1):
            self._commit(cur_name or "-", int(epoch_id))
            return
        prev = self.current()
        merged = (
            hll_merge(prev.unionByName(fresh), self.group_cols)
            if prev is not None else fresh
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


def distinct_sink(
    value_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_cols: List[str],
    value_col: str = "value",
    p: int = 12,
    trigger_available_now: bool = True,
):
    """Wire a value stream into a :class:`DistinctState` fold. Returns
    (state, streaming_query)."""
    state = DistinctState(value_stream.sparkSession, state_dir,
                          group_cols, value_col, p)
    writer = (
        value_stream.writeStream.foreachBatch(state.foreach_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return state, writer.start()
