"""Streaming quantiles: fold a value stream into per-group KLL
sketches maintained across micro-batches.

The streaming sibling of ``operators/sketch.kll_sketch`` — value
distributions (latency percentiles, doc-length profiles, score
drift) maintained continuously with bounded state per group,
served without touching raw history.

Unlike the union-find fold (streaming/cluster.py), KLL MERGE IS NOT
IDEMPOTENT: re-merging a redelivered micro-batch would double-count
its rows. foreachBatch is at-least-once, so this state implements the
standard transactional pattern instead — the committed pointer
records the last folded epoch id, and a retry of an already-committed
epoch is a no-op. (Spark guarantees a retried batch carries the SAME
epoch id with the SAME data, which is exactly what makes the check
sufficient.) Commits reuse the manifest-pointer idiom: new versioned
directory, one atomic pointer write, superseded versions pruned.
"""

from __future__ import annotations

import os
from typing import List

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


class QuantileState:
    """Persisted per-group KLL sketch table with exactly-once
    micro-batch folding. Use :meth:`foreach_batch` as a stream sink,
    :meth:`current` for the sketch rows, :meth:`quantiles` for
    estimates."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 group_cols: List[str], value_col: str = "value",
                 k: int = 200, keep_versions: int = 2):
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        self.spark = spark
        self.state_dir = state_dir
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.k = int(k)
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
            # "-" = epochs committed but no data version yet (empty
            # batches before the first non-empty one)
            return (version if version != "-" else None), int(epoch)
        except FileNotFoundError:
            return None, -1

    def _commit(self, version: str, epoch: int) -> None:
        from ..sources.layout import atomic_write_text

        atomic_write_text(self._pointer_path(),
                          "%s:%d" % (version, epoch))

    # -- reads --------------------------------------------------------------

    def current(self):
        """Latest committed sketch rows (group_cols..., levels, n), or
        None before the first commit."""
        name, _epoch = self._read_pointer()
        if name is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.state_dir, name)
        )

    def quantiles(self, qs: List[float]):
        """(group_cols..., q, est) from the committed state."""
        from ..operators.sketch import kll_quantiles

        cur = self.current()
        if cur is None:
            return None
        return kll_quantiles(cur, self.group_cols, qs, k=self.k)

    def rebind(self) -> None:
        """Accept a NEW streaming query (fresh checkpoint dir, epoch
        ids restarting at 0) while keeping the accumulated sketches:
        resets the committed epoch watermark to -1. Only call this
        when the old query is stopped — the guard in
        :meth:`foreach_batch` exists because two queries folding one
        state dir double-counts."""
        cur_name, _epoch = self._read_pointer()
        self._commit(cur_name or "-", -1)

    # -- the fold -----------------------------------------------------------

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        from ..operators.sketch import kll_merge, kll_sketch

        cur_name, last_epoch = self._read_pointer()
        if int(epoch_id) == last_epoch:
            # at-least-once redelivery of a committed epoch: KLL merge
            # is NOT idempotent, so the retry must fold nothing
            return
        if int(epoch_id) < last_epoch:
            # A retry always replays the SAME epoch id, so a strictly
            # lower id means a different query lifetime — a stream
            # restarted with a fresh checkpoint dir against this state
            # dir. Silently skipping would serve stale quantiles
            # forever; fail loudly instead.
            raise RuntimeError(
                "epoch id %d regressed below the committed watermark "
                "%d: this state dir was folded by a different "
                "streaming query (fresh checkpoint dir?). Reuse the "
                "original checkpoint dir, or call rebind() to accept "
                "the new query's epoch numbering while keeping the "
                "accumulated sketches." % (int(epoch_id), last_epoch)
            )
        fresh = kll_sketch(
            batch_df.select(*self.group_cols, self.value_col),
            self.group_cols, self.value_col, k=self.k,
        )
        if not fresh.take(1):
            # still advance the epoch so an empty batch is not
            # re-examined forever on restart
            self._commit(cur_name or "-", int(epoch_id))
            return
        prev = self.current()
        merged = (
            kll_merge(prev.unionByName(fresh), self.group_cols,
                      k=self.k)
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


def quantile_sink(
    value_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_cols: List[str],
    value_col: str = "value",
    k: int = 200,
    trigger_available_now: bool = True,
):
    """Wire a value stream into a :class:`QuantileState` fold. Returns
    (state, streaming_query)."""
    state = QuantileState(value_stream.sparkSession, state_dir,
                          group_cols, value_col, k)
    writer = (
        value_stream.writeStream.foreachBatch(state.foreach_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return state, writer.start()
