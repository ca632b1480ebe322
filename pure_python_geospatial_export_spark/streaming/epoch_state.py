"""Shared scaffolding for stream-folded sketch states whose fold is
NOT idempotent (KLL quantiles, SpaceSaving heavy hitters).

foreachBatch is at-least-once, so these states implement the standard
transactional pattern: the committed pointer records the last folded
epoch id; a retry of a committed epoch folds nothing (Spark guarantees
a retried batch carries the SAME epoch id with the SAME data, which is
exactly what makes the check sufficient); an epoch id BELOW the
watermark means a different query lifetime and raises (or
:meth:`rebind`). Commits reuse the manifest-pointer idiom: new
versioned directory, one atomic pointer write, superseded versions
pruned.

Subclasses implement one method — :meth:`_fold`, taking the previous
committed state (or None) and the micro-batch and returning the merged
state DataFrame, or None when the batch contributes nothing (the epoch
still advances so an empty batch is not re-examined forever on
restart).

The idempotent folds (streaming/distinct.py register max,
streaming/cluster.py union-find) intentionally do NOT use this base:
they need no epoch watermark, and their pointer formats differ.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


class EpochVersionedState:
    """Versioned parquet state with exactly-once micro-batch folding.
    Use :meth:`foreach_batch` as a stream sink and :meth:`current` for
    the committed rows."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 keep_versions: int = 2):
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        self.spark = spark
        self.state_dir = state_dir
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

    def current(self) -> Optional[DataFrame]:
        """Latest committed state rows, or None before the first
        data-bearing commit."""
        name, _epoch = self._read_pointer()
        if name is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.state_dir, name)
        )

    def rebind(self) -> None:
        """Accept a NEW streaming query (fresh checkpoint dir, epoch
        ids restarting at 0) while keeping the accumulated state:
        resets the committed epoch watermark to -1. Only call this
        when the old query is stopped — the guard in
        :meth:`foreach_batch` exists because two queries folding one
        state dir double-counts."""
        cur_name, _epoch = self._read_pointer()
        self._commit(cur_name or "-", -1)

    # -- the fold -----------------------------------------------------------

    def _fold(self, prev: Optional[DataFrame],
              batch_df: DataFrame) -> Optional[DataFrame]:
        """Merge the micro-batch into ``prev`` (None before the first
        commit). Return the new state rows, or None when the batch
        contributes nothing."""
        raise NotImplementedError

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        cur_name, last_epoch = self._read_pointer()
        if int(epoch_id) == last_epoch:
            # at-least-once redelivery of a committed epoch: the fold
            # is NOT idempotent, so the retry must fold nothing
            return
        if int(epoch_id) < last_epoch:
            # A retry always replays the SAME epoch id, so a strictly
            # lower id means a different query lifetime — a stream
            # restarted with a fresh checkpoint dir against this state
            # dir. Silently skipping would serve stale state forever;
            # fail loudly instead.
            raise RuntimeError(
                "epoch id %d regressed below the committed watermark "
                "%d: this state dir was folded by a different "
                "streaming query (fresh checkpoint dir?). Reuse the "
                "original checkpoint dir, or call rebind() to accept "
                "the new query's epoch numbering while keeping the "
                "accumulated state." % (int(epoch_id), last_epoch)
            )
        merged = self._fold(self.current(), batch_df)
        if merged is None:
            # still advance the epoch so an empty batch is not
            # re-examined forever on restart
            self._commit(cur_name or "-", int(epoch_id))
            return
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
