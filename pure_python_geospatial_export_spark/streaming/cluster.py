"""Streaming duplicate-cluster composition: fold a near-dup PAIR
stream into incrementally-maintained connected components.

``near_duplicates_stream`` emits pairs exactly-once (or at-least-once
in ``all_bands`` mode), but chaining the CC clustering stage as a
second stateful operator is rejected by Spark's global-watermark
correctness check (the round-3 limitation documented in
streaming/neardup.py). This module closes that gap with the standard
escape hatch: a ``foreachBatch`` sink that folds each micro-batch of
pairs into a persisted union-find table, so streamed cluster
assignments equal the batch ``duplicate_clusters`` over the union of
all pairs seen.

Why the fold is correct AND cheap:

* The assignment table maps every seen id to its component's MIN id
  (the batch convention). Components are fully described by their
  roots, so a micro-batch only has to run CC over the ROOT graph its
  pairs touch — a micro-batch-sized problem — then remap the big table
  through the (old_root -> new_root) dictionary with one distributed
  join. Nothing driver-side scales with history except the table
  itself, which stays in parquet.
* Union-find folding is IDEMPOTENT (re-adding an edge is a no-op), so
  a foreachBatch retry of the same epoch converges to the same table —
  at-least-once pair delivery (``emit_mode='all_bands'``) is safe by
  construction.
* Each epoch writes a NEW versioned directory and commits it with one
  atomic pointer-file rename — readers see the previous complete table
  or the new complete table, never a mix (the manifest-pointer commit
  pattern; see also sources/layout.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_CURRENT"


class ClusterState:
    """Persisted union-find table (id, cluster_id) with atomic
    pointer-file commits. Use :meth:`foreach_batch` as the sink of a
    pair stream (columns id_a, id_b), :meth:`current` to read the
    latest committed assignments."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 keep_versions: int = 2):
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        self.spark = spark
        self.state_dir = state_dir
        # retained version dirs INCLUDING the current one; >= 2 keeps
        # one superseded table for readers that resolved the pointer
        # just before a commit (mirrors layout.expire_snapshots)
        self.keep_versions = keep_versions
        os.makedirs(state_dir, exist_ok=True)

    # -- pointer management -------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.state_dir, _POINTER)

    def _read_pointer(self) -> str | None:
        try:
            with open(self._pointer_path()) as f:
                name = f.read().strip()
            return name or None
        except FileNotFoundError:
            return None

    def _commit_pointer(self, version_name: str) -> None:
        # durable single-pointer publish; the pointed-to directory is
        # always complete before the pointer moves
        from ..sources.layout import atomic_write_text

        atomic_write_text(self._pointer_path(), version_name)

    # -- reads --------------------------------------------------------------

    def current(self) -> DataFrame | None:
        """Latest committed (id, cluster_id) assignments, or None
        before the first commit."""
        name = self._read_pointer()
        if name is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.state_dir, name)
        )

    # -- the fold -----------------------------------------------------------

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch hook: fold one micro-batch of (id_a, id_b)
        pairs into the table.

        The version directory is a MONOTONIC COUNTER derived from the
        current pointer, NOT the epoch id: foreachBatch is
        at-least-once, and a retry of an epoch whose fold already
        committed must not name the directory it is simultaneously
        READING (Spark refuses to overwrite a path it reads from —
        an epoch-keyed name would wedge the stream in a crash loop).
        With a fresh counter the retry writes a new directory whose
        content, by fold idempotence, equals the committed one."""
        from ..operators.dedup import duplicate_clusters

        pairs = batch_df.select("id_a", "id_b").distinct()
        if not pairs.take(1):
            return
        prev = self.current()

        if prev is None:
            assign = duplicate_clusters(pairs)
        else:
            # resolve each endpoint to its current root (itself when
            # unseen), run CC on the touched ROOT graph only, then
            # remap the whole table through old_root -> new_root
            a = prev.select(
                F.col("id").alias("id_a"),
                F.col("cluster_id").alias("_ra"),
            )
            b = prev.select(
                F.col("id").alias("id_b"),
                F.col("cluster_id").alias("_rb"),
            )
            rooted = (
                pairs.join(a, "id_a", "left")
                .join(b, "id_b", "left")
                .select(
                    F.coalesce(F.col("_ra"), F.col("id_a")).alias("ra"),
                    F.coalesce(F.col("_rb"), F.col("id_b")).alias("rb"),
                    "id_a",
                    "id_b",
                )
            )
            root_edges = (
                rooted.select(
                    F.col("ra").alias("id_a"), F.col("rb").alias("id_b")
                )
                .where(F.col("id_a") != F.col("id_b"))
                .distinct()
            )
            if root_edges.take(1):
                remap = duplicate_clusters(root_edges).select(
                    F.col("id").alias("_old"),
                    F.col("cluster_id").alias("_new"),
                )
            else:
                remap = None

            def _remapped(df, col):
                if remap is None:
                    return df
                return (
                    df.join(remap, df[col] == remap["_old"], "left")
                    .select(
                        *[c for c in df.columns if c != col],
                        F.coalesce(F.col("_new"), F.col(col))
                        .alias(col),
                    )
                )

            kept = _remapped(prev, "cluster_id").select(
                "id", "cluster_id"
            )
            fresh = (
                rooted.select(F.col("id_a").alias("id"),
                              F.col("ra").alias("cluster_id"))
                .unionByName(
                    rooted.select(F.col("id_b").alias("id"),
                                  F.col("rb").alias("cluster_id"))
                )
                .groupBy("id")
                .agg(F.min("cluster_id").alias("cluster_id"))
                .join(prev.select("id"), "id", "left_anti")
            )
            assign = kept.unionByName(
                _remapped(fresh, "cluster_id").select("id", "cluster_id")
            )

        cur = self._read_pointer()
        next_n = (int(cur[1:]) + 1) if cur else 0
        version = "v%020d" % next_n
        out = os.path.join(self.state_dir, version)
        assign.write.mode("overwrite").parquet(out)
        self._commit_pointer(version)
        self._prune_versions(version)

    def _prune_versions(self, current: str) -> None:
        """Delete superseded version directories beyond the newest
        ``keep_versions`` (current included). Without this a
        long-running pair stream grows ``state_dir`` without bound —
        every micro-batch writes a full new table. At least one prior
        version survives (when keep_versions >= 2) for readers that
        resolved the pointer just before the commit."""
        import shutil

        versions = sorted(
            n for n in os.listdir(self.state_dir)
            if n.startswith("v") and n[1:].isdigit()
        )
        doomed = [n for n in versions[:-self.keep_versions]
                  if n != current]
        for name in doomed:
            shutil.rmtree(
                os.path.join(self.state_dir, name), ignore_errors=True
            )


def near_duplicate_clusters_stream(
    docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **neardup_kwargs,
):
    """The SAFE default composition of streaming near-dup detection and
    clustering: ``near_duplicates_stream`` in ``all_bands`` mode feeding
    the idempotent :class:`ClusterState` fold.

    ``min_band`` (exactly-once) has a documented recall gap — a pair is
    lost when the OWNING band's bucket FIFO-evicted a member while
    another colliding bucket still holds both (space eviction is
    per-bucket, time eviction is consistent; see streaming/neardup.py).
    Because the union-find fold is idempotent, at-least-once
    ``all_bands`` emission costs nothing here and closes that gap:
    a pair is missed only if evicted from ALL its colliding buckets.
    Callers may still override ``emit_mode`` explicitly.

    Returns (state, streaming_query)."""
    from .neardup import near_duplicates_stream

    neardup_kwargs.setdefault("emit_mode", "all_bands")
    pair_stream = near_duplicates_stream(docs, **neardup_kwargs)
    return clustered_pairs_sink(
        pair_stream, state_dir, checkpoint_dir,
        trigger_available_now=trigger_available_now,
    )


def clustered_pairs_sink(
    pair_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Wire a pair stream (id_a, id_b, ...) into a :class:`ClusterState`
    fold. Returns (state, streaming_query) — call
    ``query.awaitTermination()`` then ``state.current()`` for the
    assignments."""
    state = ClusterState(pair_stream.sparkSession, state_dir)
    writer = (
        pair_stream.writeStream.foreachBatch(state.foreach_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return state, writer.start()
