"""Per-partition lineage/metrics and resumable checkpointed runs.

North-rule ops surface: a 10^12-row job must (a) record what each
partition did, and (b) resume after failure without recomputing finished
work.

* ``partition_metrics``: a ``mapInArrow`` pass-through wrapper — batches
  stream through untouched while per-partition counters accumulate; at
  partition end one metrics row (partition id, rows, batches, bytes) is
  emitted on a side output. Zero extra shuffle; the metrics relation is
  tiny.
* ``ResumableRun``: deterministic work units (any column — the engine uses
  coarse cells so units are spatial) + a manifest parquet. A run
  anti-joins completed units from the manifest, processes the remainder,
  writes data BEFORE manifest rows (so a crash between the two re-does a
  unit rather than losing it — at-least-once), and writes via DYNAMIC
  partition overwrite so a re-done unit REPLACES its data partition
  instead of appending a duplicate copy — making the retry idempotent.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.taskcontext import TaskContext

METRICS_SCHEMA = (
    "partition_id long, n_rows long, n_batches long, n_bytes long"
)
_ARROW_METRICS = pa.schema([
    ("partition_id", pa.int64()),
    ("n_rows", pa.int64()),
    ("n_batches", pa.int64()),
    ("n_bytes", pa.int64()),
])


def partition_metrics(df: DataFrame) -> DataFrame:
    """One row per input partition: (partition_id, n_rows, n_batches,
    n_bytes). Runs a full pass over ``df`` (metrics-only job)."""

    def count_batches(batches: Iterator[pa.RecordBatch]
                      ) -> Iterator[pa.RecordBatch]:
        rows = 0
        nbatches = 0
        nbytes = 0
        for b in batches:
            rows += b.num_rows
            nbatches += 1
            nbytes += sum(
                buf.size for col in b.columns
                for buf in col.buffers() if buf is not None
            )
        pid = TaskContext.get().partitionId()
        yield pa.RecordBatch.from_pydict(
            {
                "partition_id": [pid],
                "n_rows": [rows],
                "n_batches": [nbatches],
                "n_bytes": [nbytes],
            },
            schema=_ARROW_METRICS,
        )

    return df.mapInArrow(count_batches, METRICS_SCHEMA)


class ResumableRun:
    """Checkpointed processing of a DataFrame in deterministic work units.

    Layout under ``out_dir``:
      data/      — output parquet, partitioned by the unit column
      manifest/  — parquet of completed units (+ row counts, wall time)
      metrics/   — optional per-partition metrics snapshots
    """

    def __init__(self, spark: SparkSession, out_dir: str,
                 unit_col: str = "unit"):
        self.spark = spark
        self.out_dir = out_dir
        self.unit_col = unit_col
        self.data_dir = os.path.join(out_dir, "data")
        self.manifest_dir = os.path.join(out_dir, "manifest")
        self.metrics_dir = os.path.join(out_dir, "metrics")

    def completed_units(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.manifest_dir).select(
                self.unit_col
            ).distinct()
        except Exception:
            return None

    def run(
        self,
        df: DataFrame,
        process: Callable[[DataFrame], DataFrame] | None = None,
        collect_metrics: bool = False,
    ) -> dict:
        """Process all not-yet-completed units; returns a summary dict."""
        done = self.completed_units()
        todo = df
        if done is not None:
            todo = df.join(F.broadcast(done), self.unit_col, "left_anti")
        result = process(todo) if process is not None else todo
        if self.unit_col not in result.columns:
            raise ValueError(
                "process() must preserve unit column %r" % self.unit_col
            )
        t0 = time.time()
        result = result.cache()
        try:
            unit_stats = (
                result.groupBy(self.unit_col)
                .agg(F.count(F.lit(1)).alias("n_rows"))
            )
            stats = {r[self.unit_col]: int(r["n_rows"])
                     for r in unit_stats.collect()}
            # the unit list comes from the INPUT, not the output, so
            # units whose process() output is empty are still marked done
            # (column-pruned scan of the unit column only — cheap)
            todo_units = [
                r[0] for r in
                todo.select(self.unit_col).distinct().collect()
            ]
            if not todo_units:
                return {"processed_units": 0, "rows": 0, "resumed": done
                        is not None}
            # data first, manifest second (at-least-once). Dynamic
            # partition overwrite: only the unit partitions present in
            # `result` are replaced, so a unit re-done after a crash
            # between data and manifest writes does NOT append a second
            # copy of its rows — the retry is idempotent.
            conf = self.spark.conf
            mode_key = "spark.sql.sources.partitionOverwriteMode"
            prev = conf.get(mode_key, None)
            conf.set(mode_key, "dynamic")
            try:
                result.write.mode("overwrite").partitionBy(
                    self.unit_col
                ).parquet(self.data_dir)
            finally:
                if prev is None:
                    conf.unset(mode_key)
                else:
                    conf.set(mode_key, prev)
            if collect_metrics:
                partition_metrics(result).withColumn(
                    "run_ts", F.lit(time.time())
                ).write.mode("append").parquet(self.metrics_dir)
            wall = time.time() - t0
            manifest = self.spark.createDataFrame(
                [
                    (u, stats.get(u, 0), float(wall), float(time.time()))
                    for u in todo_units
                ],
                "%s long, n_rows long, wall_sec double, finished_ts double"
                % self.unit_col,
            )
            manifest.write.mode("append").parquet(self.manifest_dir)
            return {
                "processed_units": len(todo_units),
                "rows": int(sum(stats.values())),
                "resumed": done is not None,
            }
        finally:
            result.unpersist()

    def output(self) -> DataFrame:
        return self.spark.read.parquet(self.data_dir)
