"""Streaming HLL distinct counts (streaming/distinct.py): register
relations folded across micro-batches. The fold is register-wise max —
idempotent — so unlike the KLL state no transactional epoch guard is
needed for correctness; stream state must equal the batch sketch of
the union of all folded rows, bit for bit."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pure_python_geospatial_export_spark.operators.sketch import (
    hll_sketch,
)
from pure_python_geospatial_export_spark.session import local_df
from pure_python_geospatial_export_spark.streaming.distinct import (
    DistinctState,
    distinct_sink,
)


def _regs(df):
    return {(r["grp"], r["bucket"]): r["reg"] for r in df.collect()}


def _write_batches(tmp_path, batches):
    src = tmp_path / "vals_src"
    src.mkdir()
    schema = pa.schema([("grp", pa.int64()), ("value", pa.string())])
    for i, rows in enumerate(batches):
        t = pa.table(
            {"grp": [g for g, _ in rows],
             "value": [v for _, v in rows]},
            schema=schema,
        )
        path = src / ("b%03d.parquet" % i)
        pq.write_table(t, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src)


def test_stream_equals_batch_sketch(spark, tmp_path):
    rows = [(i % 3, "u%d" % (i % 2000)) for i in range(6000)]
    batches = [rows[i::5] for i in range(5)]
    src = _write_batches(tmp_path, batches)

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    schema = StructType([
        StructField("grp", LongType(), False),
        StructField("value", StringType(), False),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state, q = distinct_sink(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        ["grp"], "value", p=10,
    )
    q.awaitTermination()

    direct = hll_sketch(
        local_df(spark, rows, ["grp", "value"]), ["grp"], "value",
        p=10,
    )
    assert _regs(state.current()) == _regs(direct)
    est = {r["grp"]: r["est"] for r in state.estimates().collect()}
    for g in (0, 1, 2):
        true_n = len({v for gg, v in rows if gg == g})
        assert abs(est[g] - true_n) / true_n < 0.15
    dirs = [n for n in os.listdir(state.state_dir)
            if n.startswith("v") and n[1:].isdigit()]
    assert len(dirs) <= 2


def test_redelivery_and_regression_are_harmless(spark, tmp_path):
    """Idempotence is the structural property: every batch folds
    unconditionally (no epoch gate), and re-folding already-folded
    rows — retry, replay, or cross-lifetime redelivery — yields
    identical registers."""
    state = DistinctState(spark, str(tmp_path / "state"), ["grp"],
                          "value", p=8)
    b1 = local_df(spark, [(0, "v%d" % i) for i in range(300)],
                  ["grp", "value"])
    b2 = local_df(spark, [(0, "v%d" % i) for i in range(200, 500)],
                  ["grp", "value"])
    state.foreach_batch(b1, 0)
    after_first = _regs(state.current())
    state.foreach_batch(b1, 0)  # retry: max of itself
    assert _regs(state.current()) == after_first
    state.foreach_batch(b2, 1)
    combined = _regs(state.current())
    # a regressed epoch replaying already-folded data: harmless
    state.foreach_batch(b1, 0)
    assert _regs(state.current()) == combined
    # the same data as a NEW epoch: registers unchanged
    state.foreach_batch(b1, 2)
    state.foreach_batch(b2, 3)
    assert _regs(state.current()) == combined
    direct = hll_sketch(
        b1.unionByName(b2), ["grp"], "value", p=8
    )
    assert combined == _regs(direct)


def test_fresh_checkpoint_restart_new_data_at_low_epoch(
    spark, tmp_path,
):
    """A new query lifetime (fresh checkpoint dir) reuses the state
    dir: its epoch ids restart at 0 and batch boundaries differ, so a
    low epoch id can carry brand-new values. An epoch-id gate would
    drop them forever; the unconditional fold must count them."""
    state = DistinctState(spark, str(tmp_path / "state"), ["grp"],
                          "value", p=8)
    a = local_df(spark, [(0, "a%d" % i) for i in range(200)],
                 ["grp", "value"])
    state.foreach_batch(a, 0)
    state.foreach_batch(a, 1)  # lifetime A ends at epoch 1
    # lifetime B: epoch 0 again, NEW values
    b = local_df(spark, [(0, "b%d" % i) for i in range(200)],
                 ["grp", "value"])
    state.foreach_batch(b, 0)
    direct = hll_sketch(a.unionByName(b), ["grp"], "value", p=8)
    assert _regs(state.current()) == _regs(direct)


def test_empty_batch_advances_epoch(spark, tmp_path):
    state = DistinctState(spark, str(tmp_path / "state"), ["grp"],
                          "value", p=8)
    empty = local_df(spark, [(0, "x")], ["grp", "value"]).where(
        "grp > 5"
    )
    state.foreach_batch(empty, 0)
    assert state.current() is None
    assert state.estimates() is None
    b = local_df(spark, [(0, "v%d" % i) for i in range(100)],
                 ["grp", "value"])
    state.foreach_batch(b, 1)
    est = state.estimates().collect()[0]
    assert abs(est["est"] - 100) / 100 < 0.15
