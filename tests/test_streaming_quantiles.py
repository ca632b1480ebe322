"""Streaming KLL quantiles (streaming/quantiles.py): per-group
sketches folded across micro-batches with transactional epoch
tracking (KLL merge is NOT idempotent — redelivered epochs must fold
nothing)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pure_python_geospatial_export_spark.operators.sketch import (
    KLLSketch,
)
from pure_python_geospatial_export_spark.session import local_df
from pure_python_geospatial_export_spark.streaming.quantiles import (
    QuantileState,
    quantile_sink,
)

ERR_BOUND = 0.016


def _write_batches(tmp_path, batches):
    src = tmp_path / "vals_src"
    src.mkdir()
    schema = pa.schema([("grp", pa.int64()), ("value", pa.float64())])
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


def _max_rank_err(sk, data):
    s = np.sort(np.asarray(data, dtype=np.float64))
    n = len(s)
    errs = []
    for q in np.linspace(0.01, 0.99, 33):
        est = sk.quantile(float(q))
        lo = np.searchsorted(s, est, side="left") / n
        hi = np.searchsorted(s, est, side="right") / n
        errs.append(max(0.0, lo - q, q - hi))
    return max(errs)


def test_stream_fold_matches_error_bound(spark, tmp_path):
    rng = np.random.default_rng(9)
    data = {0: rng.uniform(0, 1, 30_000), 1: rng.uniform(5, 9, 30_000)}
    rows = [(g, float(v)) for g, vals in data.items() for v in vals]
    rng.shuffle(rows)
    batches = [rows[i::6] for i in range(6)]
    src = _write_batches(tmp_path, batches)

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )
    schema = StructType([
        StructField("grp", LongType(), False),
        StructField("value", DoubleType(), False),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state, q = quantile_sink(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        ["grp"], "value", k=200,
    )
    q.awaitTermination()

    got = {r["grp"]: r for r in state.current().collect()}
    assert set(got) == {0, 1}
    for g, r in got.items():
        assert r["n"] == 30_000  # exact counts: each batch folded once
        sk = KLLSketch.from_row(r["levels"], r["n"], 200)
        assert _max_rank_err(sk, data[g]) <= ERR_BOUND
    est = {(r["grp"], r["q"]): r["est"]
           for r in state.quantiles([0.5]).collect()}
    assert 0.4 <= est[(0, 0.5)] <= 0.6
    assert 6.5 <= est[(1, 0.5)] <= 7.5
    # superseded version dirs pruned
    dirs = [n for n in os.listdir(state.state_dir)
            if n.startswith("v") and n[1:].isdigit()]
    assert len(dirs) <= 2


def test_redelivered_epoch_folds_nothing(spark, tmp_path):
    """The transactional check: KLL merge is not idempotent, so a
    foreachBatch retry of a committed epoch must be a no-op."""
    state = QuantileState(spark, str(tmp_path / "state"), ["grp"],
                          "value", k=64)
    b1 = local_df(spark, [(0, float(v)) for v in range(100)],
                  ["grp", "value"])
    b2 = local_df(spark, [(0, float(v)) for v in range(100, 150)],
                  ["grp", "value"])
    state.foreach_batch(b1, 0)
    state.foreach_batch(b1, 0)   # same-epoch retry: no double count
    state.foreach_batch(b2, 1)
    state.foreach_batch(b2, 1)
    (row,) = state.current().collect()
    assert row["n"] == 150
    # a NEW epoch with the same data DOES fold (it is new data)
    state.foreach_batch(b2, 2)
    (row,) = state.current().collect()
    assert row["n"] == 200


def test_epoch_regression_raises_and_rebind_recovers(spark, tmp_path):
    """An epoch id BELOW the committed watermark can only come from a
    different query lifetime (fresh checkpoint dir against existing
    state): silently skipping would serve stale quantiles forever, so
    it raises; rebind() accepts the new numbering, keeping sketches."""
    import pytest

    state = QuantileState(spark, str(tmp_path / "state"), ["grp"],
                          "value", k=64)
    b1 = local_df(spark, [(0, float(v)) for v in range(100)],
                  ["grp", "value"])
    state.foreach_batch(b1, 0)
    state.foreach_batch(b1, 1)
    with pytest.raises(RuntimeError, match="regressed"):
        state.foreach_batch(b1, 0)  # restarted query, fresh checkpoint
    # state untouched by the rejected fold
    (row,) = state.current().collect()
    assert row["n"] == 200
    state.rebind()
    state.foreach_batch(b1, 0)  # new query's epoch 0 now folds
    (row,) = state.current().collect()
    assert row["n"] == 300


def test_empty_batch_advances_epoch(spark, tmp_path):
    state = QuantileState(spark, str(tmp_path / "state"), ["grp"],
                          "value", k=64)
    empty = local_df(spark, [(0, 1.0)], ["grp", "value"]).where(
        "grp > 5"
    )
    state.foreach_batch(empty, 0)
    assert state.current() is None
    assert state.quantiles([0.5]) is None
    # the empty epoch is committed: its redelivery stays a no-op and
    # later epochs proceed normally
    state.foreach_batch(empty, 0)
    b = local_df(spark, [(0, float(v)) for v in range(10)],
                 ["grp", "value"])
    state.foreach_batch(b, 1)
    (row,) = state.current().collect()
    assert row["n"] == 10
