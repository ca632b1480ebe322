"""Streaming heavy hitters (streaming/hh.py): per-group SpaceSaving
summaries folded across micro-batches with transactional epoch
tracking (the fold is NOT idempotent — redelivered epochs must fold
nothing)."""

import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pure_python_geospatial_export_spark.streaming.hh import (
    HeavyHitterState,
    heavy_hitters_sink,
)


def _write_batches(tmp_path, batches, name="keys_src"):
    src = tmp_path / name
    src.mkdir()
    schema = pa.schema([("grp", pa.int64()), ("key", pa.string())])
    for i, rows in enumerate(batches):
        t = pa.table(
            {"grp": [g for g, _ in rows],
             "key": [k for _, k in rows]},
            schema=schema,
        )
        path = src / ("b%03d.parquet" % i)
        pq.write_table(t, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src)


def _stream(spark, src):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    schema = StructType([
        StructField("grp", LongType(), False),
        StructField("key", StringType(), False),
    ])
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _zipf_rows(rng, n, n_keys, grp=0):
    ranks = rng.zipf(1.5, n)
    ranks = ranks[ranks <= n_keys][: n // 2]
    return [(grp, "k%04d" % r) for r in ranks]


def test_unsaturated_summary_is_exact(spark, tmp_path):
    rng = np.random.default_rng(3)
    rows = [(int(g), "key%d" % rng.integers(0, 40))
            for g in rng.integers(0, 2, 4000)]
    batches = [rows[i::5] for i in range(5)]
    src = _write_batches(tmp_path, batches)
    state, q = heavy_hitters_sink(
        _stream(spark, src), str(tmp_path / "state"),
        str(tmp_path / "ckpt"), ["grp"], "key", m=256,
    )
    q.awaitTermination()
    true = Counter((g, k) for g, k in rows)
    got = {(r["grp"], r["key"]): (r["cnt"], r["err"])
           for r in state.current().collect()}
    # m=256 never saturates at 40 distinct keys -> summary IS the
    # exact count table, err identically 0
    assert {gk: c for gk, (c, _) in got.items()} == dict(true)
    assert all(e == 0 for _, e in got.values())
    top = {(r["grp"], r["key"]): r for r in state.top(5).collect()}
    for (g, k), r in top.items():
        assert r["est"] == true[(g, k)]
        assert r["lo"] == r["est"] and r["hi"] == r["est"]


def test_saturated_invariants_and_guarantee(spark, tmp_path):
    rng = np.random.default_rng(11)
    rows = _zipf_rows(rng, 30_000, 400)
    batches = [rows[i::6] for i in range(6)]
    src = _write_batches(tmp_path, batches)
    m = 64
    state, q = heavy_hitters_sink(
        _stream(spark, src), str(tmp_path / "state"),
        str(tmp_path / "ckpt"), ["grp"], "key", m=m,
    )
    q.awaitTermination()
    true = Counter(k for _, k in rows)
    n = len(rows)
    summ = {r["key"]: (r["cnt"], r["err"])
            for r in state.current().collect()}
    assert len(summ) <= m
    # invariant: counters sum to the total stream weight
    assert sum(c for c, _ in summ.values()) == n
    # invariant: every tracked count brackets the true count
    for k, (c, e) in summ.items():
        assert true.get(k, 0) <= c
        assert true.get(k, 0) >= c - e
    # guarantee: any key with true frequency > n/m is tracked
    for k, cnt in true.items():
        if cnt > n / m:
            assert k in summ, k
    # untracked keys are bounded by the minimum counter
    cmin = min(c for c, _ in summ.values())
    for k, cnt in true.items():
        if k not in summ:
            assert cnt <= cmin


def test_redelivery_folds_nothing(spark, tmp_path):
    state = HeavyHitterState(spark, str(tmp_path / "state"),
                             ["grp"], "key", m=8)
    b = spark.createDataFrame(
        [(0, "a"), (0, "a"), (0, "b")], "grp long, key string"
    )
    state.foreach_batch(b, 0)
    before = sorted(
        (r["key"], r["cnt"]) for r in state.current().collect()
    )
    state.foreach_batch(b, 0)  # redelivered epoch: must be a no-op
    after = sorted(
        (r["key"], r["cnt"]) for r in state.current().collect()
    )
    assert before == after == [("a", 2), ("b", 1)]
    state.foreach_batch(b, 1)  # a NEW epoch folds
    assert sorted(
        (r["key"], r["cnt"]) for r in state.current().collect()
    ) == [("a", 4), ("b", 2)]


def test_epoch_regression_raises_and_rebind(spark, tmp_path):
    state = HeavyHitterState(spark, str(tmp_path / "state"),
                             ["grp"], "key", m=8)
    b = spark.createDataFrame([(0, "a")], "grp long, key string")
    state.foreach_batch(b, 5)
    with pytest.raises(RuntimeError, match="regressed"):
        state.foreach_batch(b, 2)
    state.rebind()
    state.foreach_batch(b, 0)  # new lifetime accepted after rebind
    assert [(r["key"], r["cnt"])
            for r in state.current().collect()] == [("a", 2)]


def test_fold_is_deterministic(spark, tmp_path):
    rng = np.random.default_rng(7)
    rows = _zipf_rows(rng, 8_000, 300)
    b1 = spark.createDataFrame(rows[:2000], "grp long, key string")
    b2 = spark.createDataFrame(rows[2000:], "grp long, key string")
    outs = []
    for d in ("s1", "s2"):
        state = HeavyHitterState(spark, str(tmp_path / d),
                                 ["grp"], "key", m=32)
        state.foreach_batch(b1, 0)
        state.foreach_batch(b2, 1)
        outs.append(sorted(
            (r["key"], r["cnt"], r["err"])
            for r in state.current().collect()
        ))
    assert outs[0] == outs[1]


def test_empty_batch_advances_epoch(spark, tmp_path):
    state = HeavyHitterState(spark, str(tmp_path / "state"),
                             ["grp"], "key", m=8)
    empty = spark.createDataFrame([], "grp long, key string")
    state.foreach_batch(empty, 0)
    assert state.current() is None
    b = spark.createDataFrame([(0, "a")], "grp long, key string")
    state.foreach_batch(b, 1)
    assert [(r["key"], r["cnt"])
            for r in state.current().collect()] == [("a", 1)]
