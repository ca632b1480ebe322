"""ordered_group_map (operators/grouped.py): byte-for-byte equivalent
of groupBy().applyInPandas at a fraction of the per-group overhead —
including groups that span Arrow batch boundaries."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pure_python_geospatial_export_spark.operators.grouped import (
    ordered_group_map,
)
from pure_python_geospatial_export_spark.session import local_df

OUT = StructType([
    StructField("k1", LongType(), False),
    StructField("k2", StringType(), False),
    StructField("n", LongType(), False),
    StructField("s", DoubleType(), False),
    StructField("first_v", DoubleType(), False),
])


def _make_agg():
    # built as a CLOSURE (not a module-level function) so cloudpickle
    # ships it by value — executors can't import test modules
    def _agg(key, pdf):
        # order-sensitive on purpose (first_v) so the sort_cols
        # contract is part of what the equivalence check pins
        return pd.DataFrame({
            "k1": [int(key[0])],
            "k2": [str(key[1])],
            "n": [len(pdf)],
            "s": [float(pdf["v"].sum())],
            "first_v": [float(pdf["v"].iloc[0])],
        })

    return _agg


_agg = _make_agg()


def _fixture(spark, n_groups=57, rows_per=9):
    rng = np.random.default_rng(7)
    rows = []
    for g in range(n_groups):
        for r in range(rows_per):
            rows.append((
                g % 11,
                "s%d" % (g // 11),
                int(rng.integers(0, 1000)),
                float(rng.uniform(-5, 5)),
            ))
    rng.shuffle(rows)
    return local_df(spark, rows, ["k1", "k2", "ord", "v"])


def _collect(df):
    return sorted(
        (r["k1"], r["k2"], r["n"], round(r["s"], 9),
         round(r["first_v"], 9))
        for r in df.collect()
    )


def test_matches_apply_in_pandas(spark):
    df = _fixture(spark)
    want = _collect(
        df.sortWithinPartitions("ord")  # fn is order-sensitive: pin it
        .groupBy("k1", "k2")
        .applyInPandas(lambda k, p: _agg(k, p.sort_values("ord")), OUT)
    )
    got = _collect(
        ordered_group_map(df, ["k1", "k2"], _agg, OUT,
                          sort_cols=["ord"])
    )
    assert got == want
    assert len(got) == 57  # one output row per (k1, k2) group


def test_groups_spanning_arrow_batches(spark):
    """Force tiny Arrow batches so nearly every group straddles a batch
    edge — the carry-over path must reassemble them exactly."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        df = _fixture(spark, n_groups=13, rows_per=8).coalesce(2)
        want = _collect(
            df.groupBy("k1", "k2")
            .applyInPandas(
                lambda k, p: _agg(k, p.sort_values("ord")), OUT
            )
        )
        got = _collect(
            ordered_group_map(df, ["k1", "k2"], _agg, OUT,
                              sort_cols=["ord"])
        )
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )


def test_single_group_and_empty(spark):
    df = local_df(spark, [(1, "a", 0, 2.0), (1, "a", 1, 3.0)],
                  ["k1", "k2", "ord", "v"])
    got = _collect(ordered_group_map(df, ["k1", "k2"], _agg, OUT,
                                     sort_cols=["ord"]))
    assert got == [(1, "a", 2, 5.0, 2.0)]
    empty = df.where("k1 > 99")
    assert ordered_group_map(
        empty, ["k1", "k2"], _agg, OUT, sort_cols=["ord"]
    ).count() == 0


def test_requires_keys(spark):
    df = local_df(spark, [(1, 2.0)], ["k", "v"])
    with pytest.raises(ValueError, match="key_cols"):
        ordered_group_map(df, [], _agg, OUT)


def test_single_exchange_plan(spark):
    """The rewrite must not add a shuffle: one hash exchange on the
    keys, same as grouped-map."""
    df = _fixture(spark)
    plan = (
        ordered_group_map(df, ["k1", "k2"], _agg, OUT,
                          sort_cols=["ord"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_null_keys_form_one_group(spark):
    """Review fix: Spark NULL keys surface as NaN in float batches and
    NaN != NaN; the boundary scan and carry must treat them as ONE
    group, exactly like applyInPandas."""
    from pyspark.sql.types import (
        DoubleType as _D,
        LongType as _L,
        StringType as _S,
        StructField as _F,
        StructType as _T,
    )
    schema = _T([
        _F("k1", _L(), True),
        _F("k2", _S(), True),
        _F("ord", _L(), False),
        _F("v", _D(), False),
    ])
    rows = ([(None, "x", i, float(i)) for i in range(7)]
            + [(1, None, i, float(10 + i)) for i in range(5)]
            + [(1, "x", i, float(20 + i)) for i in range(4)])
    df = spark.createDataFrame(rows, schema).repartition(3)
    def _collect_n(frame):
        return sorted(
            (
                (r["k1"] is None, r["k1"] or 0),
                (r["k2"] is None, r["k2"] or ""),
                r["n"], round(r["s"], 9), round(r["first_v"], 9),
            )
            for r in frame.collect()
        )

    want = _collect_n(
        df.groupBy("k1", "k2")
        .applyInPandas(
            lambda k, p: _agg_null(
                k, p.sort_values("ord").reset_index(drop=True)
            ),
            OUT_NULL,
        )
    )
    got = _collect_n(
        ordered_group_map(df, ["k1", "k2"], _agg_null, OUT_NULL,
                          sort_cols=["ord"])
    )
    assert got == want
    assert len(got) == 3  # null-keyed groups stay whole


OUT_NULL = StructType([
    StructField("k1", LongType(), True),
    StructField("k2", StringType(), True),
    StructField("n", LongType(), False),
    StructField("s", DoubleType(), False),
    StructField("first_v", DoubleType(), False),
])


def _make_null_agg():
    def _agg(key, pdf):
        import math
        k1 = key[0]
        if k1 is not None and isinstance(k1, float) and math.isnan(k1):
            k1 = None
        return pd.DataFrame({
            "k1": [None if k1 is None else int(k1)],
            "k2": [None if key[1] is None else str(key[1])],
            "n": [len(pdf)],
            "s": [float(pdf["v"].sum())],
            # verifies the fresh 0-based index contract too
            "first_v": [float(pdf["v"][0])],
        })

    return _agg


_agg_null = _make_null_agg()
