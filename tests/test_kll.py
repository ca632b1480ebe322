"""KLL quantile sketch (round-5 verdict item 10): bounded rank error
independent of group size, mergeable, same relation-style API as the
other sketches."""

import numpy as np
import pytest

from pure_python_geospatial_export_spark.operators.sketch import (
    KLLSketch,
    kll_merge,
    kll_quantiles,
    kll_sketch,
)
from pure_python_geospatial_export_spark.session import local_df

# observed max interval-rank error at k=200 is ~0.008 across all the
# adversarial orders below; assert a 2x headroom bound
ERR_BOUND = 0.016
QS = np.linspace(0.01, 0.99, 33)


def _max_rank_err(sk, data):
    s = np.sort(np.asarray(data, dtype=np.float64))
    n = len(s)
    errs = []
    for q in QS:
        est = sk.quantile(float(q))
        # with duplicates the true rank of a value is an INTERVAL
        # [left, right]; error is the distance from q to it
        lo = np.searchsorted(s, est, side="left") / n
        hi = np.searchsorted(s, est, side="right") / n
        errs.append(max(0.0, lo - q, q - hi))
    return max(errs)


@pytest.mark.parametrize("case", [
    "uniform", "sorted", "reversed", "zipf", "constant_tail", "small",
])
def test_rank_error_bound(case):
    rng = np.random.default_rng(7)
    data = {
        "uniform": rng.uniform(0, 1, 100_000),
        "sorted": np.arange(100_000, dtype=float),
        "reversed": np.arange(100_000, dtype=float)[::-1],
        "zipf": rng.zipf(1.5, 100_000).astype(float),
        "constant_tail": np.concatenate(
            [np.zeros(90_000), rng.uniform(0, 1, 10_000)]
        ),
        "small": rng.uniform(0, 1, 150),
    }[case]
    sk = KLLSketch(200)
    sk.update_many(data)
    assert sk.n == len(data)
    assert _max_rank_err(sk, data) <= ERR_BOUND
    # memory: compactor-chain capacity, not stream size
    assert sum(len(lv) for lv in sk.levels) <= 800


def test_error_independent_of_stream_size():
    """The point of KLL over the hash sample: the bound holds as n
    grows with k fixed."""
    rng = np.random.default_rng(3)
    for n in (10_000, 100_000, 1_000_000):
        data = rng.normal(0, 1, n)
        sk = KLLSketch(200)
        sk.update_many(data)
        assert _max_rank_err(sk, data) <= ERR_BOUND, n
        assert sum(len(lv) for lv in sk.levels) <= 800, n


def test_merge_matches_direct_bound():
    rng = np.random.default_rng(5)
    parts = [rng.uniform(i, i + 2, 40_000) for i in range(5)]
    merged = KLLSketch(200)
    for p in parts:
        s = KLLSketch(200)
        s.update_many(p)
        merged.merge(s)
    allv = np.concatenate(parts)
    assert merged.n == len(allv)
    assert _max_rank_err(merged, allv) <= ERR_BOUND


def test_roundtrip_and_validation():
    sk = KLLSketch(64)
    sk.update_many([1.0, 2.0, 3.0])
    levels, n = sk.to_row()
    back = KLLSketch.from_row(levels, n, 64)
    assert back.quantile(0.5) == sk.quantile(0.5)
    with pytest.raises(ValueError, match="k must be"):
        KLLSketch(4)
    with pytest.raises(ValueError, match="empty"):
        KLLSketch(64).quantile(0.5)
    with pytest.raises(ValueError, match="q must be"):
        sk.quantile(1.5)
    # exact on tiny inputs (no compaction has happened)
    assert sk.quantile(0.0) == 1.0
    assert sk.quantile(1.0) == 3.0
    assert sk.rank(2.0) == pytest.approx(2 / 3)


def test_spark_kll_relation(spark):
    """Distributed build == bounded sketch rows; estimates within the
    error bound per group; merge of per-day sketches == one build."""
    rng = np.random.default_rng(11)
    rows = []
    data = {}
    for g, (lo, hi) in enumerate([(0, 1), (10, 30), (-5, 5)]):
        vals = rng.uniform(lo, hi, 20_000)
        data[g] = vals
        rows += [(g, int(i % 7), float(v))
                 for i, v in enumerate(vals)]
    df = local_df(spark, rows, ["grp", "day", "value"]).repartition(8)

    sk_df = kll_sketch(df, ["grp"], "value", k=200)
    got = {r["grp"]: r for r in sk_df.collect()}
    assert set(got) == {0, 1, 2}
    for g, r in got.items():
        assert r["n"] == 20_000
        assert sum(len(lv) for lv in r["levels"]) <= 800
        sk = KLLSketch.from_row(r["levels"], r["n"], 200)
        assert _max_rank_err(sk, data[g]) <= ERR_BOUND

    est = kll_quantiles(sk_df, ["grp"], [0.5, 0.9])
    for r in est.collect():
        s = np.sort(data[r["grp"]])
        lo = np.searchsorted(s, r["est"], side="left") / len(s)
        hi = np.searchsorted(s, r["est"], side="right") / len(s)
        assert max(0.0, lo - r["q"], r["q"] - hi) <= ERR_BOUND

    # rollup: per-(grp, day) sketches merged to grp == one-shot bound
    daily = kll_sketch(df, ["grp", "day"], "value", k=200)
    rolled = kll_merge(daily.drop("day"), ["grp"], k=200)
    for r in rolled.collect():
        assert r["n"] == 20_000
        sk = KLLSketch.from_row(r["levels"], r["n"], 200)
        assert _max_rank_err(sk, data[r["grp"]]) <= ERR_BOUND


def test_all_null_group_is_skipped(spark):
    """Review fix: a group whose values are all NULL once emitted an
    n=0 sketch row that crashed quantile() on the executor; it now
    simply has no sketch row."""
    from pyspark.sql.types import (
        DoubleType as _D,
        LongType as _L,
        StructField as _F,
        StructType as _T,
    )
    schema = _T([_F("grp", _L(), False), _F("value", _D(), True)])
    rows = ([(1, float(i)) for i in range(50)]
            + [(2, None)] * 10
            + [(3, None), (3, 5.0)])
    df = spark.createDataFrame(rows, schema).repartition(4)
    sk = kll_sketch(df, ["grp"], "value", k=64)
    got = {r["grp"]: r["n"] for r in sk.collect()}
    assert got == {1: 50, 3: 1}  # group 2 absent, group 3 counts non-null
    est = kll_quantiles(sk, ["grp"], [0.5])
    vals = {r["grp"]: r["est"] for r in est.collect()}
    assert vals[3] == 5.0
    assert 0 <= vals[1] <= 49


def test_merge_is_fold_order_deterministic(spark):
    """ADVICE r5: KLL compaction consumes a seeded RNG, so the merged
    sketch depends on fold ORDER; kll_merge must therefore sort partial
    rows by content before folding so run-to-run arrival-order jitter
    cannot change the estimate."""
    rng = np.random.default_rng(7)
    partials = []
    for i in range(6):
        sk = KLLSketch(64)
        sk.update_many(rng.uniform(0, 100, 5_000))
        levels, n = sk.to_row()
        partials.append((0, levels, n))

    import itertools

    outs = set()
    for perm in itertools.islice(
            itertools.permutations(partials), 8):
        df = local_df(spark, list(perm), ["grp", "levels", "n"])
        (row,) = kll_merge(df, ["grp"], k=64).collect()
        sk = KLLSketch.from_row(row["levels"], row["n"], 64)
        outs.add(tuple(sk.quantile(q)
                       for q in (0.1, 0.25, 0.5, 0.75, 0.9)))
    assert len(outs) == 1, outs
