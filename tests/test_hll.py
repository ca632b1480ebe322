"""HyperLogLog register relation: cross-engine-exact build (md5-prefix
hash, bin()-based rank), lossless register-wise-max merge, and the
scaled-integer harmonic sum that makes estimates bit-reproducible."""

import hashlib

import pytest

from pure_python_geospatial_export_spark.operators.sketch import (
    HLL_SCALE_BITS,
    hll_estimate,
    hll_merge,
    hll_sketch,
)
from pure_python_geospatial_export_spark.session import local_df


def _ref_registers(values, p):
    """Brute-force registers from the definition: md5-prefix hash,
    low-p-bit bucket, leading-zero rank of the remaining 32-p bits."""
    m = 1 << p
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        bucket = h % m
        rest = h // m
        rho = (33 - p) - rest.bit_length() if rest else 33 - p
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _collect_regs(df):
    return {
        (r["g"], r["bucket"]): r["reg"] for r in df.collect()
    }


def test_registers_match_definition(spark):
    vals = ["u%d" % i for i in range(500)]
    rows = [("a", v) for v in vals] + [("b", v) for v in vals[:100]]
    df = local_df(spark, rows, ["g", "v"])
    sk = hll_sketch(df, ["g"], "v", p=6)
    got = _collect_regs(sk)
    for g, n in (("a", 500), ("b", 100)):
        ref = _ref_registers(vals[:n], 6)
        mine = {b: r for (gg, b), r in got.items() if gg == g}
        assert mine == ref, g


def test_duplicates_do_not_change_sketch(spark):
    base = local_df(
        spark, [("a", "v%d" % i) for i in range(200)],
        ["g", "v"],
    )
    dup = base.union(base).union(base)
    a = _collect_regs(hll_sketch(base, ["g"], "v", p=8))
    b = _collect_regs(hll_sketch(dup, ["g"], "v", p=8))
    assert a == b


def test_merge_equals_direct_build(spark):
    # fine groups (g, sub) merged to g == sketch built directly on g,
    # row for row — the lossless-rollup property
    rows = [("g%d" % (i % 3), i % 7, "val%d" % i) for i in range(3000)]
    df = local_df(spark, rows, ["g", "sub", "v"])
    fine = hll_sketch(df, ["g", "sub"], "v", p=8)
    merged = hll_merge(fine, ["g"])
    direct = hll_sketch(df, ["g"], "v", p=8)
    assert _collect_regs(merged) == _collect_regs(direct)


def test_partitioning_invariance(spark):
    rows = [("g", "v%d" % i) for i in range(5000)]
    df = local_df(spark, rows, ["g", "v"])
    a = _collect_regs(hll_sketch(df.repartition(7), ["g"], "v", p=10))
    b = _collect_regs(hll_sketch(df.repartition(2), ["g"], "v", p=10))
    assert a == b


@pytest.mark.parametrize("n,p,tol", [
    (50, 8, 0.05),       # small range: linear counting, very accurate
    (20000, 11, 0.08),   # raw path: ~1.04/sqrt(2048) = 2.3%, 3.5x slack
])
def test_estimate_accuracy(spark, n, p, tol):
    df = local_df(
        spark, [("g", "item-%d" % i) for i in range(n)],
        ["g", "v"],
    )
    est = hll_estimate(
        hll_sketch(df, ["g"], "v", p=p), ["g"], p=p
    ).collect()[0]
    assert abs(est["est"] - n) / n < tol
    # harmonic is the exact scaled-integer sum: recompute from regs
    regs = _ref_registers(["item-%d" % i for i in range(n)], p)
    scale = 1 << HLL_SCALE_BITS
    want = sum(scale >> r for r in regs.values()) + (
        (1 << p) - len(regs)
    ) * scale
    assert est["harmonic"] == want
    assert est["zeros"] == (1 << p) - len(regs)


def test_estimate_raw_vs_corrected(spark):
    # tiny n with correction off takes the biased raw path; with
    # correction on, the linear-counting branch engages (zeros > 0)
    df = local_df(
        spark, [("g", "x%d" % i) for i in range(10)],
        ["g", "v"],
    )
    sk = hll_sketch(df, ["g"], "v", p=8)
    raw = hll_estimate(sk, ["g"], p=8, correction=False).collect()[0]
    cor = hll_estimate(sk, ["g"], p=8, correction=True).collect()[0]
    assert abs(cor["est"] - 10) < 1.0
    assert raw["est"] != cor["est"]


def test_p_bounds():
    with pytest.raises(ValueError):
        hll_sketch(None, ["g"], "v", p=3)


def test_single_shuffle_plan(spark):
    # build is one aggregate: partial (map-side max) + final after ONE
    # exchange — the shape that holds at 10^12 rows
    df = local_df(
        spark, [("g", "v%d" % i) for i in range(100)],
        ["g", "v"],
    )
    plan = hll_sketch(df, ["g"], "v", p=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_null_values_do_not_count(spark):
    rows = [("a", "v%d" % i) for i in range(50)] + [("a", None)] * 5
    df = local_df(spark, rows, ["g", "v"])
    with_nulls = _collect_regs(hll_sketch(df, ["g"], "v", p=8))
    without = _collect_regs(
        hll_sketch(df.where("v IS NOT NULL"), ["g"], "v", p=8)
    )
    assert with_nulls == without
    assert all(b is not None for _g, b in with_nulls)
