"""KMV distinct-count sketch: accuracy, mergeability, dup-insensitivity."""

import numpy as np
from pyspark.sql import functions as F

from pure_python_geospatial_export_spark.operators import sketch


def _vals_df(spark, rows):
    return spark.createDataFrame(rows, ["grp", "val"])


def test_kmv_exact_below_k(spark):
    df = _vals_df(spark, [("a", "v%d" % i) for i in range(10)])
    sk = sketch.kmv_sketch(df, ["grp"], "val", k=64)
    est = sk.select(sketch.kmv_estimate("sketch", 64).alias("e")).first()
    assert est["e"] == 10.0  # exact below saturation


def test_kmv_duplicates_dont_change_sketch(spark):
    base = [("a", "v%d" % i) for i in range(50)]
    df1 = _vals_df(spark, base)
    df2 = _vals_df(spark, base + base + base)  # every value x3
    s1 = df1.transform(
        lambda d: sketch.kmv_sketch(d, ["grp"], "val", k=16)
    ).first()["sketch"]
    s2 = df2.transform(
        lambda d: sketch.kmv_sketch(d, ["grp"], "val", k=16)
    ).first()["sketch"]
    assert s1 == s2


def test_kmv_estimate_accuracy(spark):
    n = 5000
    df = _vals_df(spark, [("a", "value-%d" % i) for i in range(n)])
    sk = sketch.kmv_sketch(df, ["grp"], "val", k=256)
    est = sk.select(sketch.kmv_estimate("sketch", 256).alias("e")
                    ).first()["e"]
    assert abs(est - n) / n < 0.2, est  # k=256 -> ~6% std error


def test_kmv_merge_equals_direct(spark):
    """Sketching fine groups then merging must equal sketching the
    coarse group directly — the mergeability property."""
    rng = np.random.default_rng(3)
    rows = [("g%d" % (i % 7), "item-%d" % int(rng.integers(0, 800)))
            for i in range(3000)]
    df = spark.createDataFrame(rows, ["fine", "val"]).withColumn(
        "coarse", F.lit("all")
    )
    fine = sketch.kmv_sketch(df, ["coarse", "fine"], "val", k=32)
    merged = sketch.kmv_merge(fine, ["coarse"], k=32).first()["sketch"]
    direct = sketch.kmv_sketch(df, ["coarse"], "val", k=32
                               ).first()["sketch"]
    assert merged == direct


def test_kmv_merge_large_fanin_equals_default(spark):
    rng = np.random.default_rng(5)
    rows = [("g%d" % (i % 11), "v-%d" % int(rng.integers(0, 900)))
            for i in range(2500)]
    df = spark.createDataFrame(rows, ["fine", "val"]).withColumn(
        "coarse", F.lit("all")
    )
    fine = sketch.kmv_sketch(df, ["coarse", "fine"], "val", k=24)
    small = sketch.kmv_merge(fine, ["coarse"], k=24).first()["sketch"]
    large = sketch.kmv_merge(fine, ["coarse"], k=24,
                             large_fanin=True).first()["sketch"]
    assert small == large


def test_kmv_hash_sql_matches_column(spark):
    import duckdb

    vals = ["doc://%d" % i for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select(
            "s", sketch.kmv_hash_col(F.col("s")).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    duck = dict(con.sql(
        "SELECT s, %s AS h FROM (SELECT unnest(%r) AS s)"
        % (sketch.kmv_hash_sql("s"), vals)
    ).fetchall())
    assert got == duck


# --------------------------------------------------------------------------
# SpaceSaving mergeable heavy hitters (round-3 verdict item 6)
# --------------------------------------------------------------------------


def _zipf_rows(n_heavy=6, heavy_count=400, n_tail=3000, groups=("g1", "g2")):
    """Per group: n_heavy keys with ~heavy_count occurrences + a long
    tail of singletons. True counts are exact and known."""
    rows = []
    true = {}
    for g in groups:
        for h in range(n_heavy):
            c = heavy_count - 30 * h
            true[(g, "heavy%d" % h)] = c
            rows += [(g, "heavy%d" % h)] * c
        for t in range(n_tail):
            key = "tail-%s-%d" % (g, t)
            rows.append((g, key))
            true[(g, key)] = 1
    return rows, true


def test_space_saving_guarantee_vs_exact(spark):
    rows, true = _zipf_rows()
    df = _vals_df(spark, rows).repartition(8)
    m = 128
    got = sketch.heavy_hitters_sketch(df, ["grp"], "val", k=6, m=m)
    exact = sketch.top_keys_per_group(df, ["grp"], "val", k=6)
    got_rows = got.collect()
    assert got_rows, "sketch must return hitters"
    n_per_group = {}
    for (g, _k), c in true.items():
        n_per_group[g] = n_per_group.get(g, 0) + c
    for r in got_rows:
        t = true.get((r["grp"], r["key"]), 0)
        assert r["lo"] <= t <= r["hi"], (r, t)
        # interval width bounded by the merged-minima bound
        assert r["hi"] - r["lo"] <= 2 * n_per_group[r["grp"]] / m
    # every exact top-6 key (all with freq >> N/m) is found by the sketch
    exact_keys = {(r["grp"], r["val"]) for r in exact.collect()}
    sk_keys = {(r["grp"], r["key"]) for r in got_rows}
    assert exact_keys == sk_keys


def test_space_saving_single_partition_is_exact_for_heavies(spark):
    rows, true = _zipf_rows(n_tail=500, groups=("solo",))
    df = _vals_df(spark, rows).coalesce(1)
    got = sketch.heavy_hitters_sketch(df, ["grp"], "val", k=4, m=64)
    for r in got.collect():
        t = true[(r["grp"], r["key"])]
        # single summary: est may overcount by err but lo/hi still bracket
        assert r["lo"] <= t <= r["hi"]
        assert r["est"] >= t  # SpaceSaving never undercounts locally


def test_space_saving_shuffle_rows_bounded(spark):
    """The merge input is <= m rows per (group, partition), independent
    of distinct-key cardinality — the scale rationale."""
    rows, _ = _zipf_rows(n_tail=4000, groups=("g1",))
    df = _vals_df(spark, rows).repartition(4)
    m = 32
    summ = sketch.space_saving_summaries(df, ["grp"], "val", m=m)
    per = summ.groupBy("grp", "pid").count().collect()
    assert per and all(r["count"] <= m for r in per)


# ---------------------------------------------------------------------------
# quantile sample sketch
# ---------------------------------------------------------------------------

def test_quantile_sample_exact_when_unsaturated(spark):
    from pure_python_geospatial_export_spark.session import local_df

    rows = [("g", i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])]
    df = local_df(spark, rows, ["grp", "rid", "value"])
    sample = sketch.quantile_sample(df, ["grp"], "value", "rid", k=100)
    got = {
        (r["grp"], r["q"]): r["est"]
        for r in sketch.quantile_estimate(
            sample, ["grp"], [0.2, 0.5, 1.0]
        ).collect()
    }
    # sorted: [1,3,5,7,9]; type-1 index = max(ceil(q*5), 1)
    assert got[("g", 0.2)] == 1.0
    assert got[("g", 0.5)] == 5.0
    assert got[("g", 1.0)] == 9.0


def test_quantile_sample_merge_property(spark):
    """Sketch(union) == merge(sketch(half A), sketch(half B)) at
    saturation — the bottom-k property that makes rollups sound."""
    import random

    from pure_python_geospatial_export_spark.session import local_df

    rnd = random.Random(31)
    rows = [
        ("g%d" % (i % 3), i, rnd.gauss(0, 1)) for i in range(3000)
    ]
    df = local_df(spark, rows, ["grp", "rid", "value"])
    k = 64
    whole = sketch.quantile_sample(df, ["grp"], "value", "rid", k=k)
    half_a = sketch.quantile_sample(
        df.where("rid % 2 = 0"), ["grp"], "value", "rid", k=k
    )
    half_b = sketch.quantile_sample(
        df.where("rid % 2 = 1"), ["grp"], "value", "rid", k=k
    )
    merged = sketch.quantile_sample_merge(
        half_a.unionAll(half_b), ["grp"], k=k
    )
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b
    # and the per-group sample is capped at k
    sizes = whole.groupBy("grp").count().collect()
    assert all(r["count"] == k for r in sizes)


def test_quantile_sample_rank_error_bound(spark):
    """Saturated regime: estimated quantiles must sit within a few
    /sqrt(k) of the true rank (deterministic fixture, generous bound)."""
    import random

    from pure_python_geospatial_export_spark.session import local_df

    rnd = random.Random(7)
    n, k = 20000, 256
    vals = sorted(rnd.expovariate(1.0) for _ in range(n))
    rows = [("g", i, v) for i, v in enumerate(
        [vals[j] for j in rnd.sample(range(n), n)]
    )]
    df = local_df(spark, rows, ["grp", "rid", "value"])
    sample = sketch.quantile_sample(df, ["grp"], "value", "rid", k=k)
    got = {
        r["q"]: r["est"]
        for r in sketch.quantile_estimate(
            sample, ["grp"], [0.1, 0.5, 0.9]
        ).collect()
    }
    import bisect
    for q, est in got.items():
        true_rank = q * n
        est_rank = bisect.bisect_right(vals, est)
        assert abs(est_rank - true_rank) <= 4.0 * n / (k ** 0.5), (
            q, est_rank, true_rank
        )


def test_kmv_overlap_exact_when_unsaturated(spark):
    # k >= |A ∪ B|: the union sketch IS the union, so all three
    # estimates are exact set arithmetic
    a_vals = {"v%d" % i for i in range(30)}
    b_vals = {"v%d" % i for i in range(20, 50)}  # overlap = 10
    rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
    sk = sketch.kmv_sketch(_vals_df(spark, rows), ["grp"], "val", k=64)
    a = sk.where("grp = 'A'").select(F.col("sketch").alias("sa"))
    b = sk.where("grp = 'B'").select(F.col("sketch").alias("sb"))
    eu, j, ei = sketch.kmv_overlap_cols("sa", "sb", k=64)
    row = a.crossJoin(b).select(
        eu.alias("eu"), j.alias("j"), ei.alias("ei")
    ).first()
    assert row["eu"] == 50.0
    assert row["j"] == 10.0 / 50.0
    assert row["ei"] == 10.0


def test_kmv_overlap_estimate_accuracy(spark):
    # saturated sketches: estimates within sampling error of truth
    n, ov, k = 4000, 1000, 256
    a_vals = ["a-%d" % i for i in range(n)]
    b_vals = ["a-%d" % i for i in range(ov)] + [
        "b-%d" % i for i in range(n - ov)
    ]
    rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
    sk = sketch.kmv_sketch(_vals_df(spark, rows), ["grp"], "val", k=k)
    a = sk.where("grp = 'A'").select(F.col("sketch").alias("sa"))
    b = sk.where("grp = 'B'").select(F.col("sketch").alias("sb"))
    eu, j, ei = sketch.kmv_overlap_cols("sa", "sb", k=k)
    row = a.crossJoin(b).select(eu.alias("eu"), ei.alias("ei")).first()
    true_union = 2 * n - ov
    assert abs(row["eu"] - true_union) / true_union < 0.2
    assert abs(row["ei"] - ov) / ov < 0.5  # J ~ 1/7, se ~ 2.2%/J


def test_kmv_union_col_composes(spark):
    # union-of-sketches == sketch-of-union, and associativity
    rows = (
        [("A", "x%d" % i) for i in range(60)]
        + [("B", "y%d" % i) for i in range(60)]
        + [("AB", "x%d" % i) for i in range(60)]
        + [("AB", "y%d" % i) for i in range(60)]
    )
    sk = sketch.kmv_sketch(_vals_df(spark, rows), ["grp"], "val", k=16)
    a = sk.where("grp = 'A'").select(F.col("sketch").alias("sa"))
    b = sk.where("grp = 'B'").select(F.col("sketch").alias("sb"))
    u = a.crossJoin(b).select(
        sketch.kmv_union_col("sa", "sb", 16).alias("u")
    ).first()["u"]
    direct = sk.where("grp = 'AB'").first()["sketch"]
    assert u == direct
