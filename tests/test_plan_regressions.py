"""Physical-plan regression locks for the measured perf wins.

These plans were audited and tuned across rounds (docs/PLANS.md); a
Catalyst-visible regression — a shuffle creeping back into the flagship
join, the kNN window re-shuffling its candidates, the repetition
scalars hoisting above the explode — should fail CI, not a future
benchmark."""

import os

import __spark_entry__ as em

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _plan(spark, name):
    registry = {**em.queries(), **em.extra_queries()}
    df = registry[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan):
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobin")
    )


def test_flagship_pip_join_is_shuffle_free(spark):
    """The r2 win: broadcast cell-cover join, interior cells resolved in
    codegen, boundary refined inside the scan stage — ZERO shuffle
    exchanges anywhere (broadcasts are fine and expected)."""
    plan = _plan(spark, "pip_join")
    assert _shuffles(plan) == 0, plan
    assert "BroadcastExchange" in plan


def test_knn_grid_single_shuffle(spark):
    """The top-k window keys on a superset of the join's partitioning
    keys, so the replicated candidate relation is NOT re-shuffled: one
    hash exchange total."""
    plan = _plan(spark, "knn_grid")
    assert _shuffles(plan) == 1, plan


def test_repetition_projects_scalars_below_generate(spark):
    """Tokenization scalars must sit in the Project UNDER the Generate
    (parent prints first): if ExtractGenerator hoists them above, they
    re-evaluate per exploded gram row — O(tokens^2)/doc."""
    plan = _plan(spark, "repetition")
    assert plan.index("Generate") < plan.index("array_distinct"), plan
    assert _shuffles(plan) == 2, plan  # gram count + per-doc max


def test_polygon_overlap_single_shuffle(spark):
    """One candidate pipeline: the pair-dedupe groupBy is the only
    shuffle; splitting into sure/maybe branches used to re-run the
    whole candidate subtree (2 shuffles, 2 broadcasts)."""
    plan = _plan(spark, "polygon_overlap")
    assert _shuffles(plan) == 1, plan
    assert plan.count("BroadcastExchange") == 1, plan


def test_events_funnel_single_exchange(spark):
    """Three chained per-user windows share the partition key — stages
    2..n ride stage 1's hash partitioning, one exchange total."""
    plan = _plan(spark, "events_funnel")
    assert _shuffles(plan) == 1, plan


def test_no_row_at_a_time_python_udfs_anywhere(spark):
    """Global hygiene: every driver query must stay on JVM columns or
    Arrow-batched Python (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas). A BatchEvalPython node means a row-wise
    Python UDF crept onto a hot path."""
    offenders = {}
    for name in {**em.queries(), **em.extra_queries()}:
        plan = _plan(spark, name)
        if "BatchEvalPython" in plan:
            offenders[name] = plan
    assert not offenders, sorted(offenders)


def test_tile_mvt_single_shuffle(spark):
    """Point MVT packing: tile assignment is column math in the scan
    stage; the only exchange is the groupBy(tile_id) feeding the
    per-tile applyInPandas encoder, and the decode pass is a chained
    mapInPandas (no second exchange)."""
    plan = _plan(spark, "tile_mvt")
    assert _shuffles(plan) == 1, plan


def test_image_phash_shuffle_budget(spark):
    """Render -> hash are chained mapInPandas in the scan stage (no
    exchange); the banded pair join + pair dedupe + ph_a attach spend
    at most four hash exchanges. A fifth means a stage stopped reusing
    its child's partitioning."""
    plan = _plan(spark, "image_phash")
    assert _shuffles(plan) <= 4, plan


def test_similarity_topk_single_shuffle_with_group_limit(spark):
    """Exact cosine top-k: query set broadcasts, candidates shuffle
    ONCE on query id, and WindowGroupLimit prunes to k map-side
    (partial) before the final window — the r3/r4 bench deltas on this
    query were host noise, not a plan change; lock the shape."""
    plan = _plan(spark, "similarity_topk")
    assert _shuffles(plan) == 1, plan
    assert plan.count("BroadcastExchange") == 1, plan
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("WindowGroupLimit", 2)[-1], plan


def test_events_window_partial_agg_single_shuffle(spark):
    """Hourly window agg: map-side partial aggregation in the scan
    stage, one exchange on (window, type), final agg — no window
    function, no second exchange."""
    plan = _plan(spark, "events_window")
    assert _shuffles(plan) == 1, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final
    assert "partial_count" in plan, plan


def test_minhash_pipeline_shuffle_budget(spark):
    """VERDICT r5 #6: lock the banded self-join's shuffle shape in the
    corpus-scale regime (forced SMJ — neither verify side broadcasts
    at 100 TB). Budget: 2 exchanges for the band self-join sides, 1
    for the pair distinct, 2+2 for the two verify array joins = 7 hash
    exchanges, zero extra. The public near_duplicates_minhash API
    localCheckpoints its result (hiding the plan), so the lock builds
    the same un-checkpointed pipeline from its building blocks."""
    from pyspark.sql import functions as F

    from pure_python_geospatial_export_spark.operators import dedup

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.read.parquet(
            os.path.join(SF, "documents.parquet")
        ).select("doc_id", "text")
        base = dedup.minhash_signature(df, "doc_id", "text", 64, 3)
        cands = dedup.lsh_candidate_pairs(
            base, "doc_id", 16, 64, size_threshold=0.8
        )
        out = dedup.jaccard_verify(
            cands, df, "doc_id", "text", 0.8,
            shingles_df=base.select(
                "doc_id", F.col("shingle_hashes").alias("sh")
            ),
            size_prefilter=False,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert _shuffles(plan) == 7, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_curate_pipeline_shuffle_budget(spark):
    """VERDICT r5 #6: the whole curation preset's exchange budget in
    the forced-SMJ regime — 12 hash exchanges across its cost-ordered
    stages. A new stage composing badly (re-shuffling the corpus
    where it could ride an existing partitioning) shows up here as a
    count bump, independent of wall-clock noise."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "curate_pipeline")
        assert _shuffles(plan) == 12, plan
        assert "BatchEvalPython" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_dissolve_pair_join_shuffle_budget(spark):
    """The dissolve pair stage: exactly the two hash exchanges of the
    cell equi self-join (both sides of the exploded relation) and NO
    distinct anywhere — pair dedupe is the canonical-cell filter
    inside the join stage. A creeping Deduplicate/HashAggregate over
    (id_a, id_b) would re-shuffle every candidate pair."""
    import os

    from pyspark.sql import functions as F

    from pure_python_geospatial_export_spark.functions.points import (
        lon_col, lat_col,
    )
    from pure_python_geospatial_export_spark.operators.dissolve import (
        polygon_self_overlap_pairs,
    )

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    url = F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    pts = docs.withColumn("lon", lon_col(url)).withColumn(
        "lat", lat_col(url)
    ).where(F.col("doc_id") % 21 == 0)
    half = F.lit(0.5) + (F.col("doc_id") % 4).cast("double") * F.lit(0.3)
    wkt = F.format_string(
        "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, "
        "%.6f %.6f))",
        F.round(F.col("lon") - half, 6), F.round(F.col("lat") - half, 6),
        F.round(F.col("lon") + half, 6), F.round(F.col("lat") - half, 6),
        F.round(F.col("lon") + half, 6), F.round(F.col("lat") + half, 6),
        F.round(F.col("lon") - half, 6), F.round(F.col("lat") + half, 6),
        F.round(F.col("lon") - half, 6), F.round(F.col("lat") - half, 6),
    )
    probes = pts.select(F.col("doc_id").alias("id"), wkt.alias("wkt"))

    # corpus-scale regime: neither side of a fact-scale self-join
    # broadcasts at 100 TB, so force the SMJ shape (the minhash lock's
    # recipe)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = polygon_self_overlap_pairs(probes, res=6)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert _shuffles(plan) == 2, plan
        assert "Deduplicate" not in plan and "distinct" not in plan, \
            plan

        grouped = polygon_self_overlap_pairs(probes, res=6,
                                             strategy="grouped")
        gplan = grouped._jdf.queryExecution().executedPlan().toString()
        assert _shuffles(gplan) == 1, gplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
