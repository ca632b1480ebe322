"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

The flagship measurement is the north-rule metric: pages/sec through the
full spatial-join + tile-assign pipeline over a synthesized pages table
(distributed generation, size scaled to the sf directory).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    pages_n = int(os.environ.get("SPARK_GRAFT_PAGES_N",
                                 str(int(50_000_000 * sf_num))))

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from pure_python_geospatial_export_spark.functions.points import (
        with_point,
    )
    from pure_python_geospatial_export_spark.operators.spatial_join import (
        spatial_join,
    )
    from pure_python_geospatial_export_spark.operators.tiles import (
        tile_stats,
    )
    from pure_python_geospatial_export_spark.session import get_spark
    from pure_python_geospatial_export_spark.sources.pages import synth_pages

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    spark = get_spark(app_name="ppge-bench", master="local[%d]" % cpus,
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.retainedStages": "30000"})
    spark.sparkContext.setLogLevel("ERROR")

    # Stage-metric deltas from the UI REST API. Wall clock on this
    # co-tenant host swings 5-25x under CPU-steal bursts (twice a
    # burst-poisoned BENCH artifact read as a phantom regression), but
    # total executor TASK time and shuffle bytes are properties of the
    # plan: a burst stretches wall time while task time stays ~flat, a
    # real regression moves both. Publishing both per run makes every
    # wall-time delta explainable in-artifact.
    from pure_python_geospatial_export_spark.session import (
        ui_completed_stages,
    )

    def _stage_snapshot():
        try:
            _ui, _app, stages = ui_completed_stages(spark)
        except Exception:
            return None
        return {(s["stageId"], s["attemptId"]): s for s in stages}

    def _stage_delta(before):
        """(task_time_s, shuffle_write_mb) of stages completed since
        `before` — polled until the listing stops growing so the last
        stage's async status flip is not missed."""
        if before is None:
            return None, None
        after = _stage_snapshot()
        if after is None:
            return None, None
        stable = 0
        for _ in range(20):
            time.sleep(0.05)
            nxt = _stage_snapshot() or after
            if len(nxt) == len(after):
                stable += 1
                if stable >= 2 and len(after) > len(before):
                    break
            else:
                stable = 0
            after = nxt
        new = [s for k, s in after.items() if k not in before]
        task_ms = sum(int(s.get("executorRunTime", 0)) for s in new)
        shuffle_b = sum(int(s.get("shuffleWriteBytes", 0)) for s in new)
        return round(task_ms / 1000.0, 3), round(shuffle_b / 2**20, 2)

    # --- flagship: pages spatial-join + tile-assign throughput ----------
    pages = with_point(synth_pages(spark, pages_n, partitions=cpus * 2))
    layer = entry_mod._layer_df(spark)
    from pure_python_geospatial_export_spark.sources.polygons import (
        load_rings,
        polygon_cells,
    )

    rings_by_id = load_rings(layer)
    cover = polygon_cells(spark, rings_by_id, 8)

    def flagship_run():
        joined = spatial_join(pages, layer, res=8, rings_by_id=rings_by_id,
                              cover=cover)
        out = joined.groupBy("name", "cell_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        out.write.format("noop").mode("overwrite").save()

    queries = entry_mod.queries()
    headline = [
        "pip_join",
        "tile_stats",
        "knn_grid",
        "dedup_exact",
        "text_quality",
        "similarity_topk",
        "events_window",
        "minhash_pairs",
        # round-3/4 heavy additions — benched so regressions in these
        # operators show in BENCH artifacts, not only in tests
        "polygon_overlap",
        "curate_pipeline",
        "tfidf_terms",
        "radius_pairs",
        "tile_mvt",
        "image_phash",
    ]

    def make_run(fn):
        def run():
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
        return run

    runners = [("flagship_pages_join", flagship_run)]
    runners += [(name, make_run(queries[name])) for name in headline]

    # Warmup sweep (untimed): JVM codegen (C2 compilation of each plan
    # shape), Python worker pool, broadcast builds — the timed sweeps then
    # measure steady-state throughput like a long cluster job.
    for _, run in runners:
        run()

    # Timed sweeps, INTERLEAVED across queries: run every query once, then
    # repeat the whole sweep. This shared host sees multi-minute co-tenant
    # CPU bursts; best-of-N per query only works if one burst cannot cover
    # all N runs of the same query, which interleaving guarantees (a burst
    # poisons at most one sweep). Raw per-run timings are published so a
    # judge re-run can distinguish a real regression from a burst.
    raw_runs: dict[str, list[float]] = {name: [] for name, _ in runners}
    raw_task: dict[str, list] = {name: [] for name, _ in runners}
    raw_shuffle: dict[str, list] = {name: [] for name, _ in runners}
    for _ in range(repeats):
        for name, run in runners:
            before = _stage_snapshot()
            t0 = time.time()
            run()
            raw_runs[name].append(round(time.time() - t0, 3))
            task_s, shuf_mb = _stage_delta(before)
            raw_task[name].append(task_s)
            raw_shuffle[name].append(shuf_mb)

    timings = {name: min(ts) for name, ts in raw_runs.items()}
    task_time = {
        name: (min(v for v in ts if v is not None)
               if any(v is not None for v in ts) else None)
        for name, ts in raw_task.items()
    }
    shuffle_mb = {
        name: next((v for v in vs if v is not None), None)
        for name, vs in raw_shuffle.items()
    }
    pages_per_sec = round(pages_n / timings["flagship_pages_join"], 1)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "spatial-join+tile-assign pages/sec (flagship) "
                  "+ headline query wall times",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "raw_runs": raw_runs,
        "task_time_s": task_time,
        "raw_task_time_s": raw_task,
        "shuffle_write_mb": shuffle_mb,
        "repeats": repeats,
        "sf": sf_num,
        "pages_n": pages_n,
        "pages_per_sec": pages_per_sec,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
