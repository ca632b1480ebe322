"""Skew-stress A/B for the salted spatial join (round-5 verdict item 9).

The salting code (operators/spatial_join.py, strategy='shuffle_salted')
is driver-oracled for EQUALITY, but its perf claim — that hot-cell
salting beats a plain shuffle join under zipfian point skew — was
untested. This script builds a zipfian fixture (a configurable fraction
of all points lands in ONE polygon-covered cell), forces the shuffle
join shape (autoBroadcastJoinThreshold=-1 — the regime the strategy
exists for, a polygon layer too big to broadcast), and interleaves:

  * salted    — hot-cell histogram + per-cell salt explode
  * unsalted  — same join, salting disabled (threshold above N), AQE
                skew-join OFF
  * aqe_only  — unsalted but AQE skew-join ON (the runtime backstop)

Row counts are asserted identical across modes. Results append to the
crossover tables in BENCH/BASELINE.md.

Run: python scripts/skew_join_bench.py [n_points] [hot_frac] [repeats]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from pure_python_geospatial_export_spark.operators.spatial_join import (
        spatial_join,
    )
    from pure_python_geospatial_export_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        app_name="skew-bench", master="local[%d]" % cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1",
                    "spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import urllib.request

    from pure_python_geospatial_export_spark.session import (
        ui_completed_stages,
    )

    def _stages():
        return ui_completed_stages(spark)

    def _reduce_stage_balance(before_ids):
        """max-task / total runtime of the heaviest NEW stage — the
        noise-robust skew signal: co-tenant bursts swing wall times
        5x on this box, but the straggler ratio inside one stage is a
        property of the partitioning."""
        ui, app, stages = _stages()
        new = [s for s in stages if s["stageId"] not in before_ids]
        if not new:
            return None
        big = max(new, key=lambda s: s.get("executorRunTime", 0))
        tasks = json.load(urllib.request.urlopen(
            "%s/api/v1/applications/%s/stages/%d/%d/taskList?length=1000"
            % (ui, app, big["stageId"], big["attemptId"])
        ))
        runs = [t.get("duration", 0) for t in tasks]
        total = sum(runs)
        return {
            "n_tasks": len(runs),
            "stage_total_ms": total,
            "max_task_ms": max(runs) if runs else 0,
            "straggler_share": round(max(runs) / total, 3)
            if total else None,
        }

    # zipfian points: hot_frac of them in one BOUNDARY cell straddling
    # the Wyoming/Colorado east edge (-104.05...), so the skewed work
    # includes the Arrow ray-cast refine, not just the hash probe —
    # the shape where reducer balance actually matters; the rest
    # uniform over the layer's -130..-60 x 20..55 grid extent
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )
    schema = StructType([
        StructField("pt_id", LongType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
    ])

    def synth(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 7)
            hot = rng.random(len(ids)) < hot_frac
            lon = np.where(
                hot,
                -104.3 + rng.uniform(0, 0.5, len(ids)),
                rng.uniform(-130, -60, len(ids)),
            )
            lat = np.where(
                hot,
                43.0 + rng.uniform(0, 0.5, len(ids)),
                rng.uniform(20, 55, len(ids)),
            )
            yield pd.DataFrame(
                {"pt_id": ids, "lon": lon, "lat": lat}
            )

    pts = (
        spark.range(n_points, numPartitions=cpus * 2)
        .mapInPandas(synth, schema)
        .persist()
    )
    pts.count()

    # realistic layer: the hot polygon (Wyoming) gets its ring
    # densified to ~2000 vertices — admin boundaries are high-vertex,
    # and the ray-cast refine is O(vertices) per boundary-cell point,
    # which is exactly the serialized work a hot reducer drowns in
    from pure_python_geospatial_export_spark.geo import wkt as wktmod
    from pure_python_geospatial_export_spark.session import local_df

    def densify(ring, n_per_edge):
        out = []
        for a, b in zip(ring[:-1], ring[1:]):
            for t in np.linspace(0, 1, n_per_edge, endpoint=False):
                out.append([a[0] + (b[0] - a[0]) * t,
                            a[1] + (b[1] - a[1]) * t])
        out.append(list(ring[0]))
        return out

    rows = []
    for pid, name, outer, hole in em._rects():
        rings = [em._rect_ring(*outer)]
        if hole:
            rings.append(em._rect_ring(*hole))
        if name == "Wyoming":
            rings = [densify(r, 2000) for r in rings]
        rows.append((pid, name, wktmod.dumps(
            dict(type="Polygon", coordinates=rings)
        )))
    layer = local_df(spark, rows, ["polygon_id", "name", "wkt"])

    def run(mode: str) -> float:
        if mode == "salted":
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                           "false")
            thr = max(50_000, n_points // 50)
        elif mode == "unsalted":
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                           "false")
            thr = 1 << 62
        elif mode == "aqe_only":
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                           "true")
            thr = 1 << 62
        _ui, _app, stages = _stages()
        before = {s["stageId"] for s in stages}
        t0 = time.monotonic()
        out = spatial_join(
            pts, layer, res=7, strategy="shuffle_salted",
            hot_cell_threshold=thr,
        ).groupBy("name").agg(F.count(F.lit(1)).alias("n"))
        counts = {r["name"]: r["n"] for r in out.collect()}
        wall = time.monotonic() - t0
        return wall, counts, _reduce_stage_balance(before)

    modes = ["salted", "unsalted", "aqe_only"]
    for m in modes:  # warmup
        run(m)
    raw = {m: [] for m in modes}
    balances = {m: [] for m in modes}
    counts0 = None
    for _ in range(repeats):
        for m in modes:
            dt, counts, bal = run(m)
            raw[m].append(round(dt, 3))
            balances[m].append(bal)
            if counts0 is None:
                counts0 = counts
            assert counts == counts0, (m, "result drift!")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    def best_bal(m):
        vals = [b for b in balances[m] if b]
        return min(vals, key=lambda b: b["straggler_share"] or 1) \
            if vals else None

    print(json.dumps({
        "n_points": n_points,
        "hot_frac": hot_frac,
        "cpus": cpus,
        "joined_rows": sum(counts0.values()),
        "best_sec": {m: min(v) for m, v in raw.items()},
        "raw_sec": raw,
        "reduce_stage_balance": {m: best_bal(m) for m in modes},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
