"""Data-scale linearity for the dissolve pair join (round 6).

The synthetic layer is FAMILY-structured so per-unit work stays
constant as N grows (the op_linearity_bench principle): rects come in
8-member clusters jittered around deterministically scattered centers
— intra-cluster overlaps produce a linear pair count, while naive
uniform densification would grow pairs quadratically and masquerade
as a scaling cliff.

Reports wall seconds AND executor task-time (UI REST stage deltas —
the less burst-sensitive number on this co-tenant host) for the pair
stage (`polygon_self_overlap_pairs`, the scale path) at N vs 4N rects,
plus one end-to-end `dissolve_groups` sanity pass.

Run: python scripts/dissolve_linearity_bench.py
Env: DIS_N (default 100000), DIS_SCALE (default 4),
     SPARK_GRAFT_CPUS (default 16), DIS_REPEATS (default 2)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

BASE_N = int(os.environ.get("DIS_N", "100000"))
SCALE = int(os.environ.get("DIS_SCALE", "4"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
REPEATS = int(os.environ.get("DIS_REPEATS", "2"))


def synth_rects(spark, n):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("id", LongType(), False),
        StructField("wkt", StringType(), False),
    ])

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.int64)
            fam, member = np.divmod(ids, 8)
            # clusters on a 0.8-degree lattice: extent per cluster is
            # <= 2*(0.2 + 0.12) = 0.64 deg, so clusters can NEVER touch
            # — a random scatter percolates into one giant component
            # (quadratic CC work masquerading as the pair stage)
            ix = fam % 450
            iy = fam // 450
            cx = -180.0 + 0.4 + ix.astype(np.float64) * 0.8
            cy = -75.0 + 0.4 + iy.astype(np.float64) * 0.8
            j = (ids * np.int64(6364136223846793005)) & np.int64(
                (1 << 62) - 1)
            dx = ((j % 400) / 1000.0) - 0.2
            dy = (((j // 400) % 400) / 1000.0) - 0.2
            half = 0.05 + (member % 4) * 0.0233
            x0 = cx + dx - half
            x1 = cx + dx + half
            y0 = cy + dy - half
            y1 = cy + dy + half
            wkts = [
                "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, "
                "%.6f %.6f, %.6f %.6f))"
                % (a, b, c, b, c, d, a, d, a, b)
                for a, b, c, d in zip(x0, y0, x1, y1)
            ]
            yield pd.DataFrame({"id": ids, "wkt": wkts})

    return (spark.range(n, numPartitions=CPUS * 2)
            .mapInPandas(gen, schema))


def main():
    from pure_python_geospatial_export_spark.operators.dissolve import (
        dissolve_groups,
        polygon_self_overlap_pairs,
    )
    from pure_python_geospatial_export_spark.session import (
        get_spark,
        ui_stage_delta,
        ui_stage_snapshot,
    )

    spark = get_spark(app_name="dissolve-linearity",
                      master="local[%d]" % CPUS,
                      shuffle_partitions=CPUS * 2,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.retainedStages": "30000"})
    spark.sparkContext.setLogLevel("ERROR")

    def timed_once(job):
        before = ui_stage_snapshot(spark)
        t0 = time.monotonic()
        res = job()
        wall = time.monotonic() - t0
        d = ui_stage_delta(spark, before)
        return wall, (d or {}).get("task_time_s"), res

    synth_rects(spark, 2000).count()  # warm the worker pool

    small_in = synth_rects(spark, BASE_N).cache()
    assert small_in.count() == BASE_N
    big_in = synth_rects(spark, BASE_N * SCALE).cache()
    assert big_in.count() == BASE_N * SCALE

    best = {}
    for _rep in range(REPEATS):
        # INTERLEAVE sizes so a co-tenant burst cannot hit one size
        # only and masquerade as a scaling cliff (best-of per size)
        for tag, src, n in (("small", small_in, BASE_N),
                            ("big", big_in, BASE_N * SCALE)):
            wall, task, pairs = timed_once(
                lambda s=src: polygon_self_overlap_pairs(
                    s, res=8
                ).count()
            )
            assert pairs > n // 8, (tag, pairs)
            if tag not in best or wall < best[tag]["wall_s"]:
                best[tag] = {"n": n, "pairs": int(pairs),
                             "wall_s": round(wall, 2), "task_s": task,
                             "rects_per_s": int(n / wall)}

    wall, task, groups = timed_once(
        lambda: dissolve_groups(small_in, res=8)
        .agg({"n_members": "sum"}).collect()[0][0]
    )
    assert groups == BASE_N  # every rect lands in exactly one group

    small, big = best["small"], best["big"]
    out = {
        "cpus": CPUS, "scale": SCALE,
        "pairs_stage": {
            "small": small, "big": big,
            "throughput_ratio_big_over_small": round(
                big["rects_per_s"] / small["rects_per_s"], 3),
            "task_time_linearity": (
                round(small["task_s"] * SCALE / big["task_s"], 3)
                if small["task_s"] and big["task_s"] else None
            ),
            "pairs_ratio": round(big["pairs"] / small["pairs"], 3),
        },
        "dissolve_groups_e2e_small": {
            "wall_s": round(wall, 2), "task_s": task,
            "members": int(groups),
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
