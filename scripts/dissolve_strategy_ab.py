"""A/B: dissolve pair-join strategies — hash equi self-join (two
exchanges, AQE-splittable) vs single-exchange batched group walk.

Interleaved best-of-N on the lattice-clustered layer from
dissolve_linearity_bench (per-unit work constant by construction);
records wall, executor task-time, and shuffle WRITE bytes (UI REST
deltas — the partitioning-property numbers that survive co-tenant
bursts). Pair counts are asserted identical.

Run: python scripts/dissolve_strategy_ab.py
Env: DIS_N (default 400000), SPARK_GRAFT_CPUS (default 16),
     DIS_REPEATS (default 3)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dissolve_linearity_bench import synth_rects  # noqa: E402

N = int(os.environ.get("DIS_N", "400000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
REPEATS = int(os.environ.get("DIS_REPEATS", "3"))


def main():
    from pure_python_geospatial_export_spark.operators.dissolve import (
        polygon_self_overlap_pairs,
    )
    from pure_python_geospatial_export_spark.session import (
        get_spark,
        ui_stage_delta,
        ui_stage_snapshot,
    )

    spark = get_spark(app_name="dissolve-ab",
                      master="local[%d]" % CPUS,
                      shuffle_partitions=CPUS * 2,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.retainedStages": "30000"})
    spark.sparkContext.setLogLevel("ERROR")

    def deltas(before):
        d = ui_stage_delta(spark, before)
        if d is None:
            return None, None
        return d["task_time_s"], d["shuffle_write_mb"]

    rects = synth_rects(spark, N).cache()
    assert rects.count() == N
    rects.count()  # warm

    best = {}
    counts = {}
    for _rep in range(REPEATS):
        for strategy in ("join", "grouped"):
            before = ui_stage_snapshot(spark)
            t0 = time.monotonic()
            pairs = polygon_self_overlap_pairs(
                rects, res=8, strategy=strategy
            ).count()
            wall = time.monotonic() - t0
            task, shuf = deltas(before)
            counts.setdefault(strategy, pairs)
            assert counts[strategy] == pairs
            if strategy not in best or wall < best[strategy]["wall_s"]:
                best[strategy] = {
                    "wall_s": round(wall, 2), "task_s": task,
                    "shuffle_write_mb": shuf, "pairs": int(pairs),
                }
    assert counts["join"] == counts["grouped"], counts
    print(json.dumps({"n": N, "cpus": CPUS, "res": 8, **best}))
    spark.stop()


if __name__ == "__main__":
    main()
