"""Recall@k operating points for the ANN paths (lsh_topk / ivf_topk)
vs the exact Arrow top-k on 1M synthetic vectors — quantifies the
recall/latency trade the brief's near-dup + similarity-search stack
rides at scale. Run ad hoc (ANN_N=... python scripts/ann_recall_bench.py);
the table lands in BENCH/BASELINE.md.

Vector model: 64 latent centers + Gaussian noise (mild cluster
structure so IVF's coarse quantizer has something real to find;
pure-noise corpora make every ANN look artificially bad). Ground truth
is computed in-run by cosine_topk_arrow, so per-batch RNG seeding does
not need cross-run determinism.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pure_python_geospatial_export_spark.operators import (  # noqa: E402
    similarity,
)
from pure_python_geospatial_export_spark.session import (  # noqa: E402
    get_spark,
    local_df,
)

N = int(os.environ.get("ANN_N", "1000000"))
DIM = int(os.environ.get("ANN_DIM", "32"))
NQ = int(os.environ.get("ANN_NQ", "100"))
K = int(os.environ.get("ANN_K", "10"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
N_CENTERS = 64


def main():
    spark = get_spark(app_name="ann-recall", master="local[%d]" % CPUS,
                      shuffle_partitions=CPUS,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.retainedStages": "30000"})
    spark.sparkContext.setLogLevel("ERROR")

    centers = np.random.default_rng(0).standard_normal(
        (N_CENTERS, DIM)).astype(np.float64)

    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ])

    def synth(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 1)
            noise = rng.standard_normal((len(ids), DIM))
            vecs = centers[ids % N_CENTERS] + 0.8 * noise
            yield pd.DataFrame({
                "id": ids,
                "embedding": list(vecs.astype(np.float32)),
            }).rename(columns={"id": "vec_id"})

    base = (
        spark.range(N, numPartitions=CPUS * 2)
        .mapInPandas(synth, schema)
        .cache()
    )
    base.count()

    qrows = (
        base.where("vec_id %% %d = 1" % (N // NQ)).limit(NQ).collect()
    )
    queries = local_df(
        spark,
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
         for r in qrows],
        ["query_id", "qvec"],
    )
    args = (base, queries, "vec_id", "embedding", "query_id", "qvec")

    def run(label, fn, **kw):
        t0 = time.monotonic()
        rows = fn(*args, k=K, **kw).collect()
        dt = time.monotonic() - t0
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return dt, got

    # ground truth (also the exact-baseline latency)
    t_exact, truth = run("exact", similarity.cosine_topk_arrow)

    def recall(got):
        tot = sum(
            len(got.get(q, set()) & t) / len(t)
            for q, t in truth.items()
        )
        return round(tot / len(truth), 4)

    results = [{"config": "exact_arrow", "sec": round(t_exact, 2),
                "recall_at_%d" % K: 1.0}]
    points = [] if os.environ.get("ANN_PQ_ONLY") else [
        ("lsh p=10 probe<=1", similarity.lsh_topk,
         dict(n_planes=10, probe_hamming=1, dim=DIM)),
        ("lsh p=10 probe<=2", similarity.lsh_topk,
         dict(n_planes=10, probe_hamming=2, dim=DIM)),
        ("lsh p=14 probe<=2", similarity.lsh_topk,
         dict(n_planes=14, probe_hamming=2, dim=DIM)),
        ("ivf c=64 probe=4", similarity.ivf_topk,
         dict(n_centroids=64, n_probe=4)),
        ("ivf c=64 probe=8", similarity.ivf_topk,
         dict(n_centroids=64, n_probe=8)),
        ("ivf c=64 probe=16", similarity.ivf_topk,
         dict(n_centroids=64, n_probe=16)),
    ]
    for label, fn, kw in points:
        dt, got = run(label, fn, **kw)
        results.append({"config": label, "sec": round(dt, 2),
                        "recall_at_%d" % K: recall(got)})
        print(json.dumps(results[-1]), flush=True)

    # IVF-PQ: build once (timed separately), serve at probe points;
    # report the on-disk list size vs IVF-flat for the memory claim
    import shutil
    import tempfile

    idx_root = tempfile.mkdtemp(prefix="ann_idx_")
    try:
        def tree_bytes(p):
            total = 0
            for root, _d, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files if f.endswith(".parquet"))
            return total

        t0 = time.monotonic()
        similarity.build_ivf_index(
            base, "vec_id", "embedding", os.path.join(idx_root, "flat"),
            n_centroids=64, lloyd_iters=2,
        )
        t_flat_build = time.monotonic() - t0
        t0 = time.monotonic()
        similarity.build_ivfpq_index(
            base, "vec_id", "embedding", os.path.join(idx_root, "pq"),
            n_centroids=64, m_subspaces=8, lloyd_iters=2,
        )
        t_pq_build = time.monotonic() - t0
        flat_b = tree_bytes(os.path.join(idx_root, "flat",
                                         "lists.parquet"))
        pq_b = tree_bytes(os.path.join(idx_root, "pq", "lists.parquet"))
        results.append({
            "config": "index builds",
            "flat_build_sec": round(t_flat_build, 2),
            "pq_build_sec": round(t_pq_build, 2),
            "flat_list_bytes": flat_b,
            "pq_list_bytes": pq_b,
            "memory_reduction_x": round(flat_b / max(1, pq_b), 1),
        })
        print(json.dumps(results[-1]), flush=True)
        # stage-metric deltas (shuffle bytes are a plan property,
        # robust to co-tenant bursts) for the sq_keep A/B
        from pure_python_geospatial_export_spark.session import (
            ui_stage_delta,
            ui_stage_snapshot,
        )

        def stage_keys():
            return ui_stage_snapshot(spark)

        def stage_delta(before):
            d = ui_stage_delta(spark, before)
            return None if d is None else d["shuffle_write_mb"]

        for probe, rr, sq in ((4, 200, None), (8, 200, None),
                              (8, 1000, None), (8, 1000, 4 * K)):
            before = stage_keys()
            t0 = time.monotonic()
            rows = similarity.ivfpq_topk_indexed(
                spark, os.path.join(idx_root, "pq"), queries, base,
                "vec_id", "embedding", "query_id", "qvec",
                k=K, n_probe=probe, rerank=rr, sq_keep=sq,
            ).collect()
            dt = time.monotonic() - t0
            shuf_mb = stage_delta(before)
            got = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
            results.append({
                "config": "ivfpq c=64 m=8 probe=%d rerank=%d%s"
                          % (probe, rr,
                             " sq_keep=%d" % sq if sq else ""),
                "sec": round(dt, 2),
                "shuffle_write_mb": shuf_mb,
                "recall_at_%d" % K: recall(got),
            })
            print(json.dumps(results[-1]), flush=True)
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)

    print(json.dumps({
        "n": N, "dim": DIM, "nq": NQ, "k": K, "cpus": CPUS,
        "results": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
