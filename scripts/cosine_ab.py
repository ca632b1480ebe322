"""A/B: column-expression cosine_topk (interpreted zip_with/aggregate
folds + full n*q window shuffle) vs cosine_topk_arrow (float64 BLAS
matmul + per-partition top-k combine), synthetic vectors, interleaved
runs (co-tenant-burst hygiene). Run ad hoc; numbers land in
BENCH/BASELINE.md."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pure_python_geospatial_export_spark.operators import (  # noqa: E402
    similarity,
)
from pure_python_geospatial_export_spark.session import (  # noqa: E402
    get_spark,
    local_df,
)

N, DIM, NQ, K = 100_000, 64, 8, 10
REPEATS = 3


def main():
    spark = get_spark(app_name="cosine-ab", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(5)
    mat = rng.standard_normal((N, DIM)).astype(np.float32)
    pdf = pd.DataFrame({
        "vec_id": np.arange(N, dtype=np.int64),
        "embedding": list(mat),
    })
    pdf["embedding"] = pdf["embedding"].map(
        lambda a: [float(x) for x in a]
    )
    base = spark.createDataFrame(pdf).repartition(32).cache()
    base.count()
    queries = local_df(
        spark,
        [(int(i), [float(x) for x in mat[i]]) for i in range(NQ)],
        ["query_id", "qvec"],
    )
    args = (base, queries, "vec_id", "embedding", "query_id", "qvec")

    timings = {"baseline": [], "arrow": []}

    def run(fn):
        t0 = time.monotonic()
        n = fn(*args, k=K).count()
        dt = time.monotonic() - t0
        assert n == NQ * K
        return dt

    # warmup both paths once
    run(similarity.cosine_topk_arrow)
    run(similarity.cosine_topk)
    for _ in range(REPEATS):  # interleaved sweeps
        timings["baseline"].append(run(similarity.cosine_topk))
        timings["arrow"].append(run(similarity.cosine_topk_arrow))

    for name, ts in timings.items():
        print(name, "best=%.2fs" % min(ts),
              "raw=", ["%.2f" % t for t in ts])

    # value check: identical ids/ranks
    a = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in similarity.cosine_topk(*args, k=K).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in similarity.cosine_topk_arrow(*args, k=K).collect()
    )
    assert a == b, "result mismatch"
    print("results identical:", len(a), "rows")
    spark.stop()


if __name__ == "__main__":
    main()
