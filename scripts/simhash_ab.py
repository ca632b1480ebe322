"""A/B: interpreted transform(md5->conv) token hashing (round-2 simhash)
vs the hashlib-in-kernel round-3 version, 100k synthetic docs, interleaved
runs (co-tenant-burst hygiene). Run ad hoc; numbers land in
BENCH/BASELINE.md."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import LongType  # noqa: E402

from pure_python_geospatial_export_spark.functions.text import (  # noqa: E402
    tokens_col,
)
from pure_python_geospatial_export_spark.operators.dedup import (  # noqa: E402
    simhash,
)
from pure_python_geospatial_export_spark.session import get_spark  # noqa: E402


def simhash_old(df, id_col, text_col):
    toks = tokens_col(F.col(text_col))
    hashed = df.select(
        F.col(id_col),
        F.transform(
            toks,
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
            .cast("long"),
        ).alias("tok_hi"),
        F.transform(
            toks,
            lambda t: F.conv(F.substring(F.md5(t), 9, 8), 16, 10)
            .cast("long"),
        ).alias("tok_lo"),
    )

    @F.pandas_udf(LongType())
    def _simhash(tok_hi: pd.Series, tok_lo: pd.Series) -> pd.Series:
        out = np.zeros(len(tok_hi), dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for i, (his, los) in enumerate(zip(tok_hi, tok_lo)):
            if his is None or len(his) == 0:
                continue
            hi = np.asarray(his, dtype=np.int64).astype(np.uint64)
            lo = np.asarray(los, dtype=np.int64).astype(np.uint64)
            arr = (hi << np.uint64(32)) | lo
            bits = (arr[:, None] >> shifts) & np.uint64(1)
            votes = bits.astype(np.int64) * 2 - 1
            sign = votes.sum(axis=0) >= 0
            out[i] = np.int64(
                np.bitwise_or.reduce(
                    (sign.astype(np.uint64) << shifts)
                ).astype(np.int64)
            )
        return pd.Series(out)

    return hashed.select(
        F.col(id_col),
        _simhash(F.col("tok_hi"), F.col("tok_lo")).alias("simhash"),
    )


def main():
    spark = get_spark(app_name="simhash-ab", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    n = 100_000
    words = F.array(*[F.lit(w) for w in (
        "the quick brown fox jumps over lazy dog alpha beta gamma delta "
        "epsilon zeta eta theta web page crawl corpus token".split()
    )])
    docs = (
        spark.range(n)
        .select(
            F.col("id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(80)),
                    lambda i: F.element_at(
                        words,
                        (F.xxhash64(F.col("id") * F.lit(97) + i)
                         .bitwiseAND(F.lit(0x7FFFFFFF))
                         % F.size(words) + F.lit(1)).cast("int"),
                    ),
                ),
            ).alias("text"),
        )
        .repartition(32)
        .persist()
    )
    docs.count()

    def run(fn):
        fn(docs, "id", "text").write.format("noop").mode(
            "overwrite").save()

    variants = {"old_interpreted": simhash_old, "new_kernel": simhash}
    # warmup both plan shapes
    for fn in variants.values():
        run(fn)
    times = {k: [] for k in variants}
    for _ in range(3):
        for k, fn in variants.items():
            t0 = time.time()
            run(fn)
            times[k].append(round(time.time() - t0, 2))
    # equality spot check
    a = simhash_old(docs, "id", "text").orderBy("id").limit(500).collect()
    b = simhash(docs, "id", "text").orderBy("id").limit(500).collect()
    assert [r.simhash for r in a] == [r.simhash for r in b], "VALUE DRIFT"
    print({k: {"raw": v, "best": min(v)} for k, v in times.items()})
    spark.stop()


if __name__ == "__main__":
    main()
