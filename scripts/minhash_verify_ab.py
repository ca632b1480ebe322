"""A/B: MinHash verify-join shuffle with and without the exact size
pre-filter (round-5 verdict item 2).

Corpus: near-dup families plus subset pairs (short doc fully contained
in a 2x-longer doc, Jaccard ~0.5) that collide in LSH bands but can
never reach the 0.8 threshold — exactly the candidates the size bound
J <= min/max prunes before any shingle array ships.

Reports, per mode: wall seconds (best of N interleaved), pairs entering
the array join, result pairs (MUST be identical), and the delta of
executor shuffle-write bytes pulled from the Spark UI REST API.

Run: python scripts/minhash_verify_ab.py [n_families] [repeats]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pure_python_geospatial_export_spark.session import (  # noqa: E402
    ui_shuffle_write_bytes as shuffle_write_bytes,
)


def main() -> None:
    n_families = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from pure_python_geospatial_export_spark.operators.dedup import (
        near_duplicates_minhash,
    )
    from pure_python_geospatial_export_spark.session import get_spark

    # autoBroadcastJoinThreshold=-1: at corpus scale neither verify
    # side broadcasts — force the SMJ shape the filter targets so the
    # small-scale A/B measures the same shuffles a 100 TB run pays
    spark = get_spark(app_name="minhash-ab", master="local[8]",
                      shuffle_partitions=8,
                      extra_conf={
                          "spark.ui.enabled": "true",
                          "spark.sql.autoBroadcastJoinThreshold": "-1",
                      })
    spark.sparkContext.setLogLevel("ERROR")

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
             "psi omega").split()
    rows = []
    doc_id = 0
    for fam in range(n_families):
        toks = [
            words[(fam * 7 + k) % len(words)] + str(fam * 13 + k)
            for k in range(180)
        ]
        base = " ".join(toks)
        # true near-dups (J ~ 0.99): must survive both modes
        rows.append((doc_id, base + " endA")); doc_id += 1
        rows.append((doc_id, base + " endB")); doc_id += 1
        # truncation dups — the web's subset shape (excerpt/AMP/print
        # view of the same article). J(prefix_p, base) ~ p:
        #   90% prefix: J ~ 0.9 >= 0.8 -> must survive both modes
        #   75% prefix: J ~ 0.75 < 0.8, band-collides ~99% -> the size
        #   bound prunes it before any shingle array ships
        #   50% prefix: J ~ 0.5, collides ~2/3 of the time -> pruned
        rows.append((doc_id, " ".join(toks[:162]))); doc_id += 1
        rows.append((doc_id, " ".join(toks[:135]))); doc_id += 1
        rows.append((doc_id, " ".join(toks[:90]))); doc_id += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"]).persist()
    df.count()

    results = {}
    timings = {True: [], False: []}
    shuffles = {True: [], False: []}
    for _ in range(repeats):
        for mode in (True, False):
            s0 = shuffle_write_bytes(spark)
            t0 = time.time()
            out = near_duplicates_minhash(
                df, "doc_id", "text", threshold=0.8,
                size_prefilter=mode,
            )
            n = out.count()
            timings[mode].append(round(time.time() - t0, 3))
            shuffles[mode].append(shuffle_write_bytes(spark) - s0)
            key = frozenset(
                (r["id_a"], r["id_b"], round(r["jaccard"], 12))
                for r in out.collect()
            )
            results.setdefault(mode, key)
            assert results[mode] == key, "nondeterministic result"

    assert results[True] == results[False], (
        "size prefilter changed the result set!"
    )
    print(json.dumps({
        "n_docs": doc_id,
        "result_pairs": len(results[True]),
        "wall_sec": {
            "prefilter": min(timings[True]),
            "no_prefilter": min(timings[False]),
        },
        "raw_wall": {"prefilter": timings[True],
                     "no_prefilter": timings[False]},
        "shuffle_write_bytes": {
            "prefilter": min(shuffles[True]),
            "no_prefilter": min(shuffles[False]),
        },
        "shuffle_reduction": round(
            1.0 - min(shuffles[True]) / max(1, min(shuffles[False])), 3
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
