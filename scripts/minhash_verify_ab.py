"""A/B: MinHash verify-join shuffle across prefilter modes.

Corpus: near-dup families plus two junk-candidate shapes —
* subset pairs (short doc contained in a longer one, J ~ 0.5-0.75,
  DIFFERENT sizes): the exact size bound J <= min/max prunes these
  before any shingle array ships (round-5 verdict item 2);
* half-overlap siblings (same length, half the tokens shared,
  J ~ 0.5): size-bound-PROOF — only the round-6 sketch-first filter
  (signature-agreement >= threshold - margin over the already-computed
  minhash signatures) prunes them before the array join.

Modes: none / size / size+sig(margin=0.2). Result pair sets are
asserted IDENTICAL across modes (every pruned candidate is below
threshold; the Hoeffding drop probability for a true pair at
num_hashes=64, margin=0.2 is ~e^-5 per borderline pair and the fixed
seed makes the run deterministic).

Reports, per mode: wall seconds (best of N interleaved), result pairs,
and the delta of executor shuffle-write bytes from the UI REST API.

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
        # template siblings: SAME length, 62% of tokens shared
        # (pairwise J ~ 0.45 — the boilerplate-template shape) ->
        # immune to the size bound, band-collide ~50% of the time,
        # agreement ~0.48 < 0.8-0.2 -> only the signature-agreement
        # prefilter prunes them before their arrays ship
        shared = toks[:112]
        for s in range(4):
            other = [
                "sib%d_%d_%d" % (fam, s, k) for k in range(68)
            ]
            rows.append((doc_id, " ".join(shared + other))); doc_id += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"]).persist()
    df.count()

    modes = {
        "none": dict(size_prefilter=False),
        "size": dict(size_prefilter=True),
        "size+sig": dict(size_prefilter=True, sig_margin=0.2),
    }
    results = {}
    timings = {m: [] for m in modes}
    shuffles = {m: [] for m in modes}
    for _ in range(repeats):
        for mode, kw in modes.items():
            s0 = shuffle_write_bytes(spark)
            t0 = time.time()
            out = near_duplicates_minhash(
                df, "doc_id", "text", threshold=0.8, **kw
            )
            out.count()
            timings[mode].append(round(time.time() - t0, 3))
            shuffles[mode].append(shuffle_write_bytes(spark) - s0)
            key = frozenset(
                (r["id_a"], r["id_b"], round(r["jaccard"], 12))
                for r in out.collect()
            )
            results.setdefault(mode, key)
            assert results[mode] == key, "nondeterministic result"

    for mode in modes:
        assert results[mode] == results["none"], (
            "%s prefilter changed the result set!" % mode
        )
    print(json.dumps({
        "n_docs": doc_id,
        "result_pairs": len(results["none"]),
        "wall_sec": {m: min(ts) for m, ts in timings.items()},
        "raw_wall": timings,
        "shuffle_write_bytes": {m: min(vs)
                                for m, vs in shuffles.items()},
        "shuffle_reduction_vs_none": {
            m: round(1.0 - min(shuffles[m])
                     / max(1, min(shuffles["none"])), 3)
            for m in modes
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
