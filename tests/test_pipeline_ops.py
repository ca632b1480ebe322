"""Tests for training-data pipeline operators (text analysis, dedup,
similarity, multimodal plumbing) over the driver-provided documents /
embeddings tables, each against an independent python/numpy oracle.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pure_python_geospatial_export_spark.functions import text as T
from pure_python_geospatial_export_spark.operators import (
    dedup,
    multimodal,
    similarity,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")).cache()
    df.count()
    return df


def _py_tokens(s):
    return s.strip().split()


def test_token_count_oracle(docs, docs_pd):
    got = {
        int(r["doc_id"]): int(r["tc"])
        for r in docs.select(
            "doc_id", T.token_count(F.col("text")).alias("tc")
        ).collect()
    }
    for row in docs_pd.itertuples():
        assert got[row.doc_id] == len(_py_tokens(row.text))


def test_stopword_and_quality_oracle(docs, docs_pd):
    got = {
        int(r["doc_id"]): (r["sw"], r["q"])
        for r in docs.select(
            "doc_id",
            T.stopword_ratio(F.col("text")).alias("sw"),
            T.quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    for row in docs_pd.itertuples():
        toks = _py_tokens(row.text)
        sw = sum(t in T.STOPWORDS for t in toks) / len(toks)
        punct = sum(c in ".,;:!?" for c in row.text) / len(row.text)
        q = (
            0.4 * min(len(toks) / 100.0, 1.0)
            + 0.3 * min(sw * 3.0, 1.0)
            + 0.3 * max(1.0 - punct * 5.0, 0.0)
        )
        g_sw, g_q = got[row.doc_id]
        assert g_sw == pytest.approx(sw, abs=1e-12)
        assert g_q == pytest.approx(q, abs=1e-12)


def test_lang_id_votes(spark):
    rows = [
        (1, "the cat and the dog of the house is here"),
        (2, "der hund und die katze ist das tier"),
        (3, "le chat et la maison est les arbres"),
        (4, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        int(r["id"]): r["lang"]
        for r in df.select(
            "id", T.lang_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_oracle(docs, docs_pd):
    import hashlib

    got = {
        int(r["doc_id"]): r["fp"]
        for r in docs.select(
            "doc_id", T.fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    for row in docs_pd.itertuples():
        toks = _py_tokens(row.text)
        if len(toks) >= 3:
            fp = min(
                hashlib.md5(
                    " ".join(toks[i:i + 3]).encode()).hexdigest()
                for i in range(len(toks) - 2)
            )
        else:
            fp = hashlib.md5(row.text.encode()).hexdigest()
        assert got[row.doc_id] == fp


def test_exact_duplicates(spark):
    rows = [(1, "aa bb"), (2, "aa bb"), (3, "cc"), (4, "aa bb"), (5, "cc")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (int(r["rep_id"]), int(r["n_dups"]))
        for r in dedup.exact_duplicates(df, "doc_id", "text").collect()
    }
    assert got == {(1, 3), (3, 2)}


def _py_shingles(s, size=3):
    toks = _py_tokens(s)
    if len(toks) >= size:
        return {" ".join(toks[i:i + size])
                for i in range(len(toks) - size + 1)}
    return {s}


def test_minhash_near_duplicates(spark, docs):
    # construct known near-dups: doc + same doc with one token changed
    base = docs.limit(30).select("doc_id", "text")
    mutated = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzz")).alias("text"),
    )
    both = base.unionByName(mutated)
    got = dedup.near_duplicates_minhash(
        both, "doc_id", "text", threshold=0.5
    ).collect()
    pairs = {(int(r["id_a"]), int(r["id_b"])) for r in got}
    # every (doc, doc+100000) pair must be found (jaccard ~ (n-2)/(n+1))
    expected_subset = {
        (int(r["doc_id"]), int(r["doc_id"]) + 100000)
        for r in base.collect()
    }
    assert expected_subset <= pairs
    # verify jaccard values against python oracle
    texts = {int(r["doc_id"]): r["text"] for r in both.collect()}
    for r in got:
        sa = _py_shingles(texts[int(r["id_a"])])
        sb = _py_shingles(texts[int(r["id_b"])])
        jac = len(sa & sb) / len(sa | sb)
        assert r["jaccard"] == pytest.approx(jac, abs=1e-12)


def test_minhash_max_bucket_prunes_junk_not_pairs(spark):
    """Bucket cap: boilerplate shingles shared by EVERY doc flood the
    band join; with a cap above the true family size the verified pair
    set is unchanged, and an aggressive cap kills everything."""
    boiler = " the quick brown fox jumps over the lazy dog again"
    rows = []
    for i in range(40):
        rows.append((2 * i, "document number %d body alpha %d%s"
                     % (i, i, boiler)))
        rows.append((2 * i + 1, "document number %d body alpha %d%s zzzz"
                     % (i, i, boiler)))  # near-dup twin
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in dedup.near_duplicates_minhash(
            df, "doc_id", "text", threshold=0.7).collect()
    }
    capped = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in dedup.near_duplicates_minhash(
            df, "doc_id", "text", threshold=0.7, max_bucket=10).collect()
    }
    assert len(uncapped) >= 40  # every twin pair found
    assert capped == uncapped   # cap above family size: no recall loss

    none_left = dedup.near_duplicates_minhash(
        df, "doc_id", "text", threshold=0.7, max_bucket=1).count()
    assert none_left == 0       # cap below any bucket: nothing survives


def test_minhash_sig_prefilter_identical_pairs(spark):
    """Sketch-first verify (VERDICT r5 #4): with sig_margin set, junk
    candidates below threshold - margin in signature agreement are
    pruned BEFORE the shingle arrays ship; on a corpus whose true
    pairs are far from the threshold the final pair set is identical
    to the exact path, jaccard values included."""
    rows = []
    for fam in range(25):
        toks = ["w%d_%d" % (fam, k) for k in range(120)]
        rows.append((fam * 10, " ".join(toks)))
        rows.append((fam * 10 + 1, " ".join(toks) + " zzzz"))
        # template sibling: same length, ~60% shared -> J ~ 0.45,
        # size-bound immune, often band-collides; agreement ~0.48
        sib = toks[:72] + ["s%d_%d" % (fam, k) for k in range(48)]
        rows.append((fam * 10 + 2, " ".join(sib)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    exact = {
        (int(r["id_a"]), int(r["id_b"]), round(r["jaccard"], 12))
        for r in dedup.near_duplicates_minhash(
            df, "doc_id", "text", threshold=0.8).collect()
    }
    sketched = {
        (int(r["id_a"]), int(r["id_b"]), round(r["jaccard"], 12))
        for r in dedup.near_duplicates_minhash(
            df, "doc_id", "text", threshold=0.8,
            sig_margin=0.2).collect()
    }
    assert len(exact) >= 25
    assert sketched == exact
    # sig_margin without signatures is a usage error at the low level
    with pytest.raises(ValueError, match="sig_margin requires"):
        dedup.jaccard_verify(df.limit(0), df, "doc_id", "text", 0.8,
                             sig_margin=0.2)


def test_ngram_jaccard_matches_minhash_verify(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g zz"),
        (3, "totally different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (int(r["id_a"]), int(r["id_b"])): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.0).collect()
    }
    sa, sb = _py_shingles(rows[0][1]), _py_shingles(rows[1][1])
    assert got[(1, 2)] == pytest.approx(len(sa & sb) / len(sa | sb))
    assert got[(1, 3)] == 0.0


def test_simhash_near_pairs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again tomorrow"),
        (3, "completely unrelated content about spark shuffles and joins"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sim = dedup.simhash(df, "doc_id", "text")
    vals = {int(r["doc_id"]): int(r["simhash"]) for r in sim.collect()}
    ham12 = bin(vals[1] ^ vals[2]).count("1")
    ham13 = bin(vals[1] ^ vals[3]).count("1")
    assert ham12 < ham13
    pairs = dedup.simhash_near_pairs(sim, "doc_id",
                                     max_hamming=max(ham12, 3)).collect()
    ids = {(int(r["id_a"]), int(r["id_b"])) for r in pairs}
    if ham12 <= 3:
        assert (1, 2) in ids
    for r in pairs:
        assert int(r["hamming"]) == bin(
            vals[r["id_a"]] ^ vals[r["id_b"]]).count("1")


def _np_topk(emb_pd, qids, k):
    mat = np.stack(emb_pd["embedding"].to_numpy()).astype(np.float64)
    ids = emb_pd["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    out = set()
    for q in qids:
        qi = np.flatnonzero(ids == q)[0]
        scores = mat @ mat[qi] / (norms * norms[qi])
        mask = ids != q
        order = np.lexsort((ids[mask], -scores[mask]))[:k]
        for rank, j in enumerate(order, 1):
            out.add((q, int(ids[mask][j]), rank))
    return out


def test_cosine_topk_matches_numpy(emb):
    emb_pd = emb.toPandas()
    qids = [0, 1, 2]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    got = {
        (int(r["query_id"]), int(r["vec_id"]), int(r["rank"]))
        for r in similarity.cosine_topk(
            emb, queries, "vec_id", "embedding", "query_id", "qvec", k=5
        ).collect()
    }
    assert got == _np_topk(emb_pd, qids, 5)


def test_lsh_topk_recall(emb):
    emb_pd = emb.toPandas()
    qids = [0, 1, 2, 3, 4]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    got = {
        (int(r["query_id"]), int(r["vec_id"]))
        for r in similarity.lsh_topk(
            emb, queries, "vec_id", "embedding", "query_id", "qvec",
            k=5, n_planes=6, probe_hamming=2,
        ).collect()
    }
    exact = {(q, v) for q, v, _ in _np_topk(emb_pd, qids, 5)}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, recall  # ANN: majority recall at tiny scale


def test_ivf_topk_recall(emb):
    emb_pd = emb.toPandas()
    qids = [0, 1, 2, 3, 4]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    got = {
        (int(r["query_id"]), int(r["vec_id"]))
        for r in similarity.ivf_topk(
            emb, queries, "vec_id", "embedding", "query_id", "qvec",
            k=5, n_centroids=8, n_probe=4, lloyd_iters=2,
        ).collect()
    }
    exact = {(q, v) for q, v, _ in _np_topk(emb_pd, qids, 5)}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, recall
    # determinism: second run returns the identical set
    again = {
        (int(r["query_id"]), int(r["vec_id"]))
        for r in similarity.ivf_topk(
            emb, queries, "vec_id", "embedding", "query_id", "qvec",
            k=5, n_centroids=8, n_probe=4, lloyd_iters=2,
        ).collect()
    }
    assert got == again


def test_ivf_kmeanspp_beats_first_seeding_on_skew(spark):
    """On clustered data whose low ids all sit in ONE cluster, first-k
    seeding puts every centroid there; k-means++ seeds spread across
    clusters and recall at equal n_probe must improve (or at least hold).
    """
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 16)) * 5.0
    rows = []
    vid = 0
    for c in range(4):  # ids 0..49 cluster0, 50..99 cluster1, ...
        for _ in range(50):
            v = centers[c] + rng.standard_normal(16) * 0.3
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [10, 60, 110, 160]  # one query per cluster
    queries = df.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    pdf = df.toPandas()
    exact = {(q, v) for q, v, _ in _np_topk(pdf, qids, 5)}

    def recall(seeding):
        got = {
            (int(r["query_id"]), int(r["vec_id"]))
            for r in similarity.ivf_topk(
                df, queries, "vec_id", "embedding", "query_id", "qvec",
                k=5, n_centroids=8, n_probe=2, lloyd_iters=2,
                seeding=seeding,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_pp = recall("kmeans++")
    r_first = recall("first")
    assert r_pp >= r_first, (r_pp, r_first)
    assert r_pp >= 0.9, r_pp  # spread seeds must find the true clusters


def test_embedding_near_duplicates_numpy_oracle(emb):
    """Banded sign-LSH near-dup must find the exact threshold pair set
    on a fixture with planted perturbed copies (recall ~1 at cosine
    ~0.996 with 16 bands x 8 planes), verified against numpy all-pairs."""
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    planted = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") + F.lit(0.01)
        ).alias("vec"),
    )
    u = base.unionByName(planted)
    got = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in similarity.embedding_near_duplicates(
            u, "vec_id", "vec", threshold=0.99,
            n_bands=16, band_planes=8, dim=64,
        ).collect()
    }
    assert len(got) >= 50  # every planted pair found

    pdf = u.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    scores = (mat @ mat.T) / (norms[:, None] * norms[None, :])
    exact = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(*np.where(scores >= 0.99))
        if ids[i] < ids[j]
    }
    assert got == exact


def test_ivf_index_build_and_serve(spark, emb, tmp_path):
    """build_ivf_index + ivf_topk_indexed must return exactly what the
    one-shot ivf_topk returns for the same parameters, and the lists
    table must be partitioned by list id (partition pruning surface)."""
    import os

    path = str(tmp_path / "ivf_idx")
    similarity.build_ivf_index(emb, "vec_id", "embedding", path,
                               n_centroids=8, lloyd_iters=2)
    qids = [0, 1, 2, 3, 4]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    served = {
        (int(r["query_id"]), int(r["vec_id"]), int(r["rank"]))
        for r in similarity.ivf_topk_indexed(
            spark, path, queries, "vec_id", "query_id", "qvec",
            k=5, n_probe=4,
        ).collect()
    }
    oneshot = {
        (int(r["query_id"]), int(r["vec_id"]), int(r["rank"]))
        for r in similarity.ivf_topk(
            emb, queries, "vec_id", "embedding", "query_id", "qvec",
            k=5, n_centroids=8, n_probe=4, lloyd_iters=2,
        ).collect()
    }
    assert served == oneshot
    parts = [d for d in os.listdir(os.path.join(path, "lists.parquet"))
             if d.startswith("_list=")]
    assert len(parts) > 1  # physically partitioned by inverted list


def test_multimodal_byte_stats(spark):
    import math

    payloads = [
        (1, b"\xff\xd8\xff\xe0" + b"\x00" * 100),                 # jpeg
        (2, b"\x89PNG\r\n\x1a\n" + bytes(range(256))),            # png
        (3, b"RIFF" + b"\x00\x00\x00\x00" + b"WEBP" + b"x" * 10),
        (4, b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"x" * 10),
        (5, b"\x00\x00\x00\x18ftypmp42" + b"y" * 10),             # mp4
        (6, b"plain ascii text payload here"),
        (7, b""),
        (8, bytes([7] * 64)),                                     # constant
        (9, None),                                                # null
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = {r["media_id"]: r for r in multimodal.byte_stats(df).collect()}

    assert got[1]["sniffed_mime"] == "image/jpeg"
    assert got[2]["sniffed_mime"] == "image/png"
    assert got[3]["sniffed_mime"] == "image/webp"
    assert got[4]["sniffed_mime"] == "audio/wav"
    assert got[5]["sniffed_mime"] == "video/mp4"
    assert got[6]["sniffed_mime"] == "application/octet-stream"

    assert got[6]["printable_ratio"] == 1.0
    assert got[8]["entropy_bits"] == 0.0  # constant bytes
    assert got[7]["n_bytes"] == 0
    assert got[9]["n_bytes"] == 0  # NULL payload treated as empty
    # png payload carries all 256 byte values once + 8 magic bytes:
    # entropy close to 8 bits/byte
    assert got[2]["entropy_bits"] > 7.5
    # sanity: entropy never exceeds log2(256)
    assert all(r["entropy_bits"] <= 8.0 + 1e-6 for r in got.values())
    assert math.isclose(got[6]["entropy_bits"],
                        got[6]["entropy_bits"])  # finite


def test_multimodal_feature_plumbing(spark):
    rows = [
        (1, "image", "image/png", "PNGBYTES" * 10, 32, 32, None),
        (2, "audio", "audio/wav", "WAVBYTES" * 5, None, None, 2000),
        (3, "video", "video/mp4", "MP4BYTES" * 7, 64, 64, 3500),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(df, fake=True).collect()
    assert len(feats) == 3
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
    # real decode path: undecodable payloads null out (default) or raise
    real = multimodal.extract_features(df, fake=False).collect()
    assert all(r["feature"] is None for r in real)
    assert all(r["n_bytes"] > 0 for r in real)
    with pytest.raises(Exception):
        multimodal.extract_features(
            df, fake=False, on_undecodable="raise"
        ).collect()
    frames = multimodal.frame_sample_plan(df, every_ms=1000).collect()
    assert {(int(r["media_id"]), int(r["frame_ts_ms"])) for r in frames} == {
        (3, 0), (3, 1000), (3, 2000), (3, 3000)
    }


def test_deduplicate_filters(spark):
    rows = [
        (1, "aa bb cc dd ee ff"), (2, "aa bb cc dd ee ff"),  # exact dup
        (3, "aa bb cc dd ee zz"),                            # near dup of 1
        (4, "totally different content here entirely now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = dedup.deduplicate_exact(df, "doc_id", "text")
    assert sorted(r["doc_id"] for r in exact.collect()) == [1, 3, 4]
    near = dedup.deduplicate_near(df, "doc_id", "text", threshold=0.3)
    kept = sorted(r["doc_id"] for r in near.collect())
    assert 1 in kept and 4 in kept
    assert 2 not in kept  # exact dup is also a near dup


def test_duplicate_clusters_union_find_oracle(spark):
    # chain 1-2-3-4, pair 10-11, triangle 20-21-22, singleton edge 30-31
    pair_list = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22),
                 (20, 22), (30, 31)]
    pairs = spark.createDataFrame(pair_list, ["id_a", "id_b"])
    got = {
        int(r["id"]): int(r["cluster_id"])
        for r in dedup.duplicate_clusters(pairs, "id").collect()
    }

    # python union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for n in parent:
        expected[n] = find(n)
    assert got == expected
    assert got[4] == 1 and got[11] == 10 and got[22] == 20


def test_duplicate_clusters_long_chain_converges(spark):
    """A 200-node path has diameter 200; pointer jumping must converge
    it in O(log n) passes, well inside max_iters=20 (min-propagation
    alone would need ~200 and raise)."""
    chain = [(i, i + 1) for i in range(200)]
    pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
    got = {
        int(r["id"]): int(r["cluster_id"])
        for r in dedup.duplicate_clusters(pairs, "id",
                                          max_iters=20).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_duplicate_clusters_raises_when_not_converged(spark):
    import pytest

    chain = [(i, i + 1) for i in range(200)]
    pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(pairs, "id", max_iters=2)


def test_curate_corpus_pipeline(spark):
    from pure_python_geospatial_export_spark.operators import curate

    good = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the field with steady pace today")
    rows = [
        (1, good),
        (2, good),                      # exact dup of 1 -> dropped
        (3, good + " zzzz"),            # near dup of 1 -> dropped
        (4, "x"),                       # too short -> dropped
        (5, "!!! ??? !!! ??? !!! ??? !!! ??? !!! ???"),  # low quality
        (6, "a completely different sentence about spark and parquet "
            "tables with many ordinary words in it for the test"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(
        r["doc_id"] for r in curate.curate_corpus(
            df, min_quality=0.2, near_dup_threshold=0.5,
        ).collect()
    )
    assert kept == [1, 6]

    rep = curate.curation_report(df, curate.curate_corpus(
        df, min_quality=0.2, near_dup_threshold=0.5))
    assert rep["raw_rows"] == 6 and rep["kept_rows"] == 2
    assert rep["dropped_rows"] == 4
    assert abs(rep["kept_fraction"] - 2 / 6) < 1e-12

    # near-dup stage optional
    kept2 = sorted(
        r["doc_id"] for r in curate.curate_corpus(
            df, min_quality=0.2, near_dup_threshold=None,
        ).collect()
    )
    assert 3 in kept2  # near-dup survives when the stage is skipped


def test_deterministic_sample_properties(spark):
    from pure_python_geospatial_export_spark.operators import curate

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    s1 = {r["k"] for r in curate.deterministic_sample(
        df, "k", 0.3).collect()}
    # partitioning-invariant: identical selection after repartition
    s2 = {r["k"] for r in curate.deterministic_sample(
        df.repartition(17), "k", 0.3).collect()}
    assert s1 == s2
    assert abs(len(s1) / 5000 - 0.3) < 0.03
    # nested samples: a smaller fraction is a subset of a larger one
    s_small = {r["k"] for r in curate.deterministic_sample(
        df, "k", 0.1).collect()}
    assert s_small <= s1
    # a different seed draws a (near-)independent sample
    s_seeded = {r["k"] for r in curate.deterministic_sample(
        df, "k", 0.3, seed="b").collect()}
    assert s_seeded != s1


def test_stratified_hash_sample_rates(spark):
    from pure_python_geospatial_export_spark.operators import curate

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = curate.stratified_hash_sample(
        df, "k", "lang", {"en": 0.5, "de": 0.1}).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    assert abs(got["en"] / 2000 - 0.5) < 0.05
    assert abs(got["de"] / 2000 - 0.1) < 0.04
    # default_fraction=0 drops unlisted strata entirely
    out0 = curate.stratified_hash_sample(
        df, "k", "lang", {"en": 0.5}).where(F.col("lang") == "de")
    assert out0.count() == 0


def test_deduplicate_clustered(spark):
    rows = [
        (1, "aa bb cc dd ee ff gg"),
        (2, "aa bb cc dd ee ff zz"),   # near 1
        (3, "aa bb cc dd ee qq zz"),   # near 2 (transitively near 1)
        (4, "completely different words in this one here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(
        r["doc_id"] for r in dedup.deduplicate_clustered(
            df, "doc_id", "text", threshold=0.25).collect()
    )
    assert 1 in kept and 4 in kept
    assert 2 not in kept


def test_cosine_topk_arrow_equals_baseline(emb, spark):
    """The Arrow matmul twin must reproduce the column-expression
    baseline's exact result — ids, ranks, and scores to 1e-9 (BLAS vs
    left-fold summation order)."""
    qids = [0, 1, 2, 3]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    args = (emb, queries, "vec_id", "embedding", "query_id", "qvec")
    base = {
        (int(r["query_id"]), int(r["rank"])):
            (int(r["vec_id"]), r["score"])
        for r in similarity.cosine_topk(*args, k=7).collect()
    }
    fast = {
        (int(r["query_id"]), int(r["rank"])):
            (int(r["vec_id"]), r["score"])
        for r in similarity.cosine_topk_arrow(*args, k=7).collect()
    }
    assert set(base) == set(fast)
    for key, (vid, score) in base.items():
        fvid, fscore = fast[key]
        assert fvid == vid, (key, vid, fvid)
        assert abs(fscore - score) < 1e-9

    # repartitioning must not change the result (local top-k is exact)
    fast13 = {
        (int(r["query_id"]), int(r["rank"])): int(r["vec_id"])
        for r in similarity.cosine_topk_arrow(
            emb.repartition(13), queries, "vec_id", "embedding",
            "query_id", "qvec", k=7
        ).collect()
    }
    assert fast13 == {key: vid for key, (vid, _) in fast.items()}


def test_cosine_topk_arrow_skips_degenerate_vectors(spark):
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType()), True),
    ])
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, None),          # NULL embedding
        (4, [0.0, 0.0]),    # zero norm
        (5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, schema)
    q = spark.createDataFrame([(100, [1.0, 0.0])],
                              ["query_id", "qvec"])
    got = [
        (r["vec_id"], r["rank"])
        for r in similarity.cosine_topk_arrow(
            df, q, "vec_id", "embedding", "query_id", "qvec", k=10
        ).orderBy("rank").collect()
    ]
    assert got == [(1, 1), (2, 2), (5, 3)]  # 3 and 4 skipped


def test_ngram_jaccard_guards_accidental_scale_use(spark):
    """Round-5 verdict item 4: the exact all-pairs crossJoin must
    refuse fact-scale inputs loudly instead of launching an O(n^2)
    join; max_rows=None opts out."""
    import pytest

    from pure_python_geospatial_export_spark.operators import dedup
    from pure_python_geospatial_export_spark.session import local_df

    df = local_df(
        spark, [(i, "text %d" % i) for i in range(30)],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="ALL-PAIRS"):
        dedup.ngram_jaccard_pairs(df, "doc_id", "text", max_rows=10)
    # under the cap (and with the guard disabled) it still runs
    assert dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", max_rows=30
    ).count() >= 0
    assert dedup.ngram_jaccard_pairs(
        df.limit(5), "doc_id", "text", max_rows=None
    ).count() >= 0


def test_size_prefilter_exactness(spark):
    """Round-5 verdict item 2: the in-join Jaccard size bound must
    never change the verified pair set — borderline ratios (exactly at
    the threshold) included."""
    from pure_python_geospatial_export_spark.operators import dedup
    from pure_python_geospatial_export_spark.session import local_df

    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lambda mu nu xi omicron pi rho sigma tau").split()
    rows = []
    doc_id = 0
    for fam in range(20):
        toks = [words[(fam * 5 + k) % len(words)] + str(fam * 9 + k)
                for k in range(60)]
        rows.append((doc_id, " ".join(toks))); doc_id += 1
        rows.append((doc_id, " ".join(toks) + " tailX")); doc_id += 1
        rows.append((doc_id, " ".join(toks[:42]))); doc_id += 1  # 70%
        rows.append((doc_id, " ".join(toks[:30]))); doc_id += 1  # 50%
    df = local_df(spark, rows, ["doc_id", "text"])
    for thr in (0.5, 0.7, 0.9):
        on = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 12))
            for r in dedup.near_duplicates_minhash(
                df, "doc_id", "text", threshold=thr,
                size_prefilter=True,
            ).collect()
        }
        off = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 12))
            for r in dedup.near_duplicates_minhash(
                df, "doc_id", "text", threshold=thr,
                size_prefilter=False,
            ).collect()
        }
        assert on == off, thr
        assert on  # fixture sanity: families produce pairs


def test_ivfpq_index_recall_and_memory(spark, emb, tmp_path):
    """IVF-PQ (round-5): byte-coded inverted lists must (a) be several
    times smaller than the IVF-flat lists, (b) recover the exact top-k
    after the ADC -> exact-rerank pipeline at generous probes/rerank,
    and (c) serve deterministically."""
    import os

    flat = str(tmp_path / "flat")
    pq = str(tmp_path / "pq")
    similarity.build_ivf_index(emb, "vec_id", "embedding", flat,
                               n_centroids=8, lloyd_iters=2)
    meta = similarity.build_ivfpq_index(
        emb, "vec_id", "embedding", pq, n_centroids=8,
        m_subspaces=8, lloyd_iters=2,
    )
    assert meta["m_subspaces"] == 8

    def tree_bytes(p):
        total = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
        return total

    flat_b = tree_bytes(os.path.join(flat, "lists.parquet"))
    pq_b = tree_bytes(os.path.join(pq, "lists.parquet"))
    # dim=64 float32-in-double lists vs 8 bytes/vec: demand >= 8x on
    # disk (parquet framing overhead included)
    assert pq_b * 8 <= flat_b, (pq_b, flat_b)

    qids = [0, 1, 2, 3, 4]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    exact = {
        (int(r["query_id"]), int(r["vec_id"]), int(r["rank"]))
        for r in similarity.cosine_topk_arrow(
            emb, queries, "vec_id", "embedding", "query_id", "qvec",
            k=5,
        ).collect()
    }
    serve = lambda: {
        (int(r["query_id"]), int(r["vec_id"]), int(r["rank"]))
        for r in similarity.ivfpq_topk_indexed(
            spark, pq, queries, emb, "vec_id", "embedding",
            "query_id", "qvec", k=5, n_probe=8, rerank=256,
        ).collect()
    }
    got = serve()
    assert got == serve()  # deterministic
    # all 8 lists probed + generous rerank: exact scores, exact ranks
    assert got == exact


def test_ivfpq_sq_intermediate_rerank(spark, emb, tmp_path):
    """int8-SQ intermediate rerank (round-5 verdict item 9): the
    sq.parquet relation is ~8x smaller than the float64 vectors it
    replaces in the rerank join, and serving with sq_keep recovers the
    exact top-k at generous margins, deterministically."""
    import json
    import os

    pq = str(tmp_path / "pq")
    meta = similarity.build_ivfpq_index(
        emb, "vec_id", "embedding", pq, n_centroids=8,
        m_subspaces=8, lloyd_iters=2,
    )
    assert meta["sq"] is True

    def tree_bytes(p):
        total = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
        return total

    dim = int(meta["dim"])
    n = emb.count()
    sq_b = tree_bytes(os.path.join(pq, "sq.parquet"))
    # dim int8 bytes per vector (+ parquet framing) vs 8*dim float64
    assert sq_b < n * dim * 2, (sq_b, n, dim)

    qids = [0, 1, 2, 3, 4]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    exact = {
        (int(r["query_id"]), int(r["vec_id"]), int(r["rank"]))
        for r in similarity.cosine_topk_arrow(
            emb, queries, "vec_id", "embedding", "query_id", "qvec",
            k=5,
        ).collect()
    }
    serve = lambda: {
        (int(r["query_id"]), int(r["vec_id"]), int(r["rank"]))
        for r in similarity.ivfpq_topk_indexed(
            spark, pq, queries, emb, "vec_id", "embedding",
            "query_id", "qvec", k=5, n_probe=8, rerank=256,
            sq_keep=64,
        ).collect()
    }
    got = serve()
    assert got == serve()  # deterministic
    assert got == exact    # SQ top-64 of 256 keeps every true top-5

    # guard rails: sq_keep < k, and an index without the sq relation
    import pytest

    with pytest.raises(ValueError, match="sq_keep must be >= k"):
        similarity.ivfpq_topk_indexed(
            spark, pq, queries, emb, "vec_id", "embedding",
            "query_id", "qvec", k=5, sq_keep=3,
        )
    mp = os.path.join(pq, "meta.json")
    m = json.load(open(mp))
    del m["sq"]
    with open(mp, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="sq relation"):
        similarity.ivfpq_topk_indexed(
            spark, pq, queries, emb, "vec_id", "embedding",
            "query_id", "qvec", k=5, sq_keep=20,
        )
