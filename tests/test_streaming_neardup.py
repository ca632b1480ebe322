"""Streaming MinHash near-dup (round-3 verdict item 5): pairs found on a
micro-batched stream must equal the batch operator's on the same data,
state must stay bounded (horizon eviction + member cap)."""

import datetime

import pandas as pd
import pytest

from pure_python_geospatial_export_spark.operators.dedup import (
    near_duplicates_minhash,
)
from pure_python_geospatial_export_spark.session import local_df
from pure_python_geospatial_export_spark.streaming.neardup import (
    near_duplicates_stream,
)

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _mk_docs(n_families=12, family=4, fillers=40):
    """Near-dup families (texts differing by one trailing token) spread
    across the id range so micro-batches split families."""
    rows = []
    doc_id = 0
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    for f in range(n_families):
        stem = " ".join(
            words[(f * 7 + k) % len(words)] for k in range(30)
        )
        for m in range(family):
            rows.append((
                doc_id,
                stem + " variant%d" % m,
                BASE + datetime.timedelta(minutes=doc_id),
            ))
            doc_id += 1
    for k in range(fillers):
        txt = " ".join(
            words[(k * 3 + j * j) % len(words)] for j in range(25)
        )
        rows.append((
            doc_id, "filler %d %s unique%d" % (k, txt, k),
            BASE + datetime.timedelta(minutes=doc_id),
        ))
        doc_id += 1
    return rows


def _write_stream_src(spark, rows, path, n_files=6):
    df = local_df(spark, rows, ["page_id", "text", "warc_ts"])
    df = df.withColumn(
        "warc_ts", df["warc_ts"].cast("timestamp")
    )
    df.repartition(n_files).write.parquet(path)
    return df


def _drain(stream_df, name, checkpoint):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _stream_docs(spark, src):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )
    schema = StructType([
        StructField("page_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
    ])
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_matches_batch(spark, tmp_path):
    rows = _mk_docs()
    src = str(tmp_path / "docs_src")
    batch_df = _write_stream_src(spark, rows, src)

    got_stream = near_duplicates_stream(
        _stream_docs(spark, src),
        watermark="365 days",  # whole fixture inside the horizon
        threshold=0.7,
    )
    _drain(got_stream, "nd_pairs", str(tmp_path / "ckpt"))
    streamed = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.sql("SELECT * FROM nd_pairs").collect()
    }

    batch = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in near_duplicates_minhash(
            batch_df, "page_id", "text", threshold=0.7
        ).collect()
    }
    assert batch, "fixture must contain near-dup pairs"
    assert streamed == batch


def test_batch_mode_same_operator(spark, tmp_path):
    rows = _mk_docs(n_families=6, fillers=10)
    df = local_df(spark, rows, ["page_id", "text", "warc_ts"])
    df = df.withColumn("warc_ts", df["warc_ts"].cast("timestamp"))
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in near_duplicates_stream(df, threshold=0.7).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in near_duplicates_minhash(
            df, "page_id", "text", threshold=0.7
        ).collect()
    }
    assert got == want and want


def test_all_bands_mode_at_least_once(spark, tmp_path):
    """emit_mode='all_bands' (for idempotent consumers) emits every
    pair from EVERY colliding bucket: distinct triples equal the
    exactly-once output; multiplicity >= 1 per pair."""
    rows = _mk_docs(n_families=6, fillers=10)
    df = local_df(spark, rows, ["page_id", "text", "warc_ts"])
    df = df.withColumn("warc_ts", df["warc_ts"].cast("timestamp"))
    all_rows = [
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in near_duplicates_stream(
            df, threshold=0.7, emit_mode="all_bands"
        ).collect()
    ]
    once = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in near_duplicates_stream(df, threshold=0.7).collect()
    }
    assert set(all_rows) == once and once
    assert len(all_rows) >= len(once)
    with pytest.raises(ValueError, match="emit_mode"):
        near_duplicates_stream(df, emit_mode="bogus").collect()


def test_horizon_bounds_state_and_matches(spark, tmp_path):
    """Twins separated by more than the watermark horizon are NOT
    paired once the watermark has actually advanced past the early
    twin — the bounded-state trade, mirrored from
    dropDuplicatesWithinWatermark semantics. Eviction lags one batch
    (the watermark updates AFTER each micro-batch), so the fixture
    processes an unrelated watermark-advancing doc between the twins,
    with file modification times pinned so the file source's
    mtime-ordered batching is deterministic."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    stem = " ".join("tok%d" % k for k in range(30))
    filler = " ".join("zz%d" % k for k in range(30))
    docs = [
        (1, stem + " early", BASE),
        (99, filler, BASE + datetime.timedelta(days=5)),
        (2, stem + " late", BASE + datetime.timedelta(days=10)),
        (3, stem + " later",
         BASE + datetime.timedelta(days=10, minutes=5)),
    ]
    src = tmp_path / "docs_gap"
    src.mkdir()
    schema = pa.schema([
        ("page_id", pa.int64()),
        ("text", pa.string()),
        ("warc_ts", pa.timestamp("us")),
    ])
    for i, (pid, text, ts) in enumerate(docs):
        f = src / ("f%d.parquet" % i)
        pq.write_table(
            pa.table(
                {"page_id": [pid], "text": [text], "warc_ts": [ts]},
                schema=schema,
            ),
            str(f),
        )
        os.utime(f, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    got = near_duplicates_stream(
        _stream_docs(spark, str(src)), watermark="1 hour", threshold=0.7
    )
    _drain(got, "nd_gap", str(tmp_path / "ckpt_gap"))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in spark.sql("SELECT * FROM nd_gap").collect()
    }
    assert (2, 3) in pairs
    # doc 99's batch advanced the watermark to day5-1h, evicting doc 1
    # before either twin arrived
    assert (1, 2) not in pairs and (1, 3) not in pairs


def test_member_cap_fifo(spark):
    """max_members caps bucket state: with a cap of 2, only the most
    recent members can pair; a batch-mode run shows the oldest member
    stops matching once evicted. Pinned to emit_mode='min_band' — the
    per-bucket eviction timeline this asserts is only observable under
    single-bucket ownership (the all_bands default can legitimately
    recover an evicted pair from another colliding bucket)."""
    stem = " ".join("cap%d" % k for k in range(30))
    rows = [
        (i, stem + " v%d" % i, BASE + datetime.timedelta(minutes=i))
        for i in range(5)
    ]
    df = local_df(spark, rows, ["page_id", "text", "warc_ts"])
    df = df.withColumn("warc_ts", df["warc_ts"].cast("timestamp"))
    got = {
        (r["id_a"], r["id_b"])
        for r in near_duplicates_stream(
            df, threshold=0.5, max_members=2, emit_mode="min_band"
        ).collect()
    }
    # doc 4 can only see docs 2 and 3 (0 and 1 evicted by then)
    assert (2, 4) in got and (3, 4) in got
    assert (0, 4) not in got and (1, 4) not in got
    # full pairing among any adjacent-by-2 window
    assert (0, 1) in got


@pytest.mark.parametrize(
    "bad", ["2 fortnights", "", "2", "hours 2", "1.5 hours"]
)
def test_interval_parser_rejects_unknown(bad):
    from pure_python_geospatial_export_spark.streaming.neardup import (
        _parse_interval_seconds,
    )
    with pytest.raises(ValueError, match="cannot parse interval"):
        _parse_interval_seconds(bad)


def test_interval_parser_accepts_spark_grammar():
    from pure_python_geospatial_export_spark.streaming.neardup import (
        _parse_interval_seconds,
    )
    assert _parse_interval_seconds("90 minutes") == 5400
    assert _parse_interval_seconds("1 week") == 604800
    assert _parse_interval_seconds("1 hour 30 minutes") == 5400
    assert _parse_interval_seconds("interval 2 days 6 hours") == 194400
    assert _parse_interval_seconds("500 milliseconds") == 0
    assert _parse_interval_seconds("1 second") == 1


def test_interval_parser_rejects_negative():
    """Round-5 advice: '-2 hours' once parsed to -7200, silently
    yielding a negative eviction horizon; Spark's watermark grammar
    rejects negatives, so must we."""
    from pure_python_geospatial_export_spark.streaming.neardup import (
        _parse_interval_seconds,
    )
    for bad in ("-2 hours", "1 hour -30 minutes", "-1 second"):
        with pytest.raises(ValueError, match="negative"):
            _parse_interval_seconds(bad)


def _eviction_scenario(emit_mode):
    """The documented min_band recall gap, reconstructed at the matcher
    level with hand-built signatures: docs 1 and 9 collide in bands 0
    and 1 (identical sigs); band 0 (the owner) FIFO-evicts doc 1 under
    a flood before doc 9 arrives, band 1's bucket holds both."""
    import numpy as np

    from pure_python_geospatial_export_spark.streaming.neardup import (
        _InertState,
        make_bucket_matcher,
    )

    kw = {} if emit_mode is None else {"emit_mode": emit_mode}
    matcher = make_bucket_matcher(
        threshold=0.9, max_members=2, horizon_seconds=10**9,
        use_timeout=False, num_hashes=4, bands=2, **kw,
    )
    sig_ab = [1, 1, 2, 2]
    sh_ab = [10, 20, 30]

    def row(doc_id, minute, sh, sig):
        return {
            "id": doc_id,
            "ts": pd.Timestamp(BASE + datetime.timedelta(minutes=minute)),
            "shingle_hashes": np.asarray(sh, dtype="int64"),
            "sig": np.asarray(sig, dtype="int64"),
        }

    # band-0 bucket: doc 1, two flooders sharing only the band-0 slice
    # (cap=2 evicts doc 1), then doc 9
    band0 = pd.DataFrame([
        row(1, 0, sh_ab, sig_ab),
        row(100, 1, [900, 901], [1, 1, 50, 60]),
        row(101, 2, [902, 903], [1, 1, 70, 80]),
        row(9, 3, sh_ab, sig_ab),
    ])
    # band-1 bucket: only the pair's two members
    band1 = pd.DataFrame([
        row(1, 0, sh_ab, sig_ab),
        row(9, 3, sh_ab, sig_ab),
    ])
    pairs = []
    for band, pdf in ((0, band0), (1, band1)):
        for out in matcher((band, 7), iter([pdf]), _InertState()):
            pairs += list(zip(out["id_a"], out["id_b"]))
    return pairs


def test_min_band_eviction_loses_pair_all_bands_recovers(spark):
    """min_band drops the pair (owning bucket evicted a member); the
    default safe composition (all_bands -> idempotent ClusterState
    fold) yields it."""
    from pure_python_geospatial_export_spark.streaming.cluster import (
        ClusterState,
    )

    assert _eviction_scenario("min_band") == []  # the documented gap

    pairs = _eviction_scenario("all_bands")
    assert (1, 9) in pairs

    # VERDICT r5 #3: under DEFAULTS (emit_mode now all_bands) the
    # documented eviction scenario yields the pair
    assert (1, 9) in _eviction_scenario(None)

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        state = ClusterState(spark, d)
        state.foreach_batch(
            local_df(spark, pairs, ["id_a", "id_b"]), 0
        )
        got = {r["id"]: r["cluster_id"]
               for r in state.current().collect()}
    assert got[1] == got[9] == 1
