"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode/feature-extraction run as ``mapInPandas`` Arrow kernels so payload
bytes stream executor-side in batches and never hit the driver. The actual
media decoding is STUBBED (no imaging/audio libraries in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder exercises the full Spark plumbing
(schema, batch shapes, partitioning) end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image|audio|video
    StructField("mime", StringType(), False),
    StructField("payload", StringType(), False),   # binary in real tables
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("feature", ArrayType(FloatType()), True),
])


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a dim-sized float feature
    derived from payload bytes (stable across runs/executors)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    pad = (-arr.size) % dim
    arr = np.pad(arr, (0, pad)).reshape(-1, dim)
    return (arr.mean(axis=0) / 255.0).astype(np.float32)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kind_col: str = "kind",
    dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real decode is not available in this environment; pass ``fake=True``
    to run the deterministic fake decoder through the identical plumbing.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires imaging/audio libraries not present "
            "in this environment; use fake=True to exercise the pipeline"
        )

    src = df.select(
        F.col(id_col).alias("media_id"),
        F.col(kind_col).alias("kind"),
        F.col(payload_col).alias("payload"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            nbytes = []
            for p in payloads:
                b = bytes(p) if not isinstance(p, str) else p.encode()
                nbytes.append(len(b))
                feats.append(_fake_decode(b, dim).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "feature": feats,
            })

    return src.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode sample timestamps as rows
    (the decode of each frame is the stubbed step). Pure column math."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
