"""Streaming corpus curation: the continuous-ingest twin of
``operators/curate.curate_corpus``.

A crawl arriving as a stream gets the same cost-ordered treatment as
the batch preset: stateless codegen filters first (token floor, quality
floor, language allowlist — pure column expressions, so they run
unchanged under Structured Streaming with zero state), PII redaction as
a projection, then exact dedup via ``dropDuplicatesWithinWatermark``
(the only stateful stage — state bounded by the watermark horizon,
ref streaming/ingest.deduplicated_stream). Near-dup stays a batch /
dedicated-stream concern (streaming/neardup.py) — chaining a second
stateful operator behind the dedup would trip Spark's global-watermark
restriction.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import pii as P
from ..functions import text as T


def curated_stream(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.3,
    keep_langs: Optional[list] = None,
    redact: bool = True,
    dedup_watermark: Optional[str] = "2 hours",
) -> DataFrame:
    """Filter + redact + dedup a page stream; returns the surviving
    rows (with ``text_col`` redacted in place when ``redact``).

    Works identically on a batch DataFrame (streaming-ness is decided
    by the input), which is how the equivalence test pins it to the
    batch preset's semantics. Pass ``dedup_watermark=None`` to skip the
    stateful stage (e.g. when a downstream stage owns the watermark).
    """
    out = pages.where(
        (T.token_count(F.col(text_col)) >= min_tokens)
        & (T.quality_score(F.col(text_col)) >= min_quality)
    )
    if keep_langs:
        out = out.where(T.lang_id(F.col(text_col)).isin(list(keep_langs)))
    if redact:
        out = out.withColumn(text_col, P.redact_pii(F.col(text_col)))
    if dedup_watermark is not None:
        hashed = out.withColumn(
            "_text_hash", F.md5(F.coalesce(F.col(text_col), F.lit("")))
        )
        out = (
            hashed.withWatermark(ts_col, dedup_watermark)
            .dropDuplicatesWithinWatermark(["_text_hash"])
            .drop("_text_hash")
        )
    return out
