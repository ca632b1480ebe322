"""Common-Crawl-style pages table — distributed deterministic synthesis.

Schema mandated by BASELINE.json input_hint:
(url string, warc_ts timestamp, html binary, text string, lang string).

Generation rules follow FIXTURES.md §1 and are implemented as pure column
expressions over ``spark.range`` — generation itself is distributed and
O(rows/partition) per executor, so the same code synthesizes 1k rows in a
test or 10^12 rows on a cluster (no driver materialization anywhere).

The per-row invariant "text is byte-identical per url" holds by
construction: text is a pure function of (id, url).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "pt"]


def synth_pages(
    spark: SparkSession,
    n: int,
    skew_hot_fraction: float = 0.0,
    hot_pool: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic pages table with ``n`` rows.

    ``skew_hot_fraction`` > 0 routes that share of rows to a pool of only
    ``hot_pool`` distinct urls, concentrating their derived points into a
    handful of hot cells — the fixture for skew/salting tests
    (FIXTURES.md §1 skew variant).
    """
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    df = rng.withColumnRenamed("id", "page_id")

    base_url = F.concat(
        F.lit("https://example-"),
        (F.col("page_id") % 1000).cast("string"),
        F.lit(".test/page/"),
        F.col("page_id").cast("string"),
    )
    # url_key: the identifier the url (and therefore the text) derives
    # from — page_id normally; a small pool id for skewed hot rows, so
    # the "text is byte-identical per url" invariant (input_hint) holds
    # by construction even when urls repeat
    if skew_hot_fraction > 0:
        mod = max(1, round(1.0 / skew_hot_fraction))
        is_hot = F.col("page_id") % mod == 0
        url_key = F.when(
            is_hot, (F.col("page_id") % hot_pool)
        ).otherwise(F.col("page_id"))
        url = F.when(
            is_hot,
            F.concat(
                F.lit("https://hot.test/page/"),
                (F.col("page_id") % hot_pool).cast("string"),
            ),
        ).otherwise(base_url)
    else:
        url_key = F.col("page_id")
        url = base_url

    df = df.withColumn("url", url).withColumn("_url_key", url_key)
    text = F.concat(
        F.lit("page "),
        F.col("_url_key").cast("string"),
        F.lit(" body "),
        F.substring(F.sha2(F.col("url"), 256), 1, 8),
    )
    df = (
        df.withColumn("warc_ts", F.expr(
            "timestamp'2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,page_id)"
        ))
        .withColumn("text", text)
        .withColumn(
            "html",
            F.encode(
                F.concat(
                    F.lit("<html><body>"), text, F.lit("</body></html>")
                ),
                "UTF-8",
            ),
        )
        .withColumn(
            "lang",
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]),
                (F.col("page_id") % len(LANGS) + 1).cast("int"),
            ),
        )
    )
    return df.select("page_id", "url", "warc_ts", "html", "text", "lang")
