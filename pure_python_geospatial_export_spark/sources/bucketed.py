"""Bucketed tables — pay the shuffle once at WRITE time.

A 100 TB fact table that is repeatedly joined or aggregated on the same
key (url/doc_id joins between crawl snapshots, dedup-pair lookups,
feature joins) should be stored BUCKETED on that key: rows are hashed
into a fixed number of buckets per partition at write time, and Spark's
datasource bucketing then plans equi joins between tables with matching
bucket specs WITHOUT any Exchange — the join reads co-located buckets
directly (and with ``sortBy`` the sort-merge join skips the sort too).
That converts every subsequent join from an O(data) shuffle into a scan.

This is the storage-level counterpart of the broadcast cover
(dimension side) and the salted shuffle (skewed side) in
operators/spatial_join.py — the three named north-rule techniques for
partitioning/shuffle/skew.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort_cols: Optional[List[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table in the session catalog. Joins between two tables written with
    the SAME key and bucket count are planned shuffle-free."""
    if mode == "overwrite":
        # the default catalog is in-memory per session: a managed-table
        # directory left by a PREVIOUS session is invisible to it and
        # saveAsTable refuses the location — drop both catalog entry
        # and stale directory. The stale path is derived from the
        # CATALOG's database location (handles db-qualified names like
        # 'db.tbl' -> <db location>/tbl) and only removed for local
        # filesystems — a remote warehouse URI is left to the catalog.
        import os
        import shutil
        from urllib.parse import urlparse

        spark = df.sparkSession
        spark.sql("DROP TABLE IF EXISTS %s" % table)
        parts = table.split(".")
        db = parts[-2] if len(parts) >= 2 else (
            spark.catalog.currentDatabase()
        )
        tbl = parts[-1]
        try:
            loc = urlparse(spark.catalog.getDatabase(db).locationUri)
        except Exception:
            loc = None
        if loc is not None and loc.scheme in ("", "file") and loc.path:
            shutil.rmtree(os.path.join(loc.path, tbl),
                          ignore_errors=True)
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata rides in the catalog,
    so downstream joins see the co-location)."""
    return spark.table(table)
