"""KMV (k-minimum-values) distinct-count sketch — mergeable cardinality
estimates over the cell hierarchy.

Exact ``countDistinct`` per group cannot be ROLLED UP: distinct counts
of child cells don't add. The KMV sketch (Bar-Yossef et al. 2002) keeps
the k smallest hash values of the distinct elements per group; two
sketches merge by union->sort->take-k, so per-cell sketches aggregate up
a tile pyramid (or across daily partitions) without touching raw data
again. Estimate: exact ``|sketch|`` while fewer than k values were seen,
else ``(k-1) * H / kth_min`` with ``H = 2^32`` the hash space.

The hash is DETERMINISTIC and cross-engine: the first 8 hex chars of
md5 parsed as an integer — Spark computes it with ``conv(substring(...))``
and DuckDB with a digit-sum over the same substring (``kmv_hash_sql``),
so the driver oracle can reproduce estimates bit-for-bit.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 4294967296.0  # 2^32


def kmv_hash_col(col: Column) -> Column:
    """First 32 bits of md5 as BIGINT in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def kmv_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`kmv_hash_col`: positional digit-sum over
    the same 8 hex chars (DuckDB has no base-conv function)."""
    digits = "0123456789abcdef"
    terms = [
        "(strpos('%s', substring(md5(%s), %d, 1)) - 1) * %d"
        % (digits, expr, i + 1, 16 ** (7 - i))
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def kmv_sketch(df: DataFrame, group_cols: List[str], value_col: str,
               k: int = 64) -> DataFrame:
    """(group_cols..., sketch: array<long>) — the k smallest DISTINCT
    hash values of ``value_col`` per group. One distinct + one window
    top-k (WindowGroupLimit prunes before the final pass); duplicates of
    a value never change the sketch."""
    d = df.select(
        *group_cols, kmv_hash_col(F.col(value_col)).alias("_h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    ranked = d.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    return ranked.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_h")).alias("sketch")
    )


def kmv_merge(df: DataFrame, group_cols: List[str], k: int = 64,
              sketch_col: str = "sketch",
              large_fanin: bool = False) -> DataFrame:
    """Roll sketches up to coarser groups: union -> distinct -> k
    smallest.

    Default shape collects the child sketches into one array per group
    (pure array expressions) — right when fan-in is bounded, e.g.
    level-by-level pyramid rollups (fan-in 4). For a SINGLE merge across
    many children (10^6 fine cells into one region) that buffer holds
    k * children values; ``large_fanin=True`` switches to
    explode -> distinct -> window top-k, where WindowGroupLimit caps
    per-group state at k rows regardless of fan-in."""
    if large_fanin:
        exploded = df.select(
            *group_cols, F.explode(sketch_col).alias("_h")
        ).distinct()
        w = Window.partitionBy(*group_cols).orderBy("_h")
        ranked = exploded.withColumn(
            "_rn", F.row_number().over(w)
        ).where(F.col("_rn") <= k)
        return ranked.groupBy(*group_cols).agg(
            F.sort_array(F.collect_list("_h")).alias(sketch_col)
        )
    merged = F.slice(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(sketch_col)))
        ),
        1,
        k,
    )
    return df.groupBy(*group_cols).agg(merged.alias(sketch_col))


def kmv_estimate(sketch_col, k: int = 64) -> Column:
    """Distinct-count estimate column for a sketch: exact below k,
    ``(k-1) * 2^32 / kth_min`` at saturation."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    n = F.size(c)
    kth = F.element_at(c, k)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float((k - 1)) * HASH_SPACE) / kth.cast("double")
    )


def top_keys_per_group(
    df: DataFrame,
    group_cols: List[str],
    key_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact per-group top-k most frequent keys (heavy hitters):
    (group_cols..., key, n, rank), deterministic (count desc, key asc)
    tiebreak.

    Shape: a map-side-combining groupBy on (group, key) — the only
    shuffle that sees data-sized volume, and it carries combined
    partial counts, not raw rows — then a window top-k whose exchange
    moves at most k rows per group per map partition (WindowGroupLimit
    prunes below the exchange). Exact counts are the right call until
    the distinct (group, key) pair count itself is the bottleneck;
    below that, a SpaceSaving sketch saves nothing and loses the
    guarantee."""
    counts = df.groupBy(*group_cols, key_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("n").desc(), F.col(key_col).asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
