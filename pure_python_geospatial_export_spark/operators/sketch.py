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


def kmv_union_col(a, b, k: int = 64) -> Column:
    """Union sketch of two KMV sketches: the k smallest of the merged
    distinct hashes. Same shape as the build, so estimates
    (:func:`kmv_estimate`) and further unions compose losslessly —
    ``union(union(a,b),c) == union(a,union(b,c)) == sketch(A∪B∪C)``."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_overlap_cols(a, b, k: int = 64):
    """Set-operation estimates from two KMV sketches (Beyer et al.
    2007) — the capability HLL registers cannot provide: registers
    only merge by max (union), while KMV's value sketches support
    INTERSECTION via the union sketch as a common sample frame.

    Returns ``(est_union, jaccard, est_intersection)`` Columns:
    the union sketch U of the k smallest merged hashes estimates
    ``|A∪B|`` as usual; ``J = |U ∩ sk(A) ∩ sk(B)| / |U|`` is the
    fraction of that uniform sample present in both sets; and
    ``est_intersection = J * est_union``. Every step is array/double
    arithmetic with exact DuckDB twins (list_slice/list_sort/
    list_distinct/list_concat/list_intersect), so the driver oracle
    reproduces all three estimates bit-for-bit. Standard error of J
    is ~sqrt(J(1-J)/k)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    u = kmv_union_col(a, b, k)
    icnt = F.size(F.array_intersect(F.array_intersect(u, a), b))
    jac = icnt.cast("double") / F.size(u).cast("double")
    est_u = kmv_estimate(u, k)
    return est_u, jac, jac * est_u


def hll_sketch(df: DataFrame, group_cols: List[str], value_col: str,
               p: int = 8) -> DataFrame:
    """HyperLogLog register relation (Flajolet et al. 2007):
    (group_cols..., bucket: int, reg: int) — sparse rows, one per
    NON-ZERO register, at most ``m = 2**p`` per group.

    Where KMV (:func:`kmv_sketch`) keeps k hash VALUES (8k bytes), HLL
    keeps m 6-bit registers — at equal memory it trades ~30% worse
    constant error for a fixed-size, register-wise-max-mergeable
    summary, the standard shape for per-cell distinct rollups at
    corpus scale. Stored sparse as relation rows (absent bucket ==
    register 0) so the merge is a plain groupBy-max and the build is
    pure column arithmetic.

    Every step is cross-engine exact: the hash is the md5-prefix
    integer (:func:`kmv_hash_col` / :func:`kmv_hash_sql`), the bucket
    is ``h % m``, the remaining ``32-p`` bits are ``(h - h%m)/m``
    (exact double division below 2^53), and the rank
    ``rho = 33 - p - bitlength(rest)`` uses ``length(bin(x))`` —
    ``bin`` has identical semantics in Spark and DuckDB (no padding,
    ``'0'`` for zero), so the DuckDB oracle reproduces registers
    bit-for-bit. One shuffle (the register groupBy, map-side
    combining max).
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    h = kmv_hash_col(F.col(value_col))
    bucket = (h % m).cast("int").alias("bucket")
    rest = ((h - (h % m)) / m).cast("long")
    rho = (
        F.when(rest > 0,
               F.lit(33 - p) - F.length(F.bin(rest)))
        .otherwise(F.lit(33 - p))
        .cast("int")
    )
    return (
        # NULL values don't count as a distinct element (countDistinct
        # semantics); without the filter they'd land as a NULL-bucket
        # register row and skew `zeros` by one
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, bucket, rho.alias("_rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("reg"))
    )


def hll_merge(df: DataFrame, group_cols: List[str]) -> DataFrame:
    """Roll register relations up to coarser groups: register-wise max.
    Exactly equals the sketch built directly from the unioned raw data
    (max is associative/commutative/idempotent), so merge trees of any
    depth — tile pyramids, daily partitions — are lossless relative to
    a direct build."""
    return df.groupBy(*group_cols, "bucket").agg(
        F.max("reg").alias("reg")
    )


#: scale for the integer harmonic sum: sum(2^(HLL_SCALE_BITS - reg))
#: is an exact BIGINT (reg <= 33 <= HLL_SCALE_BITS), so the
#: addition-order-sensitive double sum in the textbook formula becomes
#: an order-free integer sum — the property that lets the DuckDB
#: oracle reproduce estimates bit-for-bit.
HLL_SCALE_BITS = 40


def hll_estimate(sketch: DataFrame, group_cols: List[str],
                 p: int = 8, correction: bool = True) -> DataFrame:
    """(group_cols..., zeros, harmonic, est) from a register relation.

    ``harmonic`` is the scaled-integer harmonic sum over all m
    registers (absent rows count as register 0 == ``2^HLL_SCALE_BITS``
    each): exact BIGINT, so bit-reproducible regardless of
    partitioning. ``est`` is ``alpha_m * m^2 * 2^scale / harmonic`` —
    one double division of exact operands — with the standard
    small-range correction ``m * ln(m / zeros)`` when
    ``correction=True`` (default), ``est_raw`` otherwise.

    Cross-engine exactness of the CORRECTED branch: computing the
    ``ln`` in-engine is not reproducible (JVM Math.log and DuckDB ln
    measurably differ by 1 ulp on ~7% of the m/zeros inputs), so for
    ``p <= 10`` the correction values are precomputed HERE with one
    canonical libm and embedded as a literal lookup array indexed by
    ``zeros`` — data, not engine arithmetic, so any engine that can
    parse a double literal reproduces the estimate bit-for-bit
    (:func:`hll_correction_table` builds the same table for oracle
    SQL). Above p=10 the table would be > 2^10 literals, so the
    correction falls back to runtime ``ln`` — accurate, but only
    approximately reproducible across engines."""
    m = 1 << p
    numer = hll_numerator(p)
    term = F.pow(F.lit(2.0), F.lit(HLL_SCALE_BITS) - F.col("reg")) \
        .cast("long")
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum(term).alias("_hs"),
    )
    zeros = (F.lit(m) - F.col("_nb")).cast("long")
    harmonic = (
        F.col("_hs")
        + zeros * F.lit(1 << HLL_SCALE_BITS).cast("long")
    )
    out = agg.select(
        *group_cols,
        zeros.alias("zeros"),
        harmonic.alias("harmonic"),
    )
    raw = F.lit(numer) / F.col("harmonic").cast("double")
    if not correction:
        return out.withColumn("est", raw)
    if p <= 10:
        tbl = hll_correction_table(p)
        corr = F.element_at(
            F.array(*[F.lit(x) for x in tbl]),
            F.col("zeros").cast("int"),
        )
    else:
        corr = F.lit(float(m)) * F.log(
            F.lit(float(m)) / F.col("zeros").cast("double")
        )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("zeros") > 0), corr
    ).otherwise(raw)
    return out.withColumn("est", est)


def hll_alpha(p: int) -> float:
    """The standard HLL bias constant alpha_m, including the small-m
    special cases (m=16/32/64). ONE definition shared by
    :func:`hll_estimate` and the oracle-SQL literal builders — a
    second copy that only knows the m>=128 branch would silently
    diverge for p <= 6."""
    m = 1 << p
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    return 0.673


def hll_numerator(p: int) -> float:
    """``alpha_m * m^2 * 2^HLL_SCALE_BITS`` — the scaled estimate
    numerator, computed once in Python so both engines parse the
    identical shortest-repr double literal."""
    m = 1 << p
    return hll_alpha(p) * float(m) * float(m) * float(
        1 << HLL_SCALE_BITS
    )


def hll_correction_table(p: int) -> List[float]:
    """``[m * ln(m / v) for v in 1..m]`` — the linear-counting
    correction, 1-indexed by ``zeros``. Computed once with Python's
    libm and embedded as literals on BOTH engine sides, which is what
    makes the corrected estimate bit-reproducible (in-engine ln is
    not; see :func:`hll_estimate`)."""
    import math

    m = 1 << p
    return [float(m) * math.log(float(m) / v) for v in range(1, m + 1)]


def quantile_sample(
    df: DataFrame,
    group_cols: List[str],
    value_col: str,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Mergeable quantile sketch as a RELATION: the ``k`` rows with the
    smallest ``kmv_hash(key)`` per group, carried as
    (group_cols..., _h, value).

    Exact quantiles need a full sort of the group; at 10^12 rows the
    scale path is a bounded uniform sample. Hashing a row-unique key
    makes the sample a PURE FUNCTION of the data — partitioning,
    retries, cluster size, and the DuckDB oracle all draw the identical
    rows (unlike rand()-reservoirs) — and gives the bottom-k merge
    property: the sketch of a union is the k smallest of the unioned
    sketches (:func:`quantile_sample_merge`), so per-partition /
    per-day sketches roll up without touching raw data again. Sampling
    error is the usual ~1/sqrt(k) on ranks. One shuffle;
    WindowGroupLimit caps per-group state at k before the exchange."""
    src = df.select(
        *group_cols,
        kmv_hash_col(F.col(key_col).cast("string")).alias("_h"),
        F.col(value_col).alias("value"),
    )
    # tiebreak on value: unlike the KMV sketches (distinct hashes by
    # construction), rows here can collide in the 32-bit hash, and an
    # _h-only sort would make the kept row partition-dependent; rows
    # tying on BOTH (_h, value) are identical in every output column,
    # so this order makes the sample fully deterministic
    w = Window.partitionBy(*group_cols).orderBy("_h", "value")
    return src.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    ).drop("_rn")


def quantile_sample_merge(df: DataFrame, group_cols: List[str],
                          k: int = 256) -> DataFrame:
    """Roll sketches up to coarser groups: union the child relations
    (or pass one DataFrame holding them) and keep the k smallest hashes
    per coarser group. Identical shape to the build, so merge trees of
    any depth produce the same sketch as a direct build over the raw
    rows."""
    w = Window.partitionBy(*group_cols).orderBy("_h", "value")
    return df.select(*group_cols, "_h", "value").withColumn(
        "_rn", F.row_number().over(w)
    ).where(F.col("_rn") <= k).drop("_rn")


def quantile_estimate(
    sample: DataFrame,
    group_cols: List[str],
    qs: List[float],
) -> DataFrame:
    """(group_cols..., q, est) — type-1 (lower) empirical quantile of
    the sample: sorted values indexed at ``max(ceil(q * m), 1)``. The
    arithmetic is deliberately SQL-primitive so the DuckDB oracle can
    mirror it token for token; with k >= group size the sample is the
    whole group and the estimate is the exact type-1 quantile."""
    agg = sample.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("value")).alias("_vs")
    )
    qlit = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    with_q = agg.select(*group_cols, "_vs", qlit)
    idx = F.greatest(
        F.ceil(F.col("q") * F.size("_vs")), F.lit(1)
    ).cast("int")
    return with_q.select(
        *group_cols, "q", F.element_at("_vs", idx).alias("est")
    )


def ss_insert(ss: dict, heap: list, key, w: int, m: int) -> None:
    """Weighted SpaceSaving insertion (Metwally et al. 2005) into a
    ``{key: [cnt, err]}`` summary of capacity ``m`` with a LAZY min-heap
    of ``(cnt, key)`` entries: a tracked key absorbs its weight; an
    untracked one evicts the minimum counter c_min and enters at
    ``c_min + w`` with ``err = c_min``. The heap makes eviction
    amortized O(log m) instead of an O(m) min scan per evicted tail
    item (measured 20x on a long-tail corpus); stale heap entries
    (count since bumped, or key since evicted) are skipped on pop and
    compacted when the heap outgrows 8*m. Eviction ties break by
    (cnt, key) — deterministic. Shared by the batch summaries kernel
    and the streaming fold (streaming/hh.py)."""
    import heapq

    ent = ss.get(key)
    if ent is not None:
        ent[0] += w
        heapq.heappush(heap, (ent[0], key))
    elif len(ss) < m:
        ss[key] = [w, 0]
        heapq.heappush(heap, (w, key))
    else:
        while True:
            mc, mk = heap[0]
            cur = ss.get(mk)
            if cur is not None and cur[0] == mc:
                break
            heapq.heappop(heap)  # stale
        heapq.heappop(heap)
        del ss[mk]
        ss[key] = [mc + w, mc]
        heapq.heappush(heap, (mc + w, key))
        if len(heap) > 8 * m:
            heap[:] = [(c[0], q) for q, c in ss.items()]
            heapq.heapify(heap)


def space_saving_summaries(
    df: DataFrame,
    group_cols: List[str],
    key_col: str,
    m: int = 256,
) -> DataFrame:
    """Per-partition SpaceSaving summaries (Metwally et al. 2005):
    (group_cols..., key, cnt, err, pmin, pid), at most ``m`` keys per
    (group, input partition).

    One mapInPandas pass; within each Arrow batch the items are
    pre-aggregated with a pandas groupby so the Python counter loop
    touches distinct (group, key) pairs, not raw rows (weighted
    SpaceSaving: an absorbed weight-w item bumps its counter by w; an
    untracked one evicts the minimum counter c_min and enters at
    c_min + w with err = c_min).

    ``cnt`` overestimates the partition-local true count by at most
    ``err``; ``pmin`` is the summary's minimum counter when it is full
    (0 otherwise) — the bound on any UNtracked key's partition-local
    count, which :func:`heavy_hitters_sketch` sums into the merged
    undercount bound.
    """
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [in_fields[g] for g in group_cols]
        + [
            StructField("key", in_fields[key_col].dataType, True),
            StructField("cnt", LongType(), False),
            StructField("err", LongType(), False),
            StructField("pmin", LongType(), False),
            StructField("pid", IntegerType(), False),
        ]
    )

    def kernel(batches):
        # group tuple -> ({key: [cnt, err]}, lazy min-heap of (cnt, key))
        state: dict = {}
        for pdf in batches:
            counts = pdf.groupby(
                group_cols + [key_col], sort=False, dropna=False
            ).size()
            for idx, w in counts.items():
                if not isinstance(idx, tuple):
                    idx = (idx,)
                g, key = idx[:-1], idx[-1]
                ss, heap = state.setdefault(g, ({}, []))
                ss_insert(ss, heap, key, int(w), m)
        pid = TaskContext.get().partitionId()
        rows = []
        for g, (ss, _heap) in state.items():
            pmin = min(e[0] for e in ss.values()) if len(ss) >= m else 0
            for key, (cnt, err) in ss.items():
                rows.append(g + (key, cnt, err, pmin, pid))
        if rows:
            yield pd.DataFrame(
                rows, columns=group_cols + ["key", "cnt", "err",
                                            "pmin", "pid"]
            )

    return df.select(*group_cols, key_col).mapInPandas(kernel, out_schema)


def heavy_hitters_sketch(
    df: DataFrame,
    group_cols: List[str],
    key_col: str,
    k: int = 10,
    m: int = 256,
) -> DataFrame:
    """Approximate per-group top-k heavy hitters via MERGED SpaceSaving
    summaries — the escape hatch for when the distinct (group, key)
    cardinality makes :func:`top_keys_per_group`'s exact combine the
    bottleneck (crossover note in docs/PLANS.md).

    Returns (group_cols..., key, est, lo, hi, rank):
      * ``est = sum(cnt)`` over the partition summaries holding the key;
      * ``lo = est - sum(err)`` (SpaceSaving counters only OVERcount);
      * ``hi = est + (total_pmin - present_pmin)`` — a key absent from a
        full partition summary can hide up to that summary's minimum
        counter, so the undercount bound is the sum of ``pmin`` over the
        partitions that did NOT track it.
    True count is always within [lo, hi], and hi - lo <= N_group / m *
    (both bounds are sums of per-partition minima <= N_p / m). Every key
    with true frequency above N_group / m is guaranteed present in the
    merged summary (it is tracked somewhere), though it can rank below
    ``k`` if overcounted rivals displace it — pick k with headroom.

    Shuffle volume: at most m rows per (group, input partition) —
    independent of the distinct-key cardinality, unlike the exact path.
    """
    summ = space_saving_summaries(df, group_cols, key_col, m)
    total_pmin = (
        summ.select(*group_cols, "pid", "pmin")
        .distinct()
        .groupBy(*group_cols)
        .agg(F.sum("pmin").alias("_total_pmin"))
    )
    merged = summ.groupBy(*group_cols, "key").agg(
        F.sum("cnt").alias("est"),
        F.sum("err").alias("_err"),
        F.sum("pmin").alias("_present_pmin"),
    )
    joined = merged.join(total_pmin, group_cols)
    scored = joined.select(
        *group_cols,
        "key",
        "est",
        (F.col("est") - F.col("_err")).alias("lo"),
        (F.col("est") + F.col("_total_pmin")
         - F.col("_present_pmin")).alias("hi"),
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("est").desc(), F.col("key").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
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
    guarantee. Past it, switch to :func:`heavy_hitters_sketch`, whose
    shuffle is m rows per (group, partition) regardless of key
    cardinality (crossover note in docs/PLANS.md)."""
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


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin-Lang-Liberty 2016)
# ---------------------------------------------------------------------------


class KLLSketch:
    """Mergeable quantile sketch with a BOUNDED rank-error guarantee
    independent of stream size — the round-5 upgrade over the
    hash-sample relation (``quantile_sample``), whose error is the
    sampling ~1/sqrt(k) and whose memory is k rows per group
    regardless of how extreme the quantile asked for is.

    Classic KLL compactor chain: level ``i`` holds items of weight
    ``2^i``; when a level overflows its capacity (k * (2/3)^depth,
    floored at 2) its sorted buffer is halved by keeping alternating
    items (parity from a seeded RNG — deterministic for a fixed input
    order/partitioning) and the survivors promote one level up.
    Rank error is O(1/k) up to log factors; the property tests pin an
    observed bound. Merging concatenates level-wise then re-compacts,
    so per-partition sketches roll up exactly like the KMV sketches.
    """

    _C = 2.0 / 3.0

    def __init__(self, k: int = 200, seed: int = 42):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list = [[]]
        self.n = 0
        self._rng = __import__("numpy").random.default_rng(seed)

    # -- capacity / compaction ---------------------------------------------

    def _cap(self, level: int) -> int:
        depth = len(self.levels)
        return max(2, int(self.k * (self._C ** (depth - 1 - level))))

    def _total_cap(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _compress(self) -> None:
        import numpy as np

        while sum(len(lv) for lv in self.levels) > self._total_cap():
            for h, lv in enumerate(self.levels):
                if len(lv) > self._cap(h):
                    arr = np.sort(np.asarray(lv, dtype=np.float64))
                    off = int(self._rng.integers(0, 2))
                    kept = arr[off::2]
                    self.levels[h] = []
                    if h + 1 == len(self.levels):
                        self.levels.append([])
                    self.levels[h + 1].extend(kept.tolist())
                    break
            else:
                break

    # -- updates ------------------------------------------------------------

    def update_many(self, values) -> None:
        import numpy as np

        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return
        self.n += len(vals)
        # feed level 0 in capacity-sized chunks so memory stays bounded
        chunk = max(self._cap(0), 64)
        for lo in range(0, len(vals), chunk):
            self.levels[0].extend(vals[lo:lo + chunk].tolist())
            self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for h, lv in enumerate(other.levels):
            self.levels[h].extend(lv)
        self.n += other.n
        self._compress()
        return self

    # -- queries ------------------------------------------------------------

    def _weighted(self):
        import numpy as np

        vs, ws = [], []
        for h, lv in enumerate(self.levels):
            vs.extend(lv)
            ws.extend([1 << h] * len(lv))
        v = np.asarray(vs, dtype=np.float64)
        w = np.asarray(ws, dtype=np.float64)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        import numpy as np

        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        if self.n == 0:
            raise ValueError("empty sketch")
        v, w = self._weighted()
        cum = np.cumsum(w)
        target = q * float(cum[-1])
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, len(v) - 1)])

    def rank(self, value: float) -> float:
        """Estimated fraction of items <= value."""
        import numpy as np

        v, w = self._weighted()
        if not len(v):
            return 0.0
        mask = v <= value
        return float(w[mask].sum() / w.sum())

    # -- (de)serialization for Spark rows ------------------------------------

    def to_row(self):
        return ([list(map(float, lv)) for lv in self.levels],
                int(self.n))

    @classmethod
    def from_row(cls, levels, n, k: int = 200,
                 seed: int = 42) -> "KLLSketch":
        s = cls(k, seed)
        s.levels = [list(lv) for lv in levels]
        s.n = int(n)
        return s


def kll_sketch(
    df: DataFrame,
    group_cols: List[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Distributed KLL build -> one row per group:
    (group_cols..., levels array<array<double>>, n long).

    Two-stage like every mergeable sketch here: a partition-local
    mapInPandas pass builds one bounded sketch per (partition, group),
    then one shuffle brings each group's partial sketches (at most
    #partitions rows of ~k doubles each) into a merge. Raw values
    cross the wire ONCE, pre-compressed; per-group state never exceeds
    the compactor-chain capacity regardless of group size."""
    import pandas as pd

    spark_group_fields = df.select(*group_cols).schema
    group_t = ", ".join(
        "%s %s" % (f.name, f.dataType.simpleString())
        for f in spark_group_fields
    )
    mid_schema = (group_t
                  + ", levels array<array<double>>, n bigint")

    def partial(batches):
        sketches = {}
        for pdf in batches:
            for key, grp in pdf.groupby(group_cols, sort=False,
                                        dropna=False):
                if not isinstance(key, tuple):
                    key = (key,)
                sk = sketches.get(key)
                if sk is None:
                    sk = sketches[key] = KLLSketch(k)
                sk.update_many(grp[value_col].to_numpy(dtype="float64"))
        rows = []
        # Emission order must be stable: KLL compaction consumes a
        # seeded RNG, so merge results depend on fold order. Sort by
        # group-key repr (repr handles None/NaN deterministically).
        for key, sk in sorted(sketches.items(),
                              key=lambda kv: repr(kv[0])):
            if sk.n == 0:
                continue  # all-NULL/NaN group: no sketch row (a zero-n
                # row would crash quantile() downstream)
            levels, n = sk.to_row()
            rows.append(key + (levels, n))
        if rows:
            yield pd.DataFrame(
                rows, columns=list(group_cols) + ["levels", "n"]
            )

    partials = df.select(*group_cols, value_col).mapInPandas(
        partial, mid_schema
    )
    return kll_merge(partials, group_cols, k=k)


def kll_merge(sketches: DataFrame, group_cols: List[str],
              k: int = 200) -> DataFrame:
    """Merge sketch rows (levels, n) down to one per group — the same
    relation shape in and out, so merge trees of any depth compose."""
    import pandas as pd

    out_schema = sketches.schema

    def merge_group(key, pdf):
        # Fold order must be stable: compaction's seeded RNG makes KLL
        # merge order-sensitive, and applyInPandas delivers partial
        # rows in nondeterministic arrival order. Sort by a serialized
        # key of the sketch content (n, then packed level bytes —
        # byte-exact even for NaN payloads, unlike repr of numpy
        # arrays which truncates).
        import numpy as _np

        def _key(ln):
            levels, n = ln
            return (int(n), tuple(
                _np.asarray(lv, dtype="float64").tobytes()
                for lv in levels
            ))

        partials = sorted(zip(pdf["levels"], pdf["n"]), key=_key)
        sk = None
        for levels, n in partials:
            cur = KLLSketch.from_row(levels, n, k)
            sk = cur if sk is None else sk.merge(cur)
        levels, n = sk.to_row()
        return pd.DataFrame(
            [tuple(key) + (levels, n)],
            columns=list(group_cols) + ["levels", "n"],
        )

    return sketches.groupBy(*group_cols).applyInPandas(
        merge_group, out_schema
    )


def kll_quantiles(
    sketches: DataFrame,
    group_cols: List[str],
    qs: List[float],
    k: int = 200,
) -> DataFrame:
    """(group_cols..., q double, est double) from sketch rows."""
    import pandas as pd

    group_t = ", ".join(
        "%s %s" % (f.name, f.dataType.simpleString())
        for f in sketches.select(*group_cols).schema
    )
    out_schema = group_t + ", q double, est double"
    q_list = [float(q) for q in qs]

    def est(batches):
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                d = tup._asdict()
                if int(d["n"]) == 0:
                    continue  # defensive: empty sketch has no quantiles
                sk = KLLSketch.from_row(d["levels"], d["n"], k)
                for q in q_list:
                    rows.append(
                        tuple(d[c] for c in group_cols)
                        + (q, sk.quantile(q))
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=list(group_cols) + ["q", "est"]
                )

    return sketches.mapInPandas(est, out_schema)
