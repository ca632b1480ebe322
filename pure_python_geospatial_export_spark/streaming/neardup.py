"""Streaming MinHash near-duplicate detection.

The streaming sibling of ``operators/dedup.near_duplicates_minhash`` the
way ``deduplicated_stream`` mirrors exact dedup: documents arrive on an
unbounded stream; each is MinHash-signed (the same Arrow kernel and band
hashing as the batch operator, so band keys agree bit-for-bit), exploded
to its LSH bands, and matched against the OTHER documents that landed in
the same (band, band_hash) bucket within the watermark horizon via
``applyInPandasWithState``.

Exactly-once pair emission WITHOUT a second stateful operator: a pair
colliding in k bands would naively be emitted k times (buckets are
independent state keys), and chaining dropDuplicatesWithinWatermark
behind a flatMapGroupsWithState trips Spark's global-watermark
correctness check. Instead each member's full SIGNATURE rides in the
bucket state, and a bucket emits a pair only when its own band is the
MINIMUM band whose signature slices agree (slice equality is the true
LSH collision condition; the band_hash is just its hash) — a
deterministic, coordination-free tiebreak.

State shape (the 100-TB consideration): per bucket, the retained member
list — ids + event times + int64 shingle sets (flattened + offsets;
nested arrays avoided in state rows) + fixed-width signatures. Bounded
two ways:

* TIME — members older than the event-time watermark are evicted at the
  start of every invocation, and an event-time timeout removes idle
  buckets entirely; a duplicate arriving more than the horizon after
  its twin is missed here (batch-dedupe the cold store for the long
  tail), exactly the ``dropDuplicatesWithinWatermark`` trade.
* SPACE — ``max_members`` caps a bucket (FIFO evict): the streaming
  form of the batch ``max_bucket`` boilerplate-flood guard, without
  which one mega-bucket key would accumulate unbounded state AND emit
  O(m^2) pairs.

KNOWN RECALL GAP under min-band ownership (``emit_mode="min_band"``,
opt-in): FIFO eviction is per-bucket (it depends on that bucket's
occupancy), so member ``o`` can be evicted from the OWNING band's
bucket while another colliding band's bucket still holds both members
— the non-owning bucket skips emission (its band isn't the minimum
colliding band) and the pair is lost. This is distinct from the
watermark horizon trade: time eviction is deterministic on (ts,
watermark) and hence consistent across all of a doc's buckets, but
space eviction is not. Buckets are independent state keys with no
cross-bucket channel, so no ownership rule computable from one
bucket's state can close this. ``emit_mode="all_bands"`` is therefore
the DEFAULT: every colliding bucket emits (at-least-once), a pair is
missed only if evicted from ALL its colliding buckets — strictly
better recall, duplicate rows possible, so consumers must be
idempotent on pairs (e.g. the ``foreachBatch`` union-find clustering
sink in ``streaming/cluster.py``, or any sink keyed on (id_a, id_b)).
``min_band`` remains the exactly-once opt-in for consumers that
cannot tolerate duplicates and accept the eviction gap.

Verification is EXACT inside the kernel: both members' shingle sets are
in hand, so the emitted ``jaccard`` equals the batch operator's
``size(array_intersect)/size(array_union)`` double exactly — the parity
test asserts set equality of (id_a, id_b, jaccard) triples.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.dedup import banded_signatures, minhash_signature

PAIR_SCHEMA = StructType([
    StructField("id_a", LongType(), False),
    StructField("id_b", LongType(), False),
    StructField("jaccard", DoubleType(), False),
    StructField("pair_ts", TimestampType(), False),
])

STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(LongType()), False),
    StructField("ts_us", ArrayType(LongType()), False),
    StructField("offs", ArrayType(LongType()), False),
    StructField("sh", ArrayType(LongType()), False),
    StructField("sigs", ArrayType(LongType()), False),
])

_US = 1_000_000


def make_bucket_matcher(
    threshold: float,
    max_members: int,
    horizon_seconds: int,
    use_timeout: bool,
    num_hashes: int,
    bands: int,
    emit_mode: str = "all_bands",
):
    if emit_mode not in ("min_band", "all_bands"):
        raise ValueError(
            "emit_mode must be 'all_bands' (at-least-once, the safe "
            "default) or 'min_band' (exactly-once, eviction recall "
            "gap), got %r" % (emit_mode,)
        )
    rows_per_band = num_hashes // bands

    def min_colliding_band(sig_a: np.ndarray, sig_b: np.ndarray) -> int:
        eq = sig_a == sig_b
        for b in range(bands):
            if eq[b * rows_per_band:(b + 1) * rows_per_band].all():
                return b
        return -1  # hash collision without slice equality (~2^-64)

    def match_bucket(
        key: Tuple[int, int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return

        ids: list = []
        ts_us: list = []
        offs: list = []
        sh: list = []
        sigs: list = []
        if state.exists:
            s_ids, s_ts, s_offs, s_sh, s_sigs = state.get
            ids, ts_us = list(s_ids), list(s_ts)
            offs, sh, sigs = list(s_offs), list(s_sh), list(s_sigs)

        # event-time eviction: drop members the watermark has passed
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us > 0 and ids:
            keep = [k for k, t in enumerate(ts_us) if t >= wm_us]
            if len(keep) < len(ids):
                new_sh: list = []
                new_offs: list = []
                new_sigs: list = []
                pos = 0
                for k in keep:
                    lo = offs[k - 1] if k > 0 else 0
                    hi = offs[k]
                    new_sh.extend(sh[lo:hi])
                    pos += hi - lo
                    new_offs.append(pos)
                    new_sigs.extend(
                        sigs[k * num_hashes:(k + 1) * num_hashes]
                    )
                ids = [ids[k] for k in keep]
                ts_us = [ts_us[k] for k in keep]
                offs, sh, sigs = new_offs, new_sh, new_sigs

        sets = [
            np.asarray(sh[(offs[k - 1] if k else 0):offs[k]],
                       dtype=np.int64)
            for k in range(len(ids))
        ]
        sig_arrs = [
            np.asarray(sigs[k * num_hashes:(k + 1) * num_hashes],
                       dtype=np.int64)
            for k in range(len(ids))
        ]

        out_a, out_b, out_j, out_ts = [], [], [], []
        rows = pd.concat(list(pdfs)).sort_values("ts")
        for rid, rts, rsh, rsig in zip(
            rows["id"], rows["ts"], rows["shingle_hashes"], rows["sig"]
        ):
            rid = int(rid)
            t_us = int(pd.Timestamp(rts).value // 1000)
            cur = np.asarray(list(rsh), dtype=np.int64)
            cur_sig = np.asarray(list(rsig), dtype=np.int64)
            for oid, oset, osig, ots in zip(ids, sets, sig_arrs, ts_us):
                if oid == rid:
                    continue
                if emit_mode == "min_band":
                    if min_colliding_band(cur_sig, osig) != band:
                        continue  # another band owns this pair
                elif min_colliding_band(cur_sig, osig) < 0:
                    continue  # hash collision without slice equality
                inter = len(np.intersect1d(cur, oset))
                union = len(cur) + len(oset) - inter
                jac = float(inter) / float(union) if union else 0.0
                if jac >= threshold:
                    out_a.append(min(rid, oid))
                    out_b.append(max(rid, oid))
                    out_j.append(jac)
                    out_ts.append(max(t_us, ots))
            ids.append(rid)
            ts_us.append(t_us)
            sets.append(cur)
            sig_arrs.append(cur_sig)
            sh.extend(cur.tolist())
            offs.append(len(sh))
            sigs.extend(cur_sig.tolist())
            if len(ids) > max_members:  # FIFO space cap
                drop = len(ids) - max_members
                cut = offs[drop - 1]
                ids = ids[drop:]
                ts_us = ts_us[drop:]
                sets = sets[drop:]
                sig_arrs = sig_arrs[drop:]
                sh = sh[cut:]
                offs = [o - cut for o in offs[drop:]]
                sigs = sigs[drop * num_hashes:]

        state.update((ids, ts_us, offs, sh, sigs))
        if use_timeout:
            state.setTimeoutTimestamp(
                max(ts_us) // 1000 + horizon_seconds * 1000
            )
        if out_a:
            yield pd.DataFrame({
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "jaccard": pd.Series(out_j, dtype="float64"),
                "pair_ts": pd.to_datetime(
                    pd.Series(out_ts, dtype="int64"), unit="us"
                ),
            })

    return match_bucket


def near_duplicates_stream(
    docs: DataFrame,
    id_col: str = "page_id",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    watermark: str = "2 hours",
    max_members: int = 256,
    emit_mode: str = "all_bands",
) -> DataFrame:
    """docs stream (or batch frame) -> (id_a, id_b, jaccard, pair_ts),
    one row per near-duplicate pair found within the watermark horizon.

    ``emit_mode``: ``"all_bands"`` (the default — safe) emits a pair
    from EVERY colliding bucket, so at-least-once: a pair is lost only
    if evicted from all its colliding buckets, and downstream
    consumers must be idempotent (dedup on (id_a, id_b), or the
    union-find fold in streaming/cluster.py — which both are).
    ``"min_band"`` emits each pair exactly once (lowest colliding band
    owns it) but has a documented recall gap: per-bucket FIFO space
    eviction can remove a member from the OWNING band's bucket while
    another band still holds both, silently losing the pair (see
    module docstring). Opt into ``min_band`` only when the consumer
    cannot tolerate duplicates and the eviction risk is acceptable
    (e.g. ``max_members`` far above any realistic bucket occupancy).
    """
    is_streaming = docs.isStreaming
    sig = minhash_signature(
        docs.select(F.col(id_col), F.col(text_col), F.col(ts_col)),
        id_col, text_col, num_hashes, shingle_size,
        keep_cols=(ts_col,),
    )
    if is_streaming:
        sig = sig.withWatermark(ts_col, watermark)
    banded = banded_signatures(
        sig, id_col, bands, num_hashes,
        extra_cols=(ts_col, "shingle_hashes", "sig"),
    ).select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        "shingle_hashes",
        "sig",
        "band",
        "band_hash",
    )
    horizon_s = _parse_interval_seconds(watermark)
    matcher = make_bucket_matcher(threshold, max_members, horizon_s,
                                  use_timeout=is_streaming,
                                  num_hashes=num_hashes, bands=bands,
                                  emit_mode=emit_mode)
    if not is_streaming:
        # Spark rejects applyInPandasWithState on batch frames; run the
        # SAME matcher per bucket through the batched grouped-map with
        # an inert state (one "micro-batch" containing everything).
        # LSH buckets are MANY and SMALL — exactly the shape where
        # grouped-map's per-group Python/Arrow round-trip dominates
        # (see operators/grouped.py).
        from ..operators.grouped import ordered_group_map

        def batch_fn(key, pdf):
            out = list(matcher(key, iter([pdf]), _InertState()))
            if out:
                return out[0]
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64"),
                "pair_ts": pd.Series([], dtype="datetime64[ns]"),
            })

        return ordered_group_map(
            banded, ["band", "band_hash"], batch_fn, PAIR_SCHEMA,
            sort_cols=["ts", "id"],
        )
    return banded.groupBy("band", "band_hash").applyInPandasWithState(
        matcher,
        outputStructType=PAIR_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


class _InertState:
    """Minimal GroupState stand-in for the batch path: no prior state,
    no watermark, updates discarded."""

    exists = False
    hasTimedOut = False

    @staticmethod
    def getCurrentWatermarkMs() -> int:
        return 0

    def update(self, value) -> None:
        pass

    def setTimeoutTimestamp(self, ts) -> None:
        pass

    def remove(self) -> None:
        pass


_INTERVAL_UNIT_SECONDS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1,
    "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def _parse_interval_seconds(interval: str) -> int:
    """Parse a Spark-style interval string ('2 hours', '1 hour
    30 minutes', '1 week', with optional leading 'interval') into whole
    seconds, matching Spark's watermark-delay grammar for the units
    Spark itself accepts there.
    """
    toks = interval.strip().lower().split()
    if toks and toks[0] == "interval":
        toks = toks[1:]
    if not toks or len(toks) % 2 != 0:
        raise ValueError(
            "cannot parse interval %r: expected one or more '<n> <unit>' "
            "pairs with unit in %s (plural accepted)"
            % (interval, sorted(_INTERVAL_UNIT_SECONDS))
        )
    total = 0.0
    for qty, unit in zip(toks[::2], toks[1::2]):
        u = unit[:-1] if unit.endswith("s") else unit
        if u not in _INTERVAL_UNIT_SECONDS:
            raise ValueError(
                "cannot parse interval %r: unknown unit %r (accepted: %s)"
                % (interval, unit, sorted(_INTERVAL_UNIT_SECONDS))
            )
        try:
            n = int(qty)
        except ValueError:
            raise ValueError(
                "cannot parse interval %r: %r is not an integer quantity"
                % (interval, qty)
            )
        if n < 0:
            # Spark's watermark-delay grammar rejects negative delays;
            # accepting one here would yield a negative eviction
            # horizon (evict-everything-immediately) silently
            raise ValueError(
                "cannot parse interval %r: negative quantity %r "
                "(watermark delays must be non-negative)" % (interval, qty)
            )
        total += n * _INTERVAL_UNIT_SECONDS[u]
    return int(total)
