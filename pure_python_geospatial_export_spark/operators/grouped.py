"""Batched grouped-map: ``groupBy(keys).applyInPandas`` semantics
without the per-group Python/Arrow round-trip.

Spark's grouped-map runner makes ONE UDF invocation and one Arrow
flush PER GROUP. For operators whose natural group is small and
numerous — MVT tiles are the canonical case: a planet-scale tile
build at z15 has ~10^9 groups of a few hundred rows — that fixed
per-group cost (~4ms measured on this host: invocation + pandas
construction + Arrow result flush) dwarfs the actual work and scales
with GROUP COUNT, not data size. At 100 TB that is the whole job.

:func:`ordered_group_map` keeps the same logical plan shape (one hash
exchange on the keys) but replaces the grouped-map execution with:

    repartition(keys) -> sortWithinPartitions(keys [+ sort_cols])
    -> ONE mapInPandas pass

Inside the single pass each large Arrow batch is walked with a
vectorized group-boundary scan (keys are contiguous after the sort),
the user fn is called per group on a zero-copy slice, and all of a
batch's outputs are flushed as ONE Arrow batch. A group that spans a
batch edge is carried into the next batch, so results are identical
to ``applyInPandas`` (bytes included — asserted by the MVT tests).
Measured on the tile_mvt headline query (399 tiles, warm session):
3.97s -> 0.59s.

Use this when groups are MANY and SMALL. For few large groups,
``applyInPandas`` is equivalent (the per-group cost amortizes) and
its single-group-per-call contract is simpler.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Optional, Sequence

from pyspark.sql import DataFrame


def ordered_group_map(
    df: DataFrame,
    key_cols: Sequence[str],
    fn: Callable,
    schema,
    sort_cols: Iterable[str] = (),
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Equivalent of ``df.groupBy(*key_cols).applyInPandas(fn, schema)``
    executed as one streaming ``mapInPandas`` pass per partition.

    ``fn(key_tuple, group_pdf) -> pd.DataFrame`` — the exact grouped-map
    signature, so existing group functions drop in unchanged.
    ``sort_cols`` adds a deterministic within-group row order on top of
    the mandatory key sort (handy when ``fn`` would otherwise sort).
    """
    import numpy as np
    import pandas as pd

    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    sorts = keys + [c for c in sort_cols if c not in keys]

    def _neq(x, y):
        # NULL-safe inequality: Spark NULL keys arrive as NaN in float
        # batches, and NaN != NaN would shatter the null group into
        # per-row calls (grouped-map treats NULL as one group)
        ne = x != y
        if x.dtype.kind == "f":
            ne &= ~(np.isnan(x) & np.isnan(y))
        return ne

    def _groups(pdf) -> Iterator:
        n = len(pdf)
        arrays = [pdf[c].to_numpy() for c in keys]
        if n > 1:
            change = np.zeros(n - 1, dtype=bool)
            for a in arrays:
                change |= _neq(a[1:], a[:-1])
            idx = np.flatnonzero(change) + 1
        else:
            idx = np.empty(0, dtype=np.int64)
        starts = np.concatenate(([0], idx))
        ends = np.concatenate((idx, [n]))
        for s, e in zip(starts, ends):
            key = tuple(a[s] for a in arrays)
            # fresh 0-based index: the applyInPandas contract every
            # grouped-map fn may rely on (pdf.loc[0] etc.)
            out = fn(key, pdf.iloc[s:e].reset_index(drop=True))
            if out is not None and len(out):
                yield out

    def _runner(batches: Iterable) -> Iterator:
        carry = None
        for pdf in batches:
            if not len(pdf):
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            # hold back the trailing group — it may continue in the
            # next batch (sorted, so a group is a contiguous run)
            mask = np.ones(len(pdf), dtype=bool)
            for c in keys:
                a = pdf[c].to_numpy()
                mask &= ~_neq(a, a[-1:])
            if mask.all():
                carry = pdf  # whole batch is one (possibly open) group
                continue
            trailing = int(mask[::-1].argmin())
            split = len(pdf) - trailing
            carry = pdf.iloc[split:]
            outs = list(_groups(pdf.iloc[:split]))
            if outs:
                # ONE Arrow flush per input batch, not per group
                yield pd.concat(outs, ignore_index=True)
        if carry is not None and len(carry):
            outs = list(_groups(carry))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    prepped = (
        df.repartition(num_partitions, *keys)
        if num_partitions
        else df.repartition(*keys)
    ).sortWithinPartitions(*sorts)
    return prepped.mapInPandas(_runner, schema)
