"""End-to-end corpus curation preset — the composed pipeline a
training-data team runs over the raw pages/documents table.

Stage order is chosen for cost at 10^12 rows: cheap column-math filters
first (quality, language — whole-stage codegen, shrink the corpus
before anything shuffles), exact dedup second (one hash groupBy), the
MinHash near-dup pass last (the only multi-shuffle stage, now over the
smallest possible survivor set). Every stage is an existing tested
operator; this module only composes and reports.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from . import dedup


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    keep_langs: Optional[list] = None,
    near_dup_threshold: Optional[float] = 0.7,
    min_tokens: int = 5,
) -> DataFrame:
    """Filter ``df`` to the curated survivor set.

    Steps: (1) token-count floor + quality-score floor, (2) optional
    language allowlist (n-gram-vote language ID), (3) exact dedup
    (min-id representative per identical text), (4) optional MinHash
    near-dup (greedy higher-id drop; pass ``near_dup_threshold=None``
    to skip). Returns the surviving rows of ``df`` unchanged — callers
    keep their own columns.
    """
    out = df.where(
        (T.token_count(F.col(text_col)) >= min_tokens)
        & (T.quality_score(F.col(text_col)) >= min_quality)
    )
    if keep_langs:
        out = out.where(T.lang_id(F.col(text_col)).isin(list(keep_langs)))
    out = dedup.deduplicate_exact(out, id_col, text_col)
    if near_dup_threshold is not None:
        out = dedup.deduplicate_near(out, id_col, text_col,
                                     threshold=near_dup_threshold)
    return out


def curation_report(raw: DataFrame, curated: DataFrame,
                    id_col: str = "doc_id") -> dict:
    """Survivor accounting: {raw_rows, kept_rows, dropped_rows,
    kept_fraction} — two count jobs, no data movement."""
    n_raw = raw.select(id_col).count()
    n_kept = curated.select(id_col).count()
    return {
        "raw_rows": int(n_raw),
        "kept_rows": int(n_kept),
        "dropped_rows": int(n_raw - n_kept),
        "kept_fraction": (float(n_kept) / n_raw) if n_raw else 0.0,
    }


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: str = "",
) -> DataFrame:
    """Reproducible row sample: keep rows whose key hashes below the
    fraction threshold. Unlike ``df.sample`` (RNG per partition — result
    changes with partitioning/retries), the decision is a PURE FUNCTION
    of the key, so resumed/re-run jobs, different cluster sizes, and the
    DuckDB oracle all select the identical rows. ``seed`` salts the hash
    to draw independent samples."""
    from .sketch import HASH_SPACE, kmv_hash_col

    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    h = kmv_hash_col(
        F.concat(F.col(key_col).cast("string"), F.lit(seed))
    )
    return df.where(h < F.lit(float(fraction) * HASH_SPACE))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix builder:
    ``fractions`` maps a stratum value (e.g. language) to its keep rate.
    Same hash-threshold construction as :func:`deterministic_sample`,
    with the threshold looked up per row; strata absent from the map get
    ``default_fraction``."""
    from .sketch import HASH_SPACE, kmv_hash_col

    h = kmv_hash_col(
        F.concat(F.col(key_col).cast("string"), F.lit(seed))
    )
    thresh = F.lit(float(default_fraction) * HASH_SPACE)
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(float(frac) * HASH_SPACE)
        ).otherwise(thresh)
    return df.where(h < thresh)
