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
    boilerplate_min_docs: Optional[int] = None,
    lm_ref: Optional[DataFrame] = None,
    max_ppl_cost_milli: int = 5_000_000,
    span_ngram: Optional[int] = None,
    span_min_docs: int = 2,
) -> DataFrame:
    """Filter ``df`` to the curated survivor set.

    Steps: (0) optional line-level boilerplate removal (pass
    ``boilerplate_min_docs`` — runs FIRST so template chrome doesn't
    poison dedup or quality signals; the text column is REWRITTEN to
    the cleaned text for this and all later stages), (0b) optional
    exact duplicate-SPAN removal (pass ``span_ngram`` — cuts token
    windows shared verbatim by >= ``span_min_docs`` docs, the Lee et
    al. substring-dedup stage; runs after line removal so line chrome
    doesn't inflate the gram census), (1) token-count floor +
    quality-score floor, (2) optional language allowlist (n-gram-vote
    language ID), (3) optional char-LM perplexity ceiling (pass a
    reference corpus as ``lm_ref``; docs whose mean milli-nat cost per
    gram exceeds ``max_ppl_cost_milli`` drop — the CCNet quality
    gate), (4) exact dedup (min-id representative per identical
    text), (5) optional MinHash near-dup (greedy higher-id drop; pass
    ``near_dup_threshold=None`` to skip). Returns the surviving rows
    of ``df`` (with cleaned text when step 0/0b ran) — callers keep
    their own columns.
    """
    out = df
    if boilerplate_min_docs is not None:
        cleaned = remove_boilerplate_lines(
            out, id_col, text_col, min_docs=boilerplate_min_docs
        ).select(id_col, "clean_text")
        out = (
            out.drop(text_col)
            .join(cleaned, id_col)
            .withColumnRenamed("clean_text", text_col)
        )
    if span_ngram is not None:
        despanned = remove_duplicate_spans(
            out, id_col, text_col, ngram=span_ngram,
            min_docs=span_min_docs,
        ).select(id_col, "clean_text")
        out = (
            out.drop(text_col)
            .join(despanned, id_col)
            .withColumnRenamed("clean_text", text_col)
        )
    out = out.where(
        (T.token_count(F.col(text_col)) >= min_tokens)
        & (T.quality_score(F.col(text_col)) >= min_quality)
    )
    if keep_langs:
        out = out.where(T.lang_id(F.col(text_col)).isin(list(keep_langs)))
    if lm_ref is not None:
        model = char_lm_counts(lm_ref, text_col)
        scores = perplexity_score(out, model, id_col, text_col)
        keep = scores.where(
            (F.col("n_grams") > 0)
            & (F.col("cost_milli")
               <= F.col("n_grams").cast("long")
               * F.lit(int(max_ppl_cost_milli)))
        ).select(id_col)
        out = out.join(keep, id_col, "left_semi")
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


def quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
    seed: str = "",
) -> DataFrame:
    """Cap rows per group at ``quota`` with a DETERMINISTIC pick — the
    per-domain cap every crawl-curation recipe applies so mega-domains
    don't dominate the training mix.

    Rows are ranked within each group by the same md5-derived hash as
    :func:`deterministic_sample` (tie-broken by key), so the selection
    is a pure function of (group, key, seed): partitioning, retries,
    cluster size, and the DuckDB oracle all pick identical rows — unlike
    rank-by-random. One shuffle on the group key; WindowGroupLimit caps
    per-group state at ``quota`` rows before the final exchange."""
    from pyspark.sql import Window

    from .sketch import kmv_hash_col

    h = kmv_hash_col(
        F.concat(F.col(key_col).cast("string"), F.lit(seed))
    )
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_qs_rn", F.row_number().over(w))
        .where(F.col("_qs_rn") <= quota)
        .drop("_qs_rn")
    )


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


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals per document: boilerplate and
    degenerate generations repeat the same n-gram over and over, and
    "fraction of the text covered by the most common n-gram" is the
    classic filter for it (Rae et al. 2021 §A1.1 use exactly this family
    of thresholds).

    Returns (id, n_tokens, n_distinct_tokens, top_gram_count,
    top_gram_frac, distinct_ratio) where ``top_gram_frac`` is the
    most-frequent n-gram's share of the document's n-gram slots and
    ``distinct_ratio`` the type/token ratio. Docs shorter than ``n``
    tokens report 0 / 0.0 for the gram columns.

    Plan shape: grams explode once, then two hash aggregations keyed by
    the doc id (count per gram, max over grams) — both partial-agg
    friendly, no joins, nothing quadratic. The gram text never leaves
    the first aggregation's key.
    """
    toks = T.tokens_col(F.col(text_col))
    ntok = F.size(toks)
    grams = F.when(
        ntok >= n,
        F.transform(
            F.sequence(F.lit(1), F.greatest(ntok - F.lit(n - 1),
                                            F.lit(1))),
            lambda i: F.concat_ws(
                " ",
                *[F.try_element_at(toks, i + F.lit(j)) for j in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # scalars and the gram array are projected BELOW the explode: with
    # explode alongside computed columns in one select, ExtractGenerator
    # parks those expressions in a Project ABOVE the Generate, where
    # tokenization + array_distinct would re-run per exploded gram row —
    # O(tokens^2) per document (observed in the physical plan).
    pre = df.select(
        F.col(id_col),
        ntok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        grams.alias("_gs"),
    )
    base = pre.select(
        id_col, "n_tokens", "n_distinct_tokens",
        F.explode_outer("_gs").alias("_g"),
    )
    counts = base.groupBy(
        id_col, "n_tokens", "n_distinct_tokens", "_g"
    ).agg(F.count(F.lit(1)).alias("_c"))
    return (
        counts.groupBy(id_col, "n_tokens", "n_distinct_tokens")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("_g").isNotNull(), F.col("_c"))),
                F.lit(0).cast("long"),
            ).alias("top_gram_count")
        )
        .select(
            id_col,
            "n_tokens",
            "n_distinct_tokens",
            "top_gram_count",
            F.when(
                F.col("n_tokens") >= n,
                F.col("top_gram_count").cast("double")
                / (F.col("n_tokens") - F.lit(n - 1)).cast("double"),
            ).otherwise(F.lit(0.0)).alias("top_gram_frac"),
            (F.col("n_distinct_tokens").cast("double")
             / F.col("n_tokens").cast("double")).alias("distinct_ratio"),
        )
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col,
    k: int,
    group_cols: Optional[list] = None,
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis 2006): keep the ``k`` rows with the largest ``u^(1/w)``,
    where ``u`` is a (0,1) uniform DERIVED FROM THE KEY HASH rather than
    an RNG — so like :func:`deterministic_sample` the selection is a
    pure function of (key, seed): partitioning, retries, cluster size,
    and the DuckDB oracle all pick identical rows, while inclusion
    probabilities stay proportional to weight (the training-mix op:
    sample documents by quality/length without a global sort-by-random).

    The sort key is rounded to 12 decimals before ranking (ties then
    break on the key column) so cross-engine ``pow`` ulp drift cannot
    reorder the boundary. Rows with ``weight <= 0`` or NULL are
    excluded. One shuffle (the per-group window top-k)."""
    from pyspark.sql import Window

    from .sketch import HASH_SPACE, kmv_hash_col

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (kmv_hash_col(
        F.concat(F.col(key_col).cast("string"), F.lit(seed))
    ).cast("double") + F.lit(1.0)) / F.lit(HASH_SPACE + 1.0)
    score = F.round(
        F.pow(u, F.lit(1.0) / w.cast("double")), 12
    )
    parts = [F.col(c) for c in (group_cols or [])]
    win = Window.partitionBy(*parts).orderBy(
        score.desc(), F.col(key_col).asc()
    )
    return (
        df.where(w.isNotNull() & (w.cast("double") > 0))
        .withColumn("_ws_rn", F.row_number().over(win))
        .where(F.col("_ws_rn") <= k)
        .drop("_ws_rn")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Per-document top-``k`` terms by smoothed TF-IDF — the classic
    keyword-extraction / topic-labeling pass over a crawl:
    ``score = tf * (ln((N + 1) / (df + 1)) + 1)``.

    Returns (id, term, tf, score, rank). The score is rounded to 9
    decimals BEFORE ranking (the radius_pairs trick: ln comes from two
    libms, rounding absorbs ulp drift and makes the rank order — ties
    broken on term asc — identical cross-engine).

    Plan shape at scale: one explode, then only aggregates of
    aggregates — tf over (doc, term) with map-side combine, df over the
    already-distinct (doc, term) pairs, the term join carries one row
    per distinct pair (never raw tokens), N broadcasts as one row, and
    the final window is a per-doc top-k. Nothing quadratic, no
    driver-side collection.

    ``min_df`` / ``max_df_frac`` prune the vocabulary BEFORE the term
    join (standard TF-IDF practice): terms in fewer than ``min_df``
    docs or more than ``max_df_frac * N`` docs are dropped. At web
    scale this removes the stopword hot keys from the term-join shuffle
    outright — stopwords are exactly the terms every document emits, so
    without the cutoff they are the skewed join keys (AQE's skew-join
    is the backstop; the prune removes the hazard). Defaults keep the
    full vocabulary."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(T.tokens_col(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    if min_df > 1 or max_df_frac < 1.0:
        dfreq = (
            dfreq.crossJoin(F.broadcast(n_docs))
            .where(
                (F.col("_df") >= F.lit(int(min_df)))
                & (F.col("_df").cast("double")
                   <= F.col("_n").cast("double") * F.lit(float(max_df_frac)))
            )
            .drop("_n")
        )
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs))
    score = F.round(
        F.col("tf").cast("double")
        * (F.log((F.col("_n").cast("double") + F.lit(1.0))
                 / (F.col("_df").cast("double") + F.lit(1.0)))
           + F.lit(1.0)),
        9,
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    out_col: str = "clean_text",
) -> DataFrame:
    """CCNet-style line-level boilerplate removal: a LINE that appears
    (verbatim) in at least ``min_docs`` DISTINCT documents is template
    chrome (nav bars, cookie banners, footers) and is deleted from
    every document -> (id, out_col, n_lines, n_removed). Documents
    whose every line is boilerplate come back as the empty string, not
    dropped — the caller decides their fate (length filters follow in
    the preset order).

    Plan shape at 10^12 docs: one posexplode (linear), the hot-line
    census over DISTINCT (doc, line) pairs (two hash aggregations with
    map-side combine), a left-anti join of the exploded lines against
    the hot set, and one groupBy reassembly per doc (array_sort of
    (idx, line) structs — no window). Nothing quadratic; the anti
    join's build side is the hot-line set, which is what the operator
    is shrinking in the first place."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1))
        .alias("_idx", "_line"),
    )
    hot = (
        lines.select(id_col, "_line").distinct()
        .groupBy("_line")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
        .where(F.col("_ndocs") >= F.lit(int(min_docs)))
        # blank/whitespace-only lines are STRUCTURE, not boilerplate:
        # nearly every multi-paragraph corpus has >= min_docs docs with
        # a blank line, and treating it as hot would strip every
        # paragraph separator from every document before the
        # dedup/quality stages (round-5 advice). They stay in
        # reassembly untouched.
        .where(F.trim(F.col("_line")) != "")
        .select("_line")
    )
    kept = lines.join(hot, "_line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_idx", "_line"))
                ),
                lambda s: s["_line"],
            ),
        ).alias(out_col),
        F.count(F.lit(1)).alias("_nkept"),
    )
    base = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n", -1)).alias("n_lines"),
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            F.col("n_lines").cast("int").alias("n_lines"),
            (F.col("n_lines")
             - F.coalesce(F.col("_nkept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 10,
    min_docs: int = 2,
    out_col: str = "clean_text",
) -> DataFrame:
    """EXACT duplicate-span removal at token n-gram granularity — the
    operator form of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better", substring dedup): any token whose
    position is covered by an ``ngram``-token window that appears
    verbatim in at least ``min_docs`` DISTINCT documents is cut from
    every document. Catches shared boilerplate PASSAGES (licenses,
    disclaimers, syndicated paragraphs) that line-level dedup misses
    when line breaks differ and document-level near-dup misses when
    the shared span is a small part of each document.

    -> (id, out_col, n_tokens, n_removed). A fully-duplicated document
    comes back as "" (the boilerplate-removal convention). Documents
    with NOTHING removed keep their ORIGINAL text byte-for-byte
    (newlines, tabs, spacing intact — this is a token-level operator
    and must not normalize whitespace corpus-wide); only documents a
    span was actually cut from are reassembled as single-space-joined
    tokens, the unavoidable cost of token-granular surgery.

    Plan shape at 10^12 docs: one gram explode (n_tokens rows/doc,
    grams carried as md5 — never the text), a distinct-doc census
    (two hash aggs, map-side combine), a semi join of grams against
    the hot set, a bounded coverage explode (ngram positions per hot
    hit), and one anti join + groupBy reassembly. Everything is an
    equi join on hashes; nothing quadratic. The md5 keys make the
    DuckDB oracle reproduce the census bit-for-bit."""
    n = int(ngram)
    if n < 2:
        raise ValueError("ngram must be >= 2")
    toks = T.tokens_col(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_toks"))
    nt = F.size("_toks")
    # 1-based start positions (mirrors DuckDB generate_series); guard:
    # sequence(1, 0) would generate DESCENDING in Spark
    grams = base.where(nt >= n).select(
        id_col,
        F.explode(F.sequence(F.lit(1), nt - F.lit(n - 1))).alias("_j"),
        "_toks",
    ).select(
        id_col,
        "_j",
        F.md5(
            F.concat_ws(" ", F.slice("_toks", F.col("_j"), n))
        ).alias("_h"),
    )
    hot = (
        grams.select(id_col, "_h").distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= F.lit(int(min_docs)))
        .select("_h")
    )
    covered = (
        grams.join(hot, "_h", "left_semi")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("_j"), F.col("_j") + F.lit(n - 1))
            ).alias("_pos"),
        )
        .distinct()
    )
    tokens = base.select(
        id_col,
        F.posexplode("_toks").alias("_p0", "_tok"),
    ).select(id_col, (F.col("_p0") + 1).alias("_pos"), "_tok")
    kept = tokens.join(covered, [id_col, "_pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_tok"))
                ),
                lambda s: s["_tok"],
            ),
        ).alias(out_col),
        F.count(F.lit(1)).alias("_nkept"),
    )
    stats = df.select(
        F.col(id_col),
        F.col(text_col).alias("_orig"),
        T.token_count(F.col(text_col)).alias("n_tokens"),
    )
    removed = (
        F.col("n_tokens") - F.coalesce(F.col("_nkept"), F.lit(0))
    )
    return (
        stats.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.when(removed == 0, F.col("_orig"))
            .otherwise(F.coalesce(F.col(out_col), F.lit("")))
            .alias(out_col),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            removed.cast("int").alias("n_removed"),
        )
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    target_fracs: dict,
    total: int,
    seed: str = "",
    default_frac: float = 0.0,
) -> DataFrame:
    """Sample to a TARGET MIXTURE: group ``g`` contributes
    ``round(total * target_fracs[g])`` rows (groups absent from the
    dict use ``default_frac``), chosen deterministically by hash rank
    — the data-mixing step of training-set assembly ("60% en, 20% de,
    ...") with the same partitioning/retry/oracle invariance as
    :func:`quota_sample` (it IS quota_sample with per-group quotas
    from the mixture spec). Under-populated groups contribute what
    they have; the caller rebalances or accepts the shortfall."""
    from pyspark.sql import Window

    from .sketch import kmv_hash_col

    if not 0 <= float(default_frac) <= 1:
        raise ValueError("default_frac must be in [0, 1]")
    for g, frac in target_fracs.items():
        if not 0 <= float(frac) <= 1:
            raise ValueError(
                "target_fracs[%r] must be in [0, 1], got %r" % (g, frac)
            )

    def _quota_rows(frac):
        # half-UP, not Python's half-to-even: {'a': .5, 'b': .5} with
        # total=5 should yield 3+3, not banker's 2+2
        return int(float(total) * float(frac) + 0.5)

    quota = None
    for g, frac in sorted(target_fracs.items()):
        n = _quota_rows(frac)
        cond = F.when(F.col(group_col) == g, F.lit(n))
        quota = cond if quota is None else quota.when(
            F.col(group_col) == g, F.lit(n)
        )
    default_n = _quota_rows(default_frac)
    quota = (F.lit(default_n) if quota is None
             else quota.otherwise(F.lit(default_n)))
    h = kmv_hash_col(
        F.concat(F.col(key_col).cast("string"), F.lit(seed))
    )
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_mx_rn", F.row_number().over(w))
        .where(F.col("_mx_rn") <= quota)
        .drop("_mx_rn")
    )


LM_ALPHABET_V = 38  # smoothing denominator: a-z, 0-9, space, pad


def _lm_normalize(col):
    """Shared text normalization for the char-LM: lowercase, non
    [a-z0-9 ] -> space, collapse runs — mirrored verbatim in the SQL
    oracle (both engines' regex classes agree on this pattern)."""
    x = F.lower(col)
    x = F.regexp_replace(x, "[^a-z0-9 ]", " ")
    return F.regexp_replace(x, " +", " ")


def _lm_grams(col, order: int = 3):
    """Padded character n-grams as an array column ('##' start pad, so
    the first real char is scored against a boundary context)."""
    padded = F.concat(F.lit("#" * (order - 1)), _lm_normalize(col))
    n = F.length(padded) - (order - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.substring(padded, i, order),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_lm_counts(
    ref: DataFrame, text_col: str = "text", order: int = 3
) -> DataFrame:
    """Train the CCNet-style character n-gram LM: (gram, c_gram,
    c_ctx) integer counts over a reference corpus. c_ctx(ctx) =
    sum of c_gram over the context's continuations (every in-text
    occurrence of a context is followed by exactly one char, so this
    IS the conditional normalizer). One explode + two hash
    aggregations; the model is integer-exact, hence bit-mirrorable in
    SQL and mergeable across corpus shards."""
    grams = ref.select(
        F.explode(_lm_grams(F.col(text_col), order)).alias("gram")
    )
    c3 = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c_gram"))
    ctx = c3.withColumn(
        "_ctx", F.substring(F.col("gram"), 1, order - 1)
    )
    c2 = ctx.groupBy("_ctx").agg(F.sum("c_gram").alias("c_ctx"))
    return (
        ctx.join(c2, "_ctx")
        .select("gram", "c_gram", F.col("c_ctx").cast("long"))
    )


def perplexity_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: int = 3,
) -> DataFrame:
    """Score documents against a :func:`char_lm_counts` model ->
    (id, n_grams, cost_milli, n_oov): the KenLM-perplexity quality
    filter of the CCNet pipeline, in integer milli-nats so the result
    is bit-exact cross-engine (a float log-prob SUM is addition-order
    sensitive; an integer per-DISTINCT-gram cost times an integer
    occurrence count, summed as BIGINT, is not).

    cost per gram occurrence = round(-ln((c_gram + 1) /
    (c_ctx + V)) * 1e6) with Laplace smoothing over the fixed
    ``LM_ALPHABET_V``-char alphabet; unseen grams/contexts fall back
    to the smoothed floor and are counted in ``n_oov``. Perplexity =
    exp(cost_milli / n_grams / 1e6).

    Plan shape: per-doc DISTINCT-gram counts (map-side combine), ONE
    join against the model (broadcast when the model is small — a
    38^3-bounded trigram table always is), one groupBy back to docs.
    The gram extraction runs as a higher-order column expression
    (interpreted) — correctness/SQL-parity first; at 100-TB scoring
    scale the extraction would move into an Arrow kernel exactly like
    simhash did (BENCH/BASELINE.md), with the same join shape."""
    gcount = (
        docs.select(
            F.col(id_col),
            F.explode(_lm_grams(F.col(text_col), order)).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_occ"))
    )
    v = F.lit(float(LM_ALPHABET_V))
    joined = gcount.join(F.broadcast(model), "gram", "left")
    cost = F.round(
        -F.log(
            (F.coalesce(F.col("c_gram"), F.lit(0)).cast("double")
             + F.lit(1.0))
            / (F.coalesce(F.col("c_ctx"), F.lit(0)).cast("double") + v)
        ) * F.lit(1e6)
    ).cast("long")
    scored = joined.groupBy(id_col).agg(
        F.sum("_occ").cast("int").alias("n_grams"),
        F.sum(cost * F.col("_occ")).cast("long").alias("cost_milli"),
        F.sum(
            F.when(F.col("c_gram").isNull(), F.col("_occ"))
            .otherwise(F.lit(0))
        ).cast("int").alias("n_oov"),
    )
    return (
        docs.select(id_col).join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("cost_milli"), F.lit(0))
            .alias("cost_milli"),
            F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
        )
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination scan: per document, the fraction of its
    distinct n-token shingles that appear anywhere in the benchmark set
    -> (id, n_shingles, n_matched, contamination), contaminated docs
    only (contamination > 0).

    The standard pre-training hygiene op: before training on a crawl,
    drop documents that overlap evaluation benchmarks. Plan shape:
    benchmark shingles are DISTINCT and (being eval-set sized) land as a
    broadcast build side; doc shingles explode once and semi-join the
    build side; one groupBy on the doc id re-aggregates. Nothing in the
    pipeline is quadratic and the only wide exchange carries matched
    shingles, not text. Shingles travel as xxhash64 int64s (collision
    odds ~2^-64 per pair).
    """
    from .dedup import shingles_col

    doc_sh = docs.select(
        F.col(id_col),
        F.explode(shingles_col(F.col(text_col), n)).alias("_sh"),
    ).select(id_col, F.xxhash64("_sh").alias("_h"))
    bench_sh = benchmark.select(
        F.explode(shingles_col(F.col(bench_text_col), n)).alias("_sh")
    ).select(F.xxhash64("_sh").alias("_h")).distinct()
    matched = (
        doc_sh.join(F.broadcast(bench_sh), "_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    totals = doc_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return (
        totals.join(matched, id_col)
        .select(
            id_col,
            "n_shingles",
            "n_matched",
            (F.col("n_matched").cast("double")
             / F.col("n_shingles").cast("double")).alias("contamination"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    max_contamination: float = 0.0,
) -> DataFrame:
    """Drop documents whose benchmark shingle overlap exceeds
    ``max_contamination`` (default: any overlap). Anti join against the
    flagged ids — ``docs`` rows pass through unchanged."""
    flagged = ngram_contamination(
        docs, benchmark, id_col, text_col, bench_text_col, n
    ).where(F.col("contamination") > max_contamination).select(id_col)
    return docs.join(flagged, id_col, "left_anti")
