"""Text-analysis functions for web-scale corpus curation.

All hot-path functions are PURE COLUMN EXPRESSIONS (JVM, codegen) — no
Python UDFs: language-ID (marker-token votes), quality scoring
(length/stopword/punctuation ratios), token counting, and document
fingerprinting (min-hash over token shingles via md5 so the DuckDB oracle
can recompute the identical value).

Every function has a ``*_SQL`` twin producing the equivalent ANSI SQL for
the correctness oracle; both sides share the exact arithmetic so results
are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

#: marker tokens per language for the n-gram/stopword language-ID heuristic;
#: vote order (tie-break) is the list order below.
LANG_MARKERS = [
    ("en", ["the", "and", "of", "is", "to"]),
    ("de", ["der", "die", "und", "ist", "das"]),
    ("fr", ["le", "la", "et", "est", "les"]),
    ("es", ["el", "los", "y", "es", "las"]),
    ("pt", ["o", "os", "e", "uma", "das"]),
]


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def token_count_sql(col: str = "text") -> str:
    return "len(regexp_split_to_array(trim(%s), '\\s+'))" % col


#: BPE-ish pre-tokenizer: word pieces, numbers, or single punctuation —
#: the GPT-2-style coarse split (letters | digits | non-space symbol runs)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Count BPE-ish pre-tokens via regexp extraction (JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def bpe_token_count_sql(col: str = "text") -> str:
    return (
        "len(regexp_extract_all(%s, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
        % col
    )


def _count_in_list(text: Column, words: list) -> Column:
    toks = tokens_col(text)
    in_set = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(in_set, t)))


def _count_in_list_sql(words: list, col: str = "text") -> str:
    lit = "[" + ", ".join("'%s'" % w for w in words) + "]"
    return (
        "len(list_filter(regexp_split_to_array(trim(%s), '\\s+'), "
        "t -> list_contains(%s, t)))" % (col, lit)
    )


def stopword_ratio(text: Column) -> Column:
    return _count_in_list(text, STOPWORDS).cast("double") / token_count(
        text
    ).cast("double")


def stopword_ratio_sql(col: str = "text") -> str:
    return "CAST(%s AS DOUBLE) / CAST(%s AS DOUBLE)" % (
        _count_in_list_sql(STOPWORDS, col),
        token_count_sql(col),
    )


def punct_ratio(text: Column) -> Column:
    return F.length(
        F.regexp_replace(text, r"[^.,;:!?]", "")
    ).cast("double") / F.length(text).cast("double")


def punct_ratio_sql(col: str = "text") -> str:
    return (
        "CAST(length(regexp_replace(%s, '[^.,;:!?]', '', 'g')) AS DOUBLE)"
        " / CAST(length(%s) AS DOUBLE)" % (col, col)
    )


def quality_score(text: Column) -> Column:
    """Composite curation score in [0,1]: length saturation + stopword
    plausibility - punctuation noise. Deterministic double arithmetic."""
    tc = token_count(text).cast("double")
    length_part = F.least(tc / F.lit(100.0), F.lit(1.0))
    stop_part = F.least(stopword_ratio(text) * F.lit(3.0), F.lit(1.0))
    punct_part = F.greatest(
        F.lit(1.0) - punct_ratio(text) * F.lit(5.0), F.lit(0.0)
    )
    return (
        F.lit(0.4) * length_part
        + F.lit(0.3) * stop_part
        + F.lit(0.3) * punct_part
    )


def quality_score_sql(col: str = "text") -> str:
    tc = "CAST(%s AS DOUBLE)" % token_count_sql(col)
    return (
        "0.4 * least(%s / 100.0, 1.0)"
        " + 0.3 * least((%s) * 3.0, 1.0)"
        " + 0.3 * greatest(1.0 - (%s) * 5.0, 0.0)"
        % (tc, stopword_ratio_sql(col), punct_ratio_sql(col))
    )


def lang_id(text: Column) -> Column:
    """Marker-vote language ID; ties resolve in LANG_MARKERS order; zero
    votes everywhere -> 'und'."""
    votes = {lang: _count_in_list(text, words)
             for lang, words in LANG_MARKERS}
    best = F.greatest(*votes.values())
    expr = None
    # first-match-wins WHEN chain == tie resolution in LANG_MARKERS order
    for lang, _ in LANG_MARKERS:
        cond = (votes[lang] == best) & (best > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(
            cond, F.lit(lang)
        )
    return expr.otherwise(F.lit("und"))


def lang_id_sql(col: str = "text") -> str:
    votes = {lang: _count_in_list_sql(words, col)
             for lang, words in LANG_MARKERS}
    greatest = "greatest(%s)" % ", ".join(votes.values())
    cases = " ".join(
        "WHEN (%s) = (%s) AND (%s) > 0 THEN '%s'"
        % (votes[lang], greatest, greatest, lang)
        for lang, _ in LANG_MARKERS
    )
    return "CASE %s ELSE 'und' END" % cases


def fingerprint(text: Column) -> Column:
    """Document fingerprint: minimum md5 over 3-token shingles (min-hash of
    the shingle set — a rolling-window fingerprint whose collision means
    two documents share their minimal shingle). Falls back to whole-text
    md5 for docs shorter than 3 tokens."""
    toks = tokens_col(text)
    n = F.size(toks)
    # greatest(...,1) + try_element_at keep the short-doc branch ANSI-safe
    # (Spark 4 evaluates vectorized branches eagerly)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(2), F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.try_element_at(toks, i),
                F.try_element_at(toks, i + F.lit(1)),
                F.try_element_at(toks, i + F.lit(2)),
            )
        ),
    )
    return F.when(n >= 3, F.array_min(shingles)).otherwise(F.md5(text))


def fingerprint_sql(col: str = "text") -> str:
    toks = "regexp_split_to_array(trim(%s), '\\s+')" % col
    return (
        "CASE WHEN len(%(t)s) >= 3 THEN "
        "list_min(list_transform(range(1, len(%(t)s) - 1), "
        "i -> md5(concat_ws(' ', %(t)s[i], %(t)s[i+1], %(t)s[i+2])))) "
        "ELSE md5(%(c)s) END" % {"t": toks, "c": col}
    )


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC normalization — the canonical first step of web-text
    cleaning (combining sequences -> precomposed forms, so 'e'+U+0301
    and U+00E9 dedup/hash/tokenize identically). Spark has no built-in
    normalizer, so this is an Arrow-batched pandas UDF over stdlib
    ``unicodedata`` — the same Unicode algorithm DuckDB's
    ``nfc_normalize`` implements, so the SQL twin is bit-exact
    (pinned by a cross-engine fuzz test). NULL passes through."""
    return nfc_udf()(text)


def nfc_normalize_sql(col: str = "text") -> str:
    return "nfc_normalize(%s)" % col


_NFC_UDF = None


def nfc_udf():
    """The ONE pandas UDF behind both the column API and the SQL
    registry (ppge_nfc) — built lazily once, so the two surfaces can
    never diverge. (No type hints: this module uses postponed
    annotations, which pandas_udf's signature inspection cannot
    resolve.)"""
    global _NFC_UDF
    if _NFC_UDF is None:
        def _nfc_batch(s):
            import unicodedata

            return s.map(
                lambda v: None if v is None
                else unicodedata.normalize("NFC", v)
            )

        _NFC_UDF = F.pandas_udf(_nfc_batch, "string")
    return _NFC_UDF
