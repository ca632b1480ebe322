"""URL analysis functions for web-crawl curation — host extraction,
registered-domain grouping, path depth, media-extension flags.

Pure column expressions (JVM, codegen) with ``*_sql`` DuckDB twins
sharing the exact string logic, like functions/text.py. The
registered-domain rule is a deterministic public-suffix HEURISTIC
(last two labels; three when the second-level label is a known generic
SLD like 'co'/'com'/'ac' under a two-letter ccTLD) — no external
suffix list is consulted, so both engines and every re-run agree.
Common-crawl uses: per-domain dedup keys, domain quota sampling
(operators/curate.quota_sample), media filtering, URL-depth quality
signals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: generic second-level domains that sit under ccTLDs ('bbc.co.uk' ->
#: registered domain 'bbc.co.uk', not 'co.uk')
GENERIC_SLDS = ["ac", "co", "com", "edu", "gov", "net", "org"]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
_EXT_RE = r"\.([a-zA-Z0-9]{1,5})$"

MEDIA_EXTENSIONS = [
    "avi", "bmp", "gif", "ico", "jpeg", "jpg", "mov", "mp3", "mp4",
    "pdf", "png", "svg", "wav", "webm", "webp", "zip",
]


def url_host(url: Column) -> Column:
    """Lowercased hostname: scheme and userinfo stripped, port dropped."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_host_sql(col: str = "url") -> str:
    return "lower(regexp_extract(%s, '%s', 1))" % (col, _HOST_RE)


def registered_domain(host: Column) -> Column:
    """Registrable domain of a hostname (heuristic, see module doc):
    'a.b.bbc.co.uk' -> 'bbc.co.uk'; 'www.example.com' -> 'example.com';
    bare or single-label hosts pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last = F.element_at(labels, -1)
    second = F.element_at(labels, -2)
    sld_set = F.array(*[F.lit(s) for s in GENERIC_SLDS])
    take3 = (
        (n >= F.lit(3))
        & (F.length(last) == F.lit(2))
        & F.array_contains(sld_set, second)
    )
    last2 = F.concat_ws(".", second, last)
    last3 = F.concat_ws(".", F.element_at(labels, -3), second, last)
    return F.when(n <= 1, host).when(take3, last3).otherwise(last2)


def registered_domain_sql(host_expr: str) -> str:
    lset = "[" + ", ".join("'%s'" % s for s in GENERIC_SLDS) + "]"
    ls = "string_split(%s, '.')" % host_expr
    return (
        "CASE WHEN len({ls}) <= 1 THEN {h} "
        "WHEN len({ls}) >= 3 AND length({ls}[-1]) = 2 "
        "AND list_contains({lset}, {ls}[-2]) "
        "THEN {ls}[-3] || '.' || {ls}[-2] || '.' || {ls}[-1] "
        "ELSE {ls}[-2] || '.' || {ls}[-1] END"
    ).format(ls=ls, h=host_expr, lset=lset)


def url_path_depth(url: Column) -> Column:
    """Number of non-empty path segments: 'https://h/a/b/' -> 2, no
    path -> 0."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    segs = F.filter(
        F.split(path, "/"), lambda s: s != F.lit("")
    )
    return F.size(segs)


def url_path_depth_sql(col: str = "url") -> str:
    return (
        "len(list_filter(string_split("
        "regexp_extract(%s, '%s', 1), '/'), s -> s <> ''))"
        % (col, _PATH_RE)
    )


def url_extension(url: Column) -> Column:
    """Lowercased final extension of the path's last segment ('' when
    none): 'https://h/a/img.JPG?x=1' -> 'jpg'."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    last_seg = F.element_at(F.split(path, "/"), -1)
    return F.lower(F.regexp_extract(last_seg, _EXT_RE, 1))


def url_extension_sql(col: str = "url") -> str:
    return (
        "lower(regexp_extract(string_split("
        "regexp_extract(%s, '%s', 1), '/')[-1], '%s', 1))"
        % (col, _PATH_RE, _EXT_RE)
    )


def url_is_media(url: Column) -> Column:
    """True when the path ends in a known media/binary extension — the
    standard cheap pre-filter before text extraction."""
    ext_set = F.array(*[F.lit(e) for e in MEDIA_EXTENSIONS])
    return F.array_contains(ext_set, url_extension(url))


def url_is_media_sql(col: str = "url") -> str:
    eset = "[" + ", ".join("'%s'" % e for e in MEDIA_EXTENSIONS) + "]"
    return "list_contains(%s, %s)" % (eset, url_extension_sql(col))
