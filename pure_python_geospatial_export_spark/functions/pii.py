"""PII detection and redaction for web-scale corpus curation.

Training corpora scrub personally identifiable information before use;
this module provides the standard first-pass scrub — pattern-based
emails / phone numbers / IPv4 addresses — as PURE COLUMN EXPRESSIONS
(JVM regex, codegen; no Python UDFs on the hot path). Patterns are
deliberately conservative regexes valid in BOTH Java regex (Spark) and
RE2 (DuckDB) with identical match semantics — no lookaround, no
backreferences — so every function has a ``*_sql`` twin producing the
bit-identical DuckDB expression for the correctness oracle.

Redaction replaces matches with stable sentinels (``<EMAIL>`` etc.) so
downstream tokenization sees a constant token rather than a hole.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: shared regexes — single source of truth for Spark and the SQL twins.
#: All are plain greedy patterns (identical leftmost/non-overlapping
#: semantics in Java regex and RE2).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = (
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
)
#: 8+ chars of digits / separators, starting and ending in a digit;
#: optional leading +. Deliberately eager (a naive scrub errs toward
#: redacting number runs) — the dot is excluded so IPv4s never match.
PHONE_RE = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def _count_sql(col: str, pattern: str) -> str:
    return "CAST(len(regexp_extract_all(%s, '%s')) AS INTEGER)" % (
        col, pattern
    )


def email_count(text: Column) -> Column:
    return _count(text, EMAIL_RE)


def email_count_sql(col: str = "text") -> str:
    return _count_sql(col, EMAIL_RE)


def ipv4_count(text: Column) -> Column:
    return _count(text, IPV4_RE)


def ipv4_count_sql(col: str = "text") -> str:
    return _count_sql(col, IPV4_RE)


def phone_count(text: Column) -> Column:
    """Counted on the RAW text (like the other counters) — a phone-ish
    digit run inside an email or IP is still a phone-ish digit run."""
    return _count(text, PHONE_RE)


def phone_count_sql(col: str = "text") -> str:
    return _count_sql(col, PHONE_RE)


def redact_pii(text: Column) -> Column:
    """Replace emails, then IPv4s, then phone-ish digit runs with their
    sentinel tokens. Order matters and is fixed: the email pattern can
    contain digits the phone pattern would otherwise nibble at, and the
    IPv4 pattern must win before the (dot-free) phone pattern sees the
    remaining fragments."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def redact_pii_sql(col: str = "text") -> str:
    out = "regexp_replace(%s, '%s', '%s', 'g')" % (col, EMAIL_RE,
                                                   EMAIL_TOKEN)
    out = "regexp_replace(%s, '%s', '%s', 'g')" % (out, IPV4_RE,
                                                   IPV4_TOKEN)
    return "regexp_replace(%s, '%s', '%s', 'g')" % (out, PHONE_RE,
                                                    PHONE_TOKEN)


def pii_hit(text: Column) -> Column:
    """Cheap curation predicate: does the document contain ANY of the
    pattern classes? (rlike short-circuits; no extraction allocs)."""
    return (
        text.rlike(EMAIL_RE) | text.rlike(IPV4_RE) | text.rlike(PHONE_RE)
    )


def pii_hit_sql(col: str = "text") -> str:
    return (
        "(regexp_matches(%s, '%s') OR regexp_matches(%s, '%s')"
        " OR regexp_matches(%s, '%s'))"
        % (col, EMAIL_RE, col, IPV4_RE, col, PHONE_RE)
    )
