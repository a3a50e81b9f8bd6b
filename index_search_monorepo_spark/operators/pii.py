"""PII / URL detection and redaction — training-data text cleaning.

A 100 TB training-pipeline staple (C4/Dolma-style curation): count and
redact emails, URLs, IPv4 addresses and phone numbers before a corpus
ships. Everything here is pure `pyspark.sql.functions` regex expressions
— whole-stage codegen, zero Python in the hot path, embarrassingly
parallel (per-row, no shuffle), so it scales linearly with the scan.

The patterns are deliberately restricted to constructs whose semantics
are identical in Java regex (Spark executors) and RE2 (the DuckDB
driver oracle): character classes, bounded quantifiers, ASCII `\\b`
boundaries — no lookaround, no backreferences, no `\\s` (Java's class
includes U+000B, RE2's does not). That keeps every column
oracle-checkable byte-for-byte.

Redaction applies the patterns in a FIXED order (URL, email, IPv4,
phone) so a URL swallows any address-like substrings inside it before
the narrower patterns run; counts are measured on the raw text (density
signals), independent of redaction order.

Reference: the reference repo (Python services around Solr/MySQL) has
no PII surface; this module belongs to the build brief's first-class
curation-op set alongside dedup/similarity/textstats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# the URL must END on a non-delimiter char so redaction does not swallow
# text glued to the URL (closing paren, trailing comma/period, the next
# clause): 'read (http://ex.org/docs) now' keeps its ')'. Greedy run +
# final-char class = backtrack off the trailing punctuation, identical
# leftmost-first semantics in Java regex and RE2.
URL_RE = r"""https?://[^ \n\t\r]*[^ \n\t\r.,;:!?)\]'"]"""
# octets bounded to 0-255 (alternation longest-first for identical
# leftmost-first behavior in both engines): '10.0.7.999' is NOT an IP
_OCT = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
IPV4_RE = rf"\b{_OCT}\.{_OCT}\.{_OCT}\.{_OCT}\b"
PHONE_RE = r"\+\d{1,3}[ -]\d{3}[ -]\d{4}\b"

# (column suffix, pattern, replacement token) in REDACTION order
REDACTIONS: tuple[tuple[str, str, str], ...] = (
    ("urls", URL_RE, "<URL>"),
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
)


def redacted_expr(text: Column) -> Column:
    """Text with every PII class replaced by its token, in the fixed
    REDACTIONS order."""
    out = text
    for _name, pat, repl in REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return out


def with_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-class match counts (n_urls/n_emails/n_ipv4/n_phones,
    measured on the raw text), the PII total `n_pii` (emails + IPv4 +
    phones — URLs are tracked but not PII per se), and the fully
    redacted text (`pii_redacted`). Input columns are preserved."""
    c = F.col(text_col)
    counts = {
        name: F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat, _repl in REDACTIONS
    }
    return df.select(
        "*",
        *(counts[name].alias(f"n_{name}") for name, _p, _r in REDACTIONS),
    ).select(
        "*",
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones"))
        .cast("long")
        .alias("n_pii"),
        redacted_expr(c).alias("pii_redacted"),
    )


def oracle_pii_sql(text_expr: str) -> tuple[str, str]:
    """(counts_sql, redacted_sql) fragments for the DuckDB oracle over
    the given text expression — the same patterns, the same order, RE2
    side. Kept next to the patterns so the two engines cannot drift.
    Patterns are SQL-escaped (URL_RE contains a literal quote)."""

    def q(pat: str) -> str:
        return pat.replace("'", "''")

    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all({text_expr}, '{q(pat)}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _repl in REDACTIONS
    )
    redacted = text_expr
    for _name, pat, repl in REDACTIONS:
        redacted = f"regexp_replace({redacted}, '{q(pat)}', '{repl}', 'g')"
    return counts, redacted
