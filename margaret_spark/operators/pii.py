"""PII detection and redaction over a text corpus — the scrubbing
pass a training-data pipeline runs before anything ships: find and
mask email addresses, IPv4 addresses, and phone-like digit runs.

Scale shape: pure per-row ``regexp_extract_all`` / ``regexp_replace``
expressions in whole-stage codegen — zero shuffles, no UDFs, no
Python. At 100 TB this is a map-only pass whose cost is the scan.

Pattern dialect: every pattern sticks to the common subset of Java
regex (Spark) and RE2 (DuckDB/Go) — ASCII classes, non-capturing
groups, greedy quantifiers, ``\\b`` word boundaries; no lookaround,
no backreferences — so detection counts and redacted text are
engine-identical and the surface is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Conservative, dialect-portable patterns (see module doc).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z]{2,})+"
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_PATTERN = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"

#: Redaction order matters and is part of the contract: emails first
#: (their digit runs would otherwise partially match as phones), then
#: IPs, then phones.
REDACTIONS = [
    ("email", EMAIL_PATTERN, "[EMAIL]"),
    ("ipv4", IPV4_PATTERN, "[IP]"),
    ("phone", PHONE_PATTERN, "[PHONE]"),
]


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("int")


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_emails, n_ipv4, n_phones, has_pii): per-document match
    counts on the ORIGINAL text (each detector runs independently —
    a digit run inside an email counts as both; redaction order is
    what resolves overlaps, see :func:`pii_redact`)."""
    c = F.col(text_col)
    counts = df.select(
        F.col(id_col),
        _count(c, EMAIL_PATTERN).alias("n_emails"),
        _count(c, IPV4_PATTERN).alias("n_ipv4"),
        _count(c, PHONE_PATTERN).alias("n_phones"),
    )
    return counts.withColumn(
        "has_pii",
        (F.col("n_emails") > 0) | (F.col("n_ipv4") > 0) | (F.col("n_phones") > 0),
    )


def redact_expr(text: Column) -> Column:
    """The redaction chain as a Column expression, applied in
    :data:`REDACTIONS` order (emails before phones, so an email's
    digits never leak as a partial phone match). Shared by the batch
    operator below and the streaming at-ingest scrub
    (``streaming/scrub.py``), so the two paths cannot drift."""
    c = text
    for _name, pattern, placeholder in REDACTIONS:
        c = F.regexp_replace(c, pattern, placeholder.replace("$", "\\$"))
    return c


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, redacted): the text with every match replaced by its
    placeholder (see :func:`redact_expr`)."""
    return df.select(F.col(id_col), redact_expr(F.col(text_col)).alias("redacted"))
