"""PII detection / redaction for training-data pipelines (north-star §2.11).

Scan-local Column expressions only (regexp_extract_all / regexp_replace,
JVM-side, codegen'd): at 100 TB this is a single pass over the corpus with
zero shuffle — counts aggregate map-side, redaction rewrites in place.

Patterns are written for the common subset of Java regex (Spark) and RE2
(DuckDB oracle): no backreferences, no lookaround, `\\b` ASCII word
boundaries only — so the oracle can run the *same* pattern text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Detection patterns, applied in this order during redaction. Order
#: matters: SSN/phone are digit-shaped and must run before any future
#: bare-digit-run pattern; email before IP so `user@10.0.0.1` style hosts
#: redact as one email, not an email fragment plus an IP.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text) -> list[Column]:
    """One count column per PII class (``pii_<name>``), plus the total."""
    c = F.col(text) if isinstance(text, str) else text
    cols = [
        F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"pii_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    total = None
    for col in cols:
        total = col if total is None else total + col
    return cols + [total.alias("pii_total")]


def redact(text) -> Column:
    """Replace every PII match with a ``<CLASS>`` placeholder, applying
    the patterns in :data:`PII_PATTERNS` order (first pattern wins on
    overlap because later patterns no longer see the original text)."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return c


def redact_table(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus-prep step: append per-class counts and a redacted text
    column. Single scan, no shuffle — safe at any scale."""
    return df.select(
        "*",
        *pii_counts(text_col),
        redact(text_col).alias(f"{text_col}_redacted"),
    )
