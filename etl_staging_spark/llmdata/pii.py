"""PII scrubbing: regex masking of emails / phone numbers / long
numeric identifiers, entirely JVM-side (`regexp_replace` /
`regexp_extract_all` inside whole-stage codegen — no Python in the
hot path, so the scrub runs at scan throughput on a 100 TB corpus).

The patterns deliberately stay in the common dialect subset of Java
regex and RE2 (`\\b`, `\\d`, bounded quantifiers; no lookarounds) so
the DuckDB oracle applies the byte-identical transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Masked in THIS order: emails first (their local part contains digit
# runs that would otherwise partially match the id/phone patterns).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
LONG_ID_RE = r"\b\d{9,}\b"

MASKS = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (LONG_ID_RE, "<ID>")]


def mask_pii(col: Column) -> Column:
    """The masked text column."""
    out = col
    for pattern, token in MASKS:
        out = F.regexp_replace(out, pattern, token)
    return out


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("bigint")


def with_pii_masked(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``masked`` plus per-category match counts (counted on the
    ORIGINAL text, before masking)."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": _count(c, EMAIL_RE),
            "n_phones": _count(c, PHONE_RE),
            "n_ids": _count(c, LONG_ID_RE),
            "masked": mask_pii(c),
        }
    )
