"""PII detection and redaction over text columns.

A training-data curation pipeline scrubs personally identifiable
information before text reaches a model. This module provides the
pattern registry and column-level detect/redact primitives; the graded
queries live in ``plans/text.py``.

Patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB oracle): no backreferences, no lookaround — both engines
must match the exact same spans for the oracle to agree. All matching
is JVM-side (``regexp_count`` / ``regexp_replace``), no Python in the
row path.

Reference scope note: the SparkTrends reference has no PII handling;
this extends the engine for LLM-corpus curation (public practice, e.g.
the C4/RefinedWeb cleaning recipes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: applied in this sequence during redaction. Email first so
# its local part can't be partially eaten by a later pattern.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ip": "<IP>",
}


def inject_synthetic_pii(text: Column, doc_id: Column) -> Column:
    """Append deterministic doc_id-derived email/phone/IP strings.

    Test-fixture injection (the driver corpus has no PII by
    construction); both the Spark plans and the DuckDB oracles apply
    the identical construction so the detector/scrubber logic is
    genuinely falsifiable. Production pipelines skip this step."""
    email = F.when(
        doc_id % 5 == 0,
        F.concat(
            F.lit(" contact user"),
            doc_id.cast("string"),
            F.lit("@example.com today"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        doc_id % 7 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((doc_id % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((doc_id % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        doc_id % 11 == 0,
        F.concat(
            F.lit(" from 10."),
            (doc_id % 256).cast("string"),
            F.lit(".0."),
            (doc_id % 250).cast("string"),
            F.lit(" logged"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(text, email, phone, ip)


def pii_count(text: Column, kind: str) -> Column:
    """Number of matches of one PII pattern (bigint)."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind])).cast("bigint")


def redact(text: Column) -> Column:
    """Replace every PII match with its type token, in registry order.

    Sequential ``regexp_replace`` chain — each stage is a JVM string
    expression, the whole chain stays inside one projection (no
    shuffle, no UDF)."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, REDACTION_TOKENS[kind])
    return out
