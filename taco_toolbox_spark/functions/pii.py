"""PII detection and redaction as pure JVM regexp column expressions.

Training-corpus hygiene pass: count and strip emails / phone numbers /
IPv4 addresses / SSN-shaped ids before text ships to a model. Everything
here is `regexp_count` / `regexp_replace` — whole-stage-codegen'd, zero
Python, zero shuffle: a scan-shaped pass at any corpus size.

Pattern dialect: the common Java-regex ∩ RE2 subset (no backreferences,
no lookaround), so the SAME pattern strings run in Spark, DuckDB, Go RE2,
etc. — which is what makes the operator oracle-able and lets a redaction
manifest be re-verified outside Spark.

Redaction order is fixed (emails first, then IPv4, SSN, phone) because
patterns can overlap on digit runs; applying them in a deterministic
order makes redacted text reproducible across engines.

The reference has no PII operator; beyond-reference pipeline surface
(SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Detection patterns in the portable Java∩RE2 dialect. Keys are the
#: canonical kind names; order here IS the redaction order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # international-ish dashed numbers: +1-555-0042, 25-989-741-2988
    "phone": r"\+?\d{1,3}(-\d{3,4}){2,3}\b",
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of non-overlapping matches of one PII kind in the column."""
    if kind not in PII_PATTERNS:
        raise ValueError(f"unknown PII kind {kind!r}; known: {sorted(PII_PATTERNS)}")
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind]))


def pii_counts(col: Column | str) -> Column:
    """Struct of per-kind match counts, one `regexp_count` each — feed to
    `.select(pii_counts("text").alias("pii"))` then `pii.email` etc."""
    return F.struct(
        *[pii_count(col, kind).alias(kind) for kind in PII_PATTERNS]
    )


def redact_pii(
    col: Column | str,
    kinds: list[str] | None = None,
    token: str = "[{kind}]",
) -> Column:
    """Replace every PII match with a per-kind token (default
    ``[email]``/``[ipv4]``/…), applying kinds in the canonical
    ``PII_PATTERNS`` order (deterministic under overlap)."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        c = F.regexp_replace(c, PII_PATTERNS[kind], token.format(kind=kind))
    return c
