"""PII detection + redaction for training-data curation.

The transcript-side `processor_desensitize` (operators/transform.py)
redacts ONE configured field with one rule; corpus curation needs the
multi-rule document pass (the CCNet/Dolma-style PII scrub): find every
email / phone / IPv4 / SSN-shaped span in the text, replace each with
a typed placeholder, and report per-rule hit counts for corpus
statistics.

Everything is JVM codegen — ``regexp_replace`` + ``regexp_count`` per
rule, chained; no UDF, no shuffle, fully narrow.  The rule regexes
stay inside the Go↔Java↔DuckDB common dialect (no lookbehind) so the
whole pass is oracle-checkable.

Rule order matters and is fixed: emails before phones (an email's
digits must not be half-eaten by the phone rule), SSN before phone
(both are digit runs; SSN's dashed shape is stricter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — deliberately conservative patterns:
# a curation scrub prefers precision (don't shred code/dates) and the
# reference's desensitize takes the same stance (explicit regex, const
# replacement, processor_desensitize.go:30-55).
PII_RULES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"(?:\+?1[-. ])?\(?\b\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
        r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b",
        "<IP>",
    ),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    rules: list[tuple[str, str, str]] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Apply every rule in order: count hits on the text AS SEEN BY
    THAT RULE (after the previous rules' replacements — placeholders
    contain no digits/@, so earlier redactions can't double-count),
    then replace.  Adds ``n_<rule>`` counts and the scrubbed text."""
    rules = rules if rules is not None else PII_RULES
    cur: Column = F.col(text_col)
    counts: list[tuple[str, Column]] = []
    for name, pat, repl in rules:
        counts.append((f"n_{name}", F.regexp_count(cur, F.lit(pat))))
        cur = F.regexp_replace(cur, pat, repl)
    out = df
    # counts and the final text share the chained-replace prefix —
    # land them in ONE select so codegen's subexpression elimination
    # sees the shared subtrees (they are unconditional here)
    return out.select(
        "*",
        *[c.alias(n) for n, c in counts],
        cur.alias(out_col or f"{text_col}_scrubbed"),
    )
