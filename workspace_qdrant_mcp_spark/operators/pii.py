"""PII detection and redaction for training-data curation: regex-based
email / IPv4 / phone / government-id spotting plus a redacted-text
fingerprint. All JVM-side column expressions (regexp_count /
regexp_replace inside whole-stage codegen) — a narrow map over the scan,
no shuffle, no Python in the hot path.

The patterns are deliberately RE2-compatible (no backreferences or
lookaround) so the DuckDB oracle runs the byte-identical regexes; at
100 TB this operator is embarrassingly parallel and pushes the text-column
read straight to the parquet scan.

The synthetic documents corpus contains no organic PII, so the driver
query runs over a deterministic fixture augmentation (augment_with_pii):
a doc_id-keyed concat of synthetic email / IP / phone / id suffixes built
from the SAME expression in Spark and in the oracle SQL — the detection
machinery is exercised end-to-end on non-vacuous data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import fan_out

# Order matters for redaction (applied first to last).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"),
    ("phone", "\\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"),
    ("govid", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"),
)


def augment_with_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Append deterministic synthetic PII suffixes keyed on doc_id
    (mod 5 → email, mod 7 → IPv4, mod 9 → phone, mod 13 → gov-id). The
    oracle SQL (oracles.pii_detection) builds the identical string."""
    d = F.col(id_col)
    ds = d.cast("string")
    t = F.concat(
        F.col(text_col),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit(" contact user"), ds, F.lit("@example.com for details")
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit(" from host 10."),
                (d % 200).cast("string"),
                F.lit(".0."),
                (d % 250).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 9 == 0,
            F.concat(
                F.lit(" call +1 555-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 13 == 0,
            F.concat(
                F.lit(" ref 123-45-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.withColumn("pii_text", t)


def pii_detect(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "pii_text"
) -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, n_govids, pii_total,
    redacted_fp) — per-category non-overlapping match counts plus the
    16-hex md5 prefix of the text after in-order redaction
    (email → <EMAIL>, ipv4 → <IP>, phone → <PHONE>, govid → <ID>)."""
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(pat)).cast("int").alias(f"n_{name}s")
        for name, pat in PII_PATTERNS
    }
    red = t
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(
            red, pat, {"ipv4": "<IP>", "govid": "<ID>"}.get(name, f"<{name.upper()}>")
        )
    return fan_out(docs).select(
        F.col(id_col),
        *counts.values(),
        pii_total_expr(text_col).alias("pii_total"),
        F.substring(F.md5(red.cast("binary")), 1, 16).alias("redacted_fp"),
    )


def pii_total_expr(text_col: str = "pii_text"):
    """The pii_total column expression alone (shared with
    curation_funnel's fused single-scan shape, r13)."""
    t = F.col(text_col)
    total = None
    for name, _ in PII_PATTERNS:
        c = F.regexp_count(t, F.lit(dict(PII_PATTERNS)[name])).cast("int")
        total = c if total is None else total + c
    return total
