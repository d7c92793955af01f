"""PII detection and redaction over the ``documents`` table.

Standard training-data compliance primitives: scan for personally
identifiable information (emails, IPv4 addresses, US-style phone numbers
and SSNs) and produce redacted text with typed placeholder tokens — the
step every LLM-data pipeline runs before tokenization (the C4 / Dolma /
FineWeb pipelines all carry an equivalent pass).

Engine notes: everything is built-in ``regexp_count`` / ``regexp_replace``
— JVM-side, whole-stage-codegen'd, zero Python in the hot path.  The
patterns deliberately stay inside the common subset of Java regex (Spark)
and RE2 (DuckDB oracle): character classes, bounded repetition and ``\\b``
word boundaries only — no lookaround, no backreferences — so both engines
find the identical non-overlapping left-to-right match set.

Scale shape: embarrassingly parallel per document — no shuffle, no skew,
no driver collect; the scan pipelines directly over the parquet read and
the counts aggregate map-side.  At 100 TB this is a single pass whose cost
is regex throughput per core.

The synthetic corpus contains no organic PII (all-alpha word soup), so the
gated queries compose :func:`inject_synthetic_pii` first — a deterministic,
oracle-replayable augmentation that plants PII derived arithmetically from
``doc_id`` into a fixed subset of documents.  The operators themselves are
generic: point them at a real corpus and the injection step simply drops
out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern order is the redaction order (fixed, part of the contract).
# Shapes are mutually exclusive by construction: phone is 3-3-4 digit
# groups, SSN is 3-2-4, so neither matches the other's instances; IPv4
# uses dots, the dashed patterns use hyphens only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# IPv4 with range-valid octets (0-255) — rejects 999.999.999.999-style
# non-addresses while staying inside the Java∩RE2 subset (non-capturing
# groups + bounded alternation only).  Remaining known over-matches,
# accepted as the no-lookaround trade-off: dotted version strings shaped
# like addresses ("1.2.3.4") and the first four groups of longer dotted
# runs ("1.2.3.4.5" → "1.2.3.4"; a trailing dot is itself a \b).
_OCTET = r"(?:25[0-5]|2[0-4]\d|1?\d?\d)"
IPV4_RE = rf"\b{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

#: (kind, pattern, placeholder) in application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("ipv4", IPV4_RE, "[IP]"),
    ("ssn", SSN_RE, "[SSN]"),
    ("phone", PHONE_RE, "[PHONE]"),
)

#: matches any placeholder token — DERIVED from PII_PATTERNS so adding a
#: fifth kind keeps n_placeholders in lockstep with n_redactions.
PLACEHOLDER_RE = (
    r"\[(" + "|".join(tok[1:-1] for _, _, tok in PII_PATTERNS) + r")\]"
)


def _pad3(c: Column) -> Column:
    return F.lpad(c.cast("string"), 3, "0")


def inject_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Deterministically plant synthetic PII into a fixed subset of docs.

    Every planted value is pure integer arithmetic on ``doc_id`` (md5-free,
    engine-portable), so the DuckDB oracle replays the augmentation exactly:

    - ``doc_id % 5 == 0``  → an email ``user<id>@example.com``
    - ``doc_id % 7 == 0``  → an IPv4 ``10.<id%256>.<id*7%256>.<id%100>``
    - ``doc_id % 11 == 0`` → a phone ``555-<id*3%1000>-<id*37%10000>``
    - ``doc_id % 13 == 0`` → an SSN ``<100+id%900>-<10+id%89>-<1000+id%9000>``

    The moduli are pairwise coprime, so some documents receive several PII
    kinds and most receive none — the mix a real scan faces.
    """
    d = F.col("doc_id")
    email = F.concat(
        F.lit(" user"), d.cast("string"), F.lit("@example.com")
    )
    ipv4 = F.concat(
        F.lit(" 10."),
        (d % 256).cast("string"),
        F.lit("."),
        ((d * 7) % 256).cast("string"),
        F.lit("."),
        (d % 100).cast("string"),
    )
    phone = F.concat(
        F.lit(" 555-"),
        _pad3((d * 3) % 1000),
        F.lit("-"),
        F.lpad(((d * 37) % 10000).cast("string"), 4, "0"),
    )
    ssn = F.concat(
        F.lit(" "),
        (d % 900 + 100).cast("string"),
        F.lit("-"),
        (d % 89 + 10).cast("string"),
        F.lit("-"),
        (d % 9000 + 1000).cast("string"),
    )
    blank = F.lit("")
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(d % 5 == 0, email).otherwise(blank),
            F.when(d % 7 == 0, ipv4).otherwise(blank),
            F.when(d % 11 == 0, phone).otherwise(blank),
            F.when(d % 13 == 0, ssn).otherwise(blank),
        ),
    )


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-document PII hit counts by kind plus an overall flag.

    One projection over the scan: four ``regexp_count`` calls per row, all
    codegen'd.  Column pruning keeps the read at (doc_id, source, text).
    """
    counts = {
        f"n_{kind}": F.regexp_count(F.col("text"), F.lit(pat))
        for kind, pat, _ in PII_PATTERNS
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        "doc_id",
        "source",
        *[v.alias(k) for k, v in counts.items()],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def redact(text: Column) -> Column:
    """Apply the full redaction chain to a text column (fixed order)."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_redact(docs: DataFrame) -> DataFrame:
    """Redaction report: per doc, the per-kind match total, the md5 of the
    redacted text (the hash stands in for shipping the full text through
    the correctness gate; the redacted column itself is what a real
    pipeline writes downstream), and the count of placeholders inserted.

    ``n_redactions`` is the SUM OF INDEPENDENT PER-KIND MATCH COUNTS on the
    original text — under cross-kind overlap (a span matched by two kinds,
    e.g. ``1.2.3.4@host.com`` hit by both email and ipv4) it can exceed
    ``n_placeholders``, because the sequential replace chain consumes the
    span at the first matching kind.  ``n_placeholders`` (counted on the
    redacted output) is the number of replacements actually made; the two
    columns together expose exactly that divergence.
    """
    per_kind = [
        F.regexp_count(F.col("text"), F.lit(pat)) for _, pat, _ in PII_PATTERNS
    ]
    n_redactions = per_kind[0]
    for c in per_kind[1:]:
        n_redactions = n_redactions + c
    # Materialize the redacted text once, then derive both outputs from it
    # (two references to a non-cheap expression — CollapseProject keeps the
    # chain single-evaluation, same trick as text_stats' _toks).
    scanned = docs.select(
        "doc_id",
        n_redactions.alias("n_redactions"),
        redact(F.col("text")).alias("_red"),
    )
    return scanned.select(
        "doc_id",
        "n_redactions",
        F.md5(F.col("_red")).alias("redacted_md5"),
        F.regexp_count(F.col("_red"), F.lit(PLACEHOLDER_RE)).alias(
            "n_placeholders"
        ),
    )
