"""PII detection + scrubbing over the crawl corpus (emails, IPv4
addresses, phone numbers) — the redaction pass every web-text
training pipeline runs before tokenization (C4 / RefinedWeb drop or
mask contact strings; see also the reference's contact-email handling
in its schema.org transforms, crawler/upload/__init__.py — here it is
corpus-wide, not per-field).

All patterns are chosen to behave identically under Java regex
(Spark, JVM codegen) and RE2 (DuckDB oracle): no lookaround, no
backreferences, no variable-greed ambiguity. Detection and redaction
are pure native column expressions — zero shuffle, zero Python — so
the scrub pass is embarrassingly parallel at 100 TB and rides next to
whatever projection already scans the text column. Plan note: the
regex passes are whole-stage-codegen-able on their own; the Luhn card
COUNT uses higher-order-function expressions (filter/transform/
aggregate), which Spark evaluates JVM-interpreted outside WSCG — still
a single no-exchange projection, and the expensive part (the regex
scans) dominates either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex == RE2 behavior for all three (verified by the DuckDB
# oracle pair q_pii_scrub): character classes, bounded repetition,
# non-capturing groups and \b only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# rigid NANP-ish shape (555-123-4567 / 555 123 4567) — fixed-width so
# greedy matching can't diverge between engines
PHONE_RE = r"\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b"
# 16-digit payment-card shapes: plain, dash-grouped, space-grouped
# (explicit alternation, no backreferences — RE2-safe); detection
# counts only Luhn-VALID candidates, redaction is conservative (all
# card-shaped runs), the standard asymmetry in PII scrubbing
CC_RE = (
    r"\b(?:[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"
    r"|[0-9]{4} [0-9]{4} [0-9]{4} [0-9]{4}"
    r"|[0-9]{16})\b"
)

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"
CC_TOKEN = "<CARD>"


def _count_matches(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches (group 0 = whole match —
    identical semantics to DuckDB's regexp_extract_all default)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def pii_email_count(text: Column) -> Column:
    return _count_matches(text, EMAIL_RE)


def pii_ipv4_count(text: Column) -> Column:
    # count IPs on the email-scrubbed text so `1.2.3.4@host.com`-style
    # overlaps can't double-count; mirrors the scrub order below
    return _count_matches(F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN), IPV4_RE)


def pii_phone_count(text: Column) -> Column:
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN), IPV4_RE, IPV4_TOKEN
    )
    return _count_matches(scrubbed, PHONE_RE)


def luhn_valid_col(candidate: Column) -> Column:
    """Luhn checksum over a 16-digit card candidate (separators
    stripped), as a pure expression: strip non-digits, double every
    digit at odd 1-based position from the left (16-digit numbers
    double odd-left == every second from the right), subtract 9 when
    the doubled digit exceeds 9, sum, valid iff sum % 10 == 0.
    Integer-only — bit-identical in DuckDB's list_transform twin."""
    ds = F.regexp_replace(candidate, r"[^0-9]", "")
    digits = F.filter(F.split(ds, ""), lambda ch: F.length(ch) > 0)
    contrib = F.transform(
        digits,
        lambda d, i: F.when(
            i % 2 == 0,
            F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9)
            .otherwise(d.cast("int") * 2),
        ).otherwise(d.cast("int")),
    )
    return F.aggregate(contrib, F.lit(0), lambda a, x: a + x) % 10 == 0


def pii_cc_count(text: Column) -> Column:
    """Number of Luhn-VALID card-shaped matches, counted on the text
    after the email/IP/phone scrubs (mirrors the scrub order)."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN), IPV4_RE, IPV4_TOKEN
        ),
        PHONE_RE,
        PHONE_TOKEN,
    )
    return F.size(
        F.filter(F.regexp_extract_all(scrubbed, F.lit(CC_RE), 0), luhn_valid_col)
    )


def pii_scrub_col(text: Column) -> Column:
    """Redact email -> IPv4 -> phone -> card, in that fixed order
    (order matters: an email's host part may contain digit runs;
    scrubbing emails first keeps the later passes from seeing them).
    Card redaction is conservative: ALL card-shaped digit runs are
    masked, Luhn-valid or not (a per-match predicate can't ride
    regexp_replace; over-masking shaped-but-invalid runs is the safe
    direction for a training corpus)."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, CC_RE, CC_TOKEN)


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII scrub: returns (id, n_emails, n_ipv4,
    n_phones, n_cards, clean_text). Pure projection — the plan is a
    single WholeStageCodegen map over the scan, no exchange, no Python
    worker; at 10^10 documents this is the cheapest pass in the
    pipeline."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        pii_email_count(t).cast("long").alias("n_emails"),
        pii_ipv4_count(t).cast("long").alias("n_ipv4"),
        pii_phone_count(t).cast("long").alias("n_phones"),
        pii_cc_count(t).cast("long").alias("n_cards"),
        pii_scrub_col(t).alias("clean_text"),
    )
