"""PII scrubbing: redact emails / IPv4 addresses / phone numbers.

Beyond-reference operator (LLM-data-pipeline family): every released
web-corpus pipeline masks personally identifiable information before
training (Dolma's email/IP/phone taggers, BigScience ROOTS, FineWeb);
the canonical mechanism is conservative regex classes replaced by
typed mask tokens, so downstream tokenizers see a stable vocabulary
item instead of the raw identifier.

Pure Catalyst ``regexp_replace`` chain — no UDF, no shuffle; the
operator is a per-row projection that composes into the ingest scan
(same shape as ``html_to_text`` / ``extract_main_text``). Patterns are
deliberately conservative (precision over recall — a false positive
destroys real text forever): emails require a dotted TLD, IPv4 requires
four dotted octets on word boundaries, phones require 7+ digits in
international/US-grouped form. Redaction order is fixed and documented
(email, then IPv4, then phone) so the output — and the audit counts,
which evaluate each later pattern on the earlier-masked text — is a
stable contract rather than an implementation accident.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: conservative patterns, identical semantics under Java regex and RE2
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
)
#: digit lookarounds keep the match from biting into longer digit runs
#: (order ids, serials) — precision first. Java-regex lookbehind is fine
#: here because these patterns only ever run in Spark; the driver gate's
#: DuckDB oracle states its expectations arithmetically, no regex.
#: the extra hyphen-continuation lookarounds keep the pattern out of
#: 4+-group hyphenated serials ('555-123-4567-8901' stays intact) while
#: still matching a phone that merely FOLLOWS a number ('port 1 +44 ...')
PHONE_RE = (
    r"(?<![0-9])(?<![0-9]-)(?:\+[0-9]{1,3}[ -]?)?"
    r"(?:\([0-9]{3}\)[ -]?|[0-9]{3}[ -])"
    r"[0-9]{3}[ -][0-9]{4}(?![0-9])(?!-[0-9])"
)

EMAIL_MASK = "<EMAIL>"
IP_MASK = "<IP>"
PHONE_MASK = "<PHONE>"


def _email_masked(text: Column) -> Column:
    # NULL text is an empty document (repo-wide invariant, same as
    # ngram_lm._tokens): scrubbed must be '' and audit counts 0, never
    # NULLs that a where(n_x == 0) audit would silently drop
    return F.regexp_replace(F.coalesce(text, F.lit("")), EMAIL_RE, EMAIL_MASK)


def _ip_masked(text: Column) -> Column:
    return F.regexp_replace(_email_masked(text), IPV4_RE, IP_MASK)


def redact_pii(text: Column) -> Column:
    """Masked text: emails -> <EMAIL>, IPv4 -> <IP>, phones -> <PHONE>.
    Idempotent (mask tokens match none of the patterns)."""
    return F.regexp_replace(_ip_masked(text), PHONE_RE, PHONE_MASK)


def pii_counts(text: Column) -> Column:
    """``struct(n_emails, n_ips, n_phones)`` found in ``text`` — the audit
    side-channel (corpus PII rates are a release-report metric). Each
    count is evaluated on the text with all EARLIER patterns masked —
    exactly what ``redact_pii`` replaces — so the audit always agrees
    with the redaction (an IP's trailing octets can never be
    double-reported as a phone). The stages are built from the same
    expression subtrees as ``redact_pii`` so whole-stage codegen's
    subexpression elimination evaluates each regex pass once per row
    when the two are projected together."""
    return F.struct(
        F.regexp_count(F.coalesce(text, F.lit("")), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(_email_masked(text), F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(_ip_masked(text), F.lit(PHONE_RE)).alias("n_phones"),
    )


def scrub_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus curation view: the input columns plus ``scrubbed`` (masked
    text) and per-kind counts. The original ``text`` column is NEVER
    mutated (byte-identical extracted text per url is the repo-wide hard
    invariant); the masked form is a derived column, exactly like
    ``main_text``."""
    c = pii_counts(F.col(text_col))
    return docs.select(
        "*",
        redact_pii(F.col(text_col)).alias("scrubbed"),
        c["n_emails"].alias("n_emails"),
        c["n_ips"].alias("n_ips"),
        c["n_phones"].alias("n_phones"),
    )
