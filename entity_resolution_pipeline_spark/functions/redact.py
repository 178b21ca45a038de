"""PII redaction for webtext curation — fully native Column chains.

A 100 TB training-data pipeline scrubs contact PII (emails, phone numbers,
IPv4 addresses) before tokenization. Patterns are kept to the regex subset
shared by Java regex (Spark) and RE2 (DuckDB oracle): no lookaround, no
backreferences, non-capturing groups only — so the DuckDB battery oracle
can mirror them verbatim. The reference has no analog; this is an
LLM-pipeline extension alongside dedup/quality (see COVERAGE.md).

Native `regexp_replace` / `regexp_count` keep the scrub inside
whole-stage codegen — no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

_EMAIL_TOKEN = "<EMAIL>"
_PHONE_TOKEN = "<PHONE>"
_IP_TOKEN = "<IP>"


def redact_pii_col(text: Column) -> Column:
    """Replace every email, then phone, then IPv4 occurrence with a typed
    placeholder token. Email runs first so its digit runs are never
    half-eaten by the phone/IP patterns."""
    c = F.coalesce(text, F.lit(""))
    c = F.regexp_replace(c, EMAIL_RE, _EMAIL_TOKEN)
    c = F.regexp_replace(c, PHONE_RE, _PHONE_TOKEN)
    c = F.regexp_replace(c, IPV4_RE, _IP_TOKEN)
    return c


def pii_counts_col(text: Column) -> Column:
    """struct(email_count, phone_count, ip_count) — audit counts a curation
    job aggregates per source to decide whether a crawl slice needs manual
    review. Counted on the RAW text (before placeholders are substituted)."""
    c = F.coalesce(text, F.lit(""))
    return F.struct(
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("long").alias("email_count"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("long").alias("phone_count"),
        F.regexp_count(c, F.lit(IPV4_RE)).cast("long").alias("ip_count"),
    )
