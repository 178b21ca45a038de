"""URL / domain normalization — fully native Column chains (P10/P11/P12).

The reference has three divergent domain implementations
(/root/reference/src/domains.py:69-180, :225-275, src/utils.py:54-113); we
pin ONE spec: scheme/www/port/path strip, then eTLD+1 against a broadcast
multi-part-suffix list (`co.uk`-style), with free-email flagging.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Multi-part public suffixes handled explicitly (subset in the spirit of
# /root/reference/src/domains.py:57-66); a production deployment swaps in the
# full Mozilla PSL as a broadcast dimension table.
MULTIPART_TLDS = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.hk", "com.tr",
]

FREE_EMAIL_DOMAINS = [
    "gmail.com", "yahoo.com", "hotmail.com", "outlook.com", "aol.com",
    "icloud.com", "mail.com", "gmx.com", "protonmail.com", "yandex.com",
]


def hostname_col(url: Column) -> Column:
    """lower, strip scheme / leading www. / port / path / query."""
    c = F.lower(F.coalesce(url, F.lit("")))
    c = F.regexp_replace(c, r"^[a-z][a-z0-9+.-]*://", "")   # scheme
    c = F.regexp_replace(c, r"^www\.", "")                   # www
    c = F.regexp_replace(c, r"[/?#].*$", "")                 # path/query/frag
    c = F.regexp_replace(c, r":\d+$", "")                    # port
    return c


def etld1_col(url: Column) -> Column:
    """eTLD+1: last 3 labels when the 2-label tail is a multi-part suffix,
    else last 2 labels."""
    host = hostname_col(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(n <= 2, host)
        .when(last2.isin(MULTIPART_TLDS), last3)
        .otherwise(last2)
    )


def email_domain_col(email: Column) -> Column:
    """`regexp_extract(email, '@(...)')` (P12; run_pipeline.py:203-205)."""
    return F.lower(F.regexp_extract(F.coalesce(email, F.lit("")), r"@([^\s@]+)$", 1))


def is_free_email_col(domain: Column) -> Column:
    return F.lower(domain).isin(FREE_EMAIL_DOMAINS)


# Query parameters that never change page identity — the usual tracking set.
TRACKING_PARAMS_RE = r"(?:utm_[a-z]+|fbclid|gclid|msclkid)=[^&#]*"


def canonicalize_url_col(url: Column) -> Column:
    """Canonical dedup key for a URL: case-fold, strip fragment, leading
    `www.`, default ports (:80/:443), tracking query params (utm_*,
    fbclid, gclid, msclkid — then tidy dangling `?`/`&`), and the trailing
    slash. Purely native regexp chain (codegen, zero shuffle), restricted
    to the Java-regex ∩ RE2 subset (no lookaround / replacement backrefs)
    so the DuckDB battery oracle mirrors each step verbatim.

    URL-key canonicalization is the first dedup stage of a crawl
    pipeline — at 100 TB it collapses ~20-40% of raw crawl rows before
    any content hashing. Case-folding the ENTIRE url (not just
    scheme+host) is the documented spec choice: dedup keys trade
    path-case fidelity for collision recall, same as the reference's
    lower-cased url keys (/root/reference/src/utils.py:54-113 analog).
    """
    c = F.lower(F.coalesce(url, F.lit("")))
    c = F.regexp_replace(c, r"#.*$", "")            # fragment
    c = F.regexp_replace(c, r"://www\.", "://")     # leading www.
    c = F.regexp_replace(c, r":(?:80|443)/", "/")   # default port mid-url
    c = F.regexp_replace(c, r":(?:80|443)\?", "?")
    c = F.regexp_replace(c, r":(?:80|443)$", "")    # default port at end
    c = F.regexp_replace(c, TRACKING_PARAMS_RE, "")  # tracking params
    c = F.regexp_replace(c, r"\?&+", "?")           # tidy ?&& -> ?
    c = F.regexp_replace(c, r"&&+", "&")            # tidy a=1&&b=2
    c = F.regexp_replace(c, r"[?&]+$", "")          # dangling ? / &
    # trailing slash — but never the one in `scheme://`
    return F.when(c.rlike("://$"), c).otherwise(F.regexp_replace(c, r"/+$", ""))
