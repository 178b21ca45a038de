"""Canonical text normalization — the per-row invariant of the engine.

The pinned spec is the reference's *scalar* normalization chain
(/root/reference/src/normalize.py:181-239, chosen over the divergent
vectorized path per SURVEY.md §1.4):

    1. NFKD-decompose, drop combining marks (diacritic strip)
    2. punctuation ``[^a-zA-Z0-9\\s]`` → space
    3. whitespace collapse (`' '.join(s.split())`)
    4. lowercase

``normalize_text_py`` is the pure-Python golden oracle (used by tests and by
the synthetic-fixture generator). ``normalize_udf`` is the Arrow-vectorized
pandas UDF the Spark job uses — one of exactly three sanctioned Python
touchpoints (SURVEY.md §2.14). ``normalize_ascii_col`` is a fully native
Column chain, byte-identical to the oracle for ASCII input (no NFKD needed),
used on corpora known to be ASCII so the hot path stays in codegen.

Extraction (html → text) lives in :func:`extract_text_py` /
:func:`extract_text_udf`: deterministic boilerplate removal (drop
script/style subtrees, strip tags, entity-decode) followed by the chain
above. Byte-identical per url across the pUDF and the oracle is asserted by
golden tests (FIXTURES.md §4).
"""

from __future__ import annotations

import html as _htmllib
import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# --- pure-Python golden spec -------------------------------------------------

_PUNCT_RE = re.compile(r"[^a-zA-Z0-9\s]")
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")


def strip_diacritics_py(s: str) -> str:
    """NFKD decompose then drop combining marks (spec step 1)."""
    nfkd = unicodedata.normalize("NFKD", s)
    return "".join(c for c in nfkd if not unicodedata.combining(c))


def normalize_text_py(s: str | None) -> str:
    """The canonical chain. Golden oracle; deterministic, total."""
    if s is None:
        return ""
    s = strip_diacritics_py(str(s))
    s = _PUNCT_RE.sub(" ", s)
    s = " ".join(s.split())
    return s.lower()


def extract_text_py(html_bytes: bytes | None) -> str:
    """html → canonical text. Golden oracle for the extractor pUDF.

    Deterministic boilerplate removal: drop <script>/<style> subtrees,
    strip remaining tags (replaced by a space so adjacent text nodes do not
    fuse), decode HTML entities, then apply the canonical chain.
    """
    if html_bytes is None:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _SCRIPT_STYLE_RE.sub(" ", raw)
    raw = _TAG_RE.sub(" ", raw)
    raw = _htmllib.unescape(raw)
    return normalize_text_py(raw)


# --- Arrow-vectorized pUDFs (sanctioned Python touchpoint #1) ----------------


@pandas_udf(StringType())
def normalize_udf(s: pd.Series) -> pd.Series:
    return s.map(normalize_text_py, na_action=None)


@pandas_udf(StringType())
def extract_text_udf(b: pd.Series) -> pd.Series:
    return b.map(extract_text_py, na_action=None)


# --- native Column builders (ASCII-safe fast path & derived views) -----------


def normalize_ascii_col(col: Column) -> Column:
    """Native equivalent of the canonical chain for ASCII input.

    Identical output to ``normalize_text_py`` whenever the input contains no
    characters needing NFKD. Stays inside whole-stage codegen.
    """
    c = F.coalesce(col, F.lit(""))
    c = F.regexp_replace(c, r"[^a-zA-Z0-9\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.lower(c)


def tokens_col(col: Column, min_len: int = 2) -> Column:
    """Tokenize normalized text: split on whitespace, keep len >= min_len.

    (reference: /root/reference/src/normalize.py:130-147 tokenize + filter)
    """
    toks = F.split(col, r"\s+")
    return F.filter(toks, lambda t: (F.length(t) >= min_len) & (t != ""))


def fingerprint_col(col: Column, min_len: int = 2) -> Column:
    """Sorted unique tokens joined by space (P6; src/normalize.py:138-147)."""
    return F.array_join(F.array_sort(F.array_distinct(tokens_col(col, min_len))), " ")


def prefix_col(col: Column, k: int = 8) -> Column:
    """First k chars of the space-stripped normalized name (P7)."""
    return F.substring(F.regexp_replace(col, r"\s", ""), 1, k)


def acronym_col(col: Column) -> Column:
    """First letter of each token, uppercased (P8)."""
    toks = F.filter(F.split(col, r"\s+"), lambda t: t != "")
    return F.upper(F.array_join(F.transform(toks, lambda t: F.substring(t, 1, 1)), ""))


# ~70 multi-language legal suffixes, pinned to the reference's set
# (/root/reference/src/normalize.py:21-50) — spec data, not code
LEGAL_SUFFIXES = [
    # English
    "inc", "incorporated", "corp", "corporation", "co", "company",
    "ltd", "limited", "llc", "llp", "lp", "plc", "pvt",
    # German
    "gmbh", "ag", "kg", "ohg", "gbr", "ug", "mbh", "e v", "ev",
    # French
    "sa", "sarl", "sas", "sasu", "snc", "sca", "sci", "eurl",
    # Italian
    "spa", "s p a", "srl", "s r l", "sapa",
    # Spanish
    "sl", "s l", "slu", "sau", "sc", "coop",
    # Dutch/Belgian
    "bv", "b v", "nv", "n v", "vof", "cv", "cvba",
    # Nordic
    "ab", "a b", "as", "a s", "asa", "aps", "a/s", "oy", "oyj",
    # Eastern European
    "sp z o o", "spzoo", "zrt", "kft", "bt", "sro", "s r o", "sia", "uab",
    # Other
    "pty", "pty ltd", "pte", "pte ltd", "bhd", "sdn bhd",
    "holding", "holdings", "group", "international", "intl",
]

# longest-first alternation so 'pty ltd' beats 'ltd' at the same position —
# the reference sorts by len(desc) for the identical reason
# (src/normalize.py:53-56)
LEGAL_SUFFIX_PATTERN = (
    r"(?i)\s*[,.]?\s*("
    + "|".join(re.escape(s) for s in sorted(LEGAL_SUFFIXES, key=len, reverse=True))
    + r")\s*\.?\s*$"
)

MAX_SUFFIX_PASSES = 5


def strip_legal_suffix_col(col: Column) -> Column:
    """Iterated legal-suffix strip (P4; src/normalize.py:104-127).

    The reference loops its anchored suffix regex ≤5 times ("Acme Holding
    Group International Ltd" needs 4). A fixed chain of 5 anchored
    regexp_replace passes is equivalent — each pass truncates at most one
    trailing suffix, and a pass with no match is the identity — and stays
    fully native/codegen. Empty results fall back to the input (reference
    returns ``name`` when everything was stripped). Input is expected to be
    the canonically normalized name (the reference calls this on
    ``name_norm`` too).
    """
    orig = F.coalesce(col, F.lit(""))
    out = orig
    for _ in range(MAX_SUFFIX_PASSES):
        out = F.trim(F.regexp_replace(out, LEGAL_SUFFIX_PATTERN, ""))
    out = F.trim(F.regexp_replace(out, r"[\s,.\-]+$", ""))
    return F.when(out == "", orig).otherwise(out)


# Prose legal-name patterns (P20; /root/reference/src/alias_registry.py:397-420):
# a leading ALL-CAPS-ish name ending in a legal suffix, or a name announced by
# "legal entity is" / "company is". Applied first-match-wins.
PROSE_LEGAL_NAME_PATTERNS = [
    r"^([A-Z][A-Z\s&\.\-]+(?:S\.?L\.?|SRL|GMBH|LTD\.?|INC\.?|AG|SA|SAS|AB|OY|BV|NV))",
    r"legal entity is\s+([^,\.]+(?:Ltd|GmbH|SRL|S\.L\.|Inc|AG|SA|SAS)\.?)",
    r"company is\s+([^,]+(?:Ltd|GmbH|SRL|S\.L\.|Inc|AG|SA|SAS)\.?)",
]


def extract_legal_name_col(col: Column) -> Column:
    """First matching prose pattern's capture, trimmed; NULL when none.

    regexp_extract returns '' on no-match, so each pattern folds into a
    coalesce chain via nullif — one narrow projection, no UDF.
    """
    out = F.lit(None).cast("string")
    for pat in PROSE_LEGAL_NAME_PATTERNS:
        ex = F.nullif(F.trim(F.regexp_extract(F.coalesce(col, F.lit("")),
                                              "(?i)" + pat, 1)), F.lit(""))
        out = F.coalesce(out, ex)
    return out


GENERIC_TOKENS = [
    # generic-token stoplist in the spirit of src/normalize.py:64-72
    "global", "international", "services", "solutions", "systems",
    "consulting", "partners", "associates", "group", "holdings",
    "technologies", "technology", "tech", "digital", "media",
    "capital", "ventures", "investments", "management", "enterprise",
]


def is_generic_col(col: Column) -> Column:
    """True when every token is in the stoplist or too short (P9)."""
    toks = tokens_col(col, 1)
    non_generic = F.filter(
        toks,
        lambda t: (~t.isin(GENERIC_TOKENS)) & (F.length(t) > 2),
    )
    return F.size(non_generic) == 0
