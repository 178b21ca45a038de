"""Text-analysis functions for large-scale training-data pipelines.

All native Column expressions (no Python on the hot path): language ID by
stopword-hit scoring, quality scoring (length / punctuation / stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (md5 content hash + sorted-token fingerprint).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "des", "dans"],
    "es": ["el", "la", "los", "las", "es", "y", "un", "una", "que", "de"],
    "it": ["il", "la", "gli", "le", "e", "che", "un", "una", "di", "per"],
}


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^a-z0-9']+"), lambda t: t != "")


def lang_scores_col(text: Column) -> Column:
    """Struct of per-language stopword-hit counts."""
    w = _words(text)
    fields = []
    for lang, stops in LANG_STOPWORDS.items():
        hits = F.size(F.filter(w, lambda t: t.isin(stops)))
        fields.append(hits.alias(lang))
    return F.struct(*fields)


def lang_id_col(text: Column) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when all zero.

    Ties broken by fixed language order via strictly-decreasing epsilon
    weights so the result is deterministic.
    """
    w = _words(text)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("double")
    for rank, (lang, stops) in enumerate(LANG_STOPWORDS.items()):
        score = F.size(F.filter(w, lambda t: t.isin(stops))).cast("double") \
            - F.lit(rank * 1e-9)
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish subword count: GPT-2-style pretokenizer regex pieces."""
    pieces = F.split(text, r"(?=\s)|(?<=[a-zA-Z])(?=\d)|(?<=\d)(?=[a-zA-Z])")
    return F.size(F.filter(F.transform(pieces, lambda p: F.trim(p)), lambda p: p != ""))


def quality_score_col(text: Column) -> Column:
    """Composite quality in [0,1] from mean word length, alpha ratio and
    stopword ratio — the shape of heuristic quality filters used by
    web-scale corpus pipelines (C4/Gopher-style)."""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t).cast("double")
    w = _words(t)
    n_words = F.size(w).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", "")).cast("double")
    stop_hits = F.size(F.filter(w, lambda x: x.isin(LANG_STOPWORDS["en"]))).cast("double")
    mean_wlen = F.when(n_words > 0, alpha / n_words).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    wlen_term = F.when((mean_wlen >= 3) & (mean_wlen <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((wlen_term + alpha_ratio + F.least(stop_ratio * 5, F.lit(1.0))) / 3.0, 6)


def content_hash_col(text: Column) -> Column:
    """Exact-dedup key: md5 of the raw text bytes."""
    return F.md5(F.coalesce(text, F.lit("")))
