"""Borderline rerank (F16) + decisioning evidence (D1-D5).

Rerank: the reference re-scores only the borderline slice with a
cross-encoder and blends 0.4·old + 0.6·new
(/root/reference/src/reranking.py:42-117, mask :73, blend :106-110). The
Spark shape: filter the band, re-score via any scorer column, blend
natively, union back — no model dependency here; the default re-scorer is
embedding cosine over the stand-in embeddings (functions/embeddings.py).

Decisioning: evidence JSON (D4, src/decisioning.py:224-283) as
``to_json(struct(...))`` with top-weighted contributions sorted natively;
review-queue selection (D5, :208-215) as a filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine_col

BLEND_OLD, BLEND_NEW = 0.4, 0.6
BAND_LO, BAND_HI = 0.40, 0.95


def rerank_borderline(scored: DataFrame, embeddings: DataFrame,
                      lo: float = BAND_LO, hi: float = BAND_HI) -> DataFrame:
    """Blend embedding-cosine into p_match for the borderline band only.

    ``embeddings``: (url, embedding). Two joins co-locate the vectors on the
    pair row; everything else is native arithmetic. Pairs outside the band
    pass through untouched (the reference's mask semantics).
    """
    cold = scored.where(~F.col("p_match").between(lo, hi))
    warm = scored.where(F.col("p_match").between(lo, hi))
    ea = embeddings.select(F.col("url").alias("url_a"), F.col("embedding").alias("emb_a"))
    eb = embeddings.select(F.col("url").alias("url_b"), F.col("embedding").alias("emb_b"))
    reranked = (
        warm.join(ea, "url_a", "left").join(eb, "url_b", "left")
        .withColumn(
            "rerank_score",
            F.when(F.col("emb_a").isNotNull() & F.col("emb_b").isNotNull(),
                   (cosine_col(F.col("emb_a"), F.col("emb_b")) + 1.0) / 2.0)
             .otherwise(F.col("p_match")),
        )
        .withColumn("p_match", F.round(BLEND_OLD * F.col("p_match")
                                       + BLEND_NEW * F.col("rerank_score"), 6))
        .drop("emb_a", "emb_b", "rerank_score")
    )
    return cold.unionByName(reranked)


def with_evidence_json(scored: DataFrame, feature_weights: dict[str, float]) -> DataFrame:
    """Evidence column (D4): JSON of per-feature weighted contributions
    sorted by |contribution| desc — array_sort of structs, zero Python."""
    contribs = F.array(*[
        F.struct(
            F.round(-F.abs(F.col(c) * w), 6).alias("neg_abs"),  # sort key
            F.lit(c).alias("feature"),
            F.round(F.col(c) * w, 6).alias("contribution"),
        )
        for c, w in feature_weights.items()
    ])
    top = F.slice(F.array_sort(contribs), 1, 5)
    return scored.withColumn(
        "evidence",
        F.to_json(F.transform(top, lambda s: F.struct(
            s.getField("feature").alias("feature"),
            s.getField("contribution").alias("contribution"),
        ))),
    )


def classify_match_type(decided: DataFrame, role_col: str = "role") -> DataFrame:
    """Match-type classification (D2,
    /root/reference/src/decisioning.py:112-131): role → match_type chain."""
    r = F.upper(F.coalesce(F.col(role_col), F.lit("")))
    return decided.withColumn(
        "match_type",
        F.when(r == "GUO", "GUO")
         .when(r == "BRANCH", "BRANCH")
         .when(r.isin("SUB", "SUBSIDIARY"), "SUBSIDIARY")
         .otherwise("LEGAL_ENTITY"),
    )


def list_overlap_features(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Shared-list overlap features (F14,
    /root/reference/src/investor_linkage.py:29-140): both columns hold
    delimiter-separated name lists ("a, b and c"); output exact-overlap
    count, Jaccard, and coverage of the smaller list — all native (the
    reference's per-row loop applier becomes column expressions)."""
    def toks(c):
        parts = F.split(F.lower(F.coalesce(F.col(c), F.lit(""))),
                        r"\s*(,|\||\band\b)\s*")
        cleaned = F.transform(
            parts, lambda p: F.trim(F.regexp_replace(p, r"[^a-z0-9 ]", " ")))
        return F.array_distinct(F.filter(cleaned, lambda p: F.length(p) > 1))

    a, b = toks(col_a), toks(col_b)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    smaller = F.least(F.size(a), F.size(b)).cast("double")
    return df.select(
        "*",
        F.size(F.array_intersect(a, b)).alias("overlap_count"),
        F.round(F.when(union > 0, inter / union).otherwise(0.0), 6)
         .alias("overlap_jaccard"),
        F.round(F.when(smaller > 0, inter / smaller).otherwise(0.0), 6)
         .alias("overlap_coverage"),
    )


def apply_investor_guardrails(matches: DataFrame,
                              promote_threshold: float = 0.3,
                              coverage_col: str = "investor_cb_coverage",
                              has_data_col: str = "has_investor_data") -> DataFrame:
    """Post-decision investor guardrails (D6,
    /root/reference/src/investor_linkage.py:205-260): tier-B/C matches with
    investor coverage ≥ threshold are marked 'promoted'; tier-A matches
    that have investor data but ZERO overlap are marked 'flagged' (for the
    review queue). Like the reference, the adjustment column records the
    action without mutating the tier. Disjoint masks → one when() chain.
    """
    cov = F.coalesce(F.col(coverage_col).cast("double"), F.lit(0.0))
    has = F.coalesce(F.col(has_data_col).cast("boolean"), F.lit(False))
    return matches.withColumn(
        "investor_adjustment",
        F.when((cov >= promote_threshold) & F.col("tier").isin("B", "C"),
               "promoted")
         .when((F.col("tier") == "A") & has & (cov == 0.0), "flagged")
         .otherwise("none"),
    )


def review_queue(decided: DataFrame) -> DataFrame:
    """Review-queue selection (D5): tier C, conflicts, or crowded groups."""
    return decided.where(
        (F.col("tier") == "C") | F.col("conflict") | (F.col("n_alternatives") > 3)
    )
