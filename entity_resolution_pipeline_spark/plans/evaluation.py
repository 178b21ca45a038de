"""Pairwise evaluation vs labeled pairs (E2, north-rule gate F1 ≥ 0.99).

Predicted positives = labeled pairs whose two urls land in the same
predicted cluster; TP/FP/FN come from one join + conditional aggregates
(reference per-tier evaluation shape, /root/reference/src/evaluation.py:29-72);
F1 is computed on the driver from three counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PairwiseMetrics:
    tp: int
    fp: int
    fn: int

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 0.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def error_exemplars(scored_labeled: DataFrame, n: int = 20,
                    threshold: float = 0.5, score_col: str = "p_match",
                    label_col: str = "label",
                    id_cols: tuple[str, str] = ("url_a", "url_b")) -> DataFrame:
    """Top-N false positives and false negatives for debugging (E7,
    /root/reference/src/evaluation.py:126-187).

    FP = labeled-negative pairs scored above threshold, most confident
    first; FN = labeled-positive pairs below threshold, least confident
    first. Ordering ties break on the id columns so the exemplar list is
    deterministic under any parallelism. Output: (kind, *ids, score,
    label, rank).
    """
    from pyspark.sql import Window

    p = F.col(score_col)
    lab = F.col(label_col).cast("int")
    fp = scored_labeled.where((lab == 0) & (p >= threshold)) \
        .withColumn("kind", F.lit("FP"))
    fn = scored_labeled.where((lab == 1) & (p < threshold)) \
        .withColumn("kind", F.lit("FN"))
    both = fp.unionByName(fn)
    # confidence of the mistake: FP ranked by score desc, FN by score asc —
    # both are |score − label| descending
    wrongness = F.abs(p - lab.cast("double"))
    w = Window.partitionBy("kind").orderBy(F.desc(wrongness),
                                           *[F.asc(c) for c in id_cols])
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("kind", *id_cols, F.round(p, 6).alias(score_col),
                lab.alias(label_col), "rank")
    )


def mine_labeled_pairs(features: DataFrame, golden_clusters: DataFrame,
                       id_cols: tuple[str, str] = ("url_a", "url_b"),
                       cluster_id_col: str = "cluster_id",
                       url_col: str = "url") -> DataFrame:
    """Label candidate pairs from a golden partition (M2/E4 library form,
    /root/reference/src/modeling.py:393-479): pairs inside one golden
    cluster are positives, pairs straddling two clusters are mined hard
    negatives — by construction they co-blocked, so they are exactly the
    negatives a blocking-aware scorer must separate."""
    ia, ib = id_cols
    ga = golden_clusters.select(F.col(url_col).alias(ia),
                                F.col(cluster_id_col).alias("_c_a"))
    gb = golden_clusters.select(F.col(url_col).alias(ib),
                                F.col(cluster_id_col).alias("_c_b"))
    return (
        features.join(ga, ia).join(gb, ib)
        .withColumn("label", (F.col("_c_a") == F.col("_c_b")).cast("int"))
        .drop("_c_a", "_c_b")
    )


def hard_negative_sample(scored_labeled: DataFrame, n: int,
                         score_col: str = "p_match", label_col: str = "label",
                         id_cols: tuple[str, str] = ("url_a", "url_b")) -> DataFrame:
    """The n highest-scoring labeled negatives — boundary-hugging pairs for
    retraining (E4, /root/reference/src/evaluation.py:234-276). Determinism:
    score-desc then id-asc ordering."""
    neg = scored_labeled.where(F.col(label_col).cast("int") == 0)
    return (
        neg.orderBy(F.desc(score_col), *[F.asc(c) for c in id_cols]).limit(n)
    )


def stratified_label_sample(labeled: DataFrame, strata_col: str,
                            fractions: dict, seed: int = 42) -> DataFrame:
    """Seeded per-stratum sampling (E3) — thin wrapper over sampleBy so the
    eval-set construction is library code, not test-fixture code."""
    return labeled.sampleBy(strata_col, fractions, seed=seed)


def pairwise_metrics(clusters: DataFrame, labeled_pairs: DataFrame) -> PairwiseMetrics:
    """clusters(url, cluster_id) × labeled_pairs(url_a,url_b,label)."""
    ca = clusters.select(F.col("url").alias("url_a"), F.col("cluster_id").alias("c_a"))
    cb = clusters.select(F.col("url").alias("url_b"), F.col("cluster_id").alias("c_b"))
    j = (
        labeled_pairs.join(ca, "url_a", "left").join(cb, "url_b", "left")
        .withColumn("pred", (F.col("c_a").isNotNull() & (F.col("c_a") == F.col("c_b"))).cast("int"))
    )
    row = j.agg(
        F.sum(((F.col("pred") == 1) & (F.col("label") == 1)).cast("int")).alias("tp"),
        F.sum(((F.col("pred") == 1) & (F.col("label") == 0)).cast("int")).alias("fp"),
        F.sum(((F.col("pred") == 0) & (F.col("label") == 1)).cast("int")).alias("fn"),
    ).collect()[0]
    return PairwiseMetrics(int(row["tp"] or 0), int(row["fp"] or 0), int(row["fn"] or 0))
