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
