"""Weak supervision (M1) + evaluation statistics (E5/E6) — all native.

The reference's Snorkel-style label model applies per-row Python rules and a
weighted vote (/root/reference/src/modeling.py:102-336). Here every rule is
a Column expression producing a vote in {-1, 0, +1}; the label model is
column arithmetic — no per-row Python, no Snorkel dependency.

Wilson confidence intervals (src/evaluation.py:320-354) are a closed-form
expression over aggregated counts, computed as native columns (the reference
calls scipy on the driver; the formula needs only sqrt).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LabelRule:
    """A labeling function: vote +1/-1 when `when` holds, else abstain 0."""
    name: str
    when: Column
    vote: int
    weight: float = 1.0

    def col(self) -> Column:
        return F.when(self.when, F.lit(self.vote)).otherwise(F.lit(0)) \
                .alias(f"vote_{self.name}")


def apply_rules(df: DataFrame, rules: list[LabelRule]) -> DataFrame:
    """Adds one vote column per rule plus weighted/majority aggregate labels.

    weighted_score = Σ weight_i · vote_i / Σ |weight_i over non-abstains|
    majority_label = sign of the unweighted vote sum (0 → abstain/null).
    """
    out = df.select("*", *[r.col() for r in rules])
    wsum = None
    wnorm = None
    vsum = None
    for r in rules:
        v = F.col(f"vote_{r.name}")
        term = v.cast("double") * r.weight
        absw = F.when(v != 0, F.lit(abs(r.weight))).otherwise(F.lit(0.0))
        wsum = term if wsum is None else wsum + term
        wnorm = absw if wnorm is None else wnorm + absw
        vsum = v if vsum is None else vsum + v
    out = out.withColumn(
        "weighted_score",
        F.round(F.when(wnorm > 0, wsum / wnorm).otherwise(F.lit(0.0)), 6),
    )
    return out.withColumn(
        "majority_label",
        F.when(vsum > 0, 1).when(vsum < 0, 0).otherwise(F.lit(None).cast("int")),
    )


def wilson_bounds(pos: Column, n: Column, z: float = 1.959963984540054) -> list[Column]:
    """Wilson score interval (lower, upper) as native expressions.

    z defaults to the two-sided 95% quantile (what scipy's norm.ppf(0.975)
    returns; hard-coded so no scipy dependency).
    """
    nn = n.cast("double")
    p = pos.cast("double") / nn
    z2 = z * z
    denom = 1.0 + z2 / nn
    center = p + z2 / (2.0 * nn)
    margin = z * F.sqrt(p * (1.0 - p) / nn + z2 / (4.0 * nn * nn))
    lower = F.round(F.greatest((center - margin) / denom, F.lit(0.0)), 6)
    upper = F.round(F.least((center + margin) / denom, F.lit(1.0)), 6)
    return [lower.alias("wilson_lower"), upper.alias("wilson_upper")]


def tier_precision_with_ci(joined: DataFrame, tier_col: str = "tier",
                           label_col: str = "label") -> DataFrame:
    """Per-tier precision vs labels with Wilson CI (E1+E5,
    /root/reference/src/evaluation.py:29-72, 320-354)."""
    agg = joined.groupBy(tier_col).agg(
        F.count("*").alias("n"),
        F.sum(F.col(label_col).cast("int")).alias("n_pos"),
    )
    return agg.select(
        tier_col,
        "n", "n_pos",
        F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias("precision"),
        *wilson_bounds(F.col("n_pos"), F.col("n")),
    )
