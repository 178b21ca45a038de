"""Model lifecycle beyond raw GBT training (M4/M5/S12): isotonic
calibration, artifact persistence, holdout reporting, ablation harness.

Reference analogs:
  * isotonic calibration — CalibratedClassifierCV(method='isotonic', cv=5),
    /root/reference/src/modeling.py:565-576. Tier thresholds (A .98 / B .93
    / C .75) are statements about *probabilities*; raw GBT margins are not
    calibrated, so tiers assigned on them are arbitrary. Here the
    calibrator is ``pyspark.ml.regression.IsotonicRegression`` — Spark's
    distributed pool-adjacent-violators — and application is the fitted
    model's transform: a broadcast piecewise-constant/linear lookup, zero
    Python in the row path.
  * model package save/load — /root/reference/src/modeling.py:605-659
    (joblib dump of model + calibrator + feature list). Here spark.ml
    native ``.save()/.load()`` per stage plus a tiny JSON manifest.
  * holdout report — /root/reference/src/modeling.py:520-563 (P/R/F1/AUC
    on a held-out split).
  * ablation harness — /root/reference/src/research_analytics.py:431-551
    (drop one component, retrain, report delta).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scoring import FEATURE_COLS, apply_gbt, train_gbt


# ---- isotonic calibration (M4) -----------------------------------------------


def fit_isotonic(scored_labeled: DataFrame, score_col: str = "p_match",
                 label_col: str = "label"):
    """Fit a monotone score→probability map on held-out labeled pairs.

    Distributed PAV via spark.ml IsotonicRegression; the fitted model holds
    the boundary/prediction arrays (piecewise-linear interpolation between
    them) and broadcasts them inside ``transform`` — scoring 10^12 rows
    costs one narrow projection.
    """
    from pyspark.ml.regression import IsotonicRegression

    iso = IsotonicRegression(
        featuresCol="_cal_feat", labelCol=label_col, predictionCol="p_calibrated",
    )
    data = scored_labeled.select(
        F.col(score_col).cast("double").alias("_cal_feat"),
        F.col(label_col).cast("double").alias(label_col),
    )
    return iso.fit(data)


def apply_calibration(scored: DataFrame, iso_model,
                      score_col: str = "p_match") -> DataFrame:
    """Adds ``p_calibrated`` via the broadcast isotonic lookup."""
    out = iso_model.transform(
        scored.withColumn("_cal_feat", F.col(score_col).cast("double")))
    return out.withColumn("p_calibrated",
                          F.round(F.col("p_calibrated"), 6)).drop("_cal_feat")


# ---- model package persistence (S12) -----------------------------------------


def save_scorer_package(path: str, asm, model, iso_model=None,
                        feature_cols: list[str] | None = None) -> None:
    """Persist assembler + GBT (+ optional calibrator) + manifest.

    Native spark.ml writers — the artifact layout any Spark deployment can
    read back with ``load_scorer_package`` and resume scoring byte-for-byte
    (the resume analog of the reference's joblib model package).
    """
    asm.write().overwrite().save(os.path.join(path, "assembler"))
    model.write().overwrite().save(os.path.join(path, "gbt"))
    manifest = {
        "feature_cols": feature_cols or FEATURE_COLS,
        "has_calibrator": iso_model is not None,
        "model_type": type(model).__name__,
    }
    if iso_model is not None:
        iso_model.write().overwrite().save(os.path.join(path, "isotonic"))
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)


def load_scorer_package(path: str):
    """Returns (asm, model, iso_model_or_None, manifest)."""
    from pyspark.ml.classification import GBTClassificationModel
    from pyspark.ml.feature import VectorAssembler

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    asm = VectorAssembler.load(os.path.join(path, "assembler"))
    model = GBTClassificationModel.load(os.path.join(path, "gbt"))
    iso = None
    if manifest.get("has_calibrator"):
        from pyspark.ml.regression import IsotonicRegressionModel

        iso = IsotonicRegressionModel.load(os.path.join(path, "isotonic"))
    return asm, model, iso, manifest


# ---- holdout report (M4) -----------------------------------------------------


def holdout_report(scored_labeled: DataFrame, threshold: float = 0.5,
                   score_col: str = "p_match",
                   label_col: str = "label") -> dict:
    """P / R / F1 at ``threshold`` plus ROC AUC on a held-out labeled set.

    Counts come from one conditional aggregate; AUC from spark.ml's
    distributed BinaryClassificationEvaluator (no sklearn)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    pred = (F.col(score_col) >= threshold).cast("int")
    lab = F.col(label_col).cast("int")
    row = scored_labeled.agg(
        F.count("*").alias("n"),
        F.sum(((pred == 1) & (lab == 1)).cast("int")).alias("tp"),
        F.sum(((pred == 1) & (lab == 0)).cast("int")).alias("fp"),
        F.sum(((pred == 0) & (lab == 1)).cast("int")).alias("fn"),
    ).collect()[0]
    tp, fp, fn = int(row["tp"] or 0), int(row["fp"] or 0), int(row["fn"] or 0)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    ev = BinaryClassificationEvaluator(
        rawPredictionCol="_auc_score", labelCol="_auc_label",
        metricName="areaUnderROC")
    auc = ev.evaluate(scored_labeled.select(
        F.col(score_col).cast("double").alias("_auc_score"),
        F.col(label_col).cast("double").alias("_auc_label")))
    return {"n": int(row["n"]), "tp": tp, "fp": fp, "fn": fn,
            "precision": round(precision, 6), "recall": round(recall, 6),
            "f1": round(f1, 6), "auc": round(auc, 6)}


# ---- ablation harness (M5) ---------------------------------------------------


def run_feature_ablation(train_features: DataFrame, eval_features: DataFrame,
                         label_col: str = "label", threshold: float = 0.5,
                         feature_cols: list[str] | None = None,
                         seed: int = 42) -> list[dict]:
    """Leave-one-feature-out retrain loop (the reference's component
    ablation, /root/reference/src/research_analytics.py:431-551).

    Returns one dict per run: {'dropped', 'f1', 'precision', 'recall',
    'delta_f1'} with run 'none' (full feature set) first. The loop is
    driver-side over ≤|features| retrains — each fit/score is distributed;
    only the tiny metric rows come back.
    """
    feature_cols = feature_cols or FEATURE_COLS
    results: list[dict] = []
    base_f1 = None
    for dropped in [None, *feature_cols]:
        cols = [c for c in feature_cols if c != dropped]
        asm, model = train_gbt(train_features, label_col=label_col, seed=seed,
                               feature_cols=cols)
        scored = apply_gbt(eval_features.drop(label_col), asm, model)
        rep = holdout_report(scored.join(
            train_features.select("url_a", "url_b", label_col),
            ["url_a", "url_b"]), threshold=threshold, label_col=label_col)
        if dropped is None:
            base_f1 = rep["f1"]
        results.append({
            "dropped": dropped or "none",
            "f1": rep["f1"], "precision": rep["precision"],
            "recall": rep["recall"],
            "delta_f1": round(rep["f1"] - base_f1, 6),
        })
    return results
