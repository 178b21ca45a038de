"""Model lifecycle + evaluation library tests: isotonic calibration makes
tier-A precision live up to its nominal threshold, the scorer package
round-trips through save/load byte-identically, the ablation harness runs,
and FP/FN exemplars + hard-negative sampling are deterministic."""

import pyspark.sql.functions as F
import pytest

from entity_resolution_pipeline_spark.operators.modeling import (
    apply_calibration, fit_isotonic, holdout_report, load_scorer_package,
    run_feature_ablation, save_scorer_package,
)
from entity_resolution_pipeline_spark.operators.scoring import (
    TIER_A, apply_gbt, assign_tiers, compute_features, page_attrs, train_gbt,
)
from entity_resolution_pipeline_spark.plans.evaluation import (
    error_exemplars, hard_negative_sample, mine_labeled_pairs,
    stratified_label_sample,
)
from entity_resolution_pipeline_spark.plans.pipeline import (
    PipelineConfig, stage_blocks, stage_extract, stage_pairs,
)


@pytest.fixture(scope="module")
def scored_labeled(spark, fixtures):
    """GBT-scored candidate pairs with golden labels (library-mined)."""
    extracted = stage_extract(fixtures["pages"])
    cfg = PipelineConfig(hot_threshold=32, n_salts=4)
    salted = stage_blocks(extracted, cfg, n_docs=fixtures["pages"].count())
    pairs = stage_pairs(salted, cfg)
    feats = compute_features(pairs, page_attrs(extracted.select("url", "text_norm")))
    labeled = mine_labeled_pairs(feats, fixtures["golden_clusters"]).persist()
    asm, model = train_gbt(labeled, seed=42)
    scored = apply_gbt(labeled, asm, model)
    return scored.persist(), asm, model


def test_isotonic_calibration_tier_a_precision(spark, scored_labeled):
    scored, _, _ = scored_labeled
    iso = fit_isotonic(scored)
    cal = apply_calibration(scored, iso)
    # calibrated probabilities stay in [0,1] and are monotone in the raw score
    mm = cal.agg(F.min("p_calibrated"), F.max("p_calibrated")).collect()[0]
    assert 0.0 <= mm[0] and mm[1] <= 1.0
    pairs2 = (
        cal.select("p_match", "p_calibrated").distinct()
        .orderBy("p_match").collect()
    )
    for prev, cur in zip(pairs2, pairs2[1:]):
        assert cur["p_calibrated"] >= prev["p_calibrated"] - 1e-9
    # the point of calibrating: tier A assigned on p_calibrated must achieve
    # >= its nominal precision on the labels (the reference's Tier-A 98.2%)
    tiers = assign_tiers(cal.withColumn("p_match", F.col("p_calibrated")))
    a = tiers.where(F.col("tier") == "A").agg(
        F.count("*").alias("n"),
        F.sum(F.col("label").cast("int")).alias("pos")).collect()[0]
    assert a["n"] > 0
    assert a["pos"] / a["n"] >= TIER_A


def test_scorer_package_roundtrip(spark, scored_labeled, tmp_root):
    scored, asm, model = scored_labeled
    iso = fit_isotonic(scored)
    path = f"{tmp_root}/scorer_pkg"
    save_scorer_package(path, asm, model, iso)
    asm2, model2, iso2, manifest = load_scorer_package(path)
    assert manifest["has_calibrator"] is True
    feats = scored.drop("p_match")
    before = apply_calibration(apply_gbt(feats, asm, model), iso)
    after = apply_calibration(apply_gbt(feats, asm2, model2), iso2)
    key = [F.sum(F.round(F.col(c) * 1e6).cast("long")) for c in
           ("p_match", "p_calibrated")]
    assert before.agg(*key).collect() == after.agg(*key).collect()


def test_holdout_report_and_ablation(spark, scored_labeled):
    scored, _, _ = scored_labeled
    rep = holdout_report(scored, threshold=0.5)
    assert rep["n"] > 100 and rep["f1"] > 0.9 and 0.9 < rep["auc"] <= 1.0
    labeled = scored.drop("p_match")
    runs = run_feature_ablation(labeled, labeled, threshold=0.5, seed=42)
    assert runs[0]["dropped"] == "none" and runs[0]["delta_f1"] == 0.0
    from entity_resolution_pipeline_spark.operators.scoring import FEATURE_COLS
    assert len(runs) == len(FEATURE_COLS) + 1  # full + one per feature
    # dropping the dominant feature must not *improve* F1
    tj = next(r for r in runs if r["dropped"] == "token_jaccard")
    assert tj["delta_f1"] <= 0.0


def test_error_exemplars_deterministic(spark, scored_labeled):
    scored, _, _ = scored_labeled
    ex1 = [tuple(r) for r in error_exemplars(scored, n=10).collect()]
    ex2 = [tuple(r) for r in error_exemplars(scored, n=10).collect()]
    assert sorted(ex1) == sorted(ex2)
    for r in error_exemplars(scored, n=10).collect():
        if r["kind"] == "FP":
            assert r["label"] == 0 and r["p_match"] >= 0.5
        else:
            assert r["label"] == 1 and r["p_match"] < 0.5


def test_hard_negative_and_stratified_samplers(spark, scored_labeled):
    scored, _, _ = scored_labeled
    hn = hard_negative_sample(scored, n=25)
    rows = hn.collect()
    assert len(rows) == 25
    assert all(r["label"] == 0 for r in rows)
    scores = [r["p_match"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    strat = stratified_label_sample(
        scored.withColumn("label", F.col("label").cast("string")),
        "label", {"0": 0.5, "1": 1.0}, seed=42)
    c1 = strat.count()
    assert 0 < c1 < scored.count()
    c2 = stratified_label_sample(
        scored.withColumn("label", F.col("label").cast("string")),
        "label", {"0": 0.5, "1": 1.0}, seed=42).count()
    assert c1 == c2
