"""Learned scorer path (F13/M2-M4): GBT trained on labeled fixture pairs,
applied via broadcast transform; must reach the same F1 gate as the
heuristic scorer on the planted clusters."""

import os

import pyspark.sql.functions as F
import pytest

from entity_resolution_pipeline_spark.operators.clustering import assign_clusters
from entity_resolution_pipeline_spark.operators.scoring import (
    FEATURE_COLS, apply_gbt, compute_features, match_edges, page_attrs, train_gbt,
)
from entity_resolution_pipeline_spark.plans.evaluation import pairwise_metrics
from entity_resolution_pipeline_spark.plans.pipeline import (
    PipelineConfig, stage_blocks, stage_extract, stage_pairs,
)


@pytest.fixture(scope="module")
def features_and_labels(spark, fixtures):
    extracted = stage_extract(fixtures["pages"])
    cfg = PipelineConfig(hot_threshold=32, n_salts=4)
    salted = stage_blocks(extracted, cfg, n_docs=fixtures["pages"].count())
    pairs = stage_pairs(salted, cfg)
    feats = compute_features(pairs, page_attrs(extracted.select("url", "text_norm")))
    # hard-negative mining (M2, /root/reference/src/modeling.py:393-479):
    # few labeled negatives survive blocking, so candidate pairs straddling
    # two golden clusters become mined negatives; same-cluster pairs positive
    golden = fixtures["golden_clusters"]
    ga = golden.select(F.col("url").alias("url_a"), F.col("cluster_id").alias("c_a"))
    gb = golden.select(F.col("url").alias("url_b"), F.col("cluster_id").alias("c_b"))
    train = (
        feats.join(ga, "url_a").join(gb, "url_b")
        .withColumn("label", (F.col("c_a") == F.col("c_b")).cast("int"))
        .drop("c_a", "c_b")
    )
    return feats, train, extracted


def test_gbt_scorer_hits_f1_gate(spark, fixtures, features_and_labels):
    feats, train, extracted = features_and_labels
    assert train.where("label = 1").count() > 50
    assert train.where("label = 0").count() > 50
    asm, model = train_gbt(train, seed=42)
    scored = apply_gbt(feats, asm, model)
    assert set(FEATURE_COLS) <= set(scored.columns)
    clusters = assign_clusters(extracted.select("url"),
                               match_edges(scored, threshold=0.5))
    m = pairwise_metrics(clusters, fixtures["labeled_pairs"])
    assert m.f1 >= 0.99, (m.tp, m.fp, m.fn)


def test_gbt_extended_features_hits_f1_gate(spark, fixtures, features_and_labels):
    """F5/F2/F7: acronym_match, token_sort_ratio, and the pair-level geo
    features ride in compute_features; a GBT trained on the extended feature
    set must still clear the gate (geo features are constant 0.0 on a corpus
    with no location column — the model must tolerate them)."""
    from entity_resolution_pipeline_spark.operators.scoring import (
        EXTENDED_FEATURE_COLS,
    )

    feats, train, extracted = features_and_labels
    for col in ("acronym_match", "token_sort_ratio",
                "country_match", "city_similarity"):
        assert col in feats.columns
        assert col in EXTENDED_FEATURE_COLS
    asm, model = train_gbt(train, seed=42, feature_cols=EXTENDED_FEATURE_COLS)
    scored = apply_gbt(feats, asm, model)
    clusters = assign_clusters(extracted.select("url"),
                               match_edges(scored, threshold=0.5))
    m = pairwise_metrics(clusters, fixtures["labeled_pairs"])
    assert m.f1 >= 0.99, (m.tp, m.fp, m.fn)


def test_gbt_probabilities_bounded_and_deterministic(spark, features_and_labels):
    feats, train, _ = features_and_labels
    asm, model = train_gbt(train, seed=42)
    s1 = apply_gbt(feats, asm, model).agg(
        F.min("p_match"), F.max("p_match"),
        F.sum(F.round(F.col("p_match") * 1000).cast("long"))).collect()[0]
    assert 0.0 <= s1[0] and s1[1] <= 1.0
    asm2, model2 = train_gbt(train, seed=42)
    s2 = apply_gbt(feats, asm2, model2).agg(
        F.min("p_match"), F.max("p_match"),
        F.sum(F.round(F.col("p_match") * 1000).cast("long"))).collect()[0]
    assert tuple(s1) == tuple(s2)  # same seed → same model → same scores
