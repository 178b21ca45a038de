"""Two-phase scoring must be decision-equivalent to full scoring: the JW
term is bounded, so skipping it outside the borderline band cannot flip any
match/no-match decision at the threshold."""

from entity_resolution_pipeline_spark.operators.scoring import (
    compute_features, heuristic_score, match_edges, page_attrs,
    score_pairs_two_phase,
)
from entity_resolution_pipeline_spark.plans.pipeline import (
    PipelineConfig, stage_blocks, stage_extract, stage_pairs,
)

THRESHOLD = 0.45


def test_two_phase_same_match_edges(spark, fixtures):
    extracted = stage_extract(fixtures["pages"])
    cfg = PipelineConfig(hot_threshold=32, n_salts=4)
    salted = stage_blocks(extracted, cfg, n_docs=fixtures["pages"].count())
    pairs = stage_pairs(salted, cfg)
    attrs = page_attrs(extracted.select("url", "text_norm"))

    full = heuristic_score(compute_features(pairs, attrs))
    fast = score_pairs_two_phase(pairs, attrs, threshold=THRESHOLD)

    e_full = match_edges(full, THRESHOLD).select("src", "dst")
    e_fast = match_edges(fast, THRESHOLD).select("src", "dst")
    assert e_full.exceptAll(e_fast).count() == 0
    assert e_fast.exceptAll(e_full).count() == 0
