"""Pair-level geo features (F7) — reference semantics
/root/reference/src/features.py:232-260: country_match is upper-equality
with missing→0.0; city_similarity is 1.0 on exact lower/trim equality,
else whitespace-token Jaccard, missing→0.0."""

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.functions.geo import (
    city_similarity_col, country_match_col,
)

CASES = [
    # (country_a, country_b, expected_country_match,
    #  city_a, city_b, expected_city_similarity)
    ("US", "us", 1.0, "New York", "new york", 1.0),       # case-insensitive
    ("US", "GB", 0.0, "New York City", "New York", 2 / 3),  # token overlap
    (None, "US", 0.0, None, "Paris", 0.0),                # missing side
    ("  ", "US", 0.0, " ", "Paris", 0.0),                 # blank side
    ("DE", "DE", 1.0, "San Francisco", "Los Angeles", 0.0),  # disjoint city
    ("FR", "FR", 1.0, "St Denis", "St Cloud", 1 / 3),     # partial overlap
]


def test_geo_pair_feature_semantics(spark):
    df = spark.createDataFrame(
        [(ca, cb, cm, ta, tb, cs) for ca, cb, cm, ta, tb, cs in CASES],
        "ca string, cb string, want_cm double, ta string, tb string, want_cs double",
    )
    out = df.select(
        "want_cm", "want_cs",
        country_match_col(F.col("ca"), F.col("cb")).alias("cm"),
        city_similarity_col(F.col("ta"), F.col("tb")).alias("cs"),
    ).collect()
    for r in out:
        assert abs(r["cm"] - r["want_cm"]) < 1e-12, r
        assert abs(r["cs"] - r["want_cs"]) < 1e-12, r


def test_two_phase_keep_list_carries_extended_features(spark):
    """The two-phase scorer's output must carry token_sort_ratio (band-only,
    NULL for cold rows) and the native geo pair features."""
    from entity_resolution_pipeline_spark.operators.scoring import (
        page_attrs, score_pairs_two_phase,
    )

    pages = spark.createDataFrame(
        [("u1", "alpha beta gamma"), ("u2", "alpha beta gamma"),
         ("u3", "zeta eta theta")],
        "url string, text_norm string",
    )
    attrs = page_attrs(pages)
    pairs = spark.createDataFrame(
        [("u1", "u2", 2), ("u1", "u3", 1)],
        "url_a string, url_b string, blocking_score int",
    )
    out = score_pairs_two_phase(pairs, attrs, threshold=0.45)
    for col in ("token_sort_ratio", "country_match", "city_similarity"):
        assert col in out.columns
    rows = {(r["url_a"], r["url_b"]): r for r in out.collect()}
    # no location column on this corpus → geo features are exactly 0.0
    for r in rows.values():
        assert r["country_match"] == 0.0
        assert r["city_similarity"] == 0.0
    # (u1,u2) identical text → p_base far above threshold → cold row → NULL
    assert rows[("u1", "u2")]["token_sort_ratio"] is None
