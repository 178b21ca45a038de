"""Embedding stand-in (F15), borderline rerank (F16), evidence JSON (D4),
review queue (D5) — Spark-plumbing tests with deterministic encoders."""

import json

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.functions.embeddings import (
    embed_text, hash_embedding_col,
)
from entity_resolution_pipeline_spark.operators.rerank import (
    rerank_borderline, review_queue, with_evidence_json,
)
from entity_resolution_pipeline_spark.functions.similarity import cosine_col


def test_embed_text_deterministic_and_normalized(spark):
    df = spark.createDataFrame(
        [("u1", "alpha bravo charlie"), ("u2", "alpha bravo charlie"),
         ("u3", "totally different words here")],
        ["url", "text_norm"])
    emb = embed_text(df, dim=32)
    rows = {r.url: r.embedding for r in emb.collect()}
    assert rows["u1"] == rows["u2"]            # same text → same vector
    assert len(rows["u1"]) == 32
    assert abs(sum(x * x for x in rows["u1"]) - 1.0) < 1e-3  # L2-normalized
    # cosine of identical texts is 1, unrelated much lower
    pairs = spark.createDataFrame(
        [(rows["u1"], rows["u2"]), (rows["u1"], rows["u3"])], ["a", "b"])
    cos = [r[0] for r in pairs.select(F.round(cosine_col(F.col("a"), F.col("b")), 4)).collect()]
    assert cos[0] > 0.999 and cos[1] < 0.9


def test_native_hash_embedding_matches_shape(spark):
    df = spark.createDataFrame([("alpha bravo",), ("",)], ["t"])
    out = df.select(hash_embedding_col(F.col("t"), dim=8).alias("e")).collect()
    assert len(out[0]["e"]) == 8
    assert abs(sum(x * x for x in out[0]["e"]) - 1.0) < 1e-3
    assert out[1]["e"] == [0.0] * 8            # empty text → zero vector


def test_rerank_only_touches_borderline(spark):
    scored = spark.createDataFrame(
        [("a", "b", 0.99), ("c", "d", 0.50), ("e", "f", 0.10)],
        ["url_a", "url_b", "p_match"])
    # c/d must have nonzero, non-orthogonal cosine — orthogonal vectors give
    # rerank 0.5 and the blend lands exactly back on 0.5
    pages = spark.createDataFrame(
        [(u, "same text for both") for u in ["a", "b", "e", "f"]]
        + [("c", "alpha beta gamma delta"), ("d", "alpha beta other words")],
        ["url", "text_norm"])
    emb = embed_text(pages, dim=16)
    out = {(r.url_a, r.url_b): r.p_match
           for r in rerank_borderline(scored, emb).collect()}
    assert out[("a", "b")] == 0.99             # above band: untouched
    assert out[("e", "f")] == 0.10             # below band: untouched
    assert out[("c", "d")] != 0.50             # in band: blended


def test_evidence_json_top_contributions(spark):
    df = spark.createDataFrame([(0.9, 0.1, 1.0)], ["token_jaccard", "jw", "dom"])
    out = with_evidence_json(df, {"token_jaccard": 0.55, "jw": 0.2, "dom": 0.05})
    ev = json.loads(out.collect()[0]["evidence"])
    assert ev[0]["feature"] == "token_jaccard"  # largest |contribution| first
    assert abs(ev[0]["contribution"] - 0.495) < 1e-6
    assert len(ev) == 3


def test_review_queue_selection(spark):
    df = spark.createDataFrame(
        [("x", "A", False, 0), ("y", "C", False, 0), ("z", "A", True, 0),
         ("w", "B", False, 5)],
        ["url", "tier", "conflict", "n_alternatives"])
    picked = {r.url for r in review_queue(df).collect()}
    assert picked == {"y", "z", "w"}
