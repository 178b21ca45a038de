"""Incremental ER stream (delta pages vs static corpus): batch equivalence,
batching-invariance, and match recall on the planted fixtures."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.plans.pipeline import stage_extract
from entity_resolution_pipeline_spark.streaming.incremental import (
    corpus_er_state, score_delta_pages_batch, stream_score_delta_pages,
)

PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]


@pytest.fixture(scope="module")
def er_split(spark, fixtures):
    """Hold out one page per multi-member cluster as the crawl delta."""
    pages = fixtures["pages"]
    golden = fixtures["golden_clusters"]
    w = Window.partitionBy("cluster_id").orderBy("url")
    marked = golden.select(
        "url", "cluster_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("cluster_id")).alias("sz"))
    delta_urls = marked.where((F.col("rn") == 1) & (F.col("sz") > 1)) \
        .select("url")
    delta = pages.join(delta_urls, "url").select(*PAGE_COLS)
    corpus = pages.join(delta_urls, "url", "left_anti").select(*PAGE_COLS)
    return corpus, delta, golden


def _rows(df):
    return {(r.url_a, r.url_b, r.blocking_score, r.p_match)
            for r in df.select("url_a", "url_b", "blocking_score",
                               "p_match").collect()}


def test_er_stream_equals_batch_and_recalls_clusters(spark, er_split, tmp_path):
    corpus, delta, golden = er_split
    delta_dir = str(tmp_path / "delta")
    delta.coalesce(1).write.parquet(delta_dir)
    corpus_x = stage_extract(corpus)

    streamed = stream_score_delta_pages(
        spark, delta_dir, corpus_x, sink_dir=str(tmp_path / "sink"))
    got = _rows(streamed)

    blocks, attrs = corpus_er_state(corpus_x)
    want = _rows(score_delta_pages_batch(delta, blocks, attrs))
    for df in (blocks, attrs):
        df.unpersist()
    assert got == want and len(got) > 0

    # semantic gate: ≥90% of held-out pages find a same-cluster corpus
    # partner at the two-phase decision threshold (0.45)
    matches = streamed.where(F.col("p_match") >= 0.45).select(
        F.col("url_a").alias("url"), F.col("url_b").alias("partner"))
    g_a = golden.select(F.col("url"), F.col("cluster_id").alias("c_a"))
    g_b = golden.select(F.col("url").alias("partner"),
                        F.col("cluster_id").alias("c_b"))
    hit = (matches.join(g_a, "url").join(g_b, "partner")
           .where(F.col("c_a") == F.col("c_b"))
           .select("url").distinct().count())
    n_delta = delta.count()
    assert hit / n_delta >= 0.9, f"recall {hit}/{n_delta}"


def test_er_stream_batching_invariant(spark, er_split, tmp_path):
    corpus, delta, _ = er_split
    delta_dir = str(tmp_path / "delta4")
    delta.repartition(4).write.parquet(delta_dir)
    corpus_x = stage_extract(corpus)

    streamed = stream_score_delta_pages(
        spark, delta_dir, corpus_x, sink_dir=str(tmp_path / "sink4"),
        max_files_per_trigger=1)
    got = _rows(streamed)

    blocks, attrs = corpus_er_state(corpus_x)
    want = _rows(score_delta_pages_batch(delta, blocks, attrs))
    for df in (blocks, attrs):
        df.unpersist()
    assert got == want


def test_incremental_e2e_recovers_golden_partition(spark, er_split, tmp_path):
    """Capstone: batch-cluster the corpus, stream the held-out delta, fold
    the delta's match edges into the prior labels — the updated assignment
    must induce exactly the golden partition over all pages."""
    from entity_resolution_pipeline_spark.operators.clustering import (
        assign_clusters, update_clusters,
    )
    from entity_resolution_pipeline_spark.operators.scoring import match_edges

    corpus, delta, golden = er_split
    corpus_x = stage_extract(corpus)

    # prior assignment: batch path over the corpus only
    blocks, attrs = corpus_er_state(corpus_x)
    corpus_pairs = score_delta_pages_batch(corpus, blocks, attrs)
    # (batch-vs-itself probe also emits self pairs url_a == url_b and both
    # orientations; match_edges' src != dst filter in CC handles selves)
    prior = assign_clusters(corpus.select("url"),
                            match_edges(corpus_pairs, 0.45))

    delta_dir = str(tmp_path / "delta_e2e")
    delta.coalesce(1).write.parquet(delta_dir)
    streamed = stream_score_delta_pages(
        spark, delta_dir, corpus_x, sink_dir=str(tmp_path / "sink_e2e"))
    updated = update_clusters(prior, match_edges(streamed, 0.45),
                              new_nodes=delta.select("url"))
    for df in (blocks, attrs):
        df.unpersist()

    # same partition ⟺ same (url set, groupings); cluster ids are min
    # members on both sides, so direct dict equality applies
    got = {r["url"]: r["cluster_id"] for r in updated.collect()}
    want = {r["url"]: r["cluster_id"] for r in golden.collect()}
    assert got == want
