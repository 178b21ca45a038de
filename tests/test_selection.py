"""DSIR importance resampling (operators/selection.py) + quality-aware
dedup keeper (operators/dedup.py:fuzzy_dedup_quality_keeper)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.operators.selection import (
    dsir_bucket_counts, dsir_log_ratio, dsir_select, dsir_weights,
    ngram_instances,
)

SF_TINY = "/root/testdata/sf0.001"
TARGET_SOURCES = ("src0", "src1")
B = 64


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_TINY, "documents.parquet"))


@pytest.fixture(scope="module")
def fitted(docs):
    target = docs.where(F.col("source").isin(*TARGET_SOURCES))
    lr = dsir_log_ratio(docs, target, n_buckets=B)
    w = dsir_weights(docs, lr, n_buckets=B)
    return lr, w


def test_ngram_instances_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, None)],
        "doc_id long, text string")
    got = {(r.doc_id, r.gram)
           for r in ngram_instances(df).collect()}
    assert got == {(1, "a"), (1, "b"), (1, "c"), (1, "a b"), (1, "b c"),
                   (2, "solo")}


def test_log_ratio_table_is_complete_and_scalar_consistent(docs, fitted):
    """Every bucket 0..B-1 has a ratio; spot-check one bucket against a
    scalar recomputation from the raw counts (add-one smoothing)."""
    lr, _ = fitted
    rows = {r.bucket: r.ratio_micro for r in lr.collect()}
    assert set(rows) == set(range(B))

    target = docs.where(F.col("source").isin(*TARGET_SOURCES))
    t = {r.bucket: r.cnt
         for r in dsir_bucket_counts(target, n_buckets=B).collect()}
    r_ = {r.bucket: r.cnt
          for r in dsir_bucket_counts(docs, n_buckets=B).collect()}
    t_tot, r_tot = sum(t.values()), sum(r_.values())
    for b in (0, B // 2, B - 1):
        want = round(
            math.log((t.get(b, 0) + 1.0) / (t_tot + float(B)))
            - math.log((r_.get(b, 0) + 1.0) / (r_tot + float(B))), 6)
        assert rows[b] == round(want * 1000000)


def test_weights_cover_corpus_and_empty_doc_is_zero(spark, fitted):
    lr, w = fitted
    assert w.where(F.col("weight_micro").isNull()).count() == 0
    empty = spark.createDataFrame([(999999, "")], "doc_id long, text string")
    got = dsir_weights(empty, lr, n_buckets=B).collect()
    assert got[0].weight_micro == 0


def test_select_topk_is_weight_order_and_gumbel_reranks(docs):
    target = docs.where(F.col("source").isin(*TARGET_SOURCES))
    topk = dsir_select(docs, target, k=25, n_buckets=B,
                       method="topk").collect()
    assert len(topk) == 25
    assert [r.rank for r in topk] == list(range(1, 26))
    # topk: score IS the weight, ordered desc (ties by id)
    assert all(r.score_micro == r.weight_micro for r in topk)
    scores = [r.score_micro for r in topk]
    assert scores == sorted(scores, reverse=True)

    g = dsir_select(docs, target, k=25, n_buckets=B,
                    method="gumbel").collect()
    assert len(g) == 25
    assert all(r.score_micro != r.weight_micro for r in g)  # noise added
    # deterministic: same call, same result
    g2 = dsir_select(docs, target, k=25, n_buckets=B,
                     method="gumbel").collect()
    assert [(r.doc_id, r.score_micro) for r in g] == \
        [(r.doc_id, r.score_micro) for r in g2]


def test_select_enriches_target_sources(docs):
    """The selection must actually steer toward the target distribution:
    target-source docs are over-represented in the top-k relative to
    their corpus base rate."""
    target = docs.where(F.col("source").isin(*TARGET_SOURCES))
    n, nt = docs.count(), target.count()
    sel = dsir_select(docs, target, k=max(nt, 10), n_buckets=B,
                      method="topk")
    hit = (sel.join(docs.select("doc_id", "source"), "doc_id")
           .where(F.col("source").isin(*TARGET_SOURCES)).count())
    base_rate = nt / n
    assert hit / sel.count() > base_rate


def test_stream_dsir_equals_batch_and_batching_invariant(
        spark, docs, fitted, tmp_path):
    from entity_resolution_pipeline_spark.streaming.incremental import (
        stream_dsir_select,
    )
    lr, w = fitted
    want = {(r.doc_id, r.weight_micro, r.weight_micro > 0)
            for r in w.collect()}

    one = str(tmp_path / "delta1")
    docs.coalesce(1).write.parquet(one)
    got1 = {(r.doc_id, r.weight_micro, r.keep)
            for r in stream_dsir_select(
                spark, one, lr, sink_dir=str(tmp_path / "s1")).collect()}
    assert got1 == want

    many = str(tmp_path / "delta4")
    docs.repartition(4).write.parquet(many)
    got4 = {(r.doc_id, r.weight_micro, r.keep)
            for r in stream_dsir_select(
                spark, many, lr, max_files_per_trigger=1,
                sink_dir=str(tmp_path / "s4")).collect()}
    assert got4 == want


def test_cluster_balanced_sample_quota_and_determinism(spark):
    from entity_resolution_pipeline_spark.operators.ann import (
        ivf_assign_cells,
    )
    from entity_resolution_pipeline_spark.operators.selection import (
        cluster_balanced_sample,
    )
    emb = spark.read.parquet(os.path.join(SF_TINY, "embeddings.parquet"))
    n = emb.count()
    kept = cluster_balanced_sample(emb, n_cells=8, per_cell=5).collect()
    per_cell = {}
    for r in kept:
        per_cell[r.cell_id] = per_cell.get(r.cell_id, 0) + 1
        assert 1 <= r.cell_rank <= 5
    assert max(per_cell.values()) <= 5  # quota binds
    assert len(kept) < n                # something was actually pruned
    # cell ids agree with the shared IVF quantizer
    _, assigned = ivf_assign_cells(emb, 8)
    cells = {r.vec_id: r.cell_id for r in assigned.collect()}
    assert all(cells[r.vec_id] == r.cell_id for r in kept)
    # deterministic draw
    again = cluster_balanced_sample(emb, n_cells=8, per_cell=5).collect()
    assert {(r.vec_id, r.cell_id, r.cell_rank) for r in kept} == \
        {(r.vec_id, r.cell_id, r.cell_rank) for r in again}
    # a non-binding quota keeps everything
    allk = cluster_balanced_sample(emb, n_cells=8, per_cell=n)
    assert allk.count() == n


def test_quality_keeper_groups_match_and_keeper_is_longest(docs):
    from entity_resolution_pipeline_spark.operators.dedup import (
        fuzzy_dedup, fuzzy_dedup_quality_keeper,
    )
    base = fuzzy_dedup(docs, "doc_id", "text", k=3, n_bands=4,
                       threshold=0.7)
    qual = fuzzy_dedup_quality_keeper(docs, "doc_id", "text", k=3,
                                      n_bands=4, threshold=0.7)
    bg = {(r.id, r.dup_group) for r in base.collect()}
    rows = qual.collect()
    assert {(r.id, r.dup_group) for r in rows} == bg  # same groups

    by_group = {}
    for r in rows:
        by_group.setdefault(r.dup_group, []).append(r)
    assert any(len(m) > 1 for m in by_group.values())  # real dup groups
    for grp, members in by_group.items():
        keepers = [m for m in members if m.is_keeper]
        assert len(keepers) == 1  # exactly one keeper per group
        best = min(members, key=lambda m: (-m.quality, m.id))
        assert keepers[0].id == best.id  # longest text wins, ties min id
