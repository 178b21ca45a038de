"""Blocking recall + skew-salting tests (T4)."""

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.operators.blocking import (
    blocking_table, key_stats, salted_blocking_table,
)
from entity_resolution_pipeline_spark.operators.pairs import candidate_pairs
from entity_resolution_pipeline_spark.plans.pipeline import stage_extract
from entity_resolution_pipeline_spark.sources.pages import HOT_DOMAIN


def _blocks(spark, fixtures):
    extracted = stage_extract(fixtures["pages"]).select("url", "text_norm")
    return blocking_table(extracted)


def test_blocking_recall(spark, fixtures):
    """Blocking recall (FIXTURES.md §5a): most label=1 pairs co-block
    directly, and EVERY member of a non-singleton cluster co-blocks with at
    least one same-cluster peer (transitive closure then recovers the rest —
    the cluster-level guarantee is the e2e F1 gate)."""
    blocks = _blocks(spark, fixtures).select("block_key", "url").distinct()
    # drop the fixture's own block_key column — it would shadow the USING join
    lp = fixtures["labeled_pairs"].where("label = 1").select("url_a", "url_b")
    a = blocks.withColumnRenamed("url", "url_a")
    b = blocks.withColumnRenamed("url", "url_b")
    coblocked = lp.join(a, "url_a").join(b, ["url_b", "block_key"]) \
                  .select("url_a", "url_b").distinct()
    n_pos = lp.count()
    missed = lp.join(coblocked, ["url_a", "url_b"], "left_anti").count()
    assert missed / n_pos < 0.15, (missed, n_pos)

    # per-member reachability: some same-cluster co-block partner exists
    golden = fixtures["golden_clusters"]
    sizes = golden.groupBy("cluster_id").count()
    multi = golden.join(sizes.where("count > 1"), "cluster_id").select("url", "cluster_id")
    ga = multi.withColumnRenamed("url", "url_a").withColumnRenamed("cluster_id", "c_a")
    gb = multi.withColumnRenamed("url", "url_b").withColumnRenamed("cluster_id", "c_b")
    peer_pairs = (
        blocks.withColumnRenamed("url", "url_a").join(ga, "url_a")
        .join(blocks.withColumnRenamed("url", "url_b"), "block_key")
        .join(gb, "url_b")
        .where((F.col("url_a") != F.col("url_b")) & (F.col("c_a") == F.col("c_b")))
    )
    covered = peer_pairs.select(F.col("url_a").alias("url")).distinct()
    uncovered = multi.join(covered, "url", "left_anti").count()
    assert uncovered == 0


def test_hot_keys_are_salted_and_stop_keys_dropped(spark, fixtures):
    """The fixture's mega-cluster (40 near-identical pages) must make at
    least one content blocking key hot; hot keys get triangular salting."""
    blocks = _blocks(spark, fixtures)
    n_docs = fixtures["pages"].count()
    salted = salted_blocking_table(blocks, hot_threshold=16, n_salts=4,
                                   n_docs=n_docs, stop_frac=0.5)
    stats = key_stats(blocks)
    hot_keys = [r["block_key"] for r in
                stats.where((F.col("block_size") >= 16)
                            & (F.col("block_size") < n_docs * 0.5)).collect()]
    assert hot_keys, "fixture must produce at least one hot block"
    hot_rows = salted.where(F.col("block_key").isin(hot_keys))
    # hot key members carry salt-pair join keys, not the bare key
    assert hot_rows.where(F.col("join_key") == F.col("block_key")).count() == 0
    # triangular replication with ADAPTIVE width: each member of a block of
    # size s appears exactly clamp(ceil(s/hot_threshold), 2, n_salts) times
    # for that key (replication scales with how hot the block actually is)
    sizes = {r["block_key"]: r["block_size"] for r in
             stats.where(F.col("block_key").isin(hot_keys)).collect()}
    per_member = hot_rows.groupBy("block_key", "url").count().collect()
    for r in per_member:
        s = sizes[r["block_key"]]
        expected = min(4, max(2, -(-s // 16)))  # ceil-div, hot=16, n_salts=4
        assert r["count"] == expected, (r["block_key"], s, r["count"], expected)
    # stop keys (> stop_frac * corpus) gone entirely
    stop_keys = [r["block_key"] for r in
                 stats.where(F.col("block_size") > n_docs * 0.5).collect()]
    if stop_keys:
        assert salted.where(F.col("block_key").isin(stop_keys)).count() == 0


def test_salting_loses_no_pairs(spark, fixtures):
    """Pairs from the salted plan == pairs from the unsalted plan
    (FIXTURES.md §5b: hot keys split yet lose no cross-salt pairs)."""
    blocks = _blocks(spark, fixtures)
    unsalted = salted_blocking_table(blocks, hot_threshold=10**9, n_salts=1)
    salted = salted_blocking_table(blocks, hot_threshold=8, n_salts=5)
    p_un = candidate_pairs(unsalted, top_n=None, n_salts=1) \
        .select("url_a", "url_b", "blocking_score")
    p_sa = candidate_pairs(salted, top_n=None, n_salts=5) \
        .select("url_a", "url_b", "blocking_score")
    assert p_un.exceptAll(p_sa).count() == 0
    assert p_sa.exceptAll(p_un).count() == 0


def test_compact_keys_equal_string_path(spark, fixtures):
    """The 128-bit compact-shuffle-key path is byte-identical to grouping
    on the url strings (uncapped — with a cap only the arbitrary order of
    score TIES at the boundary may differ), and the digest-side cap keeps
    exactly the top-N scores per query url."""
    blocks = _blocks(spark, fixtures)
    salted = salted_blocking_table(blocks, hot_threshold=16, n_salts=4)
    compact = candidate_pairs(salted, top_n=None, compact_shuffle_keys=True)
    strings = candidate_pairs(salted, top_n=None, compact_shuffle_keys=False)
    assert compact.exceptAll(strings).count() == 0
    assert strings.exceptAll(compact).count() == 0

    capped = candidate_pairs(salted, top_n=3, compact_shuffle_keys=True)
    per = capped.groupBy("url_a").count().agg(F.max("count")).collect()[0][0]
    assert per <= 3
    # kept score multiset per group == string-path kept score multiset
    ref = candidate_pairs(salted, top_n=3, compact_shuffle_keys=False)
    k_c = capped.groupBy("url_a").agg(
        F.sort_array(F.collect_list("blocking_score")).alias("scores"))
    k_s = ref.groupBy("url_a").agg(
        F.sort_array(F.collect_list("blocking_score")).alias("scores"))
    assert k_c.exceptAll(k_s).count() == 0
    assert k_s.exceptAll(k_c).count() == 0


def test_pair_generation_is_ordered_and_deduped(spark, fixtures):
    blocks = _blocks(spark, fixtures)
    salted = salted_blocking_table(blocks, hot_threshold=16, n_salts=4)
    pairs = candidate_pairs(salted, top_n=50, n_salts=4)
    assert pairs.where(F.col("url_a") >= F.col("url_b")).count() == 0
    assert pairs.groupBy("url_a", "url_b").count().where("count > 1").count() == 0
