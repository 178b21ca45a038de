"""Plan-shape regression tests: pin the executed-plan properties PLANS.md
claims (zero-shuffle gates, TakeOrdered instead of global sorts, the
shuffled-hash self-join) so a Catalyst or code change that silently
degrades a plan fails loudly. Shapes are checked on sf0.001 inputs —
the claims are structural, not scale-dependent."""

import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> list[str]:
    return re.findall(r"Exchange (\w+)", plan)


def test_curation_gate_is_zero_shuffle(spark):
    """The base gate is ONE projection: no exchange of any kind."""
    from entity_resolution_pipeline_spark.operators.curation import (
        curation_flags,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(curation_flags(docs))
    assert _exchanges(plan) == [], plan


def test_url_blocklist_gate_broadcasts_the_dim(spark):
    """Stage-zero URL filtering must never shuffle the corpus: the only
    join is a BroadcastHashJoin against the blocklist dim, and the only
    exchange in the plan is the broadcast itself."""
    from entity_resolution_pipeline_spark.operators.curation import (
        url_blocklist_gate,
    )

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .withColumn("url", F.concat(F.lit("https://d"),
                                        (F.col("doc_id") % 9).cast("string"),
                                        F.lit(".com/x"))))
    plan = _plan(url_blocklist_gate(docs, ["d3.com", "d7.com"]))
    assert "BroadcastHashJoin" in plan, plan
    kinds = re.findall(r"(\w*)Exchange", plan)
    assert kinds and set(kinds) == {"Broadcast"}, plan


def test_url_blocklist_gate_rules(spark):
    """Each rule fires independently; keep is their NOR."""
    from entity_resolution_pipeline_spark.operators.curation import (
        url_blocklist_gate,
    )

    rows = [(1, "https://www.good.com/article"),
            (2, "https://bad.com/article"),
            (3, "https://good.com/casino-bonus"),
            (4, "https://sub.bad.com/xxx-page")]
    docs = spark.createDataFrame(rows, "doc_id: long, url: string")
    got = {r["doc_id"]: (r["domain_blocked"], r["url_token_hit"], r["keep"])
           for r in url_blocklist_gate(docs, ["bad.com"]).collect()}
    assert got == {1: (False, False, True),
                   2: (True, False, False),
                   3: (False, True, False),
                   4: (True, True, False)}


def test_token_stats_are_zero_shuffle(spark):
    """All three token signals (ws count, BPE-ish count, entropy fold)
    are per-row expressions — no exchange."""
    from entity_resolution_pipeline_spark.functions.textstats import (
        bpe_ish_token_count_col, token_count_col, token_entropy_col,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("a"),
        bpe_ish_token_count_col(F.col("text")).alias("b"),
        token_entropy_col(F.col("text")).alias("c"),
    )
    assert _exchanges(_plan(df)) == []


def test_chunker_is_map_side(spark):
    """The overlap chunker's fan-out is posexplode over a per-row
    transform — no exchange."""
    from entity_resolution_pipeline_spark.operators.curation import (
        chunk_documents,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert _exchanges(_plan(chunk_documents(docs))) == []


def test_build_vocab_uses_take_ordered_not_global_sort(spark):
    """Top-N vocabulary is TakeOrderedAndProject (distributed partial
    top-N), never a global Sort of the full wordcount."""
    from entity_resolution_pipeline_spark.operators.curation import (
        build_vocab,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(build_vocab(docs))
    assert "TakeOrderedAndProject" in plan, plan


def test_candidate_pairs_self_join_is_shuffled_hash(spark):
    """The blocks self-join must be a ShuffledHashJoin: a broadcast here
    is the measured scaling cliff (serial multi-GB HashedRelation), and
    sort-merge pays a per-partition sort the bounded hash build avoids."""
    from entity_resolution_pipeline_spark.operators.blocking import (
        blocking_table, salted_blocking_table,
    )
    from entity_resolution_pipeline_spark.operators.pairs import (
        candidate_pairs,
    )
    from entity_resolution_pipeline_spark.sources.pages import (
        pages_from_documents,
    )
    from entity_resolution_pipeline_spark.plans.pipeline import stage_extract

    pages = pages_from_documents(spark, SF, variants=2).drop("true_cluster")
    extracted = stage_extract(pages)
    blocks = blocking_table(extracted.select("url", "text_norm"), n_bands=4)
    salted = salted_blocking_table(blocks)
    plan = _plan(candidate_pairs(salted, top_n=20,
                                 url_dim=extracted.select("url")))
    assert "ShuffledHashJoin" in plan, plan


def test_ivf_assignment_is_narrow(spark):
    """IVF cell assignment is a single narrow projection against literal
    centroids — the corpus-touching side has no exchange (the tiny
    centroid draw job may shuffle; the assignment plan must not)."""
    from entity_resolution_pipeline_spark.operators.ann import (
        ivf_assign_cells,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, assigned = ivf_assign_cells(emb, n_cells=4)
    assert _exchanges(_plan(assigned)) == []


def test_bm25_probes_are_broadcast_and_no_term_shuffle(spark):
    """PLANS.md's retrieval claims: the query-term set broadcasts into
    the postings (BroadcastHashJoins — the corpus never shuffles on raw
    terms to meet the queries), and the only hash exchanges are the tf
    aggregation, the (query, doc) score sum, and the per-query window —
    none keyed on the term column alone (a corpus-vocabulary exchange
    would not survive webtext scale)."""
    from entity_resolution_pipeline_spark.operators.curation import _tokens
    from entity_resolution_pipeline_spark.operators.retrieval import (
        bm25_topk,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    queries = docs.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.slice(_tokens(F.col("text")), 1, 8).alias("terms"),
    )
    out = bm25_topk(docs, queries, k=5, exclude_self=True)
    try:
        out.collect()  # materialize so AQE finalizes the executed plan
        plan = _plan(out)
        # the query-term probe and the df/qterms joins ride broadcasts
        assert plan.count("BroadcastHashJoin") >= 3, plan
        # exactly TWO term-keyed exchanges are allowed, both bounded by
        # the QUERY vocabulary, never the corpus's: the query-term
        # distinct (broadcast-probe input) and the document-frequency
        # count over the probe-restricted postings. The corpus-sized
        # exchanges (tf agg, score sum, per-query window) must all carry
        # a non-term key.
        # dedup: the plan string reprints cached lineages under every
        # InMemoryTableScan, so identical exchanges appear repeatedly
        term_only, with_doc_key = set(), set()
        for keys in set(re.findall(r"hashpartitioning\(([^)]*)\)", plan)):
            cols = {c.strip().split("#")[0] for c in keys.split(",")
                    if "#" in c}
            if not (cols - {"word", ""}):
                term_only.add(keys)
            if "_d" in cols or "doc_id" in cols or "query_id" in cols:
                with_doc_key.add(keys)
        assert len(term_only) <= 2, \
            f"term-only exchanges {sorted(term_only)}:\n{plan}"
        assert with_doc_key, f"no doc-keyed exchange found:\n{plan}"
    finally:
        release_persisted(out)


def test_kmv_sketch_uses_window_group_limit(spark):
    """The bottom-k selection must push a PARTIAL top-k below the
    exchange (WindowGroupLimit) — the property that keeps sketch state
    O(groups x k) instead of shuffling every distinct item to one task
    per group unpruned."""
    from entity_resolution_pipeline_spark.functions.hashing import shingles_col
    from entity_resolution_pipeline_spark.operators.sketches import kmv_distinct

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    items = docs.select(
        "source",
        F.explode(shingles_col(F.lower(F.col("text")), 3)).alias("shingle"))
    plan = _plan(kmv_distinct(items, "source", "shingle", k=16))
    assert "WindowGroupLimit" in plan, plan


def test_line_dedup_no_forced_broadcast(spark):
    """The frequent-line anti-join must NOT carry an explicit broadcast
    hint: web-scale boilerplate sets can be billions of rows, and the
    operator leaves the strategy to AQE. The logical plan therefore has
    no ResolvedHint; exchanges are exactly the count shuffle, the join
    sides, and the reassembly aggregation."""
    from entity_resolution_pipeline_spark.operators.curation import line_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    structured = docs.select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"(\S+\s+\S+\s+\S+\s+\S+)\s+",
                         r"$1\n").alias("text"))
    logical = line_dedup(structured)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "broadcast" not in logical.lower(), logical


def test_quality_features_zero_shuffle(spark):
    """The classifier's raw feature derivation is one narrow projection."""
    from entity_resolution_pipeline_spark.operators.quality_model import (
        doc_quality_features,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert _exchanges(_plan(doc_quality_features(docs))) == []


def test_corpus_diff_moves_hashes_not_text(spark):
    """Both snapshot sides collapse to (id, md5) BELOW the diff join —
    the executed plan's join inputs must not reference the text column."""
    from entity_resolution_pipeline_spark.operators.curation import corpus_diff

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(corpus_diff(docs, docs.selectExpr(
        "doc_id", "concat(text, ' rev') AS text")))
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
                     plan), plan
    # md5 is computed in projections feeding the join; the join keys are
    # ids and the shuffled columns are the 32-hex hashes
    assert "old_hash" in plan and "new_hash" in plan


def test_bpe_pair_count_single_aggregate(spark):
    """One merge iteration = one hash aggregation over the vocab table
    (map-side combined: partial + final around a single exchange)."""
    from entity_resolution_pipeline_spark.operators.tokenizer import (
        _char_seq, _word_counts,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = _word_counts(docs, "text").select(
        "word", "wc", _char_seq(F.col("word")).alias("seq"))
    pairs = (
        vocab.where(F.size("seq") >= 2)
        .select("wc", F.explode(F.transform(
            F.sequence(F.lit(1), F.size("seq") - 1),
            lambda i: F.struct(F.element_at("seq", i).alias("l"),
                               F.element_at("seq", i + F.lit(1)).alias("r")),
        )).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("wc").alias("n"))
    )
    plan = _plan(pairs)
    # two exchanges total: the wordcount shuffle + the pair-count shuffle
    assert len(_exchanges(plan)) == 2, plan


def test_dsir_select_is_takeordered_not_global_sort(spark):
    """The corpus-level top-k must plan as TakeOrderedAndProject (sort +
    limit collapse), never a full global Sort; the model joins must be
    broadcast."""
    from entity_resolution_pipeline_spark.operators.selection import (
        dsir_select,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.where(F.col("source").isin("src0", "src1"))
    plan = _plan(dsir_select(docs, target, k=25, n_buckets=64))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_cluster_balanced_sample_is_window_group_limit(spark):
    """Kept-rows-only output lets Spark push the per-cell quota below the
    sort (WindowGroupLimit, partial + final) — dropped rows never
    materialize a rank."""
    from entity_resolution_pipeline_spark.operators.selection import (
        cluster_balanced_sample,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(cluster_balanced_sample(emb, n_cells=8, per_cell=5))
    assert "WindowGroupLimit" in plan, plan


def test_formerly_leaking_rows_release_all_caches(spark):
    """Round-5 regression pin for the cache-bleed contract: the six rows
    tools/audit_cache_bleed.py caught leaking (plus the new selection
    rows) must leave ZERO persistent RDDs and an empty CacheManager
    after release_persisted. Full-battery coverage lives in the tool;
    this pins the exact rows that regressed once."""
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )
    from entity_resolution_pipeline_spark.plans import benchqueries as bq

    # earlier tests in this module BUILD plans over persisted frames
    # without executing them — those registrations sit in the
    # CacheManager and would fail the absolute emptiness check below
    spark.catalog.clearCache()

    rows = ["corpus_curation", "dedup_ngram_jaccard", "dedup_containment",
            "dedup_canonical", "embedding_near_dup_srp",
            "connected_components", "dedup_quality_keeper", "dsir_select",
            "cluster_balanced_sample"]
    for name in rows:
        before = {int(k) for k in
                  spark.sparkContext._jsc.getPersistentRDDs()
                  .keySet().toArray()}
        df = bq.QUERIES[name](spark, SF)
        df.count()
        release_persisted(df)
        fresh = {int(k) for k in
                 spark.sparkContext._jsc.getPersistentRDDs()
                 .keySet().toArray()} - before
        cm_nonempty = not (spark._jsparkSession.sharedState()
                           .cacheManager().isEmpty())
        assert not fresh and not cm_nonempty, (name, fresh, cm_nonempty)
